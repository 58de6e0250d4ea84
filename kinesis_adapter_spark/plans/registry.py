"""Operator/query registry backing ``__spark_entry__``.

Every operator from SURVEY.md §2.1 registers here with an exact key.
A key declares:
- a PySpark callable ``(spark, sf_dir) -> DataFrame``; and
- optionally a DuckDB oracle SQL string producing the SAME columns
  (names match — the driver sorts columns by name before hashing).

Keys without an oracle get the driver's weaker rows-only check
(class T3 in SURVEY.md §2.1). The parity gate in
``tests/test_oracle_parity.py`` replicates the driver check locally, so
nothing is declared here until it hash-matches at sf0.01 (§5.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis_adapter_spark.session import prepare_session

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = oracle
        return wrapped

    return deco


def load_all_modules() -> None:
    """Import every operator module so registration side-effects run."""
    # Imports are deferred so a syntax error in one late-stage module
    # can be caught/isolated by callers that only need the core.
    from kinesis_adapter_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        curation,
        incremental,
        insights,
        mlprep,
        embeddings_ops,
        joins,
        llmops,
        multimodal,
        projections,
        scaleops,
        setops,
        sorts,
        udx,
        windows,
    )
    from kinesis_adapter_spark.functions import scalar  # noqa: F401
    from kinesis_adapter_spark.sources import scans  # noqa: F401
    from kinesis_adapter_spark.streaming import pipelines  # noqa: F401
