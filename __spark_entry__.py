"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kinesis_adapter_spark/`` (SURVEY.md §7.2);
this module only adapts the registry to the driver's API.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kinesis_adapter_spark.plans.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_modules,
)

load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return QUERIES["agg_sum_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-matchable key (T1/T2);
    T3 keys (streaming/approx/sink ops) are intentionally omitted so the
    driver records the rows-only check."""
    return dict(ORACLES)
