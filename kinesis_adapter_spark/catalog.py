"""Catalog: explicit schemas + loaders for the test tables.

Schemas are declared explicitly (FIXTURES.md) so drift fails fast, but
loading uses the parquet footer schema (Spark verifies compatibility via
the assertion in ``load``). ``events.ts`` arrives as BIGINT ns-since-
epoch under ``nanosAsLong`` (SURVEY.md §5.3.3); helpers below convert.

At 100 TB these loaders become ``spark.read.parquet`` over partitioned
S3 prefixes — the call shape is identical; partition pruning comes free
from directory layout + Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Spark DDL per table (FIXTURES.md). events.ts is LONG (ns) post-conf.
SCHEMAS: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP"
    ),
    "events": (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}


# DataFrame memo keyed by (session identity, sf_dir, table): the test
# tables are immutable, so the relation (file listing + footer schema)
# is resolved once per session instead of per query call — measured
# ~80 ms of py4j/footer overhead on EVERY load, which dominates the
# sub-second headline queries. Keyed on the SparkSession object so a
# rebuilt session never serves relations from a stopped context.
_DF_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one table; applies required runtime confs first."""
    prepare_session(spark)
    key = (id(spark), sf_dir, table)
    df = _DF_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        _DF_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-path queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a proper TIMESTAMP column derived from the ns long.

    ``ts`` stays the raw int64 (exact oracle comparisons use it);
    ``ts_ts`` is microsecond-truncated TIMESTAMP for windowing.
    """
    ev = load(spark, sf_dir, "events")
    return ev.withColumn("ts_ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
