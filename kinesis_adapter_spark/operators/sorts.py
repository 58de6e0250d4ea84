"""Sort / limit / top-k operators (SURVEY.md §2.1-F).

Every limit rides a TOTAL order (unique tiebreak column) — without it
the selected row set is nondeterministic and the oracle hash flakes.
``orderBy().limit(k)`` plans as TakeOrderedAndProject: each partition
keeps only its top-k heap and the driver merges k·p rows — no global
sort, which is what makes global top-k viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query


@query(
    "order_multi",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus DESC, o_totalprice ASC NULLS LAST, o_orderkey
    LIMIT 500
    """,
)
def order_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null placement + total order."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").desc(),
            F.col("o_totalprice").asc_nulls_last(),
            F.col("o_orderkey"),
        )
        .limit(500)
    )


@query(
    "topk_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price (TakeOrderedAndProject plan)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 200
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination over a total order (Spark ≥3.4 offset support).

    Note: OFFSET at scale still computes the first N+k rows — fine for
    page-sized k, wrong tool for deep pagination (use keyset/seek
    predicates instead: WHERE key > last_seen ORDER BY key LIMIT m)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(200)
        .limit(50)
    )


@query(
    "topk_per_group",
    """
    SELECT user_id, event_id, value, rn
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user by value (window row_number + filter).

    At 100 TB: Catalyst inserts a WindowGroupLimit (partial top-k
    before the shuffle) for rank-filter patterns, so each map task
    forwards ≤k rows per key."""
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
