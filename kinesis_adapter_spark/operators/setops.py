"""Set operators (SURVEY.md §2.1-G).

Bag vs set semantics both covered; Spark plans set variants as
aggregates/joins under the hood, so the same partial-aggregation and
broadcast reasoning applies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query


def _orders_split(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cutoff)
    late = o.filter(F.col("o_orderdate") >= cutoff)
    return early, late


@query(
    "union_all",
    """
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union: split by date then reunite (narrow op, no shuffle)."""
    early, late = _orders_split(spark, sf_dir)
    cols = ["o_orderkey", "o_totalprice"]
    return early.select(cols).unionByName(late.select(cols))


@query(
    "union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union of two customer-key sets."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    b = o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return a.union(b).distinct()


@query(
    "intersect_set",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def intersect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1996 and 1997 (set intersect)."""
    o = load(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year_keys(1996).intersect(year_keys(1997))


@query(
    "except_set",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def except_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers who ordered but never above 300k
    (non-empty at every sf, unlike customer∖orders — FK has no
    orphans)."""
    o = load(spark, sf_dir, "orders")
    all_k = o.select(F.col("o_custkey").alias("custkey"))
    big_k = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return all_k.subtract(big_k)


@query(
    "intersect_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect: keeps min(multiplicity) per key."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(r)


@query(
    "except_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicity-aware subtraction."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    o = li.filter(F.col("l_linestatus") == "O").select("l_suppkey")
    return f.exceptAll(o)
