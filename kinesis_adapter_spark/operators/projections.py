"""Projection / filter / predicate operators (SURVEY.md §2.1-B).

These are the operators Catalyst optimizes hardest: projections prune
the parquet ReadSchema, predicates push down to row-group filters.
Every query here keeps the filter expressible as a parquet predicate
(no opaque UDFs in WHERE) so the 100 TB scan only reads matching
row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query


@query(
    "project_select",
    """
    SELECT
      o_orderkey,
      o_custkey,
      ROUND(o_totalprice * 0.9, 4)            AS discounted,
      upper(o_orderstatus)                    AS status_uc,
      o_orderkey % 10                         AS bucket
    FROM orders
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + computed columns + aliases (scan reads only the
    4 referenced columns of 6 — check ReadSchema in explain)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 0.9, 4).alias("discounted"),
        F.upper("o_orderstatus").alias("status_uc"),
        (F.col("o_orderkey") % 10).alias("bucket"),
    )


@query(
    "filter_compound",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20)
      AND (l_returnflag IN ('A', 'R') OR NOT (l_linestatus = 'F'))
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN, all pushdown-eligible predicates."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag").isin("A", "R") | ~(F.col("l_linestatus") == "F"))
        & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "filter_like",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%a%' AND p_brand NOT LIKE '%3'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates (translated to StartsWith/Contains where
    possible so they still push down)."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%") & ~F.col("p_brand").like("%3")).select(
        "p_partkey", "p_name", "p_brand"
    )


@query(
    "filter_null_semantics",
    """
    WITH t AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT
      c_custkey,
      bal,
      (bal IS NULL)                 AS is_null,
      COALESCE(bal, -1.0)           AS bal_filled,
      (bal IS NOT DISTINCT FROM NULL) AS null_safe_eq_null
    FROM t
    WHERE bal IS NULL OR bal > 5000
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: NULLs derived via CASE (fixtures are
    NULL-free), then IS NULL / COALESCE / null-safe equality."""
    c = load(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    t = c.select("c_custkey", bal.alias("bal"))
    return t.select(
        "c_custkey",
        "bal",
        F.col("bal").isNull().alias("is_null"),
        F.coalesce("bal", F.lit(-1.0)).alias("bal_filled"),
        F.col("bal").eqNullSafe(F.lit(None).cast("double")).alias("null_safe_eq_null"),
    ).filter(F.col("bal").isNull() | (F.col("bal") > 5000))


@query(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate >= TIMESTAMP '1998-01-01' AS late
    FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level dedup (planned as a group-by — partial dedup map-side
    before the shuffle, so 100 TB input shuffles only distinct triples)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).alias("late"),
    ).distinct()


@query(
    "observed_quality_gate",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE n_chars >= 50 AND lang IS NOT NULL
    """,
)
def observed_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate with ZERO-COST observability: the filter drops
    short/lang-less docs, and ``df.observe`` attaches accumulator-style
    metrics (rows seen, rows kept, null-lang count, char sum) that are
    collected DURING the one pass — no second scan, no count() jobs.
    This is how a production pipeline emits its data-quality counters;
    the observation's values are asserted in pytest
    (tests/test_quality.py::test_observe_metrics_match_data). At
    100 TB observe is the only affordable way to audit a pipeline —
    every .count() audit doubles the scan bill."""
    from pyspark.sql import Observation

    d = load(spark, sf_dir, "documents")
    obs = Observation("quality_gate")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0)).alias("null_lang"),
        F.sum("n_chars").alias("chars_seen"),
    )
    out = observed.filter((F.col("n_chars") >= 50) & F.col("lang").isNotNull()).select(
        "doc_id", "lang", "n_chars"
    )
    # stash the Observation for the test to read after the action runs
    observed_quality_gate.last_observation = obs
    return out
