"""TPC-H-derived analytics shapes beyond q1/q3/q5/q18 (SURVEY.md §2.1,
reference test-query parity — reference snapshot empty, SURVEY.md §0.1).

The testdata schema is TPC-H-ish, not TPC-H: no partsupp, l_shipmode,
l_commitdate/l_receiptdate, c_phone or p_container. Each classic query
is re-cut onto the columns that exist while keeping the PLAN SHAPE the
original exercises — that shape (not the literal predicate) is what
must survive a 100 TB scale-up:

- q6  : pure scan-side predicate pushdown, no join, single partial+final agg
- q7  : fact⋈fact with two broadcast dimension legs and a year bucket
- q10 : join-then-aggregate with a top-k (TakeOrderedAndProject) head
- q12 : conditional aggregation (CASE inside SUM) over a fact join
- q14 : two conditional sums in ONE pass (ratio without a self-join)
- q15 : aggregate → window-max over the aggregate (no re-scan of the fact)
- q16 : distinct-count after join with an anti-join exclusion list
- q17 : per-group avg as a broadcast side-input (correlated subquery
        decorrelated into agg + join — Spark has no correlated exec)
- q19 : disjunctive (OR-of-ANDs) predicate that must still push down
- q22 : scalar-subquery threshold + anti join (customers with no orders)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query

def _revenue():
    # Built lazily: pyspark-classic F.col() needs an active SparkContext,
    # so a module-level Column would break import order.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style forecasting revenue change: the canonical
    pushdown benchmark. All three predicates must reach the parquet
    reader (PushedFilters), the scan reads exactly 4 columns, and the
    whole query is one partial-agg → single-row final — zero shuffle
    beyond the 1-row exchange. At 100 TB with date-partitioned data
    the shipdate range also becomes partition pruning."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: the fact⋈fact join
    (lineitem⋈orders) carries the cost; supplier and both nation legs
    broadcast, and the nation-pair disjunction is applied as soon as
    both nation names are in scope — before the groupBy — so the
    shuffle into the aggregate carries only the two qualifying
    nation-pairs' rows."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item losses: who returned the most
    revenue in a half-year window. The returnflag filter pushes into
    the lineitem scan (kills ~2/3 of the fact before the join); the
    orderdate range prunes orders; customer⋈nation broadcasts; top-20
    is TakeOrderedAndProject, never a global sort."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_lateness",
    """
    SELECT year(l_shipdate) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY year(l_shipdate)
    ORDER BY ship_year
    """,
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style lateness audit (l_shipmode absent → re-cut on
    shipping lag): for lines shipped >60 days after the order, count
    high- vs low-priority per ship year. The CASE-in-SUM pair computes
    both tallies in one aggregate pass — the naive two-query/self-join
    form scans the fact twice. The lag predicate compares two columns
    from different tables so it CANNOT push below the join — it runs
    as the join's post-condition, which is the interesting plan fact
    pinned in tests."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect: percent of one month's revenue
    from PROMO parts. Numerator and denominator are two conditional
    sums in the SAME aggregate — one scan, one broadcast join, no
    self-join. part broadcasts (bounded dim); the month filter prunes
    lineitem at the scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_revenue()), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    QUALIFY total_revenue = MAX(total_revenue) OVER ()
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: quarterly revenue per supplier,
    keep the max (with ties). The max is a window over the ALREADY
    AGGREGATED per-supplier rows — supplier-count cardinality, never a
    re-scan of lineitem (the classic Q15 view is evaluated twice by
    naive engines; Spark computes rev once). Revenue is rounded to
    cents BEFORE the max comparison so Spark and the oracle select the
    same winners under float accumulation-order differences. The empty
    window frame means a single-partition exchange — of ~suppliers
    rows, which is fine at any scale."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy()
    return (
        rev.join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_count",
    """
    WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (5, 15, 25, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier diversity (partsupp absent → lineitem
    is the part↔supplier bridge): distinct suppliers per (brand, type)
    for selected sizes, excluding an anti-joined blocklist (suppliers
    in arrears). The NOT IN becomes a broadcast left-anti join — at
    100 TB the blocklist stays driver-size; the distinct-count is the
    only expensive op and Spark expands it map-side before the final
    shuffle."""
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35)
    ).select("p_partkey", "p_brand", "p_type")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


@query(
    "q17_small_qty_revenue",
    """
    WITH avgq AS (
      SELECT l_partkey AS a_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_weekly_loss
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity-order revenue: lines below half
    the part's average quantity. The correlated scalar subquery
    (avg per part) is decorrelated into a per-part aggregate joined
    back — Spark broadcasts it since it is ≤ |part| rows of two
    columns. Lineitem is scanned twice (once for the averages, once
    for the probe); at 100 TB the averages side would be a maintained
    per-part statistics table instead — noted in SCALE.md."""
    li = load(spark, sf_dir, "lineitem")
    avgq = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avgq), li.l_partkey == avgq.a_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly_loss"))
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style discounted revenue with an OR-of-ANDs
    predicate. The optimizer must (a) extract the common
    per-table residuals so each scan still gets a pushable filter
    (l_quantity ∈ [1,30]; p_size ∈ [1,15]; brand IN-list) and (b)
    leave the cross-table disjunction as the join condition's
    residual. Catalyst's CNF conversion does exactly this — pinned in
    tests, because losing it means a full-fact scan at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@query(
    "q22_dormant_customers",
    """
    WITH thresh AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style dormant high-balance customers (c_phone absent →
    segmented by c_mktsegment): above-average balance, no URGENT order
    ever (plain "never ordered" is vacuously empty on this testdata —
    every high-balance customer has ordered — so the anti-join side is
    the urgent subset, which leaves a real surviving set to aggregate).
    The scalar average becomes a 1-row broadcast cross join (Spark's
    decorrelation of scalar subqueries); the NOT EXISTS is a left-anti
    join against a filtered o_custkey column, which at 100 TB is a
    shuffle-anti on the customer key — or a broadcast of the distinct
    key set if it fits."""
    c = load(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
