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
- q2  : per-group MIN over a multi-dim candidate set (decorrelated into
        window-min; supplier→nation→region dim chain all broadcast)
- q4  : EXISTS with a cross-table residual → left-semi join whose
        condition mixes the equi key with a date-range comparison
- q8  : market-share ratio — conditional sum / total sum per year over a
        six-way join with two independent nation legs
- q9  : profit decomposition with a LIKE filter on the part dim and a
        nation×year rollup
- q11 : group-HAVING against a scalar-subquery total (1-row broadcast)
- q13 : outer join with an ON-side filter, then an aggregate OF an
        aggregate (orders/customer → histogram of counts)
- q20 : semi-join chain: parts by prefix → per-(supp,part) shipped qty
        threshold → suppliers that clear it
- q21 : the hardest correlation shape: semi (order had other suppliers)
        + anti (no OTHER supplier was late) against the same derived
        late-lines relation
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import NS_PER_HOUR, load, ts_bucket
from kinesis_adapter_spark.plans.registry import query
from kinesis_adapter_spark.session import released_persists

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


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             ROUND(AVG(l_extendedprice / l_quantity), 4) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM cost
    JOIN part ON p_partkey = l_partkey AND p_size <= 15 AND p_type = 'STANDARD'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    QUALIFY supply_cost = MIN(supply_cost) OVER (PARTITION BY p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier (partsupp absent → lineitem
    is the part↔supplier bridge; supply cost = average realized unit
    price, rounded to 4 BEFORE the min so both engines compare the
    same values under float accumulation-order skew). The correlated
    "= (SELECT MIN ...)" of the original is decorrelated into a
    per-part window-min over the candidate set — one shuffle on
    l_partkey; every dim leg (part slice, supplier→nation→region
    chain) broadcasts. Top-20 by account balance is
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "supply_cost"
        )
    )
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style priority check (commitdate/receiptdate absent →
    lateness re-cut as shipped >60 days after order): count one
    quarter's orders that had at least one late line. The EXISTS is a
    LEFT-SEMI join whose condition mixes the l_orderkey equi key with
    the cross-table date comparison — Spark hashes on the key and
    evaluates the range as the join residual, so the fact side never
    duplicates orders (semi ≠ inner+distinct: no fan-out, no dedup
    shuffle). The quarter filter prunes the orders scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    """
    WITH base AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'EUROPE'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM base GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: NATION_7's slice of the
    European ECONOMY-part market per year. Six-way join where ONLY
    lineitem⋈orders is fact⋈fact (one shuffle); the part slice, the
    customer→nation→region leg and the supplier→nation leg all
    broadcast. The share is numerator/denominator as two conditional
    sums in ONE aggregate — the self-join-free ratio shape (same
    pattern as q14)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit (ps_supplycost absent → cost
    modeled as 60% of retail price × quantity): profit on 'red' parts
    by supplier nation and year. The LIKE '%red%' contains-filter
    cannot prune at the parquet reader (no leading anchor) but it DOES
    cut the broadcast part slice before the join; lineitem⋈orders is
    the one real shuffle; nation×year is a tiny final aggregate."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf_dir, "nation")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    """
    WITH val AS (
      SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, ROUND(value, 2) AS part_value
    FROM val
    WHERE value > 2.5 * (SELECT SUM(value) FROM val)
                      / (SELECT COUNT(*) FROM val)
    ORDER BY part_value DESC, p_key
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock (partsupp absent → traded value
    sum(extendedprice×quantity) by NATION_3's suppliers per part):
    keep parts whose value exceeds 2.5× the MEAN national part value.
    TPC-H's own Q11 scales its fraction as 0.0001/SF for exactly this
    reason — a fixed share-of-total empties as the part domain grows
    (r11: 0.0012·total kept 314 parts at sf0.01 and ZERO at sf0.1,
    a vacuous hash-match). Mean-relative keeps the selectivity stable:
    85 parts at sf0.01, 825 at sf0.1 (~6–7%), at ANY scale.
    The scalar total is collected as 1-row metadata and folded into
    the filter as a literal — two passes over the filtered broadcast
    join, nothing cached (cache-hygiene rule: a returned lazy frame
    cannot own a persist). The HAVING comparison happens on the raw
    double; output rounds after."""
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    # Scalar threshold via one bounded 1-row collect — the oracle's
    # scalar subquery, as two passes. (An earlier cut persisted val to
    # share one scan, but the returned lazy frame could never release
    # the cache, so a long-lived session held a |parts|-sized cache
    # entry per sf_dir forever — the r8 cache-hygiene rule: caches are
    # scoped inside the call or not taken at all. One extra scan of a
    # filtered broadcast join buys a leak-free engine.)
    row = val.agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    # same op order as the oracle: (2.5 * SUM) / COUNT
    threshold = 2.5 * row["total"] / row["n"]
    return (
        val.filter(F.col("value") > F.lit(threshold))
        .select(
            F.col("l_partkey").alias("p_key"), F.round("value", 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "p_key")
    )


@query(
    "q13_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: LEFT join so
    order-less customers survive with count 0, the priority exclusion
    lives in the JOIN CONDITION (an ON-side filter — pushing it to a
    WHERE would silently drop the NULL-extended rows), then an
    aggregate OF an aggregate: per-customer counts → histogram. The
    second aggregate's key space (distinct counts) is tiny, so the
    second shuffle is trivial; the first groups on the join key the
    rows already hash by."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    cond = (F.col("o_custkey") == F.col("c_custkey")) & (
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q20_part_promotion",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE EXISTS (SELECT 1 FROM shipped
                  WHERE l_suppkey = s_suppkey AND qty > 46)
    ORDER BY s_suppkey
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style promotion candidates (availqty absent → shipped
    volume): suppliers who moved >46 units of any 'small…' part in
    1996. A semi-join CHAIN: the prefix part slice broadcasts into the
    lineitem scan as a semi join (prefix LIKE 'small%' also pushes a
    StartsWith filter to the part scan), the per-(supplier, part)
    aggregate applies the threshold, and its distinct supplier keys
    semi-join the supplier dim. Each link only ever shrinks the data —
    nothing fans out."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 46)
        .select("l_suppkey")
    )
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late JOIN supplier ON s_suppkey = late.l_suppkey
    WHERE late.l_orderkey IN (SELECT l_orderkey FROM multi)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = late.l_orderkey
                        AND l2.l_suppkey <> late.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style suppliers who kept orders waiting: on finished
    multi-supplier orders, count per supplier the orders where THEY
    were late (shipped >90 days after order) and no other supplier
    was. The correlation pair — EXISTS(another supplier) + NOT
    EXISTS(another LATE supplier) — becomes a semi join against the
    multi-supplier order set and an ANTI self-join of the late set on
    (same order, different supplier); both hash on l_orderkey with the
    supplier inequality as residual, and the late set is computed ONCE
    (persisted) for both sides of the anti join. Supplier names
    broadcast; top-20 is TakeOrderedAndProject. The top-20 result is
    bounded, so the call materializes it and releases the late cache
    before returning (cache-hygiene rule: a returned lazy frame cannot
    own a persist) — the lazy plan lives in _q21_plan for the plan
    pin."""
    plan, late = _q21_plan(spark, sf_dir)
    try:
        rows = plan.collect()  # <=20 rows: bounded result
    finally:
        late.unpersist()
    return spark.createDataFrame(rows, plan.schema).orderBy(
        F.col("numwait").desc(), "s_name"
    )


def _q21_plan(spark: SparkSession, sf_dir: str):
    """q21's lazy plan plus the persisted late-set handle the caller
    must release after materializing (the _mmr_pool pattern: expose
    the corpus-shaped plan for pinning; the key function owns the
    cache lifecycle)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .persist()  # both sides of the anti self-join read this once
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    anti_cond = (F.col("l_orderkey") == F.col("o_key")) & (
        F.col("l_suppkey") != F.col("o_supp")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plan = (
        late.join(multi, "l_orderkey", "left_semi")
        .join(other_late, anti_cond, "left_anti")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
    return plan, late


# Fixed-bin bucket expression shared VERBATIM by Spark and the oracle
# (DuckDB has no width_bucket): 25 equal bins over [0,500), Postgres
# width_bucket semantics (0 below range, n+1 above). 500/25 = 20.0 is
# exact in binary, so the division is bit-identical across engines.
_HIST_BUCKET_SQL = (
    "CAST(CASE WHEN value < 0.0 THEN 0 WHEN value >= 500.0 THEN 26 "
    "ELSE CAST(floor(value / 20.0) AS INT) + 1 END AS INT)"
)


@query(
    "agg_histogram_fixed",
    f"""
    SELECT event_type,
           {_HIST_BUCKET_SQL} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 2) AS lo,
           ROUND(MAX(value), 2) AS hi
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group — the profiling/monitoring
    staple. The bucket id (Postgres width_bucket semantics: 25 equal
    bins over [0,500), bin 0 / 26 for out-of-range; expression shared
    verbatim with the oracle) is a pure map-side expression, so the
    whole histogram is ONE partial-aggregated shuffle of (type,
    bucket) pairs — at
    100 TB the shuffle carries ≤ |types|·27 rows per map task no
    matter how many events feed it. Fixed bounds (not data-dependent
    min/max) are what make the histogram mergeable across days/tiers:
    the same bins always line up."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.expr(_HIST_BUCKET_SQL))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "skew_key_report",
    """
    WITH freq AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_n,
             ROUND(AVG(n), 6) AS mean_n,
             ROUND(MAX(n) * 1.0 / AVG(n), 4) AS skew_factor
      FROM freq
    ),
    top AS (
      SELECT key, n FROM freq ORDER BY n DESC, key LIMIT 5
    )
    SELECT s.n_keys, s.n_rows, s.max_n, s.mean_n, s.skew_factor,
           t.key AS hot_key, t.n AS hot_n,
           CAST(row_number() OVER (ORDER BY t.n DESC, t.key) AS BIGINT) AS hot_rank
    FROM stats s CROSS JOIN top t
    ORDER BY hot_rank
    """,
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy-key skew diagnosis — the report run BEFORE choosing
    a mitigation (salt count, AQE skew-join thresholds, broadcast
    cutoff): per-key frequency tier, corpus-level skew factor
    (max/mean key frequency), and the top-5 heavy hitters, in one
    pass. The frequency tier is the only row-scale aggregation (a
    combinable count per key); everything after operates on the key
    frequency table. skew_factor ~ 1 means uniform keys (hash
    partitioning is fine); a hot key at 100x mean is exactly the case
    agg_salted_skew / join_salted_skew exist for — this op tells you
    which keys and how bad, so the salt count is chosen from data, not
    folklore. At 100 TB the same report runs on a sample or on the
    maintained frequency rollup.

    Output is bounded (top-5 rows), so the call materializes it and
    releases the frequency tier's localCheckpoint before returning (the
    q21 pattern — r10 persist-leak sweep caught this key pinning the
    tier across calls); the lazy plan lives in _skew_report_plan for
    the plan pin."""
    with released_persists(spark):
        # build INSIDE the guard: localCheckpoint registers its persist
        # at call time (materialization is what's deferred), so a plan
        # built before the snapshot would escape the release
        plan = _skew_report_plan(spark, sf_dir)
        rows = plan.collect()  # <=5 rows: bounded result
    return spark.createDataFrame(rows, plan.schema).orderBy("hot_rank")


def _skew_report_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_key_report's lazy plan (frequency tier checkpoint included)
    — the key function owns the materialize-and-release lifecycle."""
    o = load(spark, sf_dir, "orders")
    # materialize the frequency tier once (lazy localCheckpoint): both
    # the stats and top-5 consumers read it, so orders is scanned a
    # single time — without this the subtree plans twice
    freq = (
        o.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 6).alias("mean_n"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
    )
    top = freq.orderBy(F.col("n").desc(), "key").limit(5)
    w = Window.orderBy(F.col("n").desc(), "key")
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("hot_rank", F.row_number().over(w).cast("bigint"))
        .select(
            "n_keys",
            "n_rows",
            "max_n",
            "mean_n",
            "skew_factor",
            F.col("key").alias("hot_key"),
            F.col("n").alias("hot_n"),
            "hot_rank",
        )
        .orderBy("hot_rank")
    )


@query(
    "pareto_concentration",
    """
    WITH per_cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev,
             NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile,
             SUM(rev) OVER () AS total
      FROM per_cust
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(rev), 2) AS revenue,
           ROUND(SUM(rev) / MAX(total), 6) AS rev_share,
           ROUND(SUM(SUM(rev) / MAX(total))
                 OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS cum_share
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
)
def pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/Lorenz) report: customers ranked
    into spend deciles, each decile's revenue share and the cumulative
    share — the 'do 20% of customers drive 80% of revenue' question
    every BI deck asks, and the skew diagnosis for account-keyed
    partitioning (a cum_share knee near decile 1 predicts hot keys).

    Per-customer rollup is the only row-proportional pass; NTILE and
    the Lorenz cumulative run over the rolled-up per-customer frame,
    and the final cumulative window is over exactly 10 rows. NTILE
    ties are broken by o_custkey so both engines bucket identically.
    At 100 TB the per-customer tier is the reusable aggregate (same
    tier skew_key_report reads); everything after it is negligible."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = per_cust.select(
        "rev",
        F.ntile(10)
        .over(Window.orderBy(F.col("rev").desc(), "o_custkey"))
        .alias("decile"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
    )
    cum = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    share = F.sum("rev") / F.max("total")
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.round(share, 6).alias("rev_share"),
            share.alias("_share"),
        )
        .select(
            "decile",
            "n_custs",
            "revenue",
            "rev_share",
            F.round(F.sum("_share").over(cum), 6).alias("cum_share"),
        )
        .orderBy("decile")
    )


@query(
    "win_drawdown_max",
    """
    WITH hourly AS (
      SELECT user_id, epoch_ns(ts) // 3600000000000 AS hour_idx,
             ROUND(SUM(value), 6) AS v
      FROM events WHERE user_id < 20 GROUP BY user_id, hour_idx
    ), equity AS (
      SELECT user_id, hour_idx,
             SUM(v) OVER (PARTITION BY user_id ORDER BY hour_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS bal
      FROM hourly
    ), dd AS (
      SELECT user_id,
             MAX(bal) OVER (PARTITION BY user_id ORDER BY hour_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - bal AS drawdown
      FROM equity
    )
    SELECT user_id, ROUND(MAX(drawdown), 6) AS max_drawdown
    FROM dd GROUP BY user_id
    ORDER BY user_id
    """,
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per entity: largest drop of a cumulative
    series below its running peak — the risk metric for any
    balance/score/quota series (how far did this account fall from
    its best before recovering?). Three stacked windows (cumulative
    sum, running max, final max) all share ONE user_id partitioning
    and one sort — a single shuffle, the same discipline as
    user_streak_days. Hourly sums are rounded before accumulation so
    both engines stack identical values."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (
        ev.withColumn("hour_idx", ts_bucket(NS_PER_HOUR))
        .groupBy("user_id", "hour_idx")
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    equity = hourly.withColumn("bal", F.sum("v").over(run))
    dd = equity.withColumn(
        "drawdown", F.max("bal").over(run) - F.col("bal")
    )
    return (
        dd.groupBy("user_id")
        .agg(F.round(F.max("drawdown"), 6).alias("max_drawdown"))
        .orderBy("user_id")
    )


@query(
    "agg_benford_digits",
    """
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                        / POW(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT digit, COUNT(*) * 1.0 AS n, SUM(COUNT(*) * 1.0) OVER () AS t
      FROM d GROUP BY digit
    )
    SELECT digit,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(n / t, 6) AS obs_share,
           ROUND(LOG10(1 + 1.0 / digit), 6) AS benford_share,
           ROUND(POW(n / t - LOG10(1 + 1.0 / digit), 2)
                 / LOG10(1 + 1.0 / digit), 6) AS chi2_term
    FROM c
    ORDER BY digit
    """,
)
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the
    fraud/fabrication screen auditors run on any money column
    (organically-grown amounts follow log10(1+1/d); fabricated or
    capped data does not; here the synthetic uniform totals FAIL
    Benford visibly, which is exactly what the report should say
    about synthetic data). One map-side digit extraction (pure log
    arithmetic, no UDF), one 9-group partial-aggregated shuffle, the
    total as a window over 9 rows; emits observed vs expected share
    and the chi-squared contribution per digit."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(10, F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = F.sum("n").over(Window.partitionBy())
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return (
        c.withColumn("t", t)
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("n") / F.col("t"), 6).alias("obs_share"),
            F.round(exp, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n") / F.col("t") - exp, 2) / exp, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "agg_gini_coefficient",
    """
    WITH per_cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
             COUNT(*) OVER () * 1.0 AS n,
             SUM(rev) OVER () AS total
      FROM per_cust
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_custs,
           ROUND(2 * SUM(i * rev) / (MAX(n) * MAX(total))
                 - (MAX(n) + 1) / MAX(n), 6) AS gini
    FROM ranked
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gini COEFFICIENT of customer revenue (0 = perfectly equal,
    →1 = one customer is the business) — the single-number summary of
    pareto_concentration's Lorenz deciles, computed exactly via the
    rank formula G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n. Complements
    agg_entropy_gini, whose 'gini' is the impurity of a categorical
    mix — different statistic, shared name lineage.

    The global rank runs over the rolled-up per-customer frame (the
    only row-proportional pass is the revenue rollup), tie-broken by
    custkey so both engines rank identically; at 100 TB the ranked
    pass is |customers| rows and the same two-tier discipline as
    pareto_concentration holds."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    ranked = per_cust.select(
        "rev",
        F.row_number().over(Window.orderBy("rev", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("double").alias("n"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
    )
    n, total = F.max("n"), F.max("total")
    return ranked.agg(
        n.cast("bigint").alias("n_custs"),
        F.round(
            2 * F.sum(F.col("i") * F.col("rev")) / (n * total) - (n + 1) / n,
            6,
        ).alias("gini"),
    )
