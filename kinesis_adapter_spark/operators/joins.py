"""Join operators (SURVEY.md §2.1-C).

Scale posture per join type:
- equi joins: shuffled hash / sort-merge chosen by Catalyst+AQE; at
  100 TB co-locate via bucketing on the join key where reused.
- dim joins: explicit ``F.broadcast`` on bounded dimensions (region,
  nation, customer at sf — anything < ~1 GB serialized on a real
  cluster) to avoid shuffling the fact table.
- non-equi (theta/as-of): never a naive cartesian — carry an equi
  prefix (the key) so Catalyst plans a hash join, with the range
  predicate as a post-join filter; the pure-range case uses the
  union+window as-of technique (single shuffle, no O(n·m) blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import NS_PER_DAY, load, ts_us_trunc
from kinesis_adapter_spark.plans.registry import query


@query(
    "join_inner",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer with a pushed dim filter."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with an ON-clause (not WHERE) filter on the right
    side — preserves unmatched customers with NULL order columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_right",
    """
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: every nation survives even with no suppliers."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_full",
    """
    WITH a AS (SELECT o_custkey, COUNT(*) AS n_small FROM orders
               WHERE o_totalprice < 50000 GROUP BY o_custkey),
         b AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
               WHERE o_totalprice > 450000 GROUP BY o_custkey)
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, a.n_small, b.n_big
    FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two disjoint-ish aggregates with NULL fill."""
    o = load(spark, sf_dir, "orders")
    # Distinct aliases avoid the ambiguous-self-join trap (both sides
    # derive from the same scan, so o_custkey would share an expr id).
    a = (
        o.filter(F.col("o_totalprice") < 50000)
        .groupBy(F.col("o_custkey").alias("custkey_a"))
        .agg(F.count(F.lit(1)).alias("n_small"))
    )
    b = (
        o.filter(F.col("o_totalprice") > 450000)
        .groupBy(F.col("o_custkey").alias("custkey_b"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return a.join(b, F.col("custkey_a") == F.col("custkey_b"), "full").select(
        F.coalesce("custkey_a", "custkey_b").alias("custkey"), "n_small", "n_big"
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 480000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter — left-semi join never duplicates the left."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-existence: customers with no large (>400k) order. (The FK
    has no orphans at any sf, so the unfiltered variant is vacuously
    empty — the filter keeps the anti-join result non-trivial.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane on bounded dims (5×25)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_broadcast",
    """
    SELECT n.n_name, COUNT(*) AS n_custs, ROUND(SUM(c.c_acctbal), 2) AS tot_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join: the 25-row nation dim ships to every
    executor; the customer side never shuffles for the join (only the
    25-key aggregate shuffles). This is THE pattern for dim joins at
    100 TB — verify BroadcastHashJoin in explain."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("tot_bal"),
        )
    )


@query(
    "join_multikey",
    """
    SELECT l.l_orderkey, l.l_linenumber, l2.l_quantity AS qty_twin
    FROM lineitem l
    JOIN lineitem l2
      ON l.l_orderkey = l2.l_orderkey AND l.l_linenumber = l2.l_linenumber
    WHERE l.l_returnflag = 'A'
    """,
)
def join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi self-join (orderkey, linenumber)."""
    li = load(spark, sf_dir, "lineitem")
    l2 = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.col("l_quantity").alias("qty_twin"),
    )
    return (
        li.filter(F.col("l_returnflag") == "A")
        .join(l2, (F.col("l_orderkey") == F.col("k1")) & (F.col("l_linenumber") == F.col("k2")))
        .select("l_orderkey", "l_linenumber", "qty_twin")
    )


@query(
    "join_theta_range",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range predicate riding on an equi key: Catalyst plans
    the equi part as a hash join and applies the range as a residual
    filter — no nested-loop blowup at scale (SURVEY.md §4.2)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return li.join(o, cond).select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


@query(
    "join_range_bucketed",
    """
    WITH p AS (SELECT event_id, epoch_ns(ts) AS t FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT epoch_ns(ts) AS t FROM events
               WHERE event_type = 'click')
    SELECT p.event_id, COUNT(*) AS n_clicks_24h
    FROM p JOIN c
      ON c.t BETWEEN p.t - 86400000000000 AND p.t
    GROUP BY p.event_id
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key): for every purchase, the count of
    ALL clicks (any user) in the preceding 24 h — the global-context
    feature ("site-wide activity before this conversion") that has no
    join key at all. Naively a BroadcastNestedLoopJoin —
    O(|purchases|·|clicks|), dead at scale. The bucketed rewrite makes
    it an EQUI join: each purchase explodes into its two candidate day
    buckets (interval ≤ bucket width ⇒ exactly 2), clicks carry their
    day bucket, the join runs hash/SMJ on the bucket key, and the
    exact range predicate applies as a residual filter. Cost is
    corpus-linear + true-match-linear at any scale; DuckDB's native
    IEJoin range optimizer is the oracle.

    (r6: the original formulation ranged events against ORDERS, whose
    date domain — 1995-2001 vs events' 2024 — never overlaps, so the
    key had been vacuously green since r2; a zero-row oracle sweep
    caught it. Both sides now live in the events time domain and the
    result is non-empty at every sf.)"""
    day_ns = 86_400_000_000_000
    # integer `div` — double division loses exactness above 2^53 (ns
    # epochs are ~1.7e18) and a mis-floored bucket drops true matches
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("ts").alias("p_ns"),
        F.expr(f"ts div {day_ns}").alias("d"),
    )
    p2 = p.select(
        "event_id", "p_ns", F.explode(F.array(F.col("d") - 1, F.col("d"))).alias("b")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ns"), F.expr(f"ts div {day_ns}").alias("b")
    )
    return (
        p2.join(c, "b")
        .filter(
            (F.col("c_ns") >= F.col("p_ns") - day_ns)
            & (F.col("c_ns") <= F.col("p_ns"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_24h"))
    )


@query(
    "join_asof",
    """
    WITH ev AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events
    ), ord AS (
      SELECT o_custkey, epoch_ns(o_orderdate) AS ots, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (
        PARTITION BY o_custkey, epoch_ns(o_orderdate) ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
    FROM ev e
    ASOF LEFT JOIN ord o
      ON e.user_id = o.o_custkey AND e.ts >= o.ots
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, that user's latest order at/before
    the event time (DuckDB native ASOF JOIN is the oracle).

    Spark lacks ASOF; rather than an O(n·m) range join we use the
    union+window technique: tag both sides, sort by (key, time, side),
    and carry the latest order forward with last(..., ignorenulls) over
    an unbounded-preceding window. One shuffle on the key, sort within
    partitions — linear at 100 TB, skew handled by AQE.

    Orders are pre-deduped to one per (custkey, ts) — max orderkey —
    because ASOF tie-breaking among equal timestamps is otherwise
    engine-defined.
    """
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    w_dedup = Window.partitionBy("o_custkey", "ots").orderBy(F.col("o_orderkey").desc())
    ords = (
        o.select(
            F.col("o_custkey").alias("key"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias("ots"),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w_dedup.partitionBy("key", "ots")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    ord_side = ords.select(
        "key",
        F.col("ots").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("ts"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    ev_side = ev.withColumn("ts", ts_us_trunc()).select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("last_orderkey"),
        F.lit(None).cast("double").alias("last_totalprice"),
    )
    # Orders sort before events at equal t (is_event asc) => "at/before".
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ord_side.unionByName(ev_side).select(
        "event_id",
        F.col("key").alias("user_id"),
        "ts",
        "is_event",
        F.last("last_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("last_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return merged.filter(F.col("is_event") == 1).drop("is_event")


_ASOF_TOL_NS = 30 * NS_PER_DAY  # 30 days


@query(
    "join_asof_tolerance",
    f"""
    WITH ev AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events
    ), ord AS (
      SELECT o_custkey, epoch_ns(o_orderdate) AS ots, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (
        PARTITION BY o_custkey, epoch_ns(o_orderdate) ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN e.ts - o.ots <= {_ASOF_TOL_NS}
                THEN o.o_orderkey END AS last_orderkey,
           CASE WHEN e.ts - o.ots <= {_ASOF_TOL_NS}
                THEN o.o_totalprice END AS last_totalprice
    FROM ev e
    ASOF LEFT JOIN ord o
      ON e.user_id = o.o_custkey AND e.ts >= o.ots
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: the latest order at/before
    each event, but only if it is ≤ 30 days old — older matches
    become NULL (a stale quote/price/state is as bad as none; every
    pandas merge_asof user knows this as ``tolerance``).

    Same union+window technique as join_asof with one refinement: the
    match's (time, key, price) ride together in ONE struct carried by
    ``last(ignorenulls)``, so the tolerance test against the matched
    ots needs no extra window pass. DuckDB's ASOF JOIN has no
    tolerance argument — the oracle post-filters on the matched ots,
    which is semantically identical."""
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    w_dedup = Window.partitionBy("key", "ots").orderBy(F.col("o_orderkey").desc())
    ords = (
        o.select(
            F.col("o_custkey").alias("key"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias(
                "ots"
            ),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    match_t = F.struct(
        F.col("ots").alias("mts"),
        F.col("o_orderkey").alias("mkey"),
        F.col("o_totalprice").alias("mprice"),
    )
    ord_side = ords.select(
        "key",
        F.col("ots").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("ts"),
        match_t.alias("m"),
    )
    ev_side = ev.withColumn("ts", ts_us_trunc()).select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None)
        .cast("struct<mts:long,mkey:long,mprice:double>")
        .alias("m"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ord_side.unionByName(ev_side).withColumn(
        "lm", F.last("m", ignorenulls=True).over(w)
    )
    fresh = F.col("ts") - F.col("lm.mts") <= F.lit(_ASOF_TOL_NS)
    return (
        merged.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            "ts",
            F.when(fresh, F.col("lm.mkey")).alias("last_orderkey"),
            F.when(fresh, F.col("lm.mprice")).alias("last_totalprice"),
        )
    )


@query(
    "join_asof_forward",
    """
    WITH ev AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events
    ), ord AS (
      SELECT o_custkey, epoch_ns(o_orderdate) AS ots, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (
        PARTITION BY o_custkey, epoch_ns(o_orderdate) ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS next_orderkey, o.o_totalprice AS next_totalprice
    FROM ev e
    ASOF LEFT JOIN ord o
      ON e.user_id = o.o_custkey AND e.ts <= o.ots
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each event, that user's EARLIEST order
    at/after the event time — the look-ahead direction (time-to-next-
    conversion, next scheduled maintenance, label-after-feature joins
    in training-data assembly, where looking backward would leak).

    Mirror of join_asof's union+window technique with the window
    reversed: sort by (key, t, is_event DESC) so an order at the same
    instant as an event is visible to it, then carry the nearest order
    BACKWARD with first(ignorenulls) over [current row, unbounded
    following]. Still ONE shuffle on the key — the direction flip is
    free, where a range-join formulation would pay the same O(n·m)
    blowup in either direction."""
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    w_dedup = Window.partitionBy("key", "ots").orderBy(F.col("o_orderkey").desc())
    ords = (
        o.select(
            F.col("o_custkey").alias("key"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias(
                "ots"
            ),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    ord_side = ords.select(
        "key",
        F.col("ots").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("ts"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )
    ev_side = ev.withColumn("ts", ts_us_trunc()).select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("next_orderkey"),
        F.lit(None).cast("double").alias("next_totalprice"),
    )
    # Events sort before orders at equal t (is_event desc) => "at/after".
    w = (
        Window.partitionBy("key")
        .orderBy("t", F.col("is_event").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = ord_side.unionByName(ev_side).select(
        "event_id",
        F.col("key").alias("user_id"),
        "ts",
        "is_event",
        F.first("next_orderkey", ignorenulls=True).over(w).alias("next_orderkey"),
        F.first("next_totalprice", ignorenulls=True).over(w).alias("next_totalprice"),
    )
    return merged.filter(F.col("is_event") == 1).drop("is_event")


@query(
    "join_null_safe",
    """
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderstatus END AS k
      FROM orders WHERE o_orderkey < 500
    ),
    b AS (
      SELECT CASE WHEN s_suppkey % 4 = 0 THEN NULL ELSE 'O' END AS k,
             s_suppkey
      FROM supplier
    )
    SELECT a.o_orderkey, b.s_suppkey, COALESCE(a.k, '<null>') AS k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantic
    corner that separates "join on dirty keys" from "lose every row a
    cleaning step nulled". Spark plans eqNullSafe as a hash join on
    the null-safe key (knownfloatingpointnormalized coalesce trick),
    so it scales like any equi join; the ordinary `=` join would
    discard both sides' NULL rows and no row count would warn you."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("ka"),
    )
    s = load(spark, sf_dir, "supplier")
    b = s.select(
        F.when(F.col("s_suppkey") % 4 == 0, None).otherwise(F.lit("O")).alias("kb"),
        "s_suppkey",
    )
    return (
        a.join(b, a.ka.eqNullSafe(b.kb))
        .select(
            "o_orderkey", "s_suppkey", F.coalesce(F.col("ka"), F.lit("<null>")).alias("k")
        )
    )


@query(
    "join_bloom_runtime_filter",
    """
    SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-filter join — DPP's sibling for non-partition
    keys. When the dim side is too big to broadcast but carries a
    selective predicate, Spark's InjectRuntimeFilter builds a bloom
    filter over the dim join keys and pushes ``might_contain(...,
    xxhash64(key))`` beneath the fact side's shuffle: fact rows that
    cannot match are dropped BEFORE the shuffle write, cutting the
    exchanged bytes by roughly the dim predicate's selectivity. False
    positives only cost wasted shuffle; the join stays exact — which
    is why the plain-join oracle hash-matches.

    The injection thresholds are sized for real clusters (dim ≤
    creationSideThreshold, fact scan ≥ applicationSideScanSizeThreshold
    = 10 GB), so at fixture scale they are temporarily rescaled and the
    optimized plan is pinned EAGERLY (QueryExecution phases are
    memoized per Dataset) before the session confs are restored — the
    returned DataFrame keeps the bloom-filtered plan; the session
    keeps its defaults. At 100 TB the defaults fire on their own —
    this key exists so the plan shape is demonstrated and pinned
    (tests/test_plans.py) rather than taken on faith."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .orderBy("l_returnflag")
        )
        # Materialize the memoized optimization phases NOW, while the
        # injection thresholds are in effect.
        out._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@query(
    "join_interval_overlap",
    """
    WITH ordered AS (
      SELECT user_id, epoch_ns(ts) AS ts, event_id,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events WHERE user_id < 30
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > 14400000000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    iv AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, a.s_start AS start_a,
           b.user_id AS user_b, b.s_start AS start_b,
           least(a.s_end, b.s_end) - greatest(a.s_start, b.s_start) AS overlap_ns
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    ORDER BY user_a, start_a, user_b, start_b
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE–RANGE join: which users' activity sessions overlap in
    time (concurrency analysis — co-presence, contention, capacity).
    The overlap predicate (a.start ≤ b.end AND b.start ≤ a.end) has NO
    equi component, so a naive formulation is a nested-loop O(n²) —
    dead at scale. The bucketed rewrite: each session explodes into
    the hour buckets it covers (session spans are gap-bounded, so the
    fan-out is small and data-independent of corpus size), candidate
    pairs come from an EQUI join on the bucket, and the exact overlap
    predicate verifies candidates; a pair sharing several buckets
    collapses via distinct on the output key. Same
    blocking-join-verify discipline as every near-dup operator —
    range-range is just "near-dup in time". DuckDB's native IEJoin
    plans the quadratic form directly and is the oracle. Sessions are
    4 h-gap sessionization (sessionize_gap's pattern, event_id
    tiebreak) over a bounded user cohort."""
    hour_ns = 3_600_000_000_000
    gap_ns = 4 * hour_ns
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .withColumn("ts_us", ts_us_trunc())
    )
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts_us").over(w_order)
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        ev.select(
            "user_id",
            "ts_us",
            F.sum(
                F.when(
                    prev_ts.isNull() | ((F.col("ts_us") - prev_ts) > gap_ns), 1
                ).otherwise(0)
            )
            .over(w_cum)
            .alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end"))
    )
    a = iv.select(
        F.col("user_id").alias("user_a"),
        F.col("s_start").alias("start_a"),
        F.col("s_end").alias("end_a"),
        F.explode(
            F.sequence(
                F.expr(f"s_start div {hour_ns}"), F.expr(f"s_end div {hour_ns}")
            )
        ).alias("bucket"),
    )
    b = iv.select(
        F.col("user_id").alias("user_b"),
        F.col("s_start").alias("start_b"),
        F.col("s_end").alias("end_b"),
        F.explode(
            F.sequence(
                F.expr(f"s_start div {hour_ns}"), F.expr(f"s_end div {hour_ns}")
            )
        ).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("start_a") <= F.col("end_b"))
            & (F.col("start_b") <= F.col("end_a"))
        )
        .select(
            "user_a",
            "start_a",
            "user_b",
            "start_b",
            (
                F.least("end_a", "end_b") - F.greatest("start_a", "start_b")
            ).alias("overlap_ns"),
        )
        .distinct()
        .orderBy("user_a", "start_a", "user_b", "start_b")
    )


@query(
    "join_lateral_topn",
    """
    SELECT c.c_custkey, c.c_name, top.o_orderkey, top.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) top
    WHERE c.c_custkey <= 200
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 surface, Spark 4 native):
    top-2 orders per customer expressed as the per-row subquery users
    actually write. Catalyst DECORRELATES it into the same
    join + partitioned-window plan topk_per_group builds by hand — the
    key pins that a correlated formulation does not regress into a
    per-row re-execution (which at 100 TB would be |customers| scans).
    Identical SQL runs on DuckDB as the oracle."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, top.o_orderkey, top.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) top
        WHERE c.c_custkey <= 200
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "join_spatial_grid",
    """
    WITH pts AS (
      SELECT event_id,
             ((event_id * 7919) % 16000) / 1000.0 - 8.0 AS x,
             ((event_id * 104729) % 16000) / 1000.0 - 8.0 AS y
      FROM events
    ),
    a AS (SELECT * FROM pts WHERE event_id % 10 = 0),
    b AS (SELECT * FROM pts WHERE event_id % 10 = 5)
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           ROUND((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), 9) AS dist2
    FROM a JOIN b
      ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 0.0025
    ORDER BY id_a, id_b
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL radius join by grid-cell blocking — the planar sibling
    of join_range_bucketed's temporal bucketing: each left point
    explodes into its 3×3 neighborhood of 0.05-unit grid cells, the
    right side carries its own cell, the join runs as an EQUI join on
    the cell key, and the exact distance predicate filters residually.
    Cell width = radius guarantees recall (any pair within r sits in
    adjacent cells), so the naive O(|A|·|B|) cross-distance never
    exists — candidates are bounded by local density × 9 cells, the
    same contract a geohash/H3/S2 bucketing gives at planet scale.
    Coordinates derive deterministically from event ids via PRIME
    multipliers (a small multiplier sharing factors with the id stride
    collapsed the points onto a 2-unit lattice and made the result
    vacuously empty — caught by the non-empty plan test); Euclidean
    distance on identically-derived doubles keeps both engines
    bit-agreeing at the radius boundary (no trig)."""
    pts = load(spark, sf_dir, "events").select(
        "event_id",
        (((F.col("event_id") * 7919) % 16000) / 1000.0 - 8.0).alias("x"),
        (((F.col("event_id") * 104729) % 16000) / 1000.0 - 8.0).alias("y"),
    )
    return grid_radius_pairs(
        pts.filter(F.col("event_id") % 10 == 0),
        pts.filter(F.col("event_id") % 10 == 5),
    )


def grid_radius_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """The grid-blocked radius-join topology itself, over two point
    frames ``(event_id, x, y)`` — extracted so the scale smoke can
    drive the SAME executed code with area-growth fixtures (constant
    density, r6 directive #3) instead of the registry fixture whose
    uniform-density replication squares the true pair count."""
    cell = 0.05
    gx = F.floor(F.col("x") / cell).cast("long")
    gy = F.floor(F.col("y") / cell).cast("long")
    a9 = (
        a.withColumn("gx0", gx)
        .withColumn("gy0", gy)
        .withColumn("dgx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dgy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("event_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("gx0") + F.col("dgx")).alias("cgx"),
            (F.col("gy0") + F.col("dgy")).alias("cgy"),
        )
    )
    b1 = b.select(
        F.col("event_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        gx.alias("cgx"),
        gy.alias("cgy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    # no distinct: b carries exactly ONE cell, so each (a, b) pair can
    # meet in at most one cell — a distinct here would add a full
    # extra shuffle for nothing (r6 review finding)
    # LITERAL radius² — cell * cell computes 0.0025000000000000005 (one
    # ulp above the oracle's 0.0025 literal), a boundary-parity trap if
    # the fixture ever produces a d2 in that gap (r6 review finding)
    return (
        a9.join(b1, ["cgx", "cgy"])
        .filter(d2 <= 0.0025)
        .select("id_a", "id_b", F.round(d2, 9).alias("dist2"))
        .orderBy("id_a", "id_b")
    )


@query(
    "join_last_k_before",
    """
    WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
               WHERE event_type = 'click'),
    ranked AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.t DESC, c.event_id DESC) AS rk
      FROM p JOIN c
        ON p.user_id = c.user_id AND c.t < p.t
    )
    SELECT purchase_id, click_id, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY purchase_id, rk
    """,
)
def join_last_k_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-k-events-before join: for every purchase, that user's 3
    most recent PRIOR clicks, ranked — the "last k interactions before
    conversion" feature row attribution and sequence models consume;
    the top-k generalization of join_asof (k=1).

    Plan: equi join on user_id gives each purchase its candidate
    click set (bounded per user), then rank/filter per purchase — the
    key-partitioned candidate join never degenerates to a cross
    product, and at 100 TB the same query runs per user shard with
    AQE splitting skewed users. A per-event window over the union
    stream (the asof technique) cannot carry a top-K directly —
    last(ignorenulls) carries one value — so the candidate join + rank
    is the honest formulation."""
    ev = load(spark, sf_dir, "events").withColumn("t", ts_us_trunc())
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("t").alias("pt"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("t").alias("ct"),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("ct").desc(), F.col("click_id").desc()
    )
    return (
        p.join(c, "u")
        .filter(F.col("ct") < F.col("pt"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("purchase_id", "click_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("purchase_id", "rk")
    )
