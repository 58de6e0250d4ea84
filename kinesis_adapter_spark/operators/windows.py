"""Window-function operators (SURVEY.md §2.1-E).

Determinism rule (§5.4): every ORDER BY inside a window carries a
unique tiebreak column (event_id / o_orderkey), otherwise row_number
and frame contents are nondeterministic and the oracle hash flakes.

Scale: a window = one shuffle on the partition key + a sort within
partitions. Skewed partition keys (one user with 10⁹ events) are the
failure mode at 100 TB — mitigations: pre-aggregate before the window
where semantics allow, or salt + two-phase for associative frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load, ts_us_trunc
from kinesis_adapter_spark.plans.registry import query


@query(
    "win_rank_topn",
    """
    SELECT user_id, event_id, value, rnk, drnk
    FROM (
      SELECT user_id, event_id, value,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    )
    WHERE rnk <= 3
    """,
)
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per user; keep top-3 by value."""
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "value",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "win_lag_lead",
    """
    SELECT event_id, user_id, epoch_ns(ts) AS ts,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           epoch_ns(ts) - lag(epoch_ns(ts)) OVER w AS ns_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value and ns gap per user.

    ``ts`` is int64 ns, but DuckDB 1.0 reads parquet NANOS as a
    µs-precision TIMESTAMP (verified — sub-µs digits are truncated), so
    all oracled ts values/diffs are µs-truncated on the Spark side to
    match what the oracle can see."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", ts_us_trunc()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("ts"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("ns_since_prev"),
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order dates."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 4).alias("cum_spend"),
        )
    )


@query(
    "win_moving_avg",
    """
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("ma3"))
    )


@query(
    "win_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
           ROUND(SUM(o_totalprice) OVER w, 4) AS spend_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: orders within the trailing 30 days (epoch
    seconds; 2 592 000 s = 30 d). RANGE frames need no tiebreak — equal
    order keys share one frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_orders_30d"),
            F.round(F.sum("o_totalprice").over(w), 4).alias("spend_30d"),
        )
    )


@query(
    "win_ntile_cume",
    """
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist()    OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + percent_rank + cume_dist over a global total order.

    A single unpartitioned window serializes onto one task — acceptable
    for ranked reports; at 100 TB compute global quantiles with
    percentile_approx instead and join the cutpoints back."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
        )
    )


@query(
    "win_first_last",
    """
    SELECT user_id, event_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value with the frame made EXPLICIT (the default
    frame for last_value is ...AND CURRENT ROW — a classic trap)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.nth_value("value", 2).over(w).alias("second_val"),
        )
    )


SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, epoch_ns(ts) AS ts, event_id, value,
         CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000000 OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*)            AS n_events,
       MIN(ts)             AS session_start,
       MAX(ts)             AS session_end,
       ROUND(SUM(value),4) AS session_value
FROM sess
GROUP BY user_id, session_id
"""


@query("sessionize_gap", SESSIONIZE_ORACLE)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >30 min gap
    (1.8e12 ns). Batch twin of the streaming session_window op — the
    two must agree on static data (tested in tests/test_streaming.py).

    Pattern: lag → gap flag → running sum → session id → aggregate.
    Two window passes + one aggregate, all on the same user_id
    partitioning, so Catalyst reuses a single shuffle."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", ts_us_trunc()  # µs-truncated: what DuckDB sees
    )
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = 30 * 60 * 1_000_000_000
    prev_ts = F.lag("ts_us").over(w_order)
    flagged = ev.select(
        "user_id",
        F.col("ts_us").alias("ts"),
        "event_id",
        "value",
        F.when(prev_ts.isNull() | ((F.col("ts_us") - prev_ts) > gap_ns), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    # event_id tiebreak: duplicate (user_id, ts) pairs straddling a gap
    # boundary must land in the same session on both engines (ADVICE r01).
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "ts", "value", F.sum("is_new").over(w_cum).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "win_pct_change",
    """
    WITH monthly AS (
      SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders
      GROUP BY o_orderpriority, month
    )
    SELECT o_orderpriority, month, revenue,
           ROUND(
             (revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 6
           ) AS pct_change
    FROM monthly
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
    ORDER BY o_orderpriority, month
    """,
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period change — the reporting staple (MoM revenue
    movement per priority class). Two-tier shape: aggregate raw rows
    to the (priority, month) grid first (partial-agg shuffle), then
    lag/divide over the TINY grid — the window shuffle moves
    |priorities × months| rows, never raw orders. The ratio divides
    the ROUNDED monthly sums so both engines divide bit-identical
    operands (sum order across partitions is engine-dependent at the
    1e-9 level; rounding first makes the quotient deterministic)."""
    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.withColumn(
            "pct_change", F.round((F.col("revenue") - prev) / prev, 6)
        )
        .orderBy("o_orderpriority", "month")
    )


@query(
    "win_moving_median",
    """
    SELECT event_id, user_id,
           ROUND(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS median5
    FROM events
    ORDER BY user_id, event_id
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over the trailing 5 events per user — the robust
    smoother ops dashboards use where a moving AVERAGE would chase one
    outlier. Exact continuous-interpolation median via the aggregate
    ``percentile`` evaluated over a bounded ROWS frame (matches
    DuckDB's quantile_cont): the frame holds ≤5 values, so per-row cost
    is constant and the whole thing is ONE shuffle on user_id like
    every other window key. At 100 TB the same caveat as all user-
    partitioned windows applies: a whale user serializes one partition
    — mitigate by time-slicing the partition key (windows.py module
    docstring)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("median5"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_rolling_corr",
    """
    WITH lagged AS (
      SELECT user_id, event_id, epoch_ns(ts) AS t, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events
      WHERE value IS NOT NULL AND user_id < 20
    )
    SELECT user_id, event_id,
           ROUND(corr(value, prev_value) OVER (
             PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS roll_corr
    FROM lagged
    ORDER BY user_id, event_id
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lag-1 autocorrelation as a WINDOWED aggregate: corr of
    (value, previous value) over each user's trailing 20 events — the
    online momentum/mean-reversion feature, distinct from
    ts_autocorr_lag1's single whole-series number: this one emits a
    drifting per-row signal a feature store would join back.

    Both the lag and the corr frame ride ONE (user_id, time) shuffle
    + sort; corr is an algebraic aggregate, so the 20-row frame
    updates in O(1) per row. Rows where the frame holds <2 defined
    pairs yield NULL identically on both engines."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("user_id") < 20))
        .withColumn("t", ts_us_trunc())
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lagged = ev.withColumn("prev_value", F.lag("value").over(w))
    frame = w.rowsBetween(-19, Window.currentRow)
    return (
        lagged.select(
            "user_id",
            "event_id",
            F.round(F.corr("value", "prev_value").over(frame), 6).alias(
                "roll_corr"
            ),
        )
        .orderBy("user_id", "event_id")
    )
