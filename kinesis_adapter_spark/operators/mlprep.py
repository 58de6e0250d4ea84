"""ML-preparation operators: deterministic sampling/splits, gap-filled
resampling, and quantile feature binning.

Sampling and splitting use MD5-HEX THRESHOLDING, not rand(): bucket a
row by a hex prefix of md5(key) and compare lexicographically. The
assignment is then a pure function of the key — reproducible across
runs, engines (md5 is md5 everywhere — the DuckDB oracles hash-match
exactly), partitionings, and retries; rand(seed) is none of those
under Spark's task-retry semantics. This is how production pipelines
pin their train/val/test membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load, ts_timestamp
from kinesis_adapter_spark.plans.registry import query

# Per-language keep thresholds on the first md5 hex byte: 'en' is
# downsampled to ~20% ('33' = 51/256), the rest kept at ~50% ('80').
# Rebalancing a skewed-language corpus is the canonical use.
_STRAT_RATES = {"en": "33", "de": "80", "es": "80", "fr": "80", "zh": "80"}

_STRAT_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in _STRAT_RATES.items()
) + " ELSE '80' END"


@query(
    "sample_stratified_hash",
    f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < ({_STRAT_CASE})
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language rates, assignment by
    md5-prefix threshold. The filter is a deterministic row-local
    predicate — no shuffle, no state, survives retries and engine
    swaps bit-for-bit (unlike sampleBy/rand). At 100 TB the predicate
    composes with scan pushdown on lang: pruning happens before the
    hash is even computed for excluded partitions."""
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = F.expr(_STRAT_CASE)
    return (
        d.filter(bucket < thresh)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("lang")
    )


NEYMAN_BUDGET = 1000  # total sample budget allocated across strata


@query(
    "sample_neyman_allocation",
    f"""
    WITH v AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v100,
             md5('ney-' || CAST(event_id AS VARCHAR)) AS hk,
             event_id
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(v100) AS BIGINT) AS s1,
             CAST(SUM(v100 * v100) AS BIGINT) AS s2
      FROM v GROUP BY event_type
    ),
    sd AS (
      SELECT event_type, n_pop,
             sqrt((CAST(n_pop AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                  / (CAST(n_pop AS DOUBLE) * (n_pop - 1)) / 10000.0) AS s_h
      FROM stats WHERE n_pop > 1
    ),
    tot AS (
      SELECT SUM(CAST(ROUND(ROUND(n_pop * s_h, 6) * 1000000, 0) AS BIGINT))
             AS w6
      FROM sd
    ),
    alloc AS (
      SELECT sd.event_type, sd.n_pop, sd.s_h,
             CAST(ROUND({NEYMAN_BUDGET}
                        * (ROUND(sd.n_pop * sd.s_h, 6) * 1000000)
                        / tot.w6, 0)
                  AS BIGINT) AS n_alloc
      FROM sd, tot
    ),
    ranked AS (
      SELECT event_type, v100,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hk, event_id) AS rk
      FROM v
    ),
    kept AS (
      SELECT r.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(r.v100) AS BIGINT) AS k1
      FROM ranked r JOIN alloc a ON a.event_type = r.event_type
      WHERE r.rk <= a.n_alloc
      GROUP BY r.event_type
    )
    SELECT a.event_type, a.n_pop, ROUND(a.s_h, 6) AS s_h, a.n_alloc,
           k.n_kept,
           ROUND(CAST(k.k1 AS DOUBLE) / k.n_kept / 100.0, 6) AS mean_kept
    FROM alloc a JOIN kept k ON k.event_type = a.event_type
    ORDER BY a.event_type
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal (Neyman) stratified sampling: allocate a fixed
    budget across strata proportionally to N_h·S_h (stratum size ×
    stratum standard deviation), then draw each stratum's exact-count
    sample by deterministic md5 rank — the allocation a survey/eval
    pipeline computes before sampling a 100 TB corpus, where a
    high-variance minority stratum deserves more of the budget than
    proportional sampling gives it. sample_stratified_hash is the
    fixed-rate cousin; this key derives the rates FROM the data.

    Output per stratum: population size, S_h, the Neyman allocation,
    the realized kept count, and the kept-sample mean — the table the
    sampling job publishes for its audit.

    Determinism (the agg_stddev_var problem done differently): values
    are exactly 2-dp, so variance comes from INTEGER power sums
    (n·Σx² - (Σx)²) of v100 = value·100 — both engines sum identical
    integers, divide in the same order, and take one correctly-rounded
    sqrt, so S_h is bit-identical with no float-sum-order exposure.
    The cross-stratum weight total is summed in 6-dp integer
    micro-units (order-independent) — and the ORACLE shares that
    compressed-domain formula verbatim (same ROUND→micro-unit→BIGINT
    chain on both the w6 total and the allocation numerator), so the
    two engines cannot drift by the ~1e-6 a raw-float SUM would admit
    near a .5 rounding boundary of n_alloc. The draw is the
    md5-threshold discipline with a per-stratum
    row_number for EXACT counts.

    Scale bound: the r12 32× smoke caught n_pop·s2 overflowing bigint
    (Spark 4 ANSI raises ARITHMETIC_OVERFLOW; DuckDB raises too), so
    the variance NUMERATOR is now computed in DOUBLE on both engines —
    CAST(n_pop AS DOUBLE)·s2 − CAST(s1 AS DOUBLE)·s1 — which stays
    deterministic (both engines run identical IEEE ops on the identical
    exact-integer power sums; relative error ~1e-16 is far below the
    6-dp grid s_h publishes at) and is overflow-free to 1e308. The
    remaining exact-integer term is s2's own SUM(v100²): bigint-exact
    to ~3.8×10⁹ rows per stratum at |v100| ≤ 10⁵; past that, center
    values per stratum before squaring or lift that one SUM to
    DECIMAL(38,0) on both engines. Shape: one partial-agg pass for the
    power sums, a broadcast of the |strata|-row allocation table, one
    stratum-partitioned window for the ranked draw — at 100 TB swap
    the exact-count window for the rate threshold n_h/N_h
    (sample_stratified_hash's shuffle-free predicate) when exactness
    isn't required."""
    v = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v100"),
        F.md5(F.concat(F.lit("ney-"), F.col("event_id").cast("string"))).alias(
            "hk"
        ),
        "event_id",
    )
    stats = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("v100").cast("bigint").alias("s1"),
        F.sum(F.col("v100") * F.col("v100")).cast("bigint").alias("s2"),
    )
    sd = stats.filter(F.col("n_pop") > 1).select(
        "event_type",
        "n_pop",
        F.sqrt(
            (
                F.col("n_pop").cast("double") * F.col("s2")
                - F.col("s1").cast("double") * F.col("s1")
            )
            / (F.col("n_pop").cast("double") * (F.col("n_pop") - 1))
            / 10000.0
        ).alias("s_h"),
    )
    # per-stratum weights compressed to 6-dp micro-units BEFORE the
    # cross-stratum sum: an integer SUM is order-independent, where a
    # double SUM over shuffle output is not (the eval_auc_roc
    # compressed-domain discipline applied to a 5-row reduce)
    term6 = F.expr(
        "CAST(ROUND(ROUND(n_pop * s_h, 6) * 1000000, 0) AS BIGINT)"
    )
    tot = sd.agg(F.sum(term6).alias("w6"))
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_pop",
        "s_h",
        F.round(
            NEYMAN_BUDGET
            * (F.round(F.col("n_pop") * F.col("s_h"), 6) * 1000000)
            / F.col("w6"),
            0,
        )
        .cast("bigint")
        .alias("n_alloc"),
    )
    w = Window.partitionBy("event_type").orderBy("hk", "event_id")
    ranked = v.withColumn("rk", F.row_number().over(w))
    kept = (
        ranked.join(F.broadcast(alloc.select("event_type", "n_alloc")), "event_type")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("v100").cast("bigint").alias("k1"),
        )
    )
    return (
        alloc.join(kept, "event_type")
        .select(
            "event_type",
            "n_pop",
            F.round("s_h", 6).alias("s_h"),
            "n_alloc",
            "n_kept",
            F.round(
                F.col("k1").cast("double") / F.col("n_kept") / 100.0, 6
            ).alias("mean_kept"),
        )
        .orderBy("event_type")
    )


DSIR_KEEP_DIV = 5  # select n_docs // 5 (top 20%) by importance weight


@query(
    "sample_dsir_importance",
    """
    WITH tok AS (
      SELECT doc_id, lang, substr(md5(token), 1, 2) AS f
      FROM (SELECT doc_id, lang, unnest(str_split(lower(text), ' ')) AS token
            FROM documents)
      WHERE token <> ''
    ),
    raw AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY f),
    tgt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ct
            FROM tok WHERE lang = 'en' GROUP BY f),
    feats AS (
      SELECT r.f, r.cr, COALESCE(t.ct, 0) AS ct
      FROM raw r LEFT JOIN tgt t USING (f)
    ),
    tots AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr,
                    CAST(SUM(ct) AS BIGINT) AS tt FROM feats),
    lr AS (
      SELECT f,
             CAST(ROUND(ROUND(ln((ct + 1.0) / (tt + 256.0))
                              - ln((cr + 1.0) / (tr + 256.0)), 6)
                        * 1000000, 0) AS BIGINT) AS lr6
      FROM feats, tots
    ),
    wdoc AS (
      SELECT t.doc_id, t.lang, CAST(SUM(l.lr6) AS BIGINT) AS w6
      FROM tok t JOIN lr l USING (f)
      GROUP BY t.doc_id, t.lang
    ),
    nsel AS (SELECT COUNT(*) // 5 AS n_sel FROM wdoc),
    vf AS (
      SELECT w6, CAST(COUNT(*) AS BIGINT) AS c,
             SUM(COUNT(*)) OVER (ORDER BY w6 DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
      FROM wdoc GROUP BY w6
    ),
    thr AS (
      SELECT w6 AS wstar, cum - c AS above, n_sel
      FROM vf, nsel
      WHERE cum >= n_sel AND cum - c < n_sel
    ),
    ranked AS (
      SELECT doc_id, w6,
             row_number() OVER (
               PARTITION BY w6
               ORDER BY md5('dsir-' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM wdoc
    ),
    sel AS (
      SELECT r.doc_id
      FROM ranked r, thr t
      WHERE r.w6 > t.wstar OR (r.w6 = t.wstar AND r.rk <= t.n_sel - t.above)
    )
    SELECT w.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           ROUND(CAST(SUM(w.w6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS mean_w,
           ROUND(CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN w.w6 END)
                      AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN s.doc_id IS NOT NULL
                                   THEN 1 ELSE 0 END), 0)
                 / 1000000.0, 6) AS mean_w_sel
    FROM wdoc w LEFT JOIN sel s USING (doc_id)
    GROUP BY w.lang
    ORDER BY w.lang
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, public
    literature): importance-weight every raw document toward a target
    domain using hashed n-gram features, then keep the top fifth of
    the corpus by weight with an exact-count deterministic draw.
    Target = the 'en' slice (the stand-in for 'looks like my curated
    domain'); features = 256 md5-prefix buckets over unigrams (the
    hashed-feature trick that makes the estimator vocabulary-free);
    per-bucket evidence = the log-likelihood ratio of smoothed bucket
    probabilities under the target vs raw unigram models, and a doc's
    importance is the SUM of its token instances' bucket evidence —
    the paper's bag-of-hashed-ngrams estimator verbatim.

    Determinism (compressed-domain discipline, the neyman/logreg
    pattern): the per-bucket log-ratio is computed once on the
    256-row feature table — both engines run the identical IEEE
    ln/sub on identical integer counts — then 6-dp-rounded and
    compressed to integer micro-units, so every per-doc weight is an
    order-independent INTEGER sum; the selection threshold comes from
    a cumulative count over the DISTINCT-weight frame (bounded by the
    6-dp grid), and the boundary weight class resolves by md5-ranked
    exact-count draw (the sample_neyman_allocation mechanism with the
    weight class as the stratum), so exactly n_docs // 5 documents are
    selected on both engines, bit-identically.

    Scale shape: two count passes fold map-side into 256-row partials;
    the 256-row log-ratio table broadcast-joins back onto the token
    stream (never shuffled); the per-doc weight is one groupBy(doc_id)
    partial-agg pass; the threshold window runs over the distinct-
    weight aggregate (≤ the 6-dp grid, never corpus rows) and the
    boundary rank window is PARTITIONED by weight class. At 100 TB
    swap the exact-count draw for a fixed weight threshold published
    from a sample — the same trade the neyman docstring records.
    Output is the per-lang selection audit (n_docs, n_selected, mean
    importance overall and among the selected) — the table that shows
    the estimator pulling en-like mass forward."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("doc_id", "lang", F.substring(F.md5("token"), 1, 2).alias("f"))
    )
    # r16 (guide §1.2): raw and tgt were two separate corpus tokenize
    # passes joined afterward; one conditional count produces the
    # identical 256-row table (a bucket with no 'en' rows gets ct=0
    # exactly as the old left-join coalesce did — rows proven equal)
    # in a single pass. Exchange count 45 → 33; a persist-based
    # restructure was ALSO tried and measured slower than the lazy
    # recomputes at every scale, so the plan deliberately stays lazy.
    feats = tok.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("ct"),
    )
    tots = feats.agg(
        F.sum("cr").cast("bigint").alias("tr"),
        F.sum("ct").cast("bigint").alias("tt"),
    )
    lr = feats.crossJoin(F.broadcast(tots)).select(
        "f",
        F.expr(
            "CAST(ROUND(ROUND(ln((ct + 1.0) / (tt + 256.0))"
            " - ln((cr + 1.0) / (tr + 256.0)), 6)"
            " * 1000000, 0) AS BIGINT)"
        ).alias("lr6"),
    )
    wdoc = (
        tok.join(F.broadcast(lr), "f")
        .groupBy("doc_id", "lang")
        .agg(F.sum("lr6").cast("bigint").alias("w6"))
    )
    nsel = wdoc.agg(F.expr(f"COUNT(*) DIV {DSIR_KEEP_DIV}").alias("n_sel"))
    vf = wdoc.groupBy("w6").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = Window.orderBy(F.col("w6").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    thr = (
        vf.withColumn("cum", F.sum("c").over(wcum))
        .crossJoin(F.broadcast(nsel))
        .filter(
            (F.col("cum") >= F.col("n_sel"))
            & (F.col("cum") - F.col("c") < F.col("n_sel"))
        )
        .select(
            F.col("w6").alias("wstar"),
            (F.col("cum") - F.col("c")).alias("above"),
            "n_sel",
        )
    )
    wb = Window.partitionBy("w6").orderBy(
        F.md5(F.concat(F.lit("dsir-"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    sel = (
        wdoc.withColumn("rk", F.row_number().over(wb))
        .crossJoin(F.broadcast(thr))
        .filter(
            (F.col("w6") > F.col("wstar"))
            | (
                (F.col("w6") == F.col("wstar"))
                & (F.col("rk") <= F.col("n_sel") - F.col("above"))
            )
        )
        .select("doc_id", F.lit(1).alias("is_sel"))
    )
    return (
        wdoc.join(sel, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("is_sel", F.lit(0)))
            .cast("bigint")
            .alias("n_selected"),
            F.round(
                F.sum("w6").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("mean_w"),
            F.round(
                F.sum(F.when(F.col("is_sel").isNotNull(), F.col("w6"))).cast(
                    "double"
                )
                / F.expr(
                    "NULLIF(SUM(CASE WHEN is_sel IS NOT NULL"
                    " THEN 1 ELSE 0 END), 0)"
                )
                / 1000000.0,
                6,
            ).alias("mean_w_sel"),
        )
        .orderBy("lang")
    )


@query(
    "dataset_split_hash",
    """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
)
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by md5-prefix range
    ('cc' = 204/256 ≈ 79.7%, 'e6' = 230/256 ≈ 89.8%). A document's
    split membership is a pure function of doc_id — new data lands in
    splits without reshuffling old members, and no split manifest
    needs storing. Emitted as split×lang counts to double as a
    balance audit."""
    d = load(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        d.groupBy(split.alias("split"), "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@query(
    "resample_1h_gapfill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             ROUND(AVG(value), 6) AS v
      FROM events WHERE user_id < 5
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    spans AS (
      SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM spans
    )
    SELECT g.user_id, g.hr,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr
    ORDER BY g.user_id, g.hr
    """,
)
def resample_1h_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's events onto a
    dense hourly grid (min..max observed hour) and forward-fill gaps
    with the last observed hourly average.

    The dense grid comes from exploding a per-user timestamp sequence
    (no driver loop, no UDF); the fill is ``last(v, ignorenulls)`` over
    an unbounded-preceding row frame. Grid join and fill window both
    key on user_id → one shuffle total. At 100 TB the grid explode is
    the memory knob: a user spanning years × 1 h cells is fine; going
    to 1 s cells means bounding the span per partition first. Hourly
    averages are rounded BEFORE the fill so both engines propagate
    identical values."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .withColumn("ts_t", ts_timestamp())
    )
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts_t").alias("hr"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hr"], "left")
        .withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .select("user_id", "hr", "v_filled")
        .orderBy("user_id", "hr")
    )


@query(
    "feature_binning_quantile",
    """
    WITH binned AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS bin
      FROM events
    )
    SELECT event_type, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM binned
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def feature_binning_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) feature binning per event type with bin
    edges — the discretization step before categorical encoders or
    histogram-based models. ntile ties are broken by event_id so both
    engines assign identical bins. ntile needs a per-group total
    order (one sort per event_type partition); at 100 TB swap exact
    ntile for approx_percentile edges computed once and a range join
    against them — the approximate twin is agg_approx_percentile."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("bin", F.ntile(10).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


@query(
    "mixture_epoch_plan",
    """
    WITH st AS (
      SELECT source, SUM(len(str_split(text, ' '))) AS toks
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(toks) AS total FROM st)
    SELECT source,
           CAST(toks AS BIGINT) AS src_tokens,
           ROUND(toks / total, 6) AS natural_frac,
           ROUND(LEAST(2.0, 0.25 * total / toks), 4) AS epochs_at_budget
    FROM st, tot
    ORDER BY source
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning: per-source token inventory, natural
    sampling fraction, and the repetition factor (epochs) needed to
    fill a uniform per-source budget of 25% of the corpus — capped at
    2 epochs per the data-constrained scaling recipe (repeating data
    beyond a few epochs stops helping). One aggregation over the
    corpus; the totals row broadcasts. This is the planning query a
    mixture-weighting job runs before sampling."""
    d = load(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks")
    )
    tot = st.agg(F.sum("toks").alias("total"))
    return (
        st.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("toks").alias("src_tokens"),
            F.round(F.col("toks") / F.col("total"), 6).alias("natural_frac"),
            F.round(
                F.least(F.lit(2.0), 0.25 * F.col("total") / F.col("toks")), 4
            ).alias("epochs_at_budget"),
        )
        .orderBy("source")
    )


# Uniform-in-(0,1) from the first 6 md5 hex chars, built from pure
# string/arithmetic primitives that behave identically in Spark SQL
# and DuckDB (instr/substr/md5), generated ONCE and shared verbatim by
# both engines (same technique as scaleops._ZKEY_SQL).
_HEXU_SQL = (
    "(("
    + " + ".join(
        f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    )
    + ") + 0.5) / 16777216.0"
)


@query(
    "sample_weighted_hash",
    f"""
    SELECT doc_id, lang, n_chars,
           ROUND(ln({_HEXU_SQL}) / n_chars, 8) AS score
    FROM documents
    ORDER BY ln({_HEXU_SQL}) / n_chars DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES):
    each row draws u ~ U(0,1) and is ranked by u^(1/w) — here in the
    numerically-stable log form ln(u)/w — so the top-k is a weighted
    sample without replacement with inclusion odds ∝ weight (n_chars:
    longer documents are preferentially kept — the mixture-sampling
    step of corpus curation). u comes from md5(doc_id), not rand():
    membership is a pure function of the key, reproducible across
    runs, engines, partitionings, and task retries (module-docstring
    rationale), which is why both engines agree to the row.

    Scale shape: the score is a map-side expression; top-k plans as
    TakeOrderedAndProject (per-partition heaps + merge of k·P rows),
    never a global sort. The same score column also supports
    threshold-based Poisson sampling (keep score > c) when the output
    must stream."""
    d = load(spark, sf_dir, "documents")
    score = F.expr(f"ln({_HEXU_SQL}) / n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", score.alias("score_raw"))
        .orderBy(F.col("score_raw").desc(), "doc_id")
        .limit(100)
        .select("doc_id", "lang", "n_chars", F.round("score_raw", 8).alias("score"))
    )


@query(
    "shuffle_deterministic_epoch",
    """
    SELECT epoch, pos, doc_id
    FROM (
      SELECT t.epoch, d.doc_id,
             row_number() OVER (
               PARTITION BY t.epoch
               ORDER BY md5(CAST(d.doc_id AS STRING) || ':' ||
                            CAST(t.epoch AS STRING)), d.doc_id
             ) AS pos
      FROM documents d, (VALUES (0), (1), (2)) t(epoch)
    )
    WHERE pos <= 100
    ORDER BY epoch, pos
    """,
)
def shuffle_deterministic_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic training-data order: epoch e's sequence
    is the corpus sorted by md5(doc_id ':' e) — a different but fully
    reproducible permutation per epoch, the property data loaders need
    for resumable/distributed training (any worker can recompute its
    slice; rand() cannot, per the module docstring). Emits the first
    100 positions of 3 epochs. At 100 TB the global sequence number is
    assigned by range-partitioning on the hash key + per-partition
    offsets (sort happens within partitions; the fixture-scale
    row_number window is the same contract); readers usually skip
    materializing positions entirely and just sort each shard by the
    epoch key."""
    d = load(spark, sf_dir, "documents")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("epoch").cast("string")
            )
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 100)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


@query(
    "mixture_temperature_plan",
    """
    WITH st AS (
      SELECT lang, SUM(len(str_split(text, ' '))) AS toks
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(toks) AS total FROM st),
    scaled AS (
      SELECT lang, toks, toks / total AS p,
             POW(toks / total, 0.3) AS p_alpha
      FROM st, tot
    ),
    z AS (SELECT SUM(p_alpha) AS zsum FROM scaled)
    SELECT lang,
           CAST(toks AS BIGINT) AS lang_tokens,
           ROUND(p, 6) AS natural_frac,
           ROUND(p_alpha / zsum, 6) AS sampled_frac,
           ROUND((p_alpha / zsum) / p, 4) AS upsample_factor
    FROM scaled, z
    ORDER BY lang
    """,
)
def mixture_temperature_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (q_l ∝ p_l^α, α = 0.3 — the
    UniMax/mT5-family recipe from the public multilingual-pretraining
    literature): flattens the natural distribution so low-resource
    languages are upsampled without letting any single language
    dominate. Complements ``mixture_epoch_plan`` (uniform per-source
    budget): this is the smooth interpolation between natural (α=1)
    and uniform (α=0).

    One token-sum aggregation over the corpus is the only heavy pass.
    The per-lang frame after it is bounded by the language domain, so
    the corpus total and the normalizer Σp^α are both unpartitioned
    windows over that tiny frame — one SinglePartition exchange of
    ~n_langs rows, and the heavy aggregation subtree is evaluated
    exactly once (a scalar-subquery formulation re-evaluates it per
    consumer). Both engines evaluate the same POW expression tree on
    the same exact integer token sums."""
    d = load(spark, sf_dir, "documents")
    st = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks")
    )
    wall = Window.partitionBy()
    scaled = st.select(
        "lang",
        "toks",
        (F.col("toks") / F.sum("toks").over(wall)).alias("p"),
    ).withColumn("p_alpha", F.pow(F.col("p"), F.lit(0.3)))
    return (
        scaled.withColumn("zsum", F.sum("p_alpha").over(wall))
        .select(
            "lang",
            F.col("toks").alias("lang_tokens"),
            F.round("p", 6).alias("natural_frac"),
            F.round(F.col("p_alpha") / F.col("zsum"), 6).alias("sampled_frac"),
            F.round((F.col("p_alpha") / F.col("zsum")) / F.col("p"), 4).alias(
                "upsample_factor"
            ),
        )
        .orderBy("lang")
    )


@query(
    "ts_interpolate_linear",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             ROUND(AVG(value), 6) AS v
      FROM events WHERE user_id < 5
      GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
      SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
      FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM spans
    ), joined AS (
      SELECT g.user_id, g.hr, h.v,
        LAST_VALUE(h.v IGNORE NULLS) OVER
          (PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN h.v IS NOT NULL
                        THEN epoch(g.hr) / 3600 END IGNORE NULLS) OVER
          (PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        FIRST_VALUE(h.v IGNORE NULLS) OVER
          (PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN h.v IS NOT NULL
                         THEN epoch(g.hr) / 3600 END IGNORE NULLS) OVER
          (PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g LEFT JOIN hourly h USING (user_id, hr)
    )
    SELECT user_id, hr,
           (v IS NOT NULL) AS observed,
           ROUND(CASE WHEN nh = ph THEN pv
                      ELSE pv + (nv - pv) * (epoch(hr) / 3600 - ph)
                                          / (nh - ph) END, 6) AS v_interp
    FROM joined
    ORDER BY user_id, hr
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation over the hourly grid — the companion to
    resample_1h_gapfill's step-function forward fill: a gap's values
    slide proportionally between the surrounding observations instead
    of repeating the left one (what feature pipelines want for slowly
    varying signals like temperature or balance, where a step fill
    injects a phantom discontinuity at the right edge of every gap).

    Same one-shuffle shape as the gapfill (grid explode + left join +
    windows all keyed on user_id): prev/next observed value AND hour
    come from ignorenulls last/first over mirrored unbounded frames
    that INCLUDE the current row, so an observed hour degenerates to
    fraction 0/0 — handled by the shared nh=ph CASE, never division
    noise. Grid edges are min/max observed hours, so prev/next always
    exist and no row is NULL. Hour arithmetic is exact integer-valued
    doubles (epoch/3600) and hourly means are rounded BEFORE
    interpolation, so both engines interpolate identical endpoints —
    the 6-dp round then hash-matches. Scale knobs identical to
    resample_1h_gapfill."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .withColumn("ts_t", ts_timestamp())
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts_t").alias("hr")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    spans = hourly.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr"),
    )
    hr_num = F.unix_timestamp("hr") / 3600
    obs_hr = F.when(F.col("v").isNotNull(), hr_num)
    back = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = (
        grid.join(hourly, ["user_id", "hr"], "left")
        .withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("ph", F.last(obs_hr, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first(obs_hr, ignorenulls=True).over(fwd))
    )
    pv, ph, nv, nh = (F.col(c) for c in ("pv", "ph", "nv", "nh"))
    interp = F.when(nh == ph, pv).otherwise(
        pv + (nv - pv) * (hr_num - ph) / (nh - ph)
    )
    return j.select(
        "user_id",
        "hr",
        F.col("v").isNotNull().alias("observed"),
        F.round(interp, 6).alias("v_interp"),
    ).orderBy("user_id", "hr")


# --------------------------------------------------- K-fold target encoding

TE_FOLDS = 5


@query(
    "mlprep_target_encode_kfold",
    f"""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::INT
               % {TE_FOLDS} AS fold,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    cf AS (
      SELECT cat, fold, SUM(cents) AS s, COUNT(*) AS c
      FROM base GROUP BY cat, fold
    ),
    ct AS (SELECT cat, SUM(s) AS st, SUM(c) AS ct FROM cf GROUP BY cat)
    SELECT cf.cat, CAST(cf.fold AS INTEGER) AS fold,
           CAST(cf.c AS BIGINT) AS n_rows,
           ROUND((ct.st - cf.s) / ((ct.ct - cf.c) * 100.0), 6) AS enc
    FROM cf JOIN ct ON ct.cat = cf.cat
    ORDER BY cf.cat, cf.fold
    """,
)
def mlprep_target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold (leave-fold-out) target encoding of o_orderpriority
    against mean order value — the standard leakage-safe way to turn a
    categorical into a numeric feature: a row in fold f is encoded
    with the target mean computed from every OTHER fold, so no row's
    own target leaks into its feature. Folds are md5-keyed (module
    docstring), so membership is reproducible across engines/retries.

    Output is the (category × fold) encoding table itself — the
    artifact a trainer broadcast-joins back onto the full dataset. At
    100 TB the expensive side is one partial-aggregated groupBy over
    (cat, fold) producing a |cats|×K table; the encode-apply step is a
    broadcast join, never a shuffle of the fact table.

    Determinism: the target is summed in exact BIGINT cents (prices
    are 2dp), and the mean is a single integer/integer division — no
    float reduction order exists for engines to disagree on."""
    o = load(spark, sf_dir, "orders")
    fold = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % TE_FOLDS
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cf = (
        o.select(
            F.col("o_orderpriority").alias("cat"),
            fold.alias("fold"),
            cents.alias("cents"),
        )
        .groupBy("cat", "fold")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    wc = Window.partitionBy("cat")
    return (
        cf.withColumn("st", F.sum("s").over(wc))
        .withColumn("ct", F.sum("c").over(wc))
        .select(
            "cat",
            F.col("fold").cast("int").alias("fold"),
            F.col("c").alias("n_rows"),
            F.round(
                (F.col("st") - F.col("s"))
                / ((F.col("ct") - F.col("c")) * 100.0),
                6,
            ).alias("enc"),
        )
        .orderBy("cat", "fold")
    )


# The deterministic (score, label) projection shared VERBATIM by every
# classifier-eval oracle (calibration bins, ROC AUC, PR AUC): a 6-dp
# logistic stand-in over o_totalprice, an order-priority indicator
# label. ONE text (never-fork) so the evals can disagree on the metric,
# never on the scored frame being measured.
EVAL_SCORED_CTE = """scored AS (
      SELECT ROUND(1.0 / (1.0 + EXP(-(o_totalprice - 150000.0) / 50000.0)), 6)
               AS score,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS label
      FROM orders
    )"""


def _eval_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark mirror of ``EVAL_SCORED_CTE`` — the shared (score, label)
    frame for eval_calibration_bins / eval_auc_roc / eval_pr_auc."""
    o = load(spark, sf_dir, "orders")
    score = F.round(
        1.0 / (1.0 + F.exp(-(F.col("o_totalprice") - 150000.0) / 50000.0)), 6
    )
    label = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return o.select(score.alias("score"), label.alias("label"))


# The 10-bin reliability table body — ONE text shared by the
# eval_calibration_bins oracle and the ECE/MCE rollup over it.
_CALIB_BINS_SQL = """
      SELECT CAST(LEAST(FLOOR(score * 10), 9) AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(AVG(score), 6) AS mean_score,
             ROUND(AVG(label), 6) AS pos_rate,
             ROUND(ABS(AVG(score) - AVG(label)), 6) AS calib_gap
      FROM scored
      GROUP BY 1"""


@query(
    "eval_calibration_bins",
    f"""
    WITH {EVAL_SCORED_CTE}
    {_CALIB_BINS_SQL}
    ORDER BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table (the calibration eval every deployed
    classifier gets): scores bucketed into 10 equal-width bins, each
    reporting mean predicted score vs observed positive rate and the
    |gap| — the per-bin terms of Expected Calibration Error
    (ECE = Σ n_b/N · gap_b, one weighted sum over this output). The
    score here is a deterministic logistic stand-in over o_totalprice
    and the label an order-priority indicator: price doesn't predict
    priority, so the table EXHIBITS miscalibration — which is the
    point; the operator contract is (score, label) in, reliability
    table out.

    Scale: a map-only score/label projection into a 10-group
    aggregate — partial-agg combines map-side, the shuffle carries 10
    groups x 4 counters no matter the row count. Determinism: the
    score is 6-dp-rounded BEFORE binning in both engines, so bin
    membership compares on the same 1e-6 grid (libm-vs-JVM exp ulp
    noise cannot flip a bin)."""
    s = _eval_scored(spark, sf_dir)
    return (
        s.groupBy(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("label"), 6).alias("pos_rate"),
            F.round(F.abs(F.avg("score") - F.avg("label")), 6).alias(
                "calib_gap"
            ),
        )
        .orderBy("bin")
    )


# The rank-statistic AUC/Gini tail over a CTE named ``scored`` with
# (score, label) columns — ONE text (never-fork) shared by
# eval_auc_roc (synthetic eval frame) and eval_model_auc (the trained
# logreg scorer): the two keys may disagree on what is scored, never
# on the AUC algebra measuring it.
_AUC_RANK_SQL = """,
    pv AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM scored GROUP BY score
    ),
    mr AS (
      SELECT n_all, n_pos,
             SUM(n_all) OVER (ORDER BY score
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_all AS n_less
      FROM pv
    ),
    s AS (
      SELECT SUM(n_pos) AS p, SUM(n_all - n_pos) AS neg,
             SUM(n_pos * (2 * n_less + n_all + 1)) AS r2
      FROM mr
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
           ROUND((CAST(r2 AS DOUBLE) - CAST(p AS DOUBLE) * (p + 1))
                 / (2.0 * p * neg), 6) AS auc_roc,
           ROUND((CAST(r2 AS DOUBLE) - CAST(p AS DOUBLE) * (p + 1))
                 / (1.0 * p * neg) - 1.0, 6) AS gini
    FROM s
    """


def _auc_rank(s: DataFrame) -> DataFrame:
    """Spark twin of ``_AUC_RANK_SQL`` over a (score, label) frame —
    the compressed-domain rank pass (distinct scores first, doubled
    ranks keep every aggregate integer; the only float op is the
    final division)."""
    pv = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("label").alias("n_pos"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    mr = pv.select(
        "n_all",
        "n_pos",
        (F.sum("n_all").over(w) - F.col("n_all")).alias("n_less"),
    )
    agg = mr.agg(
        F.sum("n_pos").alias("p"),
        F.sum(F.col("n_all") - F.col("n_pos")).alias("neg"),
        F.sum(
            F.col("n_pos") * (2 * F.col("n_less") + F.col("n_all") + 1)
        ).alias("r2"),
    )
    p, neg, r2 = F.col("p"), F.col("neg"), F.col("r2")
    auc = (r2.cast("double") - p.cast("double") * (p + 1)) / (2.0 * p * neg)
    return agg.select(
        p.cast("bigint").alias("n_pos"),
        neg.cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc_roc"),
        F.round(auc * 2.0 - 1.0, 6).alias("gini"),
    )


PASSK_K = 10  # the k of pass@k (pass@1 is also published)

# The unbiased estimator's complement C(n-c,k)/C(n,k) as an UNROLLED
# left-associated product of k double divisions — the identical
# expression text runs on both engines (never-fork), so the IEEE
# result is bit-identical before the shared 6-dp round.
_PASSK_PROD = " * ".join(
    f"(CAST(n - c - {i} AS DOUBLE) / (n - {i}))" for i in range(PASSK_K)
)

_PASSK_SELECT = f"""
    SELECT event_type, task_bucket,
           n AS n_samples, c AS n_correct,
           ROUND(CAST(c AS DOUBLE) / n, 6) AS pass_at_1,
           CASE WHEN n < {PASSK_K} THEN CAST(NULL AS DOUBLE)
                WHEN n - c < {PASSK_K} THEN 1.0
                ELSE ROUND(1.0 - ({_PASSK_PROD}), 6)
           END AS pass_at_{PASSK_K}
    FROM t
    ORDER BY event_type, task_bucket"""


@query(
    "eval_pass_at_k",
    f"""
    WITH s AS (
      SELECT event_type, user_id % 10 AS task_bucket,
             CASE WHEN value >= 60.0 THEN 1 ELSE 0 END AS ok
      FROM events
    ),
    t AS (
      SELECT event_type, task_bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ok) AS BIGINT) AS c
      FROM s GROUP BY 1, 2
    )
    {_PASSK_SELECT}
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over grouped samples (Chen et al. 2021's unbiased
    estimator, public literature — the standard code-generation
    metric): tasks are (event_type, user_id mod 10) groups, a sample
    is 'correct' when its value clears the fixed 60.0 bar, and
    pass@k = 1 - C(n-c, k)/C(n, k) estimates the probability that at
    least one of k drawn samples is correct. Published per task with
    n, c, and pass@1 (= c/n, the raw accuracy) beside pass@10 — the
    table an eval harness aggregates over its benchmark.

    Determinism: n and c are exact integer counts; the combinatorial
    ratio is evaluated as an UNROLLED left-associated product of k
    double divisions whose expression text is shared verbatim between
    the Spark projection and the oracle (_PASSK_PROD — never-fork),
    so both engines execute the identical IEEE operation sequence on
    identical integers before the shared 6-dp round. The n-c < k
    branch (some draw must contain a correct sample) publishes exact
    1.0; n < k publishes NULL (the estimator is undefined), mirrored
    in both engines.

    Scale shape: one partial-agg corpus pass to the (task, n, c)
    frame (map-side combine carries two counters per task), then the
    estimator is a map-only projection over the bounded task table —
    at 100 TB nothing after the first aggregate sees more than
    |tasks| rows."""
    s = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 10).alias("task_bucket"),
        F.when(F.col("value") >= 60.0, 1).otherwise(0).alias("ok"),
    )
    t = s.groupBy("event_type", "task_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("c"),
    )
    passk = F.expr(
        f"CASE WHEN n < {PASSK_K} THEN CAST(NULL AS DOUBLE)"
        f" WHEN n - c < {PASSK_K} THEN 1.0"
        f" ELSE ROUND(1.0 - ({_PASSK_PROD}), 6) END"
    )
    return t.select(
        "event_type",
        "task_bucket",
        F.col("n").alias("n_samples"),
        F.col("c").alias("n_correct"),
        F.expr("ROUND(CAST(c AS DOUBLE) / n, 6)").alias("pass_at_1"),
        passk.alias(f"pass_at_{PASSK_K}"),
    ).orderBy("event_type", "task_bucket")


@query(
    "eval_auc_roc",
    f"""
    WITH {EVAL_SCORED_CTE}{_AUC_RANK_SQL}""",
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the shared (score, label) eval frame via the
    rank-statistic identity AUC = (R⁺ - P(P+1)/2) / (P·N) with
    average ranks for ties (exactly Mann-Whitney U normalized — the
    probability a random positive outscores a random negative), plus
    the Gini coefficient 2·AUC - 1. The standard threshold-free
    classifier eval next to eval_calibration_bins (which measures
    calibration; AUC measures discrimination — here ~0.509, price
    barely predicts priority, which is the point of the fixture).

    Scale shape: the agg_mann_whitney compressed-domain discipline —
    group by DISTINCT score first (row-proportional partial agg), so
    the ordered cumulative pass runs over the distinct-value frame,
    never the corpus. Determinism: doubled-rank arithmetic keeps
    every aggregate INTEGER (2·rank-sum avoids the ±0.5 tie term) —
    the only float op is the final division, rounded to 6 dp on both
    engines — factored as _auc_rank, shared verbatim with
    eval_model_auc (never-fork)."""
    return _auc_rank(_eval_scored(spark, sf_dir))


@query(
    "eval_pr_auc",
    f"""
    WITH {EVAL_SCORED_CTE},
    pv AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM scored GROUP BY score
    ),
    mr AS (
      SELECT n_pos,
             SUM(n_all) OVER (ORDER BY score DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_n,
             SUM(n_pos) OVER (ORDER BY score DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos
      FROM pv
    ),
    tot AS (SELECT SUM(n_pos) AS p FROM pv)
    SELECT CAST(tot.p AS BIGINT) AS n_pos,
           ROUND(SUM((CAST(n_pos AS DOUBLE) / tot.p)
                     * (CAST(cum_pos AS DOUBLE) / cum_n)), 6) AS pr_auc
    FROM mr CROSS JOIN tot
    GROUP BY tot.p
    """,
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve with
    step interpolation) of the shared (score, label) eval frame —
    the eval of record for imbalanced retrieval/classification, where
    ROC AUC flatters (here AP ~0.408 against a ~0.4 base rate: the
    score adds almost nothing, matching AUC ~0.509). Defined over
    DISTINCT score thresholds (ties form one block), so it is
    total-order-free: AP = Σ_t ΔR(t) · P(t) with ΔR = block
    positives / P and P(t) = cumulative precision at the threshold.

    Scale shape: same compressed-domain pass as eval_auc_roc — one
    corpus-proportional groupBy(score), then cumulative windows over
    the distinct-score frame only. Determinism: cumulative counts are
    exact integers; the per-threshold terms are double products
    summed once and rounded 6 dp (the agg-of-doubles class every
    power-sum oracle here already accepts)."""
    s = _eval_scored(spark, sf_dir)
    pv = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("label").alias("n_pos"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    mr = pv.select(
        "n_pos",
        F.sum("n_all").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
    )
    tot = mr.agg(F.sum("n_pos").alias("p"))
    return (
        mr.crossJoin(F.broadcast(tot))
        .groupBy("p")
        .agg(
            F.round(
                F.sum(
                    (F.col("n_pos").cast("double") / F.col("p"))
                    * (F.col("cum_pos").cast("double") / F.col("cum_n"))
                ),
                6,
            ).alias("pr_auc")
        )
        .select(F.col("p").cast("bigint").alias("n_pos"), "pr_auc")
    )


EVAL_THRESHOLDS = (0.3, 0.5, 0.7)


def _confusion_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({t!r} AS DOUBLE) AS threshold" for t in EVAL_THRESHOLDS
    )
    return f"""
    WITH {EVAL_SCORED_CTE},
    th AS ({rows}),
    cm AS (
      SELECT th.threshold,
             SUM(CASE WHEN score >= threshold AND label = 1 THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN score >= threshold AND label = 0 THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN score <  threshold AND label = 1 THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN score <  threshold AND label = 0 THEN 1 ELSE 0 END) AS tn
      FROM scored CROSS JOIN th
      GROUP BY th.threshold
    )
    SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND(tp * 1.0 / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(tp * 1.0 / NULLIF(tp + fn, 0), 6) AS recall,
           ROUND(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS f1,
           ROUND((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy
    FROM cm
    ORDER BY threshold
    """


@query("eval_threshold_confusion", _confusion_oracle())
def eval_threshold_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrices and the derived operating-point metrics
    (precision / recall / F1 / accuracy) of the shared (score, label)
    eval frame at three decision thresholds — the last member of the
    classifier-eval family: calibration (bins), discrimination (ROC /
    PR AUC), and now the deployable operating points a threshold
    choice actually ships. F1 uses the 2tp/(2tp+fp+fn) form so a
    zero-division can only occur when the slice is empty of
    predictions AND positives (NULL then, on both engines).

    Scale shape: one map-only cross join against a 3-row literal
    threshold table, aggregated into 3 groups x 4 integer counters —
    the eval_calibration_bins class; the shuffle carries 12 numbers
    regardless of corpus size. Determinism: integer counts, one
    rounded division per metric."""
    s = _eval_scored(spark, sf_dir)
    th = spark.createDataFrame(
        [(float(t),) for t in EVAL_THRESHOLDS], "threshold double"
    )
    pred = F.col("score") >= F.col("threshold")
    cm = (
        s.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum((pred & (F.col("label") == 1)).cast("long")).alias("tp"),
            F.sum((pred & (F.col("label") == 0)).cast("long")).alias("fp"),
            F.sum((~pred & (F.col("label") == 1)).cast("long")).alias("fn"),
            F.sum((~pred & (F.col("label") == 0)).cast("long")).alias("tn"),
        )
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "threshold",
        tp,
        fp,
        fn,
        tn,
        F.round(tp / F.nullif(tp + fp, F.lit(0)), 6).alias("precision"),
        F.round(tp / F.nullif(tp + fn, F.lit(0)), 6).alias("recall"),
        F.round(2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)), 6).alias(
            "f1"
        ),
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
    ).orderBy("threshold")


@query(
    "eval_expected_calibration_error",
    f"""
    WITH {EVAL_SCORED_CTE},
    bins AS ({_CALIB_BINS_SQL}
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           ROUND(SUM(n * calib_gap) / SUM(n), 6) AS ece,
           ROUND(MAX(calib_gap), 6) AS mce
    FROM bins
    """,
)
def eval_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected and Maximum Calibration Error — the scalar rollups of
    eval_calibration_bins' reliability table (ECE = Σ n_b/N · gap_b,
    MCE = max_b gap_b), the two numbers calibration papers and model
    cards actually report. Composes the bins KEY FUNCTION verbatim
    (the rag-reuses-rrf pattern) and the oracle wraps the shared
    _CALIB_BINS_SQL text, so the binning can never fork from the
    table the scalar claims to summarize.

    Scale shape: the 10-row bins aggregate reduced to one row —
    nothing beyond eval_calibration_bins' map-only pass. Determinism:
    the rollup consumes the 6-dp-rounded per-bin gaps on both
    engines."""
    bins = eval_calibration_bins(spark, sf_dir)
    return bins.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("n") * F.col("calib_gap")) / F.sum("n"), 6
        ).alias("ece"),
        F.round(F.max("calib_gap"), 6).alias("mce"),
    )


@query(
    "agg_cuped_variance_reduction",
    """
    WITH b AS (
      SELECT (epoch_ns(MIN(ts)) + epoch_ns(MAX(ts))) // 2 AS mid FROM events
    ),
    u AS (
      SELECT user_id,
             AVG(CASE WHEN epoch_ns(ts) < b.mid THEN value END) AS x,
             AVG(CASE WHEN epoch_ns(ts) >= b.mid THEN value END) AS y
      FROM events CROSS JOIN b
      GROUP BY user_id
    ),
    p AS (
      SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM u WHERE x IS NOT NULL AND y IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND((sxy / n - sx * sy / (n * n))
                 / (sxx / n - sx * sx / (n * n)), 6) AS theta,
           ROUND(syy / n - sy * sy / (n * n), 6) AS var_y,
           ROUND((syy / n - sy * sy / (n * n))
                 - POW(sxy / n - sx * sy / (n * n), 2)
                   / (sxx / n - sx * sx / (n * n)), 6) AS var_cuped,
           ROUND(POW(sxy / n - sx * sy / (n * n), 2)
                 / ((sxx / n - sx * sx / (n * n))
                    * (syy / n - sy * sy / (n * n))), 6)
             AS variance_reduction
    FROM p
    """,
)
def agg_cuped_variance_reduction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data) — the
    experimentation-platform variance-reduction workhorse: per user,
    the pre-period mean metric x (first half of the time range) is
    used as a covariate for the post-period mean y; the adjusted
    metric y - θ(x - x̄) with θ = cov(x,y)/var(x) has variance
    var(y)·(1 - ρ²). Emits θ, the raw and CUPED-adjusted variances,
    and the variance_reduction fraction ρ² — the number that decides
    how much smaller an A/B test's sample size can be.

    Scale shape: one bounds pass (2-number aggregate), one per-user
    conditional-mean pass, then a 6-power-sum reduce over users — the
    agg_corr_covar float class, nothing wider than six doubles past
    the user aggregate. Population (1/n) moments are expanded
    identically on both engines; users active in only one period drop
    out of the covariance (NULL-safe by the WHERE)."""
    from kinesis_adapter_spark.catalog import ts_us_trunc

    # µs-truncate like every cross-engine ts comparison (DuckDB reads
    # parquet NANOS at µs precision; 99.9% of fixture timestamps carry
    # sub-µs residue, so a raw-ns midpoint puts the two engines'
    # period boundaries a hair apart)
    ev = load(spark, sf_dir, "events").select(
        "user_id", ts_us_trunc().alias("ts_ns"), "value"
    )
    # integer midpoint: (min+max)/2 through Spark's `/` is a DOUBLE,
    # which cannot represent ~3.4e18 exactly (2^53 mantissa) — the mid
    # would land up to ~512 ns away from DuckDB's exact `// 2`
    bounds = ev.agg(
        F.shiftright(F.min("ts_ns") + F.max("ts_ns"), 1).alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.avg(F.when(F.col("ts_ns") < F.col("mid"), F.col("value"))).alias(
                "x"
            ),
            F.avg(
                F.when(F.col("ts_ns") >= F.col("mid"), F.col("value"))
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    p = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = sxy / n - sx * sy / (n * n)
    vx = sxx / n - sx * sx / (n * n)
    vy = syy / n - sy * sy / (n * n)
    return p.select(
        n.cast("bigint").alias("n_users"),
        F.round(cov / vx, 6).alias("theta"),
        F.round(vy, 6).alias("var_y"),
        F.round(vy - cov * cov / vx, 6).alias("var_cuped"),
        F.round(cov * cov / (vx * vy), 6).alias("variance_reduction"),
    )


NEG_ANCHORS = 20  # anchor batch: vec_id < 20 (bounded model metadata)
NEG_K = 4         # negatives per anchor


@query(
    "sample_negative_pairs",
    f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, label AS anchor_label
      FROM embeddings WHERE vec_id < {NEG_ANCHORS}
    )
    SELECT anchor_id, e.vec_id AS neg_id, e.label AS neg_label,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT a.anchor_id, e.vec_id, e.label,
             row_number() OVER (
               PARTITION BY a.anchor_id
               ORDER BY md5(a.anchor_id || ':' || e.vec_id)) AS rk
      FROM anchors a JOIN embeddings e ON e.label <> a.anchor_label
    ) e
    WHERE rk <= {NEG_K}
    ORDER BY anchor_id, rk
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE sampling for contrastive training: for
    each anchor in a BOUNDED batch, k={NEG_K} label-different
    negatives chosen by md5(anchor:candidate) order — the
    hash-thresholding discipline every sampler in this repo uses
    (pure function of the ids: reproducible across runs, engines,
    partitionings, and retries, unlike rand(seed) under task retry;
    and each anchor draws an INDEPENDENT permutation of candidates,
    unlike a single global shuffle).

    Scale shape: the anchor set is a bounded BATCH (the probe-set
    discipline of knn_join/eval_ann_recall) broadcast against the
    corpus with the label-inequality as the join residual; per-anchor
    top-k is WindowGroupLimit on the |anchors|-keyed window, so cost
    is |batch| x corpus — a full training epoch processes anchors in
    such batches, each linear in the corpus (a corpus-proportional
    anchor set in ONE pass would be quadratic: the first cut smoked
    at 4.5x for 8x data for exactly that reason). At 10^9 candidates
    add a hash-range candidate gate so the window input is sampled —
    same plan, one more map-side predicate. Determinism: md5 is md5
    everywhere."""
    e = load(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("vec_id").cast("string"),
            )
        )
    )
    return (
        e.join(
            F.broadcast(anchors), F.col("label") != F.col("anchor_label")
        )
        .select("anchor_id", "vec_id", "label")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NEG_K)
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("anchor_id", "rk")
    )


@query(
    "pipeline_ab_test_report",
    """
    WITH b AS (
      SELECT (epoch_ns(MIN(ts)) + epoch_ns(MAX(ts))) // 2 AS mid FROM events
    ),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
             AVG(CASE WHEN epoch_ns(ts) < b.mid THEN value END) AS x,
             AVG(CASE WHEN epoch_ns(ts) >= b.mid THEN value END) AS y
      FROM events CROSS JOIN b
      GROUP BY user_id
      HAVING x IS NOT NULL AND y IS NOT NULL
    ),
    p AS (
      SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM u
    ),
    th AS (
      SELECT (sxy / n - sx * sy / (n * n))
             / (sxx / n - sx * sx / (n * n)) AS theta
      FROM p
    ),
    arms AS (
      SELECT arm, COUNT(*) * 1.0 AS n,
             SUM(y) AS sy, SUM(y * y) AS syy,
             SUM(y - th.theta * x) AS sa,
             SUM((y - th.theta * x) * (y - th.theta * x)) AS saa
      FROM u CROSS JOIN th
      GROUP BY arm
    ),
    w AS (
      SELECT
        MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        MAX(CASE WHEN arm = 1 THEN sy / n END) AS m1,
        MAX(CASE WHEN arm = 0 THEN sy / n END) AS m0,
        MAX(CASE WHEN arm = 1 THEN (syy - sy * sy / n) / (n - 1) END) AS v1,
        MAX(CASE WHEN arm = 0 THEN (syy - sy * sy / n) / (n - 1) END) AS v0,
        MAX(CASE WHEN arm = 1 THEN sa / n END) AS am1,
        MAX(CASE WHEN arm = 0 THEN sa / n END) AS am0,
        MAX(CASE WHEN arm = 1 THEN (saa - sa * sa / n) / (n - 1) END) AS av1,
        MAX(CASE WHEN arm = 0 THEN (saa - sa * sa / n) / (n - 1) END) AS av0
      FROM arms
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_ctrl,
           ROUND(m1 - m0, 6) AS diff_raw,
           ROUND((m1 - m0) / SQRT(v1 / n1 + v0 / n0), 6) AS t_raw,
           ROUND((SELECT theta FROM th), 6) AS theta,
           ROUND(am1 - am0, 6) AS diff_cuped,
           ROUND((am1 - am0) / SQRT(av1 / n1 + av0 / n0), 6) AS t_cuped,
           ROUND(1.0 - (av1 / n1 + av0 / n0) / (v1 / n1 + v0 / n0), 6)
             AS se2_reduction
    FROM w
    """,
)
def pipeline_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end A/B test readout in ONE query — what an
    experimentation platform computes per metric per experiment:
    deterministic arm assignment (user_id parity — the hash-split
    discipline), per-user post-period means, the raw Welch t, and the
    CUPED-adjusted comparison (y - θx with θ pooled across arms, the
    agg_cuped_variance_reduction machinery composed into an actual
    decision readout) with the standard-error reduction the adjustment
    bought. The θ-pooling, the period split, and the Welch arithmetic
    reuse the established power-sum discipline verbatim, so this key's
    parity also cross-checks their COMPOSITION.

    Scale shape: one bounds pass, one per-user conditional-mean
    aggregate, one pooled 5-power-sum reduce, one 2-group arm
    aggregate — nothing wider than a dozen doubles past the user
    tier. Determinism: integer µs-truncated midpoint (the CUPED
    lesson), power sums expanded identically, 6 dp at output."""
    from kinesis_adapter_spark.catalog import ts_us_trunc

    ev = load(spark, sf_dir, "events").select(
        "user_id", ts_us_trunc().alias("ts_ns"), "value"
    )
    bounds = ev.agg(
        F.shiftright(F.min("ts_ns") + F.max("ts_ns"), 1).alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.avg(F.when(F.col("ts_ns") < F.col("mid"), F.col("value"))).alias("x"),
            F.avg(F.when(F.col("ts_ns") >= F.col("mid"), F.col("value"))).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "x", "y")
    )
    p = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    th = p.select(
        (
            (F.col("sxy") / n - sx * sy / (n * n))
            / (F.col("sxx") / n - sx * sx / (n * n))
        ).alias("theta")
    )
    adj = F.col("y") - F.col("theta") * F.col("x")
    arms = (
        u.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("double").alias("na"),
            F.sum("y").alias("sya"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(adj).alias("sa"),
            F.sum(adj * adj).alias("saa"),
            F.max("theta").alias("theta"),
        )
    )
    def pick(c, arm):
        return F.max(F.when(F.col("arm") == arm, c))
    na, sya, syy = F.col("na"), F.col("sya"), F.col("syy")
    sa, saa = F.col("sa"), F.col("saa")
    w = arms.agg(
        pick(na, 1).alias("n1"),
        pick(na, 0).alias("n0"),
        pick(sya / na, 1).alias("m1"),
        pick(sya / na, 0).alias("m0"),
        pick((syy - sya * sya / na) / (na - 1), 1).alias("v1"),
        pick((syy - sya * sya / na) / (na - 1), 0).alias("v0"),
        pick(sa / na, 1).alias("am1"),
        pick(sa / na, 0).alias("am0"),
        pick((saa - sa * sa / na) / (na - 1), 1).alias("av1"),
        pick((saa - sa * sa / na) / (na - 1), 0).alias("av0"),
        F.max("theta").alias("theta"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    m1, m0, v1, v0 = F.col("m1"), F.col("m0"), F.col("v1"), F.col("v0")
    am1, am0, av1, av0 = (
        F.col("am1"),
        F.col("am0"),
        F.col("av1"),
        F.col("av0"),
    )
    return w.select(
        n1.cast("bigint").alias("n_treat"),
        n0.cast("bigint").alias("n_ctrl"),
        F.round(m1 - m0, 6).alias("diff_raw"),
        F.round((m1 - m0) / F.sqrt(v1 / n1 + v0 / n0), 6).alias("t_raw"),
        F.round(F.col("theta"), 6).alias("theta"),
        F.round(am1 - am0, 6).alias("diff_cuped"),
        F.round((am1 - am0) / F.sqrt(av1 / n1 + av0 / n0), 6).alias(
            "t_cuped"
        ),
        F.round(
            1.0 - (av1 / n1 + av0 / n0) / (v1 / n1 + v0 / n0), 6
        ).alias("se2_reduction"),
    )


@query(
    "eval_brier_decomposition",
    f"""
    WITH {EVAL_SCORED_CTE},
    bins AS ({_CALIB_BINS_SQL}
    ),
    base AS (
      SELECT SUM(n * pos_rate) / SUM(n) AS p FROM bins
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           ROUND((SELECT AVG((score - label) * (score - label)) FROM scored),
                 6) AS brier,
           ROUND(SUM(n * (mean_score - pos_rate) * (mean_score - pos_rate))
                 / SUM(n), 6) AS reliability,
           ROUND(SUM(n * (pos_rate - base.p) * (pos_rate - base.p))
                 / SUM(n), 6) AS resolution,
           ROUND(MAX(base.p) * (1 - MAX(base.p)), 6) AS uncertainty
    FROM bins CROSS JOIN base
    GROUP BY base.p
    """,
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with its Murphy decomposition — the proper-scoring
    view of the same reliability table: brier = mean (score-label)²
    and, over the 10 calibration bins, reliability (how far bin
    confidence sits from bin accuracy — lower is better), resolution
    (how far bins pull away from the base rate — higher is better),
    and uncertainty (base-rate variance, the irreducible floor);
    brier ≈ reliability - resolution + uncertainty up to the binning
    residual. Shares the scored CTE and the _CALIB_BINS_SQL text
    verbatim, so the decomposition can never fork from the bins.

    Scale shape: the eval_calibration_bins pass plus one corpus
    mean-square — both map-only aggregates; everything after runs on
    10 bin rows. Determinism: bin stats are 6-dp-rounded before the
    decomposition on both engines."""
    s = _eval_scored(spark, sf_dir)
    brier = s.agg(
        F.round(
            F.avg(
                (F.col("score") - F.col("label"))
                * (F.col("score") - F.col("label"))
            ),
            6,
        ).alias("brier")
    )
    bins = eval_calibration_bins(spark, sf_dir)
    base = bins.agg(
        (F.sum(F.col("n") * F.col("pos_rate")) / F.sum("n")).alias("p")
    )
    return (
        bins.crossJoin(F.broadcast(base))
        .groupBy("p")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.round(
                F.sum(
                    F.col("n")
                    * (F.col("mean_score") - F.col("pos_rate"))
                    * (F.col("mean_score") - F.col("pos_rate"))
                )
                / F.sum("n"),
                6,
            ).alias("reliability"),
            F.round(
                F.sum(
                    F.col("n")
                    * (F.col("pos_rate") - F.col("p"))
                    * (F.col("pos_rate") - F.col("p"))
                )
                / F.sum("n"),
                6,
            ).alias("resolution"),
            F.round(F.max("p") * (1 - F.max("p")), 6).alias("uncertainty"),
        )
        .crossJoin(F.broadcast(brier))
        .select("n", "brier", "reliability", "resolution", "uncertainty")
    )


# ------------------------------------------- quality-classifier GD fit

# Fixed-iteration batch-gradient-descent logistic regression — the
# fastText-style quality-filter trainer every pretraining pipeline
# runs over surface features before burning GPU-hours on a learned
# classifier. Hyperparameters are module constants so the Spark loop,
# the unrolled-CTE oracle, and the independent pytest reference all
# read the same values.
LOGREG_LR = 2.0
LOGREG_ITERS = 5
_LOGREG_FEATURES = ["bias", "f_tokens", "f_awl", "f_rep"]

# Feature/label projection — ONE text shared by the train and score
# oracles (never-fork). Label: long-document indicator (n_chars >=
# 300, ~51% positive at sf0.01); features: token count, average word
# length, repetition (1 - type/token ratio), each scaled to O(1) and
# 6-dp rounded so every downstream product/sum lives on the same
# 1e-6 grid in both engines.
_LOGREG_F_CTE = """f AS MATERIALIZED (
      SELECT doc_id, lang,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
             1.0 AS x0,
             ROUND(len(str_split(text, ' ')) / 100.0, 6) AS x1,
             ROUND(LENGTH(text) * 1.0 / len(str_split(text, ' ')) / 10.0,
                   6) AS x2,
             ROUND(1.0 - len(list_distinct(str_split(text, ' '))) * 1.0
                   / len(str_split(text, ' ')), 6) AS x3
      FROM documents
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""

# The 6-dp-rounded sigmoid margin for weight row alias {w} — explicit
# left-associated sum so both engines evaluate the dot product in the
# same IEEE order; EXP is tolerated because the result is immediately
# 6-dp compressed (the EVAL_SCORED_CTE precedent: libm-vs-JVM exp ulp
# noise cannot survive the round).
_LOGREG_P6 = (
    "ROUND(1.0 / (1.0 + EXP(-ROUND(((({w}.w0 * x0) + {w}.w1 * x1)"
    " + {w}.w2 * x2) + {w}.w3 * x3, 6))), 6)"
)

# One GD round: gradients as EXACT integer micro-unit sums
# (order-independent across any partitioning — the
# sample_neyman_allocation compressed-domain discipline), then the
# weight update ROUND(w - lr * (g / 1e12 / n), 6) evaluated in the
# same expression order by both engines.
_LOGREG_ROUND = f""",
    g{{t}} AS (
      SELECT
        SUM(pmu * CAST(ROUND(x0 * 1000000, 0) AS BIGINT)) AS g0,
        SUM(pmu * CAST(ROUND(x1 * 1000000, 0) AS BIGINT)) AS g1,
        SUM(pmu * CAST(ROUND(x2 * 1000000, 0) AS BIGINT)) AS g2,
        SUM(pmu * CAST(ROUND(x3 * 1000000, 0) AS BIGINT)) AS g3
      FROM (
        SELECT y, x0, x1, x2, x3,
               CAST(ROUND({_LOGREG_P6.format(w='w')} * 1000000, 0) AS BIGINT)
                 - y * 1000000 AS pmu
        FROM f, w{{prev}} w
      )
    ),
    w{{t}} AS (
      SELECT
        ROUND(w.w0 - {LOGREG_LR} * (CAST(g.g0 AS DOUBLE)
              / 1000000000000.0 / nn.n), 6) AS w0,
        ROUND(w.w1 - {LOGREG_LR} * (CAST(g.g1 AS DOUBLE)
              / 1000000000000.0 / nn.n), 6) AS w1,
        ROUND(w.w2 - {LOGREG_LR} * (CAST(g.g2 AS DOUBLE)
              / 1000000000000.0 / nn.n), 6) AS w2,
        ROUND(w.w3 - {LOGREG_LR} * (CAST(g.g3 AS DOUBLE)
              / 1000000000000.0 / nn.n), 6) AS w3
      FROM w{{prev}} w, g{{t}} g, nn
    )"""

_LOGREG_CHAIN = "WITH " + _LOGREG_F_CTE + "".join(
    _LOGREG_ROUND.format(t=t, prev=t - 1) for t in range(1, LOGREG_ITERS + 1)
)


def _logreg_train_oracle() -> str:
    wt = f"w{LOGREG_ITERS}"
    unpivot = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS feature, w{j} AS weight FROM {wt}"
        for j, name in enumerate(_LOGREG_FEATURES)
    )
    return f"""
    {_LOGREG_CHAIN}
    SELECT feature, weight FROM (
      {unpivot}
    ) ORDER BY feature
    """


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark mirror of ``_LOGREG_F_CTE`` (same expression order)."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    dist = F.size(F.array_distinct(F.split(F.col("text"), " ")))
    return d.select(
        "doc_id",
        "lang",
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.round(toks / 100.0, 6).alias("x1"),
        F.round(F.length("text") * 1.0 / toks / 10.0, 6).alias("x2"),
        F.round(1.0 - dist * 1.0 / toks, 6).alias("x3"),
    )


def _logreg_p6(w: list[float]):
    """6-dp sigmoid of the 6-dp margin under weights ``w`` — the Spark
    twin of ``_LOGREG_P6``, same left-associated dot product."""
    z = F.round(
        (
            ((F.lit(w[0]) * F.col("x0")) + F.lit(w[1]) * F.col("x1"))
            + F.lit(w[2]) * F.col("x2")
        )
        + F.lit(w[3]) * F.col("x3"),
        6,
    )
    return F.round(1.0 / (1.0 + F.exp(-z)), 6)


def _logreg_fit(spark: SparkSession, sf_dir: str) -> list[float]:
    """The GD loop: LOGREG_ITERS corpus passes, each ONE partial
    aggregation whose integer micro-unit gradient sums are reduced
    alongside the row count, with the weight update computed as a
    Spark expression over that 1-row frame (so HALF_UP rounding
    semantics never leave the engine) and collected as 4 doubles of
    model metadata — never data. The oracle replays the identical
    dataflow as an unrolled plain-CTE chain (the emb_kmeans_lloyd /
    vocab_bpe_train discipline)."""
    # r16 (guide §1.2/§5): every GD round aggregates the SAME feature
    # projection, and the projection is the expensive part of a round
    # (split + array_distinct tokenization of the whole corpus). Pin
    # the narrow numeric frame (doc_id, lang, y, x0..x3) once for the
    # K rounds — identical values feed identical integer-micro-unit
    # aggs, so the fitted weights are bit-identical — and release it
    # before returning (cache-hygiene rule).
    f = _logreg_features(spark, sf_dir).persist()
    try:
        return _logreg_gd_rounds(f)
    finally:
        f.unpersist()


def _logreg_gd_rounds(f: DataFrame) -> list[float]:
    """The LOGREG_ITERS GD rounds over the (persisted) feature frame —
    split out of _logreg_fit so the cache release wraps the whole loop
    in one try/finally (the _bpe_rounds pattern)."""
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(LOGREG_ITERS):
        pmu = (
            F.round(_logreg_p6(w) * 1000000, 0).cast("bigint")
            - F.col("y") * 1000000
        )
        agg = f.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            *[
                F.sum(
                    pmu
                    * F.round(F.col(f"x{j}") * 1000000, 0).cast("bigint")
                ).alias(f"g{j}")
                for j in range(4)
            ],
        )
        row = agg.select(
            *[
                F.round(
                    F.lit(w[j])
                    - LOGREG_LR
                    * (
                        F.col(f"g{j}").cast("double")
                        / 1000000000000.0
                        / F.col("n")
                    ),
                    6,
                ).alias(f"w{j}")
                for j in range(4)
            ]
        ).collect()[0]
        w = [float(row[f"w{j}"]) for j in range(4)]
    return w


@query("model_logreg_train", _logreg_train_oracle())
def model_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier trainer: batch-GD logistic regression
    (LOGREG_ITERS rounds, lr=LOGREG_LR, zero init) over surface
    features of the document corpus — token count, average word
    length, repetition — against a long-document indicator label the
    features genuinely predict (AUC ≈ 0.999 via model_logreg_score →
    eval_auc_roc's rank identity), published as the (feature, weight)
    table a scoring pass broadcasts. This is the fastText-style
    quality-filter shape: train once on a sample, score 100 TB
    map-only.

    Determinism: features and per-round sigmoids are 6-dp compressed;
    gradient sums are EXACT integer micro-unit arithmetic
    (order-independent under any partitioning); each round's weights
    re-round to 6 dp before folding into the next round as literals —
    so the oracle's unrolled CTE chain replays bit-identical
    operands. Scale bound (same class as sample_neyman_allocation):
    |pmu| ≤ 1e6 and |xµ| ≤ ~1.1e6 at these O(1) feature scales, so a
    gradient term is ≤ ~1.1e12 and the bigint sum is exact to ~8×10⁶
    corpus rows; past that, mini-batch the GD pass (the standard move
    anyway) or lift the gradient sums to DECIMAL(38,0) on both
    engines.

    Scale shape: one partial-agg corpus pass per round (map-side
    combine carries 5 counters per partition), 4 doubles of model
    state collected per round — the emb_kmeans_lloyd loop with a
    1-row model instead of k×d centroids."""
    w = _logreg_fit(spark, sf_dir)
    return spark.createDataFrame(
        sorted(zip(_LOGREG_FEATURES, w)), "feature string, weight double"
    ).orderBy("feature")


@query(
    "model_logreg_score",
    f"""
    {_LOGREG_CHAIN}
    SELECT f.doc_id, f.y AS label,
           {_LOGREG_P6.format(w='w')} AS score
    FROM f, w{LOGREG_ITERS} w
    ORDER BY f.doc_id
    """,
)
def model_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only scoring pass of the trained quality classifier: the 4
    fitted weights broadcast as literals into a single projection —
    per document, the (label, 6-dp sigmoid score) pair that feeds the
    threshold-free eval suite (eval_auc_roc / eval_pr_auc /
    eval_calibration_bins all consume a (score, label) frame; this
    key closes the loop the synthetic EVAL_SCORED_CTE stood in for).
    At 100 TB this is THE production shape: no shuffle, no state —
    the classifier rides the scan, and the quality gate becomes a
    pushed-down filter on its output.

    The fit reruns the deterministic GD loop (model metadata, never
    persisted — cache-hygiene rule), so the key stays a pure function
    of (spark, sf_dir); the oracle replays train + score in one CTE
    chain."""
    w = _logreg_fit(spark, sf_dir)
    f = _logreg_features(spark, sf_dir)
    # deliberately NO orderBy: the scoring projection must stay
    # shuffle-free (the compare is order-insensitive; the oracle's
    # ORDER BY is presentation only) — pinned in tests/test_plans.py
    return f.select(
        "doc_id",
        F.col("y").alias("label"),
        _logreg_p6(w).alias("score"),
    )


QUALITY_TAU = 0.5  # keep threshold on the 6-dp logreg score


@query(
    "eval_model_auc",
    f"""
    {_LOGREG_CHAIN},
    scored AS (
      SELECT {_LOGREG_P6.format(w='w')} AS score, f.y AS label
      FROM f, w{LOGREG_ITERS} w
    ){_AUC_RANK_SQL}""",
)
def eval_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC / Gini of the TRAINED quality classifier — the closed
    loop: model_logreg_train's weights score the corpus
    (model_logreg_score's projection) and the shared rank-statistic
    tail (_AUC_RANK_SQL / _auc_rank, verbatim from eval_auc_roc)
    measures the result. Where eval_auc_roc deliberately grades a
    non-predictive synthetic fixture (~0.509), this key certifies the
    trainer actually learned (AUC ≈ 0.999 — the features genuinely
    predict the long-document label), which is the sign a pretraining
    pipeline checks before promoting a quality filter to a 100 TB
    scoring pass.

    Scale shape: the fit's bounded per-round aggs, one map-only
    scoring projection, then the compressed-domain rank pass over
    DISTINCT scores — the corpus never sorts."""
    w = _logreg_fit(spark, sf_dir)
    f = _logreg_features(spark, sf_dir)
    return _auc_rank(
        f.select(_logreg_p6(w).alias("score"), F.col("y").alias("label"))
    )


@query(
    "pipeline_quality_filter",
    f"""
    {_LOGREG_CHAIN},
    scored AS (
      SELECT f.lang, {_LOGREG_P6.format(w='w')} AS score
      FROM f, w{LOGREG_ITERS} w
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score >= {QUALITY_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN score >= {QUALITY_TAU} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS kept_rate,
           ROUND(SUM(CASE WHEN score >= {QUALITY_TAU}
                          THEN CAST(ROUND(score * 1000000, 0) AS BIGINT)
                          ELSE 0 END)
                 / 1000000.0
                 / NULLIF(SUM(CASE WHEN score >= {QUALITY_TAU}
                                   THEN 1 ELSE 0 END), 0),
                 6) AS mean_score_kept
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality-filter pass a pretraining pipeline ships:
    train the classifier (model_logreg_train's GD loop), score every
    document map-only (model_logreg_score's projection), gate at
    QUALITY_TAU, and publish the per-language keep audit — the table
    a curation run reviews before committing the filtered corpus
    (pipeline_text_curation's heuristic gate, upgraded to a LEARNED
    gate). Composing the three stages cross-checks weights/score/lang
    plumbing the way pipeline_rag_retrieval does for retrieval.

    Determinism: scores are the 6-dp sigmoid both engines already
    agree on; the kept-mean is summed in integer micro-units BEFORE
    the two divisions (order-independent — the compressed-domain
    discipline), and kept counts are integers. At 100 TB the gate is
    the production shape: score+filter ride the scan (zero shuffle),
    and only the |langs|-row audit aggregates."""
    w = _logreg_fit(spark, sf_dir)
    f = _logreg_features(spark, sf_dir)
    scored = f.select("lang", _logreg_p6(w).alias("score"))
    kept = F.when(F.col("score") >= QUALITY_TAU, 1).otherwise(0)
    s6 = F.round(F.col("score") * 1000000, 0).cast("bigint")
    n_kept = F.sum(kept)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            n_kept.cast("bigint").alias("n_kept"),
            F.round(n_kept * 1.0 / F.count(F.lit(1)), 6).alias("kept_rate"),
            F.round(
                F.sum(
                    F.when(F.col("score") >= QUALITY_TAU, s6).otherwise(
                        F.lit(0)
                    )
                )
                / 1000000.0
                / F.when(n_kept > 0, n_kept),
                6,
            ).alias("mean_score_kept"),
        )
        .orderBy("lang")
    )
