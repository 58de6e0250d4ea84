"""UDF / UDAF / UDTF surface (SURVEY.md §2.1-K).

Demonstrates every Python-extension point with the performance
hierarchy made explicit:

1. built-in JVM expressions (everything else in this repo) — fastest;
2. Arrow-vectorized pandas UDFs / applyInPandas / mapInPandas — the
   ONLY acceptable Python path at scale (one Arrow batch per ~10k
   rows, numpy vectorization inside);
3. row-at-a-time @udf — included because the surface requires it,
   deliberately on a small input; never in a 100 TB hot path.

Each key that is semantically SQL-expressible still declares an
oracle, so the Python implementations are hash-checked against pure
SQL — the strongest possible test of the UDF plumbing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query


@query(
    "udf_scalar",
    """
    SELECT doc_id,
           lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS clean,
           length(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS clean_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (text cleaner), oracled against the
    equivalent SQL. Input capped at 100 rows — the per-row Python
    round-trip is the slow path by construction."""
    import re

    # no type hints on purpose: the returnType IS StringType(), and
    # hinted closures make pyspark try (and fail) to infer an Arrow
    # eval type, emitting a UserWarning on every run (VERDICT r9)
    @F.udf(StringType())
    def clean_text(s):
        if s is None:  # SQL trim(NULL) is NULL; match it (ADVICE r01)
            return None
        return re.sub(r"\s+", " ", s.strip()).lower()

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        clean_text("text").alias("clean"),
        F.length(clean_text("text")).alias("clean_len"),
    )


@query(
    "udf_pandas_vectorized",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.qv AS DOUBLE[])), 6) AS sim
    FROM embeddings e CROSS JOIN q
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized cosine (numpy inside a pandas UDF) — the same
    semantics as the HOF implementation in embeddings_ops.cosine; the
    oracle hash-checks the two against DuckDB. One Arrow batch crosses
    the JVM↔Python boundary per ~10k rows, numpy does the math."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )  # 64 floats to the driver — a bounded broadcast constant
    q = np.array(qvec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    @F.pandas_udf(DoubleType())
    def cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy()).astype(np.float64)  # (batch, 64)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return e.select("vec_id", F.round(cos("embedding"), 6).alias("sim"))


@query(
    "udaf_pandas_grouped",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           ROUND(AVG(value), 6) AS trimmed_mean
    FROM ranked
    WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
    GROUP BY event_type
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: 10%-trimmed mean per event type,
    oracled against the window-based SQL equivalent."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        arr = np.sort(v.to_numpy())
        k = int(np.floor(len(arr) * 0.1))
        return float(arr[k : len(arr) - k].mean())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean")
    )


@query(
    "udf_grouped_map",
    """
    SELECT event_id, user_id,
           ROUND((value - AVG(value) OVER (PARTITION BY user_id)) /
                 stddev_samp(value) OVER (PARTITION BY user_id), 6) AS z
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group transform: z-score events within each
    user (pandas mean/std(ddof=1) ≡ SQL avg/stddev_samp)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(6)}
        )

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id bigint, user_id bigint, z double"
    )


@query(
    "udf_map_partitions",
    """
    SELECT event_id,
           CAST(floor(value / 10) AS BIGINT) AS value_bucket,
           ROUND(ln(value + 1), 6)           AS log_value
    FROM events
    """,
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition-wise enrichment (iterator of Arrow
    batches — the shape used for batch model inference / feature
    extraction at scale, where per-batch setup cost is amortized)."""
    import numpy as np

    def enrich(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "value_bucket": np.floor(pdf["value"] / 10).astype("int64"),
                    "log_value": np.log(pdf["value"] + 1).round(6),
                }
            )

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    return ev.mapInPandas(enrich, "event_id bigint, value_bucket bigint, log_value double")


@query(
    "udtf_python",
    """
    WITH sh AS (
      SELECT doc_id, substring(text, i, 8) AS shingle
      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i
            FROM documents WHERE doc_id < 50)
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct
    FROM sh
    GROUP BY doc_id
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input doc row → many (doc_id, shingle) rows
    (8-char sliding window), then aggregated; oracled against the SQL
    generate_series twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class CharShingles:
        def eval(self, doc_id: int, text: str):
            for i in range(len(text) - 7):
                yield doc_id, text[i : i + 8]

    CharShingles = spark.udtf.register("char_shingles", CharShingles)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT s.doc_id,
               COUNT(*) AS n_shingles,
               COUNT(DISTINCT s.shingle) AS n_distinct
        FROM docs_for_udtf d, LATERAL char_shingles(d.doc_id, d.text) s
        GROUP BY s.doc_id
        """
    )


@query(
    "udf_arrow_optimized",
    """
    SELECT doc_id,
           CAST(n_chars * 2 + len(str_split(text, ' ')) AS BIGINT) AS feature
    FROM documents
    ORDER BY doc_id
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``):
    same row-wise author experience as @udf, but the engine ships
    Arrow batches instead of pickled rows — measured 1.5-3× over
    classic @udf without rewriting to pandas-UDF style. The remaining
    gap to true vectorization (pandas_udf processes whole series with
    numpy) is why the hierarchy in this module's docstring still puts
    pandas UDFs above it; useArrow is the drop-in upgrade for legacy
    @udf code. Oracled against pure SQL: the Python body must agree
    with the relational expression exactly."""

    @F.udf("long", useArrow=True)
    def doc_feature(n_chars: int, text: str) -> int:
        return n_chars * 2 + len(text.split(" "))

    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", doc_feature("n_chars", "text").alias("feature"))
        .orderBy("doc_id")
    )


@query(
    "udf_map_arrow",
    """
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_chars % 7 AS BIGINT) AS bucket
    FROM documents
    ORDER BY doc_id
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: per-partition transformation directly over
    pyarrow RecordBatches — no pandas materialization at all, the
    lowest-overhead Python extension point (pandas conversion cost
    matters when batches are wide or string-heavy). The transform
    computes a bucket column with pyarrow compute kernels; oracled
    against the SQL equivalent."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(batches):
        for batch in batches:
            n = batch.column("n_chars")
            # n % 7 from divide/multiply/subtract — this pyarrow build
            # ships no mod kernel (Arrow integer divide truncates)
            bucket = pc.subtract(n, pc.multiply(pc.divide(n, 7), 7))
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n, bucket],
                names=["doc_id", "n_chars", "bucket"],
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return d.mapInArrow(
        bucketize, "doc_id long, n_chars long, bucket long"
    ).orderBy("doc_id")


@query(
    "udtf_table_arg",
    """
    WITH ev AS (
      SELECT user_id, epoch_ns(ts) AS t, event_id
      FROM events WHERE user_id < 50
    ),
    g AS (
      SELECT user_id,
             t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS gap
      FROM ev
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(MAX(gap) // 60000000000, 0) AS BIGINT)
             AS max_gap_min
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4):
    ``gap_summary(TABLE(...) PARTITION BY user_id ORDER BY t)`` — the
    engine feeds each UDTF INSTANCE one ordered partition and
    ``terminate`` emits its summary row, the structured-stream-free
    way to run sequential per-key Python logic (state machines,
    sessionizers, protocol decoders) inside SQL. Max inter-event gap
    per user here; the window-function oracle proves the partition
    feed is complete and correctly ordered.

    At 100 TB this shape shuffles once on the PARTITION BY key and
    streams each group through Python via Arrow — same cost model as
    applyInPandas but callable from SQL and composable with lateral
    joins."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_min bigint")
    class GapSummary:
        def __init__(self):
            self._uid = None
            self._n = 0
            self._prev = None
            self._max = 0

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            t = row["t"]
            if self._prev is not None and t - self._prev > self._max:
                self._max = t - self._prev
            self._prev = t

        def terminate(self):
            if self._uid is not None:
                yield self._uid, self._n, self._max // 60_000_000_000

    spark.udtf.register("kas_gap_summary", GapSummary)
    (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", F.col("ts").alias("t"), "event_id")
        .createOrReplaceTempView("events_for_tbludtf")
    )
    return spark.sql(
        """
        SELECT * FROM kas_gap_summary(
          TABLE(events_for_tbludtf)
          PARTITION BY user_id ORDER BY (t, event_id)
        )
        ORDER BY user_id
        """
    )
