"""Multimodal binary-column operators (north-star mandate: image/audio/
video as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample over Arrow-batched Pandas UDFs).

No media libraries exist in this container, so the DECODE step is a
deterministic stub (``_fake_decode``) clearly marked as such — the
Spark-side plumbing (binary schema, Arrow transport into mapInPandas,
batch shapes, partition behavior, typed-metadata pruning) is real and
oracled:

- the derived ``media.parquet`` fixture stores, next to each payload,
  ground-truth feature columns computed by PLAIN PYTHON at fixture
  build time;
- the Spark pipeline recomputes those features FROM THE RAW BYTES via
  ``mapInPandas``/numpy, and the DuckDB oracle reads the stored
  ground truth — so a hash-match proves the whole binary round-trip
  (parquet → JVM → Arrow → pandas → numpy) is lossless.

At 100 TB: payloads live in parquet binary columns partitioned by
``media_type`` (so single-modality pipelines prune partitions), with
metadata in typed columns so planning-time filters never touch bytes;
mapInPandas keeps decode vectorized per Arrow batch and scales by
partition count, and ``spark.sql.files.maxPartitionBytes`` bounds the
per-task byte load.
"""

from __future__ import annotations

import hashlib
import os

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.plans.registry import query
from kinesis_adapter_spark.sources.scans import DERIVED_ROOT, derived_dir

MEDIA_TYPES = ("image", "audio", "video")


def _payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic pseudo-media bytes for one document."""
    seed = hashlib.sha256(f"media-{doc_id}".encode()).digest()
    length = 256 + (n_chars % 1024)
    return (seed * (length // len(seed) + 1))[:length]


def ensure_media_parquet(sf_dir: str) -> Path:
    """Derive media.parquet from documents: binary payload + typed
    metadata + plain-Python ground-truth feature columns."""
    out = derived_dir(sf_dir) / "media.parquet"
    if out.exists():
        return out
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas()
    rows = {
        "media_id": [],
        "media_type": [],
        "payload": [],
        "width": [],
        "height": [],
        "sample_rate": [],
        "n_frames": [],
        "fps": [],
        # ground truth (computed OUTSIDE Spark; the oracle reads these)
        "gt_n_bytes": [],
        "gt_byte_mean": [],
        "gt_sha256_16": [],
    }
    for doc_id, n_chars in zip(docs["doc_id"], docs["n_chars"]):
        doc_id, n_chars = int(doc_id), int(n_chars)
        mt = MEDIA_TYPES[doc_id % 3]
        p = _payload(doc_id, n_chars)
        rows["media_id"].append(doc_id)
        rows["media_type"].append(mt)
        rows["payload"].append(p)
        rows["width"].append(64 + doc_id % 64 if mt == "image" else None)
        rows["height"].append(48 + doc_id % 48 if mt == "image" else None)
        rows["sample_rate"].append(8000 if mt == "audio" else None)
        rows["n_frames"].append(24 + doc_id % 96 if mt == "video" else None)
        rows["fps"].append(12 if mt == "video" else None)
        rows["gt_n_bytes"].append(len(p))
        rows["gt_byte_mean"].append(round(sum(p) / len(p), 6))
        rows["gt_sha256_16"].append(hashlib.sha256(p).hexdigest()[:16])
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("media_type", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
            ("n_frames", pa.int32()),
            ("fps", pa.int32()),
            ("gt_n_bytes", pa.int64()),
            ("gt_byte_mean", pa.float64()),
            ("gt_sha256_16", pa.string()),
        ]
    )
    tmp = out.with_suffix(".tmp")
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, out)
    return out


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(str(ensure_media_parquet(sf_dir)))


# Oracle path constant: tracks DERIVED_ROOT so a staged-fixture version
# bump can never strand the oracles on a stale directory.
_MEDIA_ORACLE_PATH = str(DERIVED_ROOT / "sf0.01" / "media.parquet")

# NOTE: oracle SQL paths point at the sf0.01 staging dir — the scale
# the driver (and the local parity gate) oracles at. The Spark side of
# each key stages the fixture before the oracle runs.


@query(
    "mm_decode_features",
    f"""
    SELECT media_id, media_type, gt_n_bytes AS n_bytes,
           gt_byte_mean AS byte_mean, gt_sha256_16 AS sha256_16
    FROM read_parquet('{_MEDIA_ORACLE_PATH}')
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-featurize over mapInPandas: recompute byte stats from
    the RAW binary column with numpy per Arrow batch; the oracle reads
    the plain-Python ground truth stored in the fixture, so a match
    proves the binary Arrow round-trip bit-exact."""
    import numpy as np
    import pandas as pd

    def featurize(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda b: round(
                            float(np.frombuffer(b, dtype=np.uint8).mean()), 6
                        )
                    ),
                    "sha256_16": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()[:16]
                    ),
                }
            )

    return _media(spark, sf_dir).mapInPandas(
        featurize,
        "media_id bigint, media_type string, n_bytes bigint, "
        "byte_mean double, sha256_16 string",
    )


@query(
    "mm_metadata_profile",
    f"""
    SELECT media_type, COUNT(*) AS n,
           CAST(SUM(gt_n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(width) AS INT) AS max_width,
           CAST(MAX(n_frames) AS INT) AS max_frames
    FROM read_parquet('{_MEDIA_ORACLE_PATH}')
    GROUP BY media_type
    """,
)
def mm_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality profile over typed metadata plus payload sizes.
    Everything except the length() probe is planned off the small typed
    columns; a variant that drops total_bytes prunes payload from
    ReadSchema entirely — at 100 TB that is the difference between
    scanning kilobytes of metadata and scanning every blob."""
    return (
        _media(spark, sf_dir)
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("n_frames").alias("max_frames"),
        )
    )


@query(
    "mm_frame_sample",
    f"""
    SELECT media_id, CAST(f.frame_id AS BIGINT) AS frame_id
    FROM read_parquet('{_MEDIA_ORACLE_PATH}'),
         LATERAL (SELECT unnest(range(0, CAST(n_frames AS BIGINT), CAST(fps AS BIGINT)))
                  AS frame_id) f
    WHERE media_type = 'video'
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (every fps-th index, i.e. ~1/sec) — pure JVM sequence+explode on
    metadata; the per-frame DECODE would hang off this skeleton as a
    mapInPandas stage (stubbed here — no codecs in this container)."""
    v = _media(spark, sf_dir).filter(F.col("media_type") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames").cast("long") - 1,
                       F.col("fps").cast("long"))
        ).alias("frame_id"),
    )


@query(
    "pipeline_multimodal_curation",
    f"""
    SELECT d.lang, m.media_type,
           COUNT(*) AS n_docs,
           CAST(SUM(m.gt_n_bytes) AS BIGINT) AS total_media_bytes,
           ROUND(AVG(sqrt(list_aggregate(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6)
             AS avg_emb_norm
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    JOIN read_parquet('{_MEDIA_ORACLE_PATH}') m
      ON d.doc_id = m.media_id
    WHERE d.n_chars >= 100
    GROUP BY d.lang, m.media_type
    """,
)
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality curation composite: text ⋈ vector ⋈ binary media
    on the shared id, quality filter on text length, per (lang,
    media_type) accounting of corpus size in bytes and embedding norms
    — the shape of a real multimodal training-set audit, in ONE plan
    (both joins broadcast the bounded side at this sf; at 100 TB all
    three tables co-bucket on the id and the joins are exchange-free)."""
    from kinesis_adapter_spark.catalog import load as _load

    d = _load(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    e = _load(spark, sf_dir, "embeddings")
    m = _media(spark, sf_dir)
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    norm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda s, x: s + x))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .join(m, d.doc_id == m.media_id)
        .groupBy("lang", "media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("payload")).alias("total_media_bytes"),
            F.round(F.avg(norm), 6).alias("avg_emb_norm"),
        )
    )


@query("mm_resize_stub")  # T3: stubbed decoder — shape/determinism in pytest
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image 'resize' with the decode step STUBBED: a real deployment
    replaces ``_fake_decode`` with PIL/libvips inside the same
    mapInPandas signature. The fake path is deterministic (keep every
    2nd byte; halve dims) so the plumbing — binary in, binary out,
    metadata transform, Arrow batching — is fully testable."""
    import pandas as pd

    def _fake_decode(payload: bytes) -> bytes:
        # STUB: stands in for image decode+resample. Deterministic.
        return payload[::2]

    def resize(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(_fake_decode),
                    "width": (pdf["width"] // 2).astype("int32"),
                    "height": (pdf["height"] // 2).astype("int32"),
                }
            )
            yield out

    return (
        _media(spark, sf_dir)
        .filter(F.col("media_type") == "image")
        .mapInPandas(resize, "media_id bigint, payload binary, width int, height int")
        .select("media_id", F.length("payload").alias("n_bytes"), "width", "height")
    )
