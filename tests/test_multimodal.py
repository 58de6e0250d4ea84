"""Multimodal binary plumbing checks the oracle can't express:
Arrow round-trip of binary columns, stubbed-decode determinism, typed
metadata nullability per modality, and column pruning of payloads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_adapter_spark.operators.multimodal import ensure_media_parquet
from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules
from tests.oracle import SF_TEST

load_all_modules()


def test_media_fixture_schema_and_modalities(spark):
    df = spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
    assert dict(df.dtypes)["payload"] == "binary"
    by_type = {r["media_type"]: r for r in df.groupBy("media_type").count().collect()}
    assert set(by_type) == {"image", "audio", "video"}
    # typed metadata is modality-scoped: width only on images, etc.
    bad = df.filter(
        ((F.col("media_type") == "image") & F.col("width").isNull())
        | ((F.col("media_type") != "image") & F.col("width").isNotNull())
        | ((F.col("media_type") == "video") & F.col("n_frames").isNull())
    ).count()
    assert bad == 0


def test_resize_stub_is_deterministic_and_halves(spark):
    a = {r["media_id"]: tuple(r) for r in QUERIES["mm_resize_stub"](spark, SF_TEST).collect()}
    b = {r["media_id"]: tuple(r) for r in QUERIES["mm_resize_stub"](spark, SF_TEST).collect()}
    assert a == b, "stubbed decode must be deterministic"
    src = {
        r["media_id"]: r
        for r in spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
        .filter(F.col("media_type") == "image")
        .select("media_id", F.length("payload").alias("n"), "width", "height")
        .collect()
    }
    assert a.keys() == src.keys()
    for mid, (_, n_bytes, w, h) in a.items():
        assert n_bytes == (src[mid]["n"] + 1) // 2  # every 2nd byte kept
        assert w == src[mid]["width"] // 2 and h == src[mid]["height"] // 2


def test_payload_pruned_when_only_metadata_needed(spark):
    """A metadata-only projection must not read the payload column —
    ReadSchema in the parquet scan is the 100 TB guard."""
    df = (
        spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
        .filter(F.col("media_type") == "video")
        .select("media_id", "n_frames", "fps")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, "payload must be pruned from the scan"


def test_decode_features_batch_plumbing(spark):
    """mapInPandas output must cover every row exactly once even when
    the scan splits into multiple partitions (batch boundaries)."""
    out = QUERIES["mm_decode_features"](spark, SF_TEST)
    n_src = spark.read.parquet(str(ensure_media_parquet(SF_TEST))).count()
    assert out.count() == n_src
    assert out.select("media_id").distinct().count() == n_src
