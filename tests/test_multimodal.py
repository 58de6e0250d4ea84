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


def test_resize_math_against_hand_computed_vector():
    """Anchor the 2×2 box-filter math itself on a hand-computed case —
    the build-time (strided slices) and engine-side (reshape/sum)
    implementations are independent code, but this pins BOTH to values
    computed by hand, so a shared misunderstanding can't hide.

    2×2 image, pixels chosen by hand; expected 1×1 output channel c =
    floor(mean of the four pixels' channel c)."""
    import hashlib

    from kinesis_adapter_spark.operators.multimodal import (
        _gt_resized_ppm,
        _ppm_header,
    )

    # pixels (y,x) -> (r,g,b): (0,0)=(10,20,30) (0,1)=(50,60,70)
    #                          (1,0)=(90,100,110) (1,1)=(130,141,255)
    raw = bytes([10, 20, 30, 50, 60, 70, 90, 100, 110, 130, 141, 255])
    src = _ppm_header(2, 2) + raw
    # means: r=(10+50+90+130)/4=70, g=(20+60+100+141)/4=80.25 -> 80,
    #        b=(30+70+110+255)/4=116.25 -> 116
    expected = _ppm_header(1, 1) + bytes([70, 80, 116])
    assert _gt_resized_ppm(src) == expected

    # engine-side path, exercised directly (same fn mm_resize maps)
    import numpy as np

    hdr_end = src.index(b"255\n") + 4
    pix = np.frombuffer(src, dtype=np.uint8, offset=hdr_end).reshape(2, 2, 3)
    blocks = pix.astype(np.uint16).reshape(1, 2, 1, 2, 3)
    out = (blocks.sum(axis=(1, 3)) // 4).astype(np.uint8)
    assert _ppm_header(1, 1) + out.tobytes() == expected
    assert hashlib.sha256(expected).hexdigest()  # smoke the digest path


def test_resize_matches_ground_truth_bit_exact(spark):
    """mm_resize recomputed-from-bytes output must equal the fixture's
    independently-computed ground truth for EVERY image row (dims,
    byte count, and resized-payload sha256) — the oracle parity gate
    hashes the same columns, but this fails with the media_id named."""
    out = {
        r["media_id"]: r for r in QUERIES["mm_resize"](spark, SF_TEST).collect()
    }
    gt = {
        r["media_id"]: r
        for r in spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
        .filter(F.col("media_type") == "image")
        .select("media_id", "gt_rs_n_bytes", "gt_rs_width", "gt_rs_height",
                "gt_rs_sha16", "width", "height")
        .collect()
    }
    assert out.keys() == gt.keys()
    for mid, r in out.items():
        g = gt[mid]
        assert r["n_bytes"] == g["gt_rs_n_bytes"], mid
        assert r["width"] == g["gt_rs_width"] == g["width"] // 2, mid
        assert r["height"] == g["gt_rs_height"] == g["height"] // 2, mid
        assert r["sha256_16"] == g["gt_rs_sha16"], mid


def test_image_payloads_are_real_ppm(spark):
    """Every image payload must be a well-formed P6 raster whose
    header dims agree with the typed metadata columns and whose pixel
    buffer is exactly w*h*3 bytes — the property mm_resize's honest
    decode depends on."""
    rows = (
        spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
        .filter(F.col("media_type") == "image")
        .select("payload", "width", "height")
        .collect()
    )
    assert rows
    for r in rows:
        b = bytes(r["payload"])
        assert b[:3] == b"P6\n"
        hdr_end = b.index(b"255\n") + 4
        w, h = (int(t) for t in b[3 : b.index(b"\n", 3)].split())
        assert (w, h) == (r["width"], r["height"])
        assert len(b) - hdr_end == w * h * 3


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


def test_phash_hand_computed_vector_and_shift_invariance():
    """Anchor the pHash math on a hand-computable case and pin the
    brightness-shift invariance the near-dup fixture relies on.

    8×8 image (one pixel per grid cell, bh=bw=1): cell (cy, cx) has
    RGB sum 3*(10*cy + cx) + 3 (channels contribute +0,+1,+2). Total
    = sum over all 64 cells; bit set iff cell_sum*64 > total. With
    values 0..77 the top-left half (cell sums below the mean) is 0 and
    the rest 1 — computed by hand below."""
    import numpy as np

    from kinesis_adapter_spark.operators.multimodal import (
        _phash_gt,
        _phash_one,
        _ppm_header,
    )

    cy = np.arange(8)[:, None, None]
    cx = np.arange(8)[None, :, None]
    ch = np.arange(3)[None, None, :]
    pix = (10 * cy + cx + ch).astype(np.uint8)  # max 79, no wrap
    src = _ppm_header(8, 8) + pix.tobytes()

    # hand computation: cell_sum(cy,cx) = 3*(10cy + cx) + 3;
    # total = 3*(10*28*8 + 28*8 + 64) = 3*(2240+224+64) = 7584;
    # bit = 64*(30cy+3cx+3) > 7584  <=>  10cy + cx > 38.5
    expected_bits = 0
    for y in range(8):
        for x in range(8):
            expected_bits = (expected_bits << 1) | (1 if 10 * y + x > 38.5 else 0)
    expected = f"{expected_bits:016x}"
    assert _phash_gt(src) == expected
    assert _phash_one(src) == expected

    # brightness shift: +10 everywhere (no clamp) must not change any bit
    shifted = _ppm_header(8, 8) + (pix + 10).astype(np.uint8).tobytes()
    assert _phash_one(shifted) == expected
    assert _phash_gt(shifted) == expected


def test_phash_dedup_finds_every_planted_twin(spark):
    """Every brightness-shifted twin (media_id + 5M, planted for every
    5th image) must pair with its source — sha256 dedup provably CAN'T
    find these (the bytes differ everywhere), which is the point of
    the perceptual hash."""
    from kinesis_adapter_spark.operators.multimodal import NEAR_DUP_ID_OFFSET

    pairs = {
        (r.id_a, r.id_b)
        for r in QUERIES["dedup_image_phash"](spark, SF_TEST).collect()
    }
    media = spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
    twins = [
        r.media_id
        for r in media.filter(
            F.col("media_id") >= NEAR_DUP_ID_OFFSET
        ).collect()
    ]
    assert twins, "fixture must plant near-dup twins"
    for t in twins:
        assert (t - NEAR_DUP_ID_OFFSET, t) in pairs, f"twin pair for {t} missed"
    # and byte-identity dedup indeed misses them: distinct sha256 everywhere
    n_payload_dups = (
        media.filter(F.col("media_type") == "image")
        .groupBy("gt_sha256_16")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert n_payload_dups == 0


def test_wav_features_hand_computed_vector():
    """Anchor the WAV parse + feature math on a hand-computed case:
    4 samples [100, -200, 300, 0] → sum_sq = 10000+40000+90000+0 =
    140000; zero crossings with sign := (s >= 0): +,-,+,+ → flips at
    i=1 and i=2 → 2; duration = 4*1000//8000 = 0 ms."""
    import struct

    from kinesis_adapter_spark.operators.multimodal import (
        AUDIO_SR,
        _audio_gt,
        _wav_features_one,
    )

    samples = struct.pack("<4h", 100, -200, 300, 0)
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(samples))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, AUDIO_SR, AUDIO_SR * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    expected = (4, 0, 140000, 2)
    assert _audio_gt(wav) == expected
    assert _wav_features_one(wav) == expected


def test_video_stream_parse_hand_computed():
    """A hand-built 2-frame P6 stream must split at exactly the frame
    boundaries in BOTH the build-time re-parser and an engine-style
    walk, and a corrupted boundary must raise, not resync silently."""
    import pytest as _pytest

    from kinesis_adapter_spark.operators.multimodal import (
        _ppm_header,
        _video_frames_gt,
    )

    f0 = _ppm_header(2, 1) + bytes([1, 2, 3, 4, 5, 6])
    f1 = _ppm_header(1, 2) + bytes([9, 8, 7, 6, 5, 4])
    frames = _video_frames_gt(f0 + f1)
    assert frames == [f0, f1]
    with _pytest.raises(AssertionError):
        _video_frames_gt(f0[:-1] + f1)  # truncated frame shifts boundary


def test_audio_video_match_ground_truth_bit_exact(spark):
    """Every audio row's recomputed features and every sampled frame
    digest must equal the fixture's independently-built ground truth —
    fails with the media_id named (the oracle gate hashes the same
    values but anonymously)."""
    media = spark.read.parquet(str(ensure_media_parquet(SF_TEST)))
    au = {
        r["media_id"]: (r["n_samples"], r["duration_ms"], r["sum_sq"],
                        r["zero_crossings"])
        for r in QUERIES["mm_audio_features"](spark, SF_TEST).collect()
    }
    gt = {
        r["media_id"]: (r["gt_au_n_samples"], r["gt_au_duration_ms"],
                        r["gt_au_sumsq"], r["gt_au_zero_cross"])
        for r in media.filter(F.col("media_type") == "audio").collect()
    }
    assert au == gt
    frames = {
        (r["media_id"], r["frame_id"]): r["frame_sha16"]
        for r in QUERIES["mm_video_frame_extract"](spark, SF_TEST).collect()
    }
    from kinesis_adapter_spark.sources.scans import derived_dir

    gt_frames = {
        (r["media_id"], r["frame_id"]): r["gt_frame_sha16"]
        for r in spark.read.parquet(
            str(derived_dir(SF_TEST) / "media_frames.parquet")
        ).collect()
    }
    assert frames == gt_frames
    # sanity: sampling stride — every video has ceil(n_frames/12) rows
    vids = {
        r["media_id"]: r["n_frames"]
        for r in media.filter(F.col("media_type") == "video").collect()
    }
    from collections import Counter

    per_vid = Counter(mid for mid, _ in frames)
    assert per_vid == {m: (n + 11) // 12 for m, n in vids.items()}
