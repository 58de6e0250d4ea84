"""Schema gate for the fixture catalog (VERDICT r03 items #1/#4).

The round-2 fixture regeneration silently retyped ``events.ts`` from
INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and 23 keys rotted for two
rounds. ``catalog.load`` now canonicalizes and validates at the single
choke point; this suite pins that contract for every table at every SF
so the NEXT drift is one loud, named failure.
"""

from __future__ import annotations

import pytest

from kinesis_adapter_spark import catalog


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
])
@pytest.mark.parametrize("table", catalog.TABLES)
def test_post_load_schema_is_canonical(spark, sf_dir, table):
    df = catalog.load(spark, sf_dir, table)
    expected = spark.createDataFrame([], catalog.SCHEMAS[table]).schema
    got = df.schema
    assert [f.name for f in got.fields] == [f.name for f in expected.fields]
    for ef, gf in zip(expected.fields, got.fields):
        et, gt = ef.dataType.typeName(), gf.dataType.typeName()
        assert et == gt or {et, gt} <= catalog._TS_TYPES, (
            f"{table}.{ef.name}: expected {et}, got {gt}"
        )


def test_events_ts_is_epoch_ns(spark):
    """The load contract: ts is BIGINT ns-since-epoch, µs-aligned under
    the current fixture generation, and consistent with events_with_time."""
    ev = catalog.load(spark, "/root/testdata/sf0.001", "events")
    assert ev.schema["ts"].dataType.typeName() == "long"
    row = ev.selectExpr(
        "min(ts) AS lo",
        "max(ts) AS hi",
        "max(ts % 1000) AS sub_us",
    ).first()
    # epoch-ns magnitude (year 2000+ is ~9.5e17 ns; µs misread ~9.5e14)
    assert row.lo > 10**17, f"ts not in ns magnitude: min={row.lo}"
    assert row.hi < 4 * 10**18
    assert row.sub_us == 0  # µs-typed fixture → ns values µs-aligned


def test_validate_rejects_drift(spark):
    """The gate must fail loudly on a retyped column, not downstream."""
    ev = spark.range(1).selectExpr(
        "id AS event_id",
        "CAST(id AS STRING) AS ts",  # wrong type on purpose
        "id AS user_id",
        "'x' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    with pytest.raises(TypeError, match="fixture drift|events.ts"):
        catalog._validate(spark, "events", ev)

def test_memo_evicts_stopped_sessions(spark):
    """ADVICE r4: the DF memo must not retain relations for stopped
    sessions forever — dead entries are swept on the next insert."""
    catalog.load(spark, "/root/testdata/sf0.001", "region")
    n_before = len(catalog._DF_MEMO)
    # forge an entry whose "session" reports stopped (anything lacking
    # ._sc._jsc is treated as stopped by the sweep)
    class _Dead:
        pass

    catalog._DF_MEMO[(id(_Dead), "/x", "region")] = (_Dead(), None)
    # an insert (forced by dropping nation's memo entry) triggers the sweep
    catalog._DF_MEMO.pop((id(spark), "/root/testdata/sf0.001", "nation"), None)
    catalog.load(spark, "/root/testdata/sf0.001", "nation")
    assert (id(_Dead), "/x", "region") not in catalog._DF_MEMO
    # live entries survive
    assert len(catalog._DF_MEMO) >= n_before
    assert catalog.load(spark, "/root/testdata/sf0.001", "region") is not None


def test_memo_drops_aliased_entry(spark):
    """If id() reuse ever lands a new session on a memoized address,
    the stale entry is deleted (not just bypassed) on first touch."""
    key = (id(spark), "/root/testdata/sf0.001", "supplier")
    df = catalog.load(spark, "/root/testdata/sf0.001", "supplier")

    class _Other:
        _sc = None  # looks stopped to the sweep as well

    catalog._DF_MEMO[key] = (_Other(), df)
    out = catalog.load(spark, "/root/testdata/sf0.001", "supplier")
    assert catalog._DF_MEMO[key][0] is spark
    assert out is not None


def test_fresh_staging_rebuilds_on_source_change(tmp_path):
    """r5 review: derived caches must rebuild when their SOURCE data
    changes at the same path (regenerated testdata / re-materialized
    scaled dirs), not trust a bare _SUCCESS marker."""
    import os
    import time

    from kinesis_adapter_spark.sources.scans import fresh_staging

    src = tmp_path / "src.parquet"
    src.write_bytes(b"gen-one")
    out = tmp_path / "derived"

    staging = fresh_staging(out, src)
    assert staging is not None
    marker, fp = staging
    (out / "data.txt").write_text("staged-from-gen-one")
    marker.write_text(fp)

    # unchanged source -> cache hit
    assert fresh_staging(out, src) is None
    assert (out / "data.txt").read_text() == "staged-from-gen-one"

    # regenerate the source (new mtime/size) -> stale dir is cleared
    time.sleep(0.01)
    src.write_bytes(b"gen-two!!")
    os.utime(src)
    staging2 = fresh_staging(out, src)
    assert staging2 is not None
    assert not (out / "data.txt").exists(), "stale staging survived"
