"""Scan sources and sinks (SURVEY.md §2.1-A).

CSV/NDJSON fixtures are derived from the parquet tables into
/tmp/kas_derived/<sf-basename>/ (never into the read-only testdata
dir). Numeric formatting is pinned (%.2f for the 2-decimal `value`)
so text round-trips reproduce the exact doubles, letting the oracles
compare against the ORIGINAL events view — i.e. the whole
export→parse path must be lossless to pass.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_adapter_spark.catalog import load
from kinesis_adapter_spark.plans.registry import query
from kinesis_adapter_spark.sources import aws

# Bump the version when any derived-fixture FORMAT changes: staged
# fixtures are cached by existence checks, so a format change without a
# new directory would silently serve stale data to later runs.
# v2: fixtures changed events.ts to timestamp[us] — ts_ns derivation
# fixed accordingly; v1 dirs may hold data staged from ns-era files.
# v3: media.parquet image payloads became real P6 PPM rasters with
# resize ground-truth columns (mm_resize replaced mm_resize_stub);
# v2 dirs hold the old pseudo-byte image payloads.
# v4: image pixel base became mod-200 (headroom for brightness-shifted
# near-dup twin rows, media_id + 5M) and gt_phash joined the media
# fixture for dedup_image_phash; v3 dirs lack the twins.
# v5: audio payloads became real RIFF/WAVE PCM16 and video payloads
# real netpbm P6 streams, with gt_au_* columns and a
# media_frames.parquet ground-truth table; v4 dirs hold pseudo-bytes
# for those modalities.
DERIVED_VERSION = "v5"
DERIVED_ROOT = Path("/tmp/kas_derived") / DERIVED_VERSION


def derived_dir(sf_dir: str) -> Path:
    d = DERIVED_ROOT / Path(sf_dir).name
    d.mkdir(parents=True, exist_ok=True)
    return d


def source_fingerprint(src: Path) -> str:
    """Identity of a staged dir's SOURCE data: sizes + mtimes of the
    files it derives from. Stored in the derived dir's _SUCCESS marker
    and compared on reuse — derived_dir keys by basename only, so a
    rebuilt source at the same path (a regenerated /root/testdata, or
    scale_smoke re-materializing /tmp/kas_scale_xN after a fingerprint
    mismatch) would otherwise silently serve stale staged data to
    every later run (the ADVICE-r4 drift class)."""
    if src.is_file():
        files = [src]
    else:
        files = sorted(p for p in src.rglob("*") if p.is_file() and p.name != "_SUCCESS")
    parts = []
    for p in files:
        st = p.stat()
        parts.append(f"{p.name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def fresh_staging(out: Path, src: Path) -> tuple[Path, str] | None:
    """Return (marker, fingerprint) if ``out`` must be (re)staged from
    ``src``; None when the cached staging is current. On a stale cache
    the directory is cleared first."""
    marker = out / "_SUCCESS"
    fp = source_fingerprint(src)
    if marker.exists() and marker.read_text() == fp:
        return None
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    return marker, fp


def publish_fingerprinted(base: Path, fp: str, stage_fn) -> Path:
    """Content-addressed publication of a derived DIRECTORY artifact
    (VERDICT r14 item #3): the final directory name embeds a hash of
    the source fingerprint and is NEVER deleted or renamed-over once
    published, so a reader holding the returned path can never hit the
    delete-then-rename window a shared mutable name has when the
    fingerprint changes (second-order: two concurrent engines on one
    host). A fingerprint change simply publishes a NEW sibling; stale
    siblings are collected by :func:`reap_stale_fingerprints`.

    Concurrency: each stager builds under a pid-unique dot-tmp; the
    first ``os.rename`` wins, a loser discards its tmp and reads the
    winner's copy (content is deterministic from the fingerprinted
    source, so copies are interchangeable). ``stage_fn(tmp_path)``
    must create the artifact at exactly ``tmp_path``.
    """
    import hashlib

    tag = hashlib.md5(fp.encode()).hexdigest()[:16]
    final = base.parent / f"{base.stem}-{tag}{base.suffix}"
    if final.exists():
        return final
    tmp = base.parent / f".{final.name}.tmp-{os.getpid()}"
    # a prior attempt in THIS process may have left the tmp behind
    # (stage_fn raised before the rename): clear it so a retry with a
    # default-errorifexists stage_fn cannot fail on its own leftovers
    # (ADVICE r15)
    shutil.rmtree(tmp, ignore_errors=True)
    stage_fn(str(tmp))
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(str(tmp), ignore_errors=True)  # concurrent winner
    if not final.exists():
        raise RuntimeError(
            f"fingerprinted artifact publish failed: {final} does not "
            "exist after rename (and no concurrent publisher supplied "
            "it). Check staging-dir permissions/space; the tmp staging "
            "was cleaned up."
        )
    return final


def reap_stale_fingerprints(
    base: Path, keep: Path, grace_sec: float = 1800.0
) -> list[str]:
    """Collect dead-fingerprint siblings of a content-addressed
    artifact: every ``{base.stem}-*{base.suffix}`` entry other than
    ``keep``, plus the legacy unfingerprinted ``base`` itself (and its
    ``.src`` marker) from the pre-r15 mutable-name scheme. Deletion is
    deferred while (a) the entry was published less than ``grace_sec``
    ago or (b) another live kas run exists on this host — a concurrent
    engine may still hold the stale path (it corresponds to
    regenerated source data, so it is semantically dead, but it must
    not FileNotFound mid-query). Returns the reaped names.

    ASSUMPTION (VERDICT r15 'what's wrong' #3, documented rather than
    closed): a frame returned by THIS process from an older
    fingerprint is not protected once ``grace_sec`` has passed — the
    own-process holder case. That window is unreachable while source
    dirs are immutable for the life of a run (fingerprints only change
    when the bytes under ``sf_dir`` change: true for /root/testdata
    and for scale_smoke dirs, which re-materialize before any engine
    run), so the grace covers only the cross-process republish storm.
    A deployment with in-run-mutable sources must defer reaping while
    its own run-root is live (tie the grace to run-root liveness) —
    pinned by tests/test_catalog.py::
    test_reap_same_process_window_is_documented_behavior."""
    from kinesis_adapter_spark import staging

    now = time.time()
    reaped = []
    candidates = [
        p
        for p in base.parent.glob(f"{base.stem}-*{base.suffix}")
        if p != keep
    ]
    legacy = base.parent / base.name
    if legacy.exists():
        candidates.append(legacy)
    # abandoned pid-tagged tmps (stager SIGKILLed mid-publish): reap
    # only when the owning pid is dead, same age grace
    for p in base.parent.glob(f".{base.stem}-*{base.suffix}.tmp-*"):
        try:
            owner = int(p.name.rsplit("-", 1)[-1])
        except ValueError:
            continue
        if not staging._pid_alive(owner):
            candidates.append(p)
    for p in candidates:
        try:
            if now - p.stat().st_mtime < grace_sec:
                continue
        except OSError:
            continue  # raced another reaper
        if staging.live_foreign_runs():
            break
        shutil.rmtree(str(p), ignore_errors=True)
        src_marker = p.parent / f"{p.name}.src"
        if src_marker.exists():
            src_marker.unlink(missing_ok=True)
        reaped.append(p.name)
    return reaped


def _events_table(sf_dir: str):
    """events as pandas with ``ts`` canonicalized to int64 epoch-ns.

    Mirrors ``catalog._canonicalize``: fixtures have shipped ts as both
    INT64 ns (arrives as int64) and timestamp[us] (arrives as
    datetime64); both normalize to the same epoch-ns long here so the
    staged text exports always carry true nanoseconds.
    """
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ts = pdf["ts"]
    if ts.dtype.kind == "M":  # datetime64[*] → ns long
        ts = ts.astype("datetime64[ns]").astype("int64")
    else:
        ts = ts.astype("int64")
    return pdf.assign(ts=ts)


def ensure_events_csv(sf_dir: str) -> Path:
    """events → single CSV (event_id,user_id,event_type,value).

    Single-file staging, so the source fingerprint lives in a sibling
    `.src` marker instead of a dir _SUCCESS (same invalidation contract
    as fresh_staging — a regenerated events.parquet at the same path
    must rebuild, never serve the stale CSV)."""
    out = derived_dir(sf_dir) / "events.csv"
    marker = derived_dir(sf_dir) / "events.csv.src"
    fp = source_fingerprint(Path(sf_dir) / "events.parquet")
    if not out.exists() or not marker.exists() or marker.read_text() != fp:
        pdf = _events_table(sf_dir)[["event_id", "user_id", "event_type", "value"]]
        tmp = out.with_suffix(".tmp")
        pdf.to_csv(tmp, index=False, float_format="%.2f")
        os.replace(tmp, out)
        marker.write_text(fp)
    return out


def ensure_events_ndjson(sf_dir: str) -> Path:
    """events → NDJSON files split by day (stands in for S3 objects).

    ts is exported as an ISO-µs string (the oracle's precision — DuckDB
    reads parquet NANOS at µs, SURVEY.md §5.3) plus the raw ns long.
    """
    out = derived_dir(sf_dir) / "events_ndjson"
    staging = fresh_staging(out, Path(sf_dir) / "events.parquet")
    if staging is not None:
        done, fp = staging
        pdf = _events_table(sf_dir).sort_values("event_id")
        ts = pdf["ts"].astype("int64")
        pdf = pdf.assign(
            ts_ns=ts,
            ts_iso=(ts // 1000 * 1000)
            .pipe(lambda s: s.astype("datetime64[ns]"))
            .dt.strftime("%Y-%m-%dT%H:%M:%S.%f"),
            day=ts.astype("datetime64[ns]").dt.strftime("%Y%m%d"),
        )
        for day, grp in pdf.groupby("day"):
            with open(out / f"events-{day}.json.tmp", "w") as f:
                for r in grp.itertuples():
                    f.write(
                        json.dumps(
                            {
                                "event_id": int(r.event_id),
                                "ts_iso": r.ts_iso,
                                "ts_ns": int(r.ts_ns),
                                "user_id": int(r.user_id),
                                "event_type": r.event_type,
                                "value": round(float(r.value), 2),
                                "props": r.props,
                            }
                        )
                        + "\n"
                    )
            os.replace(out / f"events-{day}.json.tmp", out / f"events-{day}.json")
        done.write_text(fp)
    return out


EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts_iso TIMESTAMP, ts_ns BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


@query(
    "scan_parquet",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar parquet scan with projection + pushed filter: the scan
    node must show PushedFilters [EqualTo(l_returnflag,R)] and a 4-col
    ReadSchema (asserted in tests/test_plans.py)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "scan_csv",
    """
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed CSV read of the derived export; the oracle reads the
    ORIGINAL parquet, so the parquet→CSV→parse round-trip must be
    value-exact to hash-match."""
    path = ensure_events_csv(sf_dir)
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).csv(str(path), header=True)


@query(
    "roundtrip_orc",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    """,
)
def roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read round trip (the other columnar format Spark
    ships natively): orders → ORC → scan back. The oracle reads the
    ORIGINAL parquet, so the round trip must be value-exact. ORC gets
    the same pushdown/pruning treatment as parquet at the scan."""
    out = derived_dir(sf_dir) / "orders_orc"
    staging = fresh_staging(out, Path(sf_dir) / "orders.parquet")
    if staging is not None:
        done, fp = staging
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .orc(str(out))
        )
        done.write_text(fp)  # after Spark's own empty _SUCCESS
    return spark.read.orc(str(out))


@query(
    "scan_json",
    """
    SELECT event_id, user_id, event_type, value,
           epoch_ns(ts) AS ts_ns
    FROM events
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd NDJSON read (the reference's decode stage: S3 objects
    hold newline-delimited JSON records — SURVEY.md §2.0)."""
    path = ensure_events_ndjson(sf_dir)
    return (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .json(str(path))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            # exported ts_ns keeps full ns fidelity; the oracle sees µs
            (F.col("ts_ns") - F.col("ts_ns") % 1000).alias("ts_ns"),
        )
    )


@query(
    "sink_parquet_partitioned",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents partitioned by lang, read back, aggregate.

    partitionBy(lang) is the layout primitive behind partition pruning
    at 100 TB (scan only the partitions a filter names). The oracle
    aggregates the ORIGINAL documents table, so write+read must be
    lossless.
    """
    out = derived_dir(sf_dir) / "docs_by_lang.parquet"
    d = load(spark, sf_dir, "documents")
    d.write.mode("overwrite").partitionBy("lang").parquet(str(out))
    back = spark.read.parquet(str(out))
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "source_s3_moto",
    """
    SELECT event_id, user_id, event_type FROM events
    """,
)
def source_s3_moto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SOURCE stage: list an S3 prefix, fetch objects,
    decode NDJSON (SURVEY.md §2.0 row 1). S3 is moto-served; objects
    are downloaded to a local staging dir and scanned with the same
    schema'd json reader (no hadoop-aws jar in this env — with one,
    this becomes spark.read.json('s3a://...') unchanged otherwise)."""
    ndjson = ensure_events_ndjson(sf_dir)
    s3 = aws.client("s3")
    bucket = f"kas-src-{Path(sf_dir).name.replace('.', '-')}"
    try:
        s3.create_bucket(Bucket=bucket)
    except Exception:
        pass  # bucket already exists from a prior call — idempotent staging
    staged = derived_dir(sf_dir) / "s3_download"
    staged.mkdir(exist_ok=True)
    for f in sorted(ndjson.glob("events-*.json")):
        key = f"incoming/{f.name}"
        try:
            s3.head_object(Bucket=bucket, Key=key)
        except Exception:
            s3.upload_file(str(f), bucket, key)
    listed = s3.list_objects_v2(Bucket=bucket, Prefix="incoming/")
    for obj in listed.get("Contents", []):
        dest = staged / Path(obj["Key"]).name
        if not dest.exists():
            s3.download_file(bucket, obj["Key"], str(dest))
    return (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .json(str(staged))
        .select("event_id", "user_id", "event_type")
    )


@query(
    "sink_kinesis",
    """
    SELECT event_id, event_type FROM events
    """,
)
def sink_kinesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SINK stage, batch form: partition-parallel
    PutRecords (≤500/call, retry w/ backoff) into moto Kinesis, then
    drain all shards and hand the payloads back as a DataFrame — the
    oracle compares against the original events, so the full
    serialize→put→shard→get round-trip must be lossless.

    Writes run in ``foreachPartition`` on executors (each worker owns
    its partition's batches — the production shape); the read-back
    drain is driver-side by nature of the check."""
    stream = f"kas-sink-{uuid.uuid4().hex[:10]}"
    aws.create_stream(stream, shards=4)
    endpoint = aws.endpoint_url()
    kw = dict(aws.AWS_KW)

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")

    def write_partition(rows):
        # Self-contained: executors may not have this package on their
        # sys.path, so the chunk/retry loop is inlined (mirrors
        # aws.put_records_with_retry, which tests cover directly).
        import json as _json
        import time as _time

        import boto3 as _boto3

        kin = _boto3.client("kinesis", endpoint_url=endpoint, **kw)
        recs = [
            {
                "Data": _json.dumps(
                    {"event_id": r.event_id, "event_type": r.event_type}
                ).encode(),
                "PartitionKey": str(r.user_id % 4),
            }
            for r in rows
        ]
        for i in range(0, len(recs), 500):
            chunk = recs[i : i + 500]
            attempt = 0
            while chunk:
                resp = kin.put_records(StreamName=stream, Records=chunk)
                if not resp.get("FailedRecordCount"):
                    break
                chunk = [
                    rec for rec, st in zip(chunk, resp["Records"]) if "ErrorCode" in st
                ]
                attempt += 1
                if attempt > 5:
                    raise RuntimeError("kinesis put failed after retries")
                _time.sleep(0.05 * (2**attempt))

    ev.foreachPartition(write_partition)

    records = aws.read_all_records(stream)
    payloads = [json.loads(r["Data"]) for r in records]
    # Fresh uuid stream per run (ADVICE r01): no distinct() masking —
    # a duplicate delivery must fail the losslessness check loudly.
    n_unique = len({tuple(sorted(p.items())) for p in payloads})
    if n_unique != len(payloads):
        raise RuntimeError(
            f"duplicate Kinesis delivery: {len(payloads)} records, "
            f"{n_unique} unique"
        )
    return spark.createDataFrame(payloads, "event_id BIGINT, event_type STRING")


N_BAD_LINES = 7


def ensure_events_ndjson_dirty(sf_dir: str) -> Path:
    """events NDJSON + one extra file of N_BAD_LINES malformed records
    (truncated JSON, bare words, wrong-type field) — the realistic
    state of any at-scale ingest directory."""
    clean = ensure_events_ndjson(sf_dir)
    out = derived_dir(sf_dir) / "events_ndjson_dirty"
    staging = fresh_staging(out, clean)
    if staging is not None:
        done, fp = staging
        for f in clean.glob("events-*.json"):
            target = out / f.name
            if not target.exists():
                target.write_bytes(f.read_bytes())
        bad = [
            '{"event_id": 1, "user_id": ',  # truncated mid-token
            "not json at all",
            '{"event_id": "NaN-ish", "user_id": {}}',  # wrong nesting
            '[1, 2, 3',  # unterminated array
            '{"event_id":, "user_id": 2}',  # missing value
            '{broken: true}',  # unquoted key
            '"just a string with no object"trailing',  # trailing garbage
        ]
        assert len(bad) == N_BAD_LINES
        tmp = out / "events-badlines.json.tmp"
        tmp.write_text("\n".join(bad) + "\n")
        tmp.rename(out / "events-badlines.json")
        done.write_text(fp)
    return out


@query(
    "scan_json_badrecords",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
           CAST({N_BAD_LINES} AS BIGINT) AS n_corrupt,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def scan_json_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode ingest of a dirty NDJSON directory: malformed
    lines land in ``_corrupt_record`` instead of failing the job, and
    the query quarantines them (count here; dead-letter path in
    production) while the clean rows flow on. At 100 TB failing a
    multi-hour job on one bad byte (FAILFAST) is not an option, and
    silently dropping (DROPMALFORMED) destroys the audit trail — the
    PERMISSIVE + quarantine split is the only scalable posture. The
    corrupt column must be requested in the schema to materialize;
    caching before the split avoids a double read.

    Oracle: clean rows equal the events table; the corrupt count is the
    fixture constant."""
    path = ensure_events_ndjson_dirty(sf_dir)
    schema = EVENTS_JSON_SCHEMA + ", _corrupt_record STRING"
    df = spark.read.schema(schema).json(str(path)).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    plan = (
        good.agg(
            F.count(F.lit(1)).alias("n_good"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .crossJoin(bad.agg(F.count(F.lit(1)).alias("n_corrupt")))
        .select("n_good", "n_corrupt", "n_users")
    )
    # 1-row result: materialize and release the split cache before
    # returning (cache-hygiene rule — a returned lazy frame cannot own
    # a persist; this was the last lingering cache in the engine)
    try:
        rows = plan.collect()
    finally:
        df.unpersist()
    return spark.createDataFrame(rows, plan.schema)


def ensure_parquet_evolving(sf_dir: str) -> Path:
    """Two parquet generations of the same logical table: gen1 is
    (doc_id, lang), gen2 adds n_chars — the normal state of a lake
    table after a schema migration."""
    out = derived_dir(sf_dir) / "docs_evolving"
    staging = fresh_staging(out, Path(sf_dir) / "documents.parquet")
    if staging is not None:
        done, fp = staging
        pdf = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
        pdf = pdf.sort_values("doc_id")
        gen1 = pdf[pdf.doc_id % 2 == 0][["doc_id", "lang"]]
        gen2 = pdf[pdf.doc_id % 2 == 1][["doc_id", "lang", "n_chars"]]
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(gen1, preserve_index=False),
                       out / "gen1.parquet")
        pq.write_table(pa.Table.from_pandas(gen2, preserve_index=False),
                       out / "gen2.parquet")
        done.write_text(fp)
    return out


@query(
    "scan_parquet_evolving",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS n_with_chars,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS sum_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def scan_parquet_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: a directory holding files written before
    and after a column was added, unified with ``mergeSchema`` — rows
    from the old generation surface NULL for the new column instead of
    failing the scan. The aggregate counts both populations to prove
    the union really happened. At 100 TB mergeSchema's footer-merge
    cost scales with FILE COUNT, not data size — production lakes pin
    the merged schema in a metastore/table format and read with an
    explicit schema instead; the per-file null-fill behavior pinned
    here is identical."""
    path = ensure_parquet_evolving(sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(str(path))
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("n_chars").alias("n_with_chars"),
            F.sum(F.when(F.col("doc_id") % 2 == 1, F.col("n_chars"))).alias(
                "sum_chars"
            ),
        )
        .orderBy("lang")
    )


@query(
    "source_python_datasource",
    """
    SELECT CAST(g // 250 AS INT) AS pid,
           CAST(g AS INT) AS gid,
           (g * 7 % 1000) / 4.0 AS val
    FROM generate_series(0, 999) t(g)
    ORDER BY gid
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through a CUSTOM Python DataSource (Spark 4
    pyspark.sql.datasource API, sources/python_source.py): 4
    InputPartitions × 250 rows of a deterministic synthetic feed,
    executed partition-parallel as Arrow-batched Python tasks. The
    oracle recomputes the identical rows from generate_series, so the
    hash match proves the custom source's partitioning covers the row
    space exactly once with no gaps or overlaps — the correctness
    contract any source plugin must meet."""
    from kinesis_adapter_spark.sources.python_source import RangeFeedDataSource

    try:
        spark.dataSource.register(RangeFeedDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("kas_feed")
        .option("partitions", "4")
        .option("rows", "250")
        .load()
        .orderBy("gid")
    )


def ensure_media_files(sf_dir: str) -> Path:
    """Stage each IMAGE payload as its own .ppm file — the
    object-per-file layout multimodal corpora actually arrive in
    (S3 bucket of images), as opposed to media.parquet's
    blobs-in-columns layout. Source of truth is the media fixture, so
    fingerprint invalidation chains through documents.parquet."""
    from kinesis_adapter_spark.operators.multimodal import ensure_media_parquet

    media = ensure_media_parquet(sf_dir)
    out = derived_dir(sf_dir) / "media_files"
    staging = fresh_staging(out, Path(sf_dir) / "documents.parquet")
    if staging is not None:
        done, fp = staging
        tbl = pq.read_table(
            str(media), columns=["media_id", "media_type", "payload"]
        )
        for mid, mt, payload in zip(
            tbl.column("media_id").to_pylist(),
            tbl.column("media_type").to_pylist(),
            tbl.column("payload").to_pylist(),
        ):
            if mt == "image":
                (out / f"media_{mid}.ppm").write_bytes(payload)
        done.write_text(fp)
    return out


@query(
    "source_binaryfile",
    f"""
    SELECT media_id, gt_n_bytes AS n_bytes, gt_sha256_16 AS sha256_16
    FROM read_parquet('{DERIVED_ROOT / "sf0.01" / "media.parquet"}')
    WHERE media_type = 'image'
    ORDER BY media_id
    """,
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's ``binaryFile`` source over an object-per-file media
    directory — the ingest path for raw image/audio buckets (each S3
    object one blob): scan yields (path, modificationTime, length,
    content); the id parses from the file name and the digest is
    computed JVM-side with sha2 over the binary column — no Python in
    the loop. The oracle reads the fixture's independently-computed
    ground truth, so the hash match proves the file write + binaryFile
    read round-trip is lossless.

    100 TB notes: binaryFile parallelizes by file; selecting only
    (path, length) prunes ``content`` from the scan entirely
    (metadata-only listing), and ``pathGlobFilter`` prunes non-matching
    objects before any read."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "media_*.ppm")
        .load(str(ensure_media_files(sf_dir)))
    )
    return (
        df.select(
            F.regexp_extract(
                F.col("path"), r"media_(\d+)\.ppm$", 1
            ).cast("bigint").alias("media_id"),
            F.col("length").alias("n_bytes"),
            F.lower(F.substring(F.sha2("content", 256), 1, 16)).alias(
                "sha256_16"
            ),
        )
        .orderBy("media_id")
    )


@query(
    "source_python_stream",
    """
    SELECT CAST(g AS INT) AS gid, (g * 7 % 1000) / 4.0 AS val
    FROM generate_series(0, 999) t(g)
    ORDER BY gid
    """,
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM through a custom Python streaming DataSource (Spark 4
    ``simpleStreamReader`` API): offset-tracked micro-batches (100
    rows each over a bounded 1000-row feed) land in a memory sink via
    availableNow; the oracle recomputes the whole feed from
    generate_series, so the hash match proves the offset arithmetic
    covers the row space exactly once across ~10 micro-batches — no
    gap at batch boundaries, no replayed overlap. This is the
    PySpark-native version of writing a Kinesis/REST source plugin:
    initialOffset/read/readBetweenOffsets give checkpointed resume
    for free."""
    import uuid as _uuid

    from kinesis_adapter_spark.staging import ephemeral_dir

    from kinesis_adapter_spark.sources.python_source import (
        RangeFeedStreamDataSource,
    )

    try:
        spark.dataSource.register(RangeFeedStreamDataSource)
    except Exception:
        pass  # already registered in this session
    name = f"mem_{_uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format("kas_feed_stream")
        .option("batch_rows", "100")
        .option("total_rows", "1000")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ephemeral_dir("kas_pysrc_"))
        .start()
    )
    # availableNow snapshots only the FIRST offset range for a simple
    # python stream reader (probed: one 100-row batch, then stop);
    # processAllAvailable drains the bounded feed through every
    # micro-batch before stopping.
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return spark.table(name).orderBy("gid")


@query(
    "scan_text_lines",
    """
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw ``text`` source + full-record from_json parse: each NDJSON
    line arrives as one string row and the typed record is extracted
    in a single from_json against the declared schema — the
    lowest-level ingest path (upstream of the schema'd json reader)
    and the one you reach for when lines need pre-cleaning before
    parse. Oracled against the ORIGINAL parquet, so text-split,
    JSON-parse, and numeric round-trip must all be lossless."""
    lines = spark.read.text(str(ensure_events_ndjson(sf_dir)))
    rec = F.from_json("value", EVENTS_JSON_SCHEMA)
    return lines.select(rec.alias("r")).select(
        "r.event_id", "r.user_id", "r.event_type", "r.value"
    )
