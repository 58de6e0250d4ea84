"""Local AWS emulation plumbing (moto server) for S3/Kinesis paths.

The reference is an S3→Kinesis adapter; this environment has no
network and no hadoop-aws/kinesis JVM connectors (SURVEY.md §0.3), so
AWS APIs are served by a moto ThreadedMotoServer on 127.0.0.1 and all
clients talk to it via ``endpoint_url``.

Why a *server* and not ``mock_aws()``: Spark's Python workers are
separate processes — an in-process mock patches only the driver. An
HTTP endpoint works from every worker, which keeps the production
shape (each partition writes its own batches) testable locally. In
production the same code runs with the endpoint_url removed.
"""

from __future__ import annotations

import atexit
import socket
import time

import boto3

_PORT = 5123
_server = None

AWS_KW = dict(
    region_name="us-east-1",
    aws_access_key_id="testing",
    aws_secret_access_key="testing",
)


def endpoint_url() -> str:
    return f"http://127.0.0.1:{_PORT}"


def ensure_moto_server() -> str:
    """Start the singleton moto server if not already running."""
    global _server
    if _server is None:
        # Another process (e.g. previous pytest worker) may own the port.
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", _PORT)) == 0:
                return endpoint_url()
        import logging

        from moto.server import ThreadedMotoServer

        logging.getLogger("werkzeug").setLevel(logging.ERROR)  # silence request spam
        server = ThreadedMotoServer(ip_address="127.0.0.1", port=_PORT, verbose=False)
        try:
            server.start()
        except OSError:
            # Check-then-start race (ADVICE r01): another process bound
            # the port between our probe and start(). Re-probe and use
            # the winner's instance.
            for _ in range(50):
                with socket.socket() as s:
                    if s.connect_ex(("127.0.0.1", _PORT)) == 0:
                        return endpoint_url()
                time.sleep(0.1)
            raise
        _server = server
        atexit.register(_server.stop)
        time.sleep(0.2)
    return endpoint_url()


def client(service: str):
    ensure_moto_server()
    return boto3.client(service, endpoint_url=endpoint_url(), **AWS_KW)


def create_stream(name: str, shards: int = 4):
    """Idempotently create a Kinesis stream and wait until ACTIVE."""
    kin = client("kinesis")
    try:
        kin.create_stream(StreamName=name, ShardCount=shards)
    except kin.exceptions.ResourceInUseException:
        pass  # stream already exists — idempotent create, fall through to wait
    for _ in range(50):
        desc = kin.describe_stream_summary(StreamName=name)
        if desc["StreamDescriptionSummary"]["StreamStatus"] == "ACTIVE":
            break
        time.sleep(0.1)
    return kin


def read_all_records(stream: str) -> list[dict]:
    """Drain every shard of a stream (TRIM_HORIZON → empty)."""
    kin = client("kinesis")
    out: list[dict] = []
    desc = kin.describe_stream(StreamName=stream)
    for shard in desc["StreamDescription"]["Shards"]:
        it = kin.get_shard_iterator(
            StreamName=stream,
            ShardId=shard["ShardId"],
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        empties = 0
        while it:
            resp = kin.get_records(ShardIterator=it, Limit=10000)
            out.extend(resp["Records"])
            if resp["Records"]:
                empties = 0
            else:
                # An empty page does NOT mean end-of-shard: Kinesis can
                # return no records with a valid NextShardIterator while
                # data remains further along. Only stop once the iterator
                # is caught up (MillisBehindLatest == 0) or after several
                # consecutive empty pages (bounded, for emulators that
                # omit the field).
                if resp.get("MillisBehindLatest", 0) == 0:
                    break
                empties += 1
                if empties >= 5:
                    break
            it = resp.get("NextShardIterator")
    return out


class moto_put_lock:
    """Cross-process serialization of PutRecords against the LOCAL moto
    emulator: moto's in-memory Kinesis backend drops records under
    concurrent puts (measured: 7998/8000 with 8 writer threads). Real
    Kinesis is concurrent-safe — production runs (no local endpoint)
    skip the lock entirely. flock works across the Python worker
    processes of a local[*] session because they share the host.

    The lock file is keyed by STREAM name (ADVICE r01): moto's drop
    happens on concurrent puts to one in-memory stream, so unrelated
    pipelines writing different streams need not serialize against
    each other."""

    def __init__(self, endpoint: str | None, stream: str = "default"):
        self.local = bool(endpoint) and "127.0.0.1" in (endpoint or "")
        self.stream = stream
        self._fh = None

    def __enter__(self):
        if self.local:
            import fcntl
            import re as _re

            safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", self.stream)
            from kinesis_adapter_spark.staging import ephemeral_file

            self._fh = open(
                ephemeral_file(f"/tmp/kas_moto_put.{safe}.lock"), "w"
            )
            fcntl.flock(self._fh, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        if self._fh is not None:
            import fcntl

            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
        return False


def put_records_with_retry(
    kin,
    stream: str,
    records: list[dict],
    max_retries: int = 5,
    backoff_s: float = 0.05,
) -> int:
    """PutRecords in ≤500-record chunks with per-record failure retry.

    This is the reference adapter's core sink contract (SURVEY.md
    §2.0): Kinesis caps PutRecords at 500 records / 5 MB; individual
    records can fail (throttling) while the call succeeds — those are
    re-enqueued with exponential backoff. Returns records delivered."""
    delivered = 0
    lock = moto_put_lock(
        getattr(getattr(kin, "meta", None), "endpoint_url", None), stream=stream
    )
    for i in range(0, len(records), 500):
        chunk = records[i : i + 500]
        attempt = 0
        while chunk:
            with lock:
                resp = kin.put_records(StreamName=stream, Records=chunk)
            failed = resp.get("FailedRecordCount", 0)
            if not failed:
                delivered += len(chunk)
                break
            retry = [
                rec
                for rec, st in zip(chunk, resp["Records"])
                if "ErrorCode" in st
            ]
            delivered += len(chunk) - len(retry)
            chunk = retry
            attempt += 1
            if attempt > max_retries:
                raise RuntimeError(f"{len(chunk)} records failed after retries")
            time.sleep(backoff_s * (2**attempt))
    return delivered
