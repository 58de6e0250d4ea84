"""foreachBatch Kinesis sink: the reference adapter's core delivery
stage re-expressed on Structured Streaming (SURVEY.md §2.0, §3.4).

Contract implemented:
- records serialized to JSON, partitioned by a key column (Kinesis
  routes partition-key hash → shard, ordering per shard only);
- PutRecords in ≤500-record chunks (the API cap), per-record failure
  retry with exponential backoff (a PutRecords call can succeed while
  individual records throttle — FailedRecordCount);
- batch_id idempotency ledger: foreachBatch is at-least-once across
  restarts; a delivered batch_id is recorded durably next to the
  checkpoint and re-delivery of the same batch is skipped, upgrading
  the sink to effectively-once for whole-batch replays.

Writes fan out via DataFrame.foreachPartition, so each executor ships
its own partitions' chunks — the production shape. The closure is
self-contained (executors don't need this package importable).
"""

from __future__ import annotations

import json
from pathlib import Path


class KinesisForeachBatchSink:
    """Callable for ``writeStream.foreachBatch`` delivering to Kinesis."""

    def __init__(
        self,
        stream: str,
        endpoint: str,
        aws_kw: dict,
        ledger_dir: str,
        partition_key_col: str = "pk",
    ):
        self.stream = stream
        self.endpoint = endpoint
        self.aws_kw = dict(aws_kw)
        self.ledger = Path(ledger_dir)
        self.ledger.mkdir(parents=True, exist_ok=True)
        self.pk_col = partition_key_col
        # Driver-side registration of the executor-side moto lock file
        # (same naming as put_guard below) so a run leaves no /tmp
        # residue — the executor closure itself stays
        # package-import-free; __init__ runs on the driver only.
        import re as _re

        from kinesis_adapter_spark.staging import ephemeral_file

        safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", stream)
        ephemeral_file(f"/tmp/kas_moto_put.{safe}.lock")

    def __call__(self, batch_df, batch_id: int) -> None:
        mark = self.ledger / f"batch-{batch_id}.done"
        if mark.exists():  # replayed batch after restart → skip (idempotent)
            return
        stream, endpoint, aws_kw, pk_col = (
            self.stream,
            self.endpoint,
            self.aws_kw,
            self.pk_col,
        )

        def write_partition(rows):
            import contextlib
            import json as _json
            import time as _time

            import boto3 as _boto3

            @contextlib.contextmanager
            def put_guard():
                # moto's in-memory Kinesis loses records under
                # concurrent puts; serialize against the LOCAL emulator
                # only (real Kinesis runs lock-free). Keyed by stream
                # name with the SAME file naming as aws.moto_put_lock so
                # the two lock sites contend on one file per stream but
                # unrelated streams proceed in parallel (ADVICE r01).
                # Inline (no package import): executors must not need
                # kinesis_adapter_spark importable.
                if endpoint and "127.0.0.1" in endpoint:
                    import fcntl
                    import re as _re

                    safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", stream)
                    with open(f"/tmp/kas_moto_put.{safe}.lock", "w") as fh:
                        fcntl.flock(fh, fcntl.LOCK_EX)
                        try:
                            yield
                        finally:
                            fcntl.flock(fh, fcntl.LOCK_UN)
                else:
                    yield

            kin = _boto3.client("kinesis", endpoint_url=endpoint, **aws_kw)
            recs = []
            for r in rows:
                d = r.asDict()
                pk = str(d.pop(pk_col))
                recs.append({"Data": _json.dumps(d).encode(), "PartitionKey": pk})
            for i in range(0, len(recs), 500):
                chunk = recs[i : i + 500]
                attempt = 0
                while chunk:
                    with put_guard():
                        resp = kin.put_records(StreamName=stream, Records=chunk)
                    if not resp.get("FailedRecordCount"):
                        break
                    chunk = [
                        rec
                        for rec, st in zip(chunk, resp["Records"])
                        if "ErrorCode" in st
                    ]
                    attempt += 1
                    if attempt > 5:
                        raise RuntimeError("kinesis put failed after retries")
                    _time.sleep(0.05 * (2**attempt))

        batch_df.foreachPartition(write_partition)
        mark.write_text(json.dumps({"batch_id": batch_id}))
