"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference adapter's extensibility story is "write a new source
plugin"; Spark 4's Python DataSource API is the PySpark-native
equivalent — a pure-Python reader that still gets partition-parallel
execution (one Arrow-batched task per InputPartition). The feed below
is deterministic (closed-form row values), so the key that reads it
carries a full DuckDB oracle: the oracle recomputes the same rows from
generate_series — proving the custom source's partitioning delivers
exactly-once, gap-free coverage of the row space.

At 100 TB the same class shape wraps a real external system (paginated
REST API, Kinesis shard iterator, proprietary format): partitions()
enumerates shards/pages, read() pulls one shard — Spark schedules them
across executors with no JVM code.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FeedPartition(InputPartition):
    def __init__(self, pid: int, rows: int):
        self.pid = pid
        self.rows = rows


class RangeFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows", "250"))

    def partitions(self):
        return [_FeedPartition(p, self.rows) for p in range(self.n_parts)]

    def read(self, partition: _FeedPartition):
        # Deterministic synthetic feed: value is a closed-form function
        # of the global row index, so any engine can recompute it.
        for i in range(partition.rows):
            gid = partition.pid * partition.rows + i
            yield (partition.pid, gid, (gid * 7 % 1000) / 4.0)


class RangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kas_feed"

    def schema(self) -> str:
        return "pid int, gid int, val double"

    def reader(self, schema) -> RangeFeedReader:
        return RangeFeedReader(self.options)


class RangeFeedStreamReader:
    """SimpleDataSourceStreamReader over the same deterministic feed:
    offsets are plain row counts; each micro-batch serves at most
    ``batch_rows`` rows and the feed is BOUNDED at ``total_rows`` (so
    availableNow/processAllAvailable terminates). readBetweenOffsets
    replays any committed range exactly — the recoverability contract
    a streaming source must meet for checkpoint resume."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.total_rows = int(options.get("total_rows", "1000"))

    def initialOffset(self):
        return {"offset": 0}

    @staticmethod
    def _rows(start: int, end: int):
        # iter over a prebuilt LIST: the runner's prefetch cache calls
        # next() on the return value (so a bare list fails) but then
        # pickles the drained rows (so a generator fails too)
        return iter([(gid, (gid * 7 % 1000) / 4.0) for gid in range(start, end)])

    def read(self, start):
        s = start["offset"]
        e = min(s + self.batch_rows, self.total_rows)
        return (self._rows(s, e), {"offset": e})

    def readBetweenOffsets(self, start, end):
        return self._rows(start["offset"], end["offset"])

    def commit(self, end):
        pass  # offsets are recomputable; nothing external to ack


class RangeFeedStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kas_feed_stream"

    def schema(self) -> str:
        return "gid int, val double"

    def simpleStreamReader(self, schema) -> RangeFeedStreamReader:
        return RangeFeedStreamReader(self.options)
