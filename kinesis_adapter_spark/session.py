"""SparkSession factory + runtime-conf preparation.

Two entry paths (SURVEY.md §7.1 "session factory is the first line of
code"):

- ``build_spark()``: build our own session with every required conf —
  used by tests and bench.
- ``prepare_session(spark)``: the driver passes us ITS session
  (``__spark_entry__.entry/queries``); we cannot rebuild it, but the
  confs we need are all *runtime-settable* SQL confs, so we set them
  defensively on every query entry. Idempotent and cheap.

Required confs and why:
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — back-compat for the
  ns-era fixture generation: events.parquet shipped as INT64
  TIMESTAMP(NANOS), which Spark 4.1.2 refuses to read otherwise
  ([PARQUET_TYPE_ILLEGAL]). Current fixtures carry TIMESTAMP(MICROS,
  isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ; this conf is a no-op
  for them) — ``catalog._canonicalize`` converts either physical form
  to the BIGINT-ns contract at the load choke point.
- ``spark.sql.session.timeZone=UTC`` — oracle (DuckDB) timestamps are
  naive/UTC; extracts (year/month/hour) must agree.
- ``spark.sql.shuffle.partitions`` — sized to cores at test scale; at
  100 TB on a real cluster this is left to AQE coalescing from a high
  initial value instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied both at build time and defensively
# on sessions we did not build.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Right-size shuffles for a session we did not build (the driver's
    # bare session defaults to 200 — wasteful at test scale). 8 beats
    # cpu-count locally (measured −30% on the sf0.1 headline set: AQE
    # coalesces either way, task overhead doesn't); on a real cluster
    # set ≈2–3× total cores and let AQE coalesce (SCALE.md §0).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "8"),
}


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_spark(
    app_name: str = "kinesis-adapter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a fully-configured local SparkSession.

    On a real cluster the same confs apply; only master/memory sizing
    changes. AQE is on so the static shuffle-partition count is an upper
    bound that runtime coalescing shrinks.
    """
    cpus = _default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle = (
        shuffle_partitions
        if shuffle_partitions is not None
        else int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    # explicit arg wins over the _RUNTIME_CONFS default
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prepare_session(spark: SparkSession) -> SparkSession:
    """Set required runtime confs on a session we did not build.

    Safe to call repeatedly; every conf here is a runtime SQL conf.
    Failures are swallowed per-conf so one locked-down conf cannot take
    the whole query path out.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked/unknown on this build — keep the rest applied
    return spark


def persistent_rdd_ids(spark: SparkSession) -> frozenset:
    """Ids of every RDD the context currently pins (persist/cache AND
    localCheckpoint — a local checkpoint registers its backing RDD in
    the same map). The cache-hygiene gate's measurement surface:
    tools/replica_check.py snapshots this around every registry key."""
    return frozenset(spark.sparkContext._jsc.getPersistentRDDs().keys())


def release_persist_ids(spark: SparkSession, ids) -> None:
    """Unpersist exactly the given RDD ids (if still pinned). Used by
    iterative cores to drop a superseded round's localCheckpoint as
    soon as nothing can reference it — without this, an R-round
    convergence loop pins R node-sized checkpoints at peak instead
    of 2 (the r10 in-loop memory fix)."""
    for rid, jrdd in dict(
        spark.sparkContext._jsc.getPersistentRDDs()
    ).items():
        if rid in ids:
            jrdd.unpersist(False)


def release_new_persists(spark: SparkSession, before: frozenset) -> None:
    """Unpersist every RDD pinned since ``before`` (a
    ``persistent_rdd_ids`` snapshot). Non-blocking: the persistentRdds
    map updates synchronously; executor block removal is async."""
    for rid, jrdd in dict(
        spark.sparkContext._jsc.getPersistentRDDs()
    ).items():
        if rid not in before:
            jrdd.unpersist(False)


class released_persists:
    """Scope guard for the r9 cache-hygiene rule ("no returned lazy
    frame owns a persist"): every persist/cache/localCheckpoint taken
    inside the block is released on exit, success or error. For use
    around a fully-materializing action (a bounded collect or an
    artifact write) — anything lazy that still references a checkpoint
    taken inside the block would recompute-fail after release, which is
    the point: the block boundary IS the materialization boundary.

    Snapshot-diff, not handle tracking, so it also catches persists
    taken by helpers the caller can't see (the way the replica sweep
    measures). Assumes one driver thread per session — a concurrent
    query's new persists inside the window would be swept too.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.before = persistent_rdd_ids(self.spark)
        return self

    def __exit__(self, *exc):
        release_new_persists(self.spark, self.before)
        return False


def _physical_nodes(jnode):
    """DFS over an executed physical plan, descending through the
    wrappers that hide subtrees from ``children()``: AQE roots
    (executedPlan), materialized query stages (plan), and cached
    relations (relation().cachedPlan())."""
    yield jnode
    name = jnode.getClass().getSimpleName()
    try:
        if name == "AdaptiveSparkPlanExec":
            yield from _physical_nodes(jnode.executedPlan())
        elif name.endswith("QueryStageExec"):
            yield from _physical_nodes(jnode.plan())
        elif name == "InMemoryTableScanExec":
            yield from _physical_nodes(jnode.relation().cachedPlan())
    except Exception:
        pass  # a wrapper without the accessor on this build: skip into children
    kids = jnode.children()
    for i in range(kids.size()):
        yield from _physical_nodes(kids.apply(i))


_JOIN_NODES = frozenset(
    {
        "SortMergeJoinExec",
        "ShuffledHashJoinExec",
        "BroadcastHashJoinExec",
        "CartesianProductExec",
        "BroadcastNestedLoopJoinExec",
    }
)


def _node_output_rows(jnode):
    """numOutputRows of a node if it carries the metric, else the
    first descendant's that does (exchanges/sorts in between don't)."""
    for n in _physical_nodes(jnode):
        try:
            m = n.metrics()
            if m.contains("numOutputRows"):
                return int(m.apply("numOutputRows").value())
        except Exception:
            continue
    return None


def join_expansion_factors(df) -> list:
    """Post-action audit of every JOIN node in the executed plan:
    ``[(node_name, output_rows, max_input_rows), ...]``. The
    expanding-join gate's measurement surface (VERDICT r12 item #6):
    the r12 SemDeDup cliff was a block-key self-join whose OUTPUT was
    Σ|block|² candidate rows — invisible to plan-shape pins (the plan
    looks like any equi-join) and to AQE (it coalesces by INPUT
    bytes), but exactly what the join node's numOutputRows metric vs
    its children's exposes. Call after an action has run; AQE final
    plans, query stages, and cached subtrees are all descended."""
    out = []
    root = df._jdf.queryExecution().executedPlan()
    for node in _physical_nodes(root):
        name = node.getClass().getSimpleName()
        if name not in _JOIN_NODES:
            continue
        rows = _node_output_rows(node)
        kids = node.children()
        child_rows = [
            _node_output_rows(kids.apply(i)) for i in range(kids.size())
        ]
        child_rows = [c for c in child_rows if c is not None]
        if rows is None or not child_rows:
            continue
        out.append((name, rows, max(child_rows)))
    return out
