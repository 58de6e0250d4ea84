"""Scale smoke: measure how the heavy operators scale when the data
does — the empirical check behind SCALE.md's linearity claims.

Usage: python tools/scale_smoke.py [factor] [op ...]   (default 8, all ops)
Full run over all SMOKE_OPS takes ~10-12 min (each op runs warm twice
at both scales; fuzzy_match_names alone is ~30 s of it). Naming ops
restricts the run — e.g. `python tools/scale_smoke.py 32
fuzzy_match_names dedup_containment` pushes just the worst batch ops
to a higher factor.

Builds a synthetic sf directory at /tmp/kas_scale_x{N} by replicating
sf0.1's big tables N times with id offsets (events: event_id/user_id,
documents: doc_id, embeddings: vec_id — offsets multiply the GROUP
counts, keeping per-group work constant, which is how real corpora
grow), copying the bounded dims as-is. Then times each smoke op once
warm at 1x (sf0.1) and once at Nx, printing per-op wall-clock and the
scaling ratio. A ratio near N is linear scaling; a ratio well above N
flags a superlinear shape that would not survive 100 TB.

Replicated ts stays identical across replicas (more users per hour,
same time span) — the realistic way event volume grows.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from kinesis_adapter_spark import catalog  # noqa: E402
from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules  # noqa: E402
from kinesis_adapter_spark.session import build_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# op -> dominant input table (for the report only)
SMOKE_OPS = {
    "sessionize_gap": "events",
    "win_moving_median": "events",
    "rolling_active_users": "events",
    "text_repetition_score": "documents",
    "dedup_near_minhash": "documents",
    "pipeline_text_curation": "documents",
    "dedup_cluster_cc_stars": "documents",
    "sim_topk": "embeddings",
    "dedup_containment": "documents",
    "agg_bitmap_distinct": "events",
    "tfidf_topterms": "documents",
    "contamination_ngram": "documents",
    "fuzzy_match_names": "customer",
    "join_asof": "events+orders",
    # streaming maintenance twins (r5, VERDICT item #2): each call
    # stages its own arrival batches from the sf dir, runs the
    # availableNow maintenance stream, then queries the maintained
    # artifact — so the timing covers the whole incremental path, and a
    # superlinear query-time formula (the r4 stop-shingle cap bug)
    # shows up here instead of in production
    "stream_minhash_maintain": "documents",
    "stream_hll_rollup": "events",
    "stream_histogram_rollup": "events",
    # r5 rank-statistic keys: the compressed-value-domain claim —
    # per-value counts shrink the ordered pass to the distinct-value
    # frame, so runtime should grow far slower than the data
    "agg_mann_whitney": "events",
    "agg_ks_test": "events",
    "graph_triangle_count": "lineitem",
    # r6 additions: multimodal raster path (decode cost scales with
    # blob bytes), streaming index maintenance, k-gram duplication
    # accounting, outer stream-stream join, IVM, forward as-of.
    # NOTE (phash keys): replicated doc_ids differ by 10M ≡ 0 mod 200,
    # so cross-replica images are pixel-identical and phash buckets
    # grow to the replica count — output pairs grow ~quadratically in
    # REPLICAS (a harness artifact, same class as the c_name collision
    # fixed above), but buckets stay bounded by the factor so the
    # equi-join cost stays linear-ish; judge ratios accordingly.
    "mm_resize": "documents(media)",
    "dedup_image_phash": "documents(media)",
    "stream_phash_maintain": "documents(media)",
    "text_dup_kgram_fraction": "documents",
    "stream_stream_join_outer": "events",
    "incremental_mv_join": "orders+customer",
    "join_asof_forward": "events+orders",
    "mm_audio_features": "documents(media)",
    "mm_video_frame_extract": "documents(media)",
    "text_bigram_logprob": "documents",
    "agg_weighted_median": "lineitem",
    # NOTE join_spatial_grid: uniform replication multiplies point
    # DENSITY in a fixed area, so true pair count grows with the
    # SQUARE of the factor (measured 64x rows at 8x data; runtime
    # 24x < output growth => per-pair cost constant). Real spatial
    # corpora grow area, not uniform density — same output-linearity
    # class as fuzzy_match_names; judge its ratio against the output
    # count, not the data factor.
    "join_spatial_grid": "events",
    "survival_km": "events",
}

# (table, id columns to offset, per-replica offset)
_REPLICATE = {
    "events": (("event_id", 1_000_000_000), ("user_id", 1_000_000)),
    "documents": (("doc_id", 10_000_000),),
    "embeddings": (("vec_id", 1_000_000),),
    # FK-consistent replication: user_id/o_custkey/c_custkey share the
    # same per-replica offset so cross-table joins replicate per copy
    # instead of fanning out across copies
    "customer": (("c_custkey", 1_000_000),),
    "orders": (("o_orderkey", 100_000_000), ("o_custkey", 1_000_000)),
    # l_orderkey shares orders' offset (order⋈lineitem joins replicate
    # per copy); l_partkey/l_suppkey offset too so the co-purchase
    # graph replicates as DISJOINT copies — shared parts across
    # replicas would densify the graph and conflate harness combinatorics
    # with operator scaling (same lesson as the c_name collision)
    "lineitem": (
        ("l_orderkey", 100_000_000),
        ("l_partkey", 10_000_000),
        ("l_suppkey", 1_000_000),
    ),
}


def _base_fingerprint() -> str:
    """Identity of the base fixtures the scaled dir derives from: file
    sizes + mtimes of every sf0.1 parquet. If /root/testdata is ever
    regenerated (the DERIVED_VERSION drift class in sources/scans.py),
    the cached replica is invalid and must rebuild — a bare _SUCCESS
    marker would silently measure stale data (ADVICE r4)."""
    parts = [f"replicate:{sorted(_REPLICATE.items())!r}"]
    for p in sorted(Path(BASE_SF).glob("*.parquet")):
        st = p.stat()
        parts.append(f"{p.name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def build_scaled_dir(spark, factor: int) -> str:
    out = Path(f"/tmp/kas_scale_x{factor}")
    marker = out / "_SUCCESS"
    fp = _base_fingerprint()
    if marker.exists() and marker.read_text() == fp:
        return str(out)
    if out.exists():
        import shutil

        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in catalog.TABLES:
        src = catalog.load(spark, BASE_SF, t)  # post-canonicalization
        dest = out / f"{t}.parquet"
        if t in _REPLICATE:
            parts = []
            for i in range(factor):
                rep = src
                for col, off in _REPLICATE[t]:
                    rep = rep.withColumn(col, F.col(col) + F.lit(i * off))
                if t == "customer":
                    # vary the name per replica: leaving names identical
                    # would make every name an 8-way collision, and the
                    # CORRECT fuzzy-match output itself grows
                    # quadratically in copies — an artifact of naive
                    # replication, not a property of real corpus growth
                    rep = rep.withColumn(
                        "c_name", F.concat("c_name", F.lit(f"-r{i}"))
                    )
                parts.append(rep)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            df.write.mode("overwrite").parquet(str(dest))
        else:
            src.write.mode("overwrite").parquet(str(dest))
    marker.write_text(fp)
    return str(out)


def time_op(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).collect()  # warm-up / staging
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return time.perf_counter() - t0


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = set(sys.argv[2:])
    unknown = only - set(SMOKE_OPS)
    if unknown:
        raise SystemExit(f"unknown smoke ops: {sorted(unknown)}")
    ops = {k: v for k, v in SMOKE_OPS.items() if not only or k in only}
    spark = build_spark(app_name="kas-scale-smoke")
    load_all_modules()
    scaled = build_scaled_dir(spark, factor)
    report = []
    for op, table in ops.items():
        t1 = time_op(QUERIES[op], spark, BASE_SF)
        tn = time_op(QUERIES[op], spark, scaled)
        report.append(
            {
                "op": op,
                "table": table,
                "t_1x_sec": round(t1, 3),
                f"t_{factor}x_sec": round(tn, 3),
                "ratio": round(tn / t1, 2),
                "factor": factor,
            }
        )
        print(json.dumps(report[-1]))
    worst = max(report, key=lambda r: r["ratio"])
    print(
        json.dumps(
            {
                "summary": "scale_smoke",
                "factor": factor,
                "worst_op": worst["op"],
                "worst_ratio": worst["ratio"],
                "linear_bound": factor * 1.5,
                "pass": worst["ratio"] <= factor * 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
