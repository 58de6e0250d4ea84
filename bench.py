"""Benchmark harness: times the headline queries against BASELINE.md.

Runs each headline query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``, one warm-up
then median of 3 timed runs (wall-clock around full materialization via
``collect()``), and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The first six keys map 1:1 onto the BASELINE.md measured set (q1, q3,
topk, window, docs_by_lang, knn) so runs are directly comparable; the
extras track the heavyweight LLM-pipeline operators.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules  # noqa: E402
from kinesis_adapter_spark.session import build_spark  # noqa: E402

# bench name -> registry key (first six = BASELINE.md headline set)
HEADLINE = {
    "q1_pricing_summary": "agg_sum_group",
    "q3_shipping_priority": "q3_shipping_priority",
    "topk_orders": "topk_global",
    "window_events": "win_rank_topn",
    "docs_by_lang": "text_lang_profile",
    "knn_cosine": "sim_topk",
}
EXTRAS = {
    "dedup_minhash": "dedup_near_minhash",
    "tfidf": "tfidf_topterms",
    "sessionize": "sessionize_gap",
    "join_asof": "join_asof",
    "stream_file_pipeline": "stream_throughput_file",
    # scan-efficiency + incremental-path trackers (not in BASELINE.md)
    "q6_pushdown": "q6_forecast_revenue",
    "merge_upsert": "merge_upsert",
    "doc_chunking": "doc_chunk_overlap",
}


def time_query(fn, spark, sf_dir: str, runs: int = 3) -> float:
    fn(spark, sf_dir).collect()  # warm-up (also triggers any staging)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = Path(sf_dir).name
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else None
    spark = build_spark(app_name="kas-bench", shuffle_partitions=8)
    load_all_modules()

    timings: dict[str, float] = {}
    for name, key in {**HEADLINE, **EXTRAS}.items():
        timings[name] = round(time_query(QUERIES[key], spark, sf_dir), 4)

    total = round(sum(timings[n] for n in HEADLINE), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_warm_median",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
