"""Round-16 plan audit: executed-plan node census for every bench
entry.

For each bench key, builds the declared frame and counts the physical
operators that signal cost or pathology (scans, exchanges, joins by
strategy, windows, sorts, Python-boundary nodes, cartesian products,
reused exchanges). Writes one JSON (plans/r16/plan_audit.json) the
OPTIMIZATION_r16.md checklist cites. Static (pre-AQE) plans — runtime
may further convert joins — but redundant-subtree and boundary-node
counts are exact either way.

Usage: python tools/plan_audit_r16.py [--sf DIR] [KEY ...]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PATTERNS = [
    "Scan parquet",
    "Exchange",
    "ReusedExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "Sort ",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Generate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "InMemoryTableScan",
    "TakeOrderedAndProject",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bench import EXTRAS, HEADLINE
    from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules
    from kinesis_adapter_spark.session import build_spark

    spark = build_spark(app_name="kas-plan-audit-r16", shuffle_partitions=8)
    load_all_modules()

    entries = {**HEADLINE, **EXTRAS}
    keys = args.keys or list(entries)
    out: dict[str, dict] = {}
    for bench_name in keys:
        reg_key = entries.get(bench_name, bench_name)
        try:
            df = QUERIES[reg_key](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            counts = {
                p.strip(): len(re.findall(re.escape(p), plan))
                for p in PATTERNS
            }
            counts = {k: v for k, v in counts.items() if v}
            out[bench_name] = {"key": reg_key, "nodes": counts}
        except Exception as exc:  # noqa: BLE001
            out[bench_name] = {"key": reg_key, "error": str(exc)[:200]}
        print(bench_name, out[bench_name].get("nodes", "ERR"), flush=True)

    dest = ROOT / "plans" / "r16" / "plan_audit.json"
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}", flush=True)


if __name__ == "__main__":
    main()
