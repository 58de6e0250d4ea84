"""Dump plans/r16/<key>_{before,after}.txt evidence files.

Usage: python tools/dump_plan_r16.py SUFFIX KEY [KEY ...]
Builds each declared frame at sf0.1 (plan_audit session config) and
writes its ``explain('formatted')`` output to plans/r16/<key>_SUFFIX.txt.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.1"


def main() -> None:
    suffix, keys = sys.argv[1], sys.argv[2:]
    from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules
    from kinesis_adapter_spark.session import build_spark

    spark = build_spark(app_name="kas-dump-plan-r16", shuffle_partitions=8)
    load_all_modules()
    for key in keys:
        df = QUERIES[key](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        dest = ROOT / "plans" / "r16" / f"{key}_{suffix}.txt"
        dest.write_text(buf.getvalue())
        print(f"wrote {dest}", flush=True)


if __name__ == "__main__":
    main()
