"""One-shot audit: engine-level (Arrow) output-type skew per oracled key.

Fetches the LIMIT-0 Arrow schema of every registered query from BOTH
engines and prints each key whose normalized types differ.  Used to
drive the round-2 type-alignment pass (VERDICT r01 item #2); the
enforcing test lives in tests/test_oracle_parity.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES, load_all_modules
from kinesis_adapter_spark.session import build_spark
from tests.oracle import SF_TEST, arrow_type_problems, duck_connect


def main() -> int:
    load_all_modules()
    spark = build_spark(app_name="kas-audit", master="local[8]", shuffle_partitions=8)
    con = duck_connect(SF_TEST)
    bad = 0
    for key in sorted(ORACLES):
        try:
            problems = arrow_type_problems(spark, key, SF_TEST, con=con)
        except Exception as e:  # noqa: BLE001
            print(f"{key}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if problems:
            bad += 1
            print(f"{key}:")
            for p in problems:
                print(f"    {p}")
    print(f"\n{bad} / {len(ORACLES)} keys with type skew")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
