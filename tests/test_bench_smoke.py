"""Bench-harness smoke gate (VERDICT r03 item #7).

``bench.py`` crashed in warm-up for two consecutive rounds (r02/r03)
without any test noticing, so the repo shipped zero perf numbers twice.
This gate runs every bench-mapped registry key once at sf0.001 — if any
bench query cannot execute end-to-end, pytest goes red BEFORE the
driver's per-round bench run does.
"""

from __future__ import annotations

import pytest

import bench
from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules

load_all_modules()

SF_SMOKE = "/root/testdata/sf0.001"
BENCH_KEYS = sorted({**bench.HEADLINE, **bench.EXTRAS}.items())


def test_bench_keys_registered():
    """Every bench name maps to a real registry key, and every anchor
    names a real bench entry — a rename in either place fails here."""
    names = {**bench.HEADLINE, **bench.EXTRAS}
    missing = [k for k in names.values() if k not in QUERIES]
    assert not missing, f"bench maps to unregistered keys: {missing}"
    stray = [n for n in bench.ANCHORS if n not in names]
    assert not stray, f"anchors without a bench entry: {stray}"


@pytest.mark.parametrize("name,key", BENCH_KEYS, ids=[n for n, _ in BENCH_KEYS])
def test_bench_query_runs(spark, name, key):
    rows = QUERIES[key](spark, SF_SMOKE).collect()
    assert rows is not None
