"""Mechanical freshness gates (VERDICT r8 items #1/#2).

Two consecutive rounds ended with keys added AFTER the committed
replica artifact was generated, and with README counts written
mid-round — prose rules ("replica is the LAST act of the round")
didn't hold, so the discipline is now a failing test:

- the highest-round ``REPLICA_r{N}.json`` in the repo must cover
  EXACTLY the live registry's key set (and carry zero failures);
- README.md's registry/oracle counts must equal ``len(QUERIES)`` /
  ``len(ORACLES)``.

Adding a key without regenerating the replica — or without updating
the README — is now a red suite, not a judge finding.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry():
    from kinesis_adapter_spark.plans.registry import (
        ORACLES,
        QUERIES,
        load_all_modules,
    )

    load_all_modules()
    return QUERIES, ORACLES


def _latest_replica() -> Path:
    arts = sorted(REPO.glob("REPLICA_r*.json"))
    assert arts, "no REPLICA_r{N}.json artifact committed"
    return arts[-1]


def test_replica_artifact_covers_live_registry():
    """Every registry key has a row in the newest committed replica —
    the same-day-replica rule as a gate instead of a directive."""
    queries, _ = _registry()
    art = json.loads(_latest_replica().read_text())
    replica_keys = set(art["keys"])
    missing = sorted(set(queries) - replica_keys)
    extra = sorted(replica_keys - set(queries))
    assert not missing and not extra, (
        f"{_latest_replica().name} is stale: missing rows for {missing}, "
        f"orphan rows for {extra} — rerun tools/replica_check.py at HEAD"
    )


def test_replica_artifact_is_all_green():
    """The committed replica may not carry a failing key: a red row
    means the round shipped a known-broken declaration."""
    art = json.loads(_latest_replica().read_text())
    red = sorted(
        k for k, r in art["keys"].items() if r.get("status") == "fail"
    )
    assert art["fail"] == 0 and not red, red


def test_readme_counts_match_registry():
    """README.md's '(N operator keys)' / '(M DuckDB-checkable)' claims
    are derived from the live registry, never hand-maintained."""
    queries, oracles = _registry()
    text = (REPO / "README.md").read_text()
    m = re.search(
        r"`queries\(\)` \((\d+) operator\s+keys\), and `oracle_sql\(\)` "
        r"\((\d+) DuckDB-checkable\)",
        text,
    )
    assert m, "README.md no longer carries the registry-count sentence"
    assert int(m.group(1)) == len(queries), (
        f"README says {m.group(1)} keys, registry has {len(queries)}"
    )
    assert int(m.group(2)) == len(oracles), (
        f"README says {m.group(2)} oracled, registry has {len(oracles)}"
    )


def test_smoke_and_bench_reference_live_registry_keys():
    """Every key named by the scale-smoke table and the bench harness
    must exist in the live registry, and every bench entry must carry
    an anchor — a renamed/removed key must not silently orphan its
    evidence (same drift class as the replica gate)."""
    queries, _ = _registry()
    from tools.scale_smoke import SMOKE_OPS

    missing = sorted(set(SMOKE_OPS) - set(queries))
    assert not missing, f"smoke ops not in registry: {missing}"

    import bench

    for name, key in {**bench.HEADLINE, **bench.EXTRAS}.items():
        assert key in queries, f"bench entry {name} -> unknown key {key}"
    unanchored = [
        n
        for n in {**bench.HEADLINE, **bench.EXTRAS}
        if n not in bench.ANCHORS
    ]
    assert not unanchored, f"bench entries without anchors: {unanchored}"
