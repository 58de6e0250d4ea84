"""Self-cleaning per-run staging directories (VERDICT r11 item #2).

Per-invocation staging (streaming checkpoints, arrival-batch work
dirs) and per-process artifact caches (pid-keyed layout stagings)
used to leak one /tmp directory per process forever — the r11
adjudication's hygiene pass removed 8,266 of them, and that
accumulation is exactly the host-IO drift the bench's IO-heavy keys
(bm25_maintain / rag_retrieval / ivfpq) are exposed to. Every
ephemeral path now registers here and is removed at interpreter exit
(atexit), so a replica sweep / bench run / pytest session leaves
/tmp as it found it; tools/replica_check.py additionally records an
``orphan_staging_dirs`` audit field, freshness-gated to ``[]``.

Deliberately NOT registered (intentional cross-run caches, bounded
to one dir per scale tag, each guarded by a source fingerprint):
/tmp/kas_derived (staged fixtures + oracle artifacts),
kas_buckets_<sf>/kas_cbo_<sf> (warehouse dirs), kas_scale_x<N>
(scale-smoke materializations).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from pathlib import Path

_LOCK = threading.Lock()
_REGISTERED: dict[str, None] = {}  # insertion-ordered set of paths


def _register(path: str) -> str:
    with _LOCK:
        _REGISTERED[path] = None
    return path


def ephemeral_dir(prefix: str) -> str:
    """A fresh per-invocation staging dir (mkdtemp), removed at
    interpreter exit. Drop-in for ``tempfile.mkdtemp(prefix=...)``."""
    return _register(tempfile.mkdtemp(prefix=prefix))


def pid_staging_dir(name: str) -> str:
    """A process-lifetime staging root: the SAME path for the life of
    this process (callers fingerprint-cache layouts inside it across
    calls — the bench's warm-run reuse depends on that), removed at
    interpreter exit. The path is NOT created here; callers stage
    into it with their own _SUCCESS discipline."""
    return _register(str(Path(tempfile.gettempdir()) / f"{name}_{os.getpid()}"))


def ephemeral_file(path: str) -> str:
    """Register an ephemeral FILE (e.g. a moto put lock) for removal
    at interpreter exit."""
    return _register(path)


def registered_paths() -> set[str]:
    with _LOCK:
        return set(_REGISTERED)


def cleanup_now() -> list[str]:
    """Remove everything registered so far; return what was removed.
    Idempotent — atexit calls it again harmlessly. replica_check calls
    it explicitly before computing its orphan audit (atexit would fire
    only after the artifact is written)."""
    with _LOCK:
        paths = list(_REGISTERED)
        _REGISTERED.clear()
    removed = []
    for p in paths:
        try:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
            elif os.path.exists(p):
                os.unlink(p)
                removed.append(p)
        except OSError:
            pass  # a vanished or busy path must not break exit
    return removed


atexit.register(cleanup_now)
