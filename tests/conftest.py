from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from kinesis_adapter_spark.session import build_spark

    s = build_spark(app_name="kas-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
