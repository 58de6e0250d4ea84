"""The pre-declare gate (SURVEY.md §5.4): every key that appears in
``oracle_sql()`` must exactly match its DuckDB oracle at sf0.01.

This replicates the driver's check with exact value equality (stricter
than a hash). Keys registered without an oracle are checked rows-only.
"""

from __future__ import annotations

import pytest

from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES, load_all_modules
from tests.oracle import SF_TEST, check_query

load_all_modules()

ORACLED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("key", ORACLED)
def test_oracle_parity(spark, key):
    problems = check_query(spark, key, SF_TEST)
    assert not problems, f"{key}: " + "; ".join(problems)


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only(spark, key):
    df = QUERIES[key](spark, SF_TEST)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
