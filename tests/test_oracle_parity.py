"""The pre-declare gate (SURVEY.md §5.4): every key that appears in
``oracle_sql()`` must exactly match its DuckDB oracle at sf0.01.

This replicates the driver's check with exact value equality (stricter
than a hash). Keys registered without an oracle are checked rows-only.
"""

from __future__ import annotations

import pytest

from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES, load_all_modules
from tests.oracle import (
    SF_TEST,
    arrow_type_problems,
    check_query,
    compare_arrow_schemas,
    duck_arrow_schema,
    duck_connect,
    spark_arrow_schema,
)

load_all_modules()

ORACLED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("key", ORACLED)
def test_oracle_parity(spark, key):
    problems = check_query(spark, key, SF_TEST)
    assert not problems, f"{key}: " + "; ".join(problems)


@pytest.mark.parametrize("key", ORACLED)
def test_arrow_type_parity(spark, key):
    """Engine-level output types must match (VERDICT r01 item #2).

    Value equality alone let agg_decimal_exact's decimal(28,2) vs
    DECIMAL(38,2) skew pass locally and fail the driver hash; this gate
    compares the static Arrow schema of both engines under a
    normalization that pins decimal precision/scale exactly.
    """
    problems = arrow_type_problems(spark, key, SF_TEST)
    assert not problems, f"{key}: " + "; ".join(problems)


def test_type_gate_catches_decimal_skew(spark):
    """The gate must FAIL on a deliberately mis-typed probe — the exact
    skew class that produced r01's only red driver row."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("1.00").cast("decimal(28,2)").alias("total")
    )
    con = duck_connect(SF_TEST)
    try:
        d = duck_arrow_schema(con, "SELECT CAST(1.00 AS DECIMAL(38,2)) AS total")
        ok = duck_arrow_schema(con, "SELECT CAST(1.00 AS DECIMAL(28,2)) AS total")
    finally:
        con.close()
    assert compare_arrow_schemas(spark_arrow_schema(df), d), (
        "type gate failed to flag decimal(28,2) vs DECIMAL(38,2)"
    )
    assert not compare_arrow_schemas(spark_arrow_schema(df), ok)


def test_type_gate_tolerates_int_width(spark):
    """Negative control: int widths unify (Python ints are width-less
    after materialization, so the driver hash can't distinguish them)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(1).cast("long").alias("n"))
    con = duck_connect(SF_TEST)
    try:
        d = duck_arrow_schema(con, "SELECT CAST(1 AS INTEGER) AS n")
    finally:
        con.close()
    assert not compare_arrow_schemas(spark_arrow_schema(df), d)


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only(spark, key):
    df = QUERIES[key](spark, SF_TEST)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_oracled_key_is_vacuously_empty():
    """r6 guard: a zero-row result hash-matches a zero-row oracle no
    matter how wrong both sides are — join_spatial_grid's first
    fixture collapsed onto a lattice with no near pairs, and
    join_range_bucketed ranged events (2024) against orders
    (1995-2001) and had been vacuously green since r2. Every oracle
    must return at least one row at the oracle SF; a key whose empty
    result is SEMANTICALLY correct must be allowlisted here with a
    reason."""
    import duckdb

    allow_empty: dict[str, str] = {}
    con = duck_connect(SF_TEST)
    try:
        empty = []
        for k, sql in sorted(ORACLES.items()):
            if k in allow_empty:
                continue
            try:
                rows = con.execute(f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall()
            except duckdb.IOException:
                # Only a derived-fixture oracle may be skipped (not yet
                # staged under this process ordering; the replica
                # artifact's zero_row_keys covers those every round) —
                # an IOException from anything else must fail, or an
                # unstaged AND vacuous key slips both nets (r6 review).
                assert "kas_derived" in sql, f"{k}: unexpected IO failure"
                continue
            if not rows:
                empty.append(k)
    finally:
        con.close()
    assert not empty, f"vacuously-empty oracles: {empty}"
