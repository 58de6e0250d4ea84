"""Local replica of the driver's DuckDB-oracle correctness check.

The driver (SURVEY.md §5.2) runs each ``queries()[key]`` at sf0.01 and
compares against ``oracle_sql()[key]`` on row-count + schema +
order-insensitive value-hash. This harness is STRICTER: it compares
canonicalized values with exact equality, so anything passing here
passes any reasonable hash.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any

import duckdb

from kinesis_adapter_spark.catalog import TABLES

SF_TEST = "/root/testdata/sf0.01"
SF_FAST = "/root/testdata/sf0.001"
SF_BENCH = "/root/testdata/sf0.1"


def oracle_sql_for(key: str, sf_dir: str) -> str:
    """The oracle SQL for ``key``, re-pointed at ``sf_dir``'s staged
    artifacts (VERDICT r11 item #4). Artifact-reading oracles embed
    literal ``DERIVED_ROOT/sf0.01/...`` parquet paths because the
    driver's gate runs the raw string at sf0.01; every artifact is
    ALSO staged per-sf (derived_dir keys by basename, fingerprint-
    guarded), so at any other sf the same oracle applies verbatim
    once its paths are rewritten to that sf's staging dir. The Spark
    side of a check must run first — it stages the artifacts on first
    touch — which both check_query and replica_check already do."""
    from kinesis_adapter_spark.plans.registry import ORACLES
    from kinesis_adapter_spark.sources.scans import DERIVED_ROOT

    sql = ORACLES[key]
    base = Path(sf_dir.rstrip("/")).name
    if base != "sf0.01":
        sql = sql.replace(f"{DERIVED_ROOT}/sf0.01/", f"{DERIVED_ROOT}/{base}/")
    return sql


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v: Any) -> Any:
    """Canonicalize one cell so Spark/DuckDB representations compare."""
    import datetime

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return df.columns, [tuple(r) for r in df.collect()]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, [tuple(r) for r in cur.fetchall()]


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
    float_tol: float = 0.0,
) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    for i, (sr, dr) in enumerate(zip(s, d)):
        if sr == dr:
            continue
        if float_tol > 0 and _rows_close(sr, dr, float_tol):
            continue
        problems.append(f"row {i}: spark={sr!r} duck={dr!r}")
        if len(problems) >= 5:
            problems.append("... (truncated)")
            break
    return problems


def _rows_close(a: tuple, b: tuple, tol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                continue
        return False
    return True


# --- Engine-level (Arrow) output-type comparison -----------------------
#
# VERDICT r01 item #2: value equality alone let a decimal-width skew
# (Spark decimal(28,2) vs DuckDB DECIMAL(38,2)) slip past the local gate
# and fail the driver's hash.  The fix: compare the STATIC Arrow schema
# of both engines' results (LIMIT 0 — no data movement) under a
# normalization that treats hash-identical representations as equal but
# pins everything the driver's canonicalization might distinguish:
#   - decimals must match in precision AND scale (the proven blind spot)
#   - decimal vs int vs float never unify
#   - int widths unify (Python int is width-less once materialized)
#   - timestamp unit/tz unify (both canonicalize to naive datetime)
#   - string/large_string, date32/64, list/large_list unify
#   - nested types compare recursively

def _norm_arrow_type(t) -> str:
    import pyarrow.types as pt

    if pt.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return f"float{t.bit_width}"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_time(t):
        return "time"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(f"{f.name}:{_norm_arrow_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pt.is_map(t):
        return f"map<{_norm_arrow_type(t.key_type)},{_norm_arrow_type(t.item_type)}>"
    if pt.is_null(t):
        return "null"
    return str(t)


def spark_arrow_schema(df):
    """Static Arrow schema of a Spark result (LIMIT 0 — plan only)."""
    return df.limit(0).toArrow().schema


def duck_arrow_schema(con, sql: str):
    return con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema


def compare_arrow_schemas(s_schema, d_schema) -> list[str]:
    """Mismatch list between two Arrow schemas (column-name keyed)."""
    problems: list[str] = []
    s_types = {f.name: _norm_arrow_type(f.type) for f in s_schema}
    d_types = {f.name: _norm_arrow_type(f.type) for f in d_schema}
    if sorted(s_types) != sorted(d_types):
        return [f"columns: spark={sorted(s_types)} duck={sorted(d_types)}"]
    for name in sorted(s_types):
        if s_types[name] != d_types[name]:
            problems.append(
                f"type[{name}]: spark={s_types[name]} duck={d_types[name]}"
            )
    return problems


def arrow_type_problems(spark, key: str, sf_dir: str = SF_TEST, con=None) -> list[str]:
    """Engine-level type comparison for one oracled key."""
    from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES

    df = QUERIES[key](spark, sf_dir)
    own_con = con is None
    if own_con:
        con = duck_connect(sf_dir)
    try:
        d_schema = duck_arrow_schema(con, oracle_sql_for(key, sf_dir))
    finally:
        if own_con:
            con.close()
    return compare_arrow_schemas(spark_arrow_schema(df), d_schema)


def check_query(spark, key: str, sf_dir: str = SF_TEST, float_tol: float = 0.0) -> list[str]:
    """Run one registered query against its oracle; return mismatches."""
    from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES

    df = QUERIES[key](spark, sf_dir)
    scols, srows = spark_result(df)
    con = duck_connect(sf_dir)
    try:
        dcols, drows = duck_result(con, oracle_sql_for(key, sf_dir))
    finally:
        con.close()
    return compare(scols, srows, dcols, drows, float_tol=float_tol)
