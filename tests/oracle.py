"""Local replica of the driver's DuckDB-oracle correctness check.

The driver (SURVEY.md §5.2) runs each ``queries()[key]`` at sf0.01 and
compares against ``oracle_sql()[key]`` on row-count + schema +
order-insensitive value-hash. This harness is STRICTER: it compares
canonicalized values with exact equality, so anything passing here
passes any reasonable hash.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from kinesis_adapter_spark.catalog import TABLES

SF_TEST = "/root/testdata/sf0.01"
SF_FAST = "/root/testdata/sf0.001"
SF_BENCH = "/root/testdata/sf0.1"


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


def check_query(spark, key: str, sf_dir: str = SF_TEST, float_tol: float = 0.0) -> list[str]:
    """Run one registered query against its oracle; return mismatches."""
    from kinesis_adapter_spark.plans.registry import ORACLES, QUERIES

    df = QUERIES[key](spark, sf_dir)
    scols, srows = spark_result(df)
    con = duck_connect(sf_dir)
    try:
        dcols, drows = duck_result(con, ORACLES[key])
    finally:
        con.close()
    return compare(scols, srows, dcols, drows, float_tol=float_tol)
