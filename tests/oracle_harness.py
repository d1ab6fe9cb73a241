"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side, sorts
columns by name (as the driver does before value-hashing), and compares the
order-insensitive multisets of rows.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and ulp noise surviving the query-side rounding
        return round(v, 9) + 0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def run_spark_query(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_oracle(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [tuple(r) for r in cur.fetchall()]
    return cols, rows


def compare_query(spark, fn, sql: str, sf_dir: str) -> dict:
    s_cols, s_rows = run_spark_query(spark, fn, sf_dir)
    con = duckdb_connection(sf_dir)
    try:
        o_cols, o_rows = run_oracle(con, sql)
    finally:
        con.close()
    result = {
        "spark_cols": sorted(s_cols), "oracle_cols": sorted(o_cols),
        "spark_rowcount": len(s_rows), "oracle_rowcount": len(o_rows),
    }
    result["cols_match"] = sorted(s_cols) == sorted(o_cols)
    sc = canonical_rows(s_cols, s_rows)
    oc = canonical_rows(o_cols, o_rows)
    result["values_match"] = sc == oc
    if not result["values_match"]:
        mism = [(a, b) for a, b in zip(sc, oc) if a != b]
        result["first_diffs"] = mism[:5]
        only_s = [r for r in sc if r not in oc][:3]
        only_o = [r for r in oc if r not in sc][:3]
        result["only_spark"] = only_s
        result["only_oracle"] = only_o
    return result
