"""Local mirror of the driver's Spark-vs-DuckDB correctness check:
row count + column names + order-insensitive value comparison (exact,
since the queries are engineered for bit-identical results)."""

from __future__ import annotations

import math

import duckdb

from ocr_gang_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [colnames[i] for i in order]


def compare(spark_df, con, sql: str):
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    errors = []
    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    s_ms, cols = rows_to_multiset([tuple(r) for r in s_rows], s_cols)
    d_ms, _ = rows_to_multiset(d_rows, d_cols)
    if s_ms != d_ms:
        diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:3]
        only_s = [r for r in s_ms if r not in set(map(tuple, d_ms))][:2]
        errors.append(f"values differ (cols={cols}); first diffs={diffs} only_spark={only_s}")
    return errors
