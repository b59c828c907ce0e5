"""In-repo replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir and
compares row count + column names + order-insensitive canonicalized values.
Used by tests/test_oracle_parity.py (sf0.001) to catch drift before the
driver's sf0.01 gate does.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from pulseboard_spark.registry import QUERIES, ORACLE_SQL

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    detail: str = ""


def compare(spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str) -> ParityResult:
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = con.execute(ORACLE_SQL[name])
    d_cols = [c[0].lower() for c in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return ParityResult(name, False, len(s_rows), len(d_rows), f"columns differ: {sorted(s_cols)} vs {sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        return ParityResult(name, False, len(s_rows), len(d_rows), "row count differs")

    sc = _canon_rows(s_cols, s_rows)
    dc = _canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return ParityResult(name, False, len(s_rows), len(d_rows), f"values differ, first diffs: {diffs}")
    return ParityResult(name, True, len(s_rows), len(d_rows))


def run_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    con = duck_connection(sf_dir)
    results = []
    for name in names or [n for n in QUERIES if n in ORACLE_SQL]:
        try:
            results.append(compare(spark, con, name, sf_dir))
        except Exception as exc:  # surface, don't abort the sweep
            results.append(ParityResult(name, False, -1, -1, f"{type(exc).__name__}: {exc}"))
    return results
