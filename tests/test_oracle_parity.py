"""Replicates the driver's t2 gate at sf0.001: every registered query must
match its DuckDB oracle on row count, columns, and canonicalized values."""

from __future__ import annotations

import pytest

from pulseboard_spark.parity import run_all, duck_connection, compare
from pulseboard_spark.registry import QUERIES, ORACLE_SQL

NAMES = [n for n in QUERIES if n in ORACLE_SQL]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, sf_dir, duck, name):
    res = compare(spark, duck, name, sf_dir)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, duck={res.duck_rows})"
    assert res.spark_rows >= 0
