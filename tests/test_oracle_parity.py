"""Replicates the driver's t2 gate at sf0.001: every registered query must
match its DuckDB oracle on row count, columns, and canonicalized values."""

from __future__ import annotations

import pytest

from pulseboard_spark.parity import run_all, duck_connection, compare
from pulseboard_spark.registry import QUERIES, ORACLE_SQL

# The sweep is the single biggest slice of suite wall time (~7 min of the
# old 16m39s default run); it lives behind `-m parity` so the default gate
# stays fast while the sweep remains a required pre-hand-off invocation
# (COVERAGE.md "Test invocations").
pytestmark = pytest.mark.parity

NAMES = [n for n in QUERIES if n in ORACLE_SQL]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, sf_dir, duck, name):
    res = compare(spark, duck, name, sf_dir)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, duck={res.duck_rows})"
    assert res.spark_rows >= 0
