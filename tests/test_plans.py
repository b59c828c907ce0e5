"""Physical-plan hygiene regression tests (SCALE.md contract).

These pin the *shape* of the plans, not the results: filters reach the
parquet scan, projection pruning reaches ReadSchema, shuffle counts don't
silently grow, and Python appears only in the designated Arrow seams.
A refactor that turns a one-shuffle window plan into a join-plus-three
shuffles would pass every value-level test — this file is what fails.
"""

from __future__ import annotations

import re

import pytest

from pulseboard_spark.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


PY_NODES = re.compile(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas")


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter must reach the scan"
    schemas = _read_schemas(plan)
    assert schemas and all("l_comment" not in s for s in schemas), "unused wide column must be pruned"
    # single aggregation shuffle
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1


def test_trailing_windows_single_key_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_trailing_aggs")
    # all five trailing frames share ONE hash partitioning on the key
    hashparts = re.findall(r"hashpartitioning\(entity_id", plan)
    assert len(hashparts) == 1, f"expected one key shuffle, got {len(hashparts)}"
    assert not PY_NODES.search(plan), "window layer must stay JVM-side"
    schemas = _read_schemas(plan)
    assert all("props" not in s for s in schemas), "unused props column must be pruned"


def test_rolling_counter_single_key_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rolling_counter_24h")
    hashparts = re.findall(r"hashpartitioning\(pid", plan)
    assert len(hashparts) == 1, f"expected one (pid,name) shuffle, got {len(hashparts)}"
    assert "Join" not in plan, "rolling counter must be the window form, not a self-join"
    assert not PY_NODES.search(plan)


def test_rules_stay_jvm_side(spark, sf_dir):
    for name in ["r1_velocity_spike", "r4_exfil"]:
        plan = _plan(spark, sf_dir, name)
        assert not PY_NODES.search(plan), f"{name} must compile to pure Catalyst expressions"


def test_ewma_exactly_one_python_seam(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ewma")
    assert len(PY_NODES.findall(plan)) == 1, "EWMA is the single designated Arrow seam"
    assert "MapInPandas" in plan, "EWMA must be the partition-level scan, not per-group apply"


def test_profile_aggs_prune_text(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_quality")
    schemas = _read_schemas(plan)
    assert schemas and all("source" not in s for s in schemas), "unused doc columns pruned"


def test_top20_is_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top20_profiles")
    assert "TakeOrderedAndProject" in plan, "top-k must not be a global sort"
