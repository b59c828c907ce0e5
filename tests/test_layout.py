"""Physical layout levers: bucketed joins must be exchange-free, and
partitioned reads must prune directories at the scan."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from pulseboard_spark.sources.layout import read_table, write_bucketed, write_partitioned
from pulseboard_spark.sources.tables import entity_events, load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    """orders ⋈ customer both bucketed on custkey: the join runs on
    co-located buckets — zero Exchange nodes in the whole plan (the
    write-time shuffle is paid once, not per query)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", ["o_custkey"], 8, str(tmp_path / "orders_b"))
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", ["o_custkey"], 8, str(tmp_path / "customer_b"),
    )
    try:
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "customer_b"), "o_custkey"
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the join itself must not shuffle; the only allowed exchange is the
        # tiny 5-key final aggregation above it
        assert "Exchange" not in plan[plan.index("SortMergeJoin"):], plan[:3000]
        n = joined.count()
        assert n >= 1
        # sanity: same answer as the unbucketed join
        want = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment").count().count()
        )
        assert n == want
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_partitioned_read_prunes(spark, sf_dir, tmp_path):
    """Events written partitioned by day: a one-day predicate must appear
    as PartitionFilters and scan only that day's directory."""
    ev = entity_events(spark, sf_dir).withColumn(
        "day", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    write_partitioned(ev, str(tmp_path / "ev_days"), ["day"], sort_cols=["ts_ms"])
    got = spark.read.parquet(str(tmp_path / "ev_days")).where(F.col("day") == "2024-01-05")
    plan = _plan(got)
    assert re.search(r"PartitionFilters: \[[^\]]*day", plan), plan[:2000]
    want = ev.where(F.col("day") == "2024-01-05").count()
    assert got.count() == want
