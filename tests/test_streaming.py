"""Streaming twins must agree with the batch operators on the same data.

Strategy (SURVEY §5): file-source streams fed in time-ordered chunks with
maxFilesPerTrigger=1, memory sink, processAllAvailable, then set-compare
against the batch result — the batch path is oracle-checked, so streaming
equivalence transitively inherits oracle correctness.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pulseboard_spark.sources.tables import entity_events
from pulseboard_spark.operators import rules
from pulseboard_spark.streaming.stateful import (
    ALERT_SCHEMA,
    alert_rules_stateful,
    segment_diff_stateful,
)


@pytest.fixture(scope="module")
def entity_chunks_dir(spark, sf_dir, tmp_path_factory):
    """Entity view split into 4 time-ordered parquet chunks."""
    out = str(tmp_path_factory.mktemp("entity_stream"))
    df = entity_events(spark, sf_dir).orderBy("ts_us")
    n = df.count()
    chunk = (n + 3) // 4
    rows = df.collect()
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, df.schema).coalesce(1).write.mode("overwrite").parquet(
                f"{out}/chunk={i}"
            )
    return out, df.schema


def test_streaming_alerts_match_batch(spark, sf_dir, entity_chunks_dir):
    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    alerts = alert_rules_stateful(stream)
    q = (
        alerts.writeStream.format("memory")
        .queryName("stream_alerts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql("SELECT rule, entity_id, ts_ms, severity, event_id FROM stream_alerts").collect()
    }

    batch = rules.alerts(entity_events(spark, sf_dir)).filter(F.col("rule") != "R3_GEO_DEVICE_MISMATCH")
    want = {tuple(r) for r in batch.collect()}
    missing = want - got
    extra = got - want
    assert not missing and not extra, f"missing={list(missing)[:5]} extra={list(extra)[:5]}"


def test_segment_diff_stateful(spark, tmp_path):
    rows = [
        # profile, segments, ts
        ("p1", ["pro_plan"], 1_000),
        ("p1", ["pro_plan", "power_user"], 2_000),
        ("p1", ["power_user"], 3_000),
        ("p2", [], 1_500),
        ("p2", ["reengage"], 2_500),
    ]
    df = spark.createDataFrame(
        [(p, s, t, t) for p, s, t in rows], "profile_id string, segments array<string>, ts_ms bigint, t long"
    ).withColumn("ts", F.timestamp_millis(F.col("t"))).drop("t")
    path = str(tmp_path / "snapshots")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        segment_diff_stateful(stream)
        .writeStream.format("memory")
        .queryName("seg_events")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.profile_id, r.segment, r.action, r.ts_ms)
        for r in spark.sql("SELECT * FROM seg_events").collect()
    }
    want = {
        ("p1", "pro_plan", "ENTER", 1_000),
        ("p1", "power_user", "ENTER", 2_000),
        ("p1", "pro_plan", "EXIT", 3_000),
        ("p2", "reengage", "ENTER", 2_500),
    }
    assert got == want
