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


@pytest.fixture
def small_state(spark):
    """sf0.001 fixtures are a few thousand rows; one state partition per
    core just multiplies per-micro-batch Python state-task overhead (the
    sized_session dial, SCALE.md 'Tuned visibility latency').  4 keeps the
    multi-partition state path exercised.  Fresh tmp_path checkpoints bind
    the count at first start, so a per-test override is safe to restore."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.fixture(scope="module")
def entity_chunks_dir(spark, sf_dir, tmp_path_factory):
    """Entity view split into 4 time-ordered parquet chunks."""
    out = str(tmp_path_factory.mktemp("entity_stream"))
    # (ts_us, event_id) is the engine's arrival order — ordering by ts_us
    # alone is unstable across same-ts peers, and a reversed-peer chunk
    # split would let the kernel see a "later" arrival batch excludes
    df = entity_events(spark, sf_dir).orderBy("ts_us", "event_id")
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


def test_streaming_alerts_match_batch(spark, sf_dir, entity_chunks_dir, small_state):
    """On REAL testdata this equality is no-spurious-alerts only: the
    driver data never trips R1/R2/R4 (every alert is R3), so both sides
    are empty.  The non-vacuous positive-path twin equality runs on the
    engineered firing fixture in tests/test_rule_firing.py."""
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
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_profile_apply_stateful_matches_batch(spark, sf_dir, tmp_path, small_state):
    """Feed canonical-id-tagged CDP events through the stateful profile
    operator in 3 time-ordered chunks; the LAST emitted snapshot per profile
    must equal the batch materialization (identifiers, LWW traits, lastSeen)
    with the counter as of each profile's own last event."""
    from pulseboard_spark.registry import _evprof
    from pulseboard_spark.operators.profiles import build_profiles, DAY_MS, MINUTE_MS
    from pulseboard_spark.streaming.stateful import profile_apply_stateful

    ev = _evprof(spark, sf_dir).select(
        "profile_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "ts_us", "ts_ms",
        "event_id", "ctype", "name", "plan", "country", "nuser", "nanon", "nemail",
    ).orderBy("ts_us", "event_id")
    rows = ev.collect()
    out = str(tmp_path / "cdp_stream")
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i}")

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(f"{out}/chunk=*")
    q = (
        profile_apply_stateful(stream)
        .writeStream.format("memory")
        .queryName("profile_snaps")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    snaps = spark.sql("SELECT * FROM profile_snaps").collect()
    assert snaps, "no snapshots emitted"
    last = {}
    for r in snaps:  # memory sink appends in batch order; later batch wins
        last[r.profile_id] = r

    batch = {r.profile_id: r for r in build_profiles(_evprof(spark, sf_dir)).collect()}
    assert set(last) == set(batch)

    # per-profile 24h counter as of that profile's last event (the streaming
    # "now"); batch build_profiles uses the global max ts, so recompute here
    from pyspark.sql import functions as F2
    e = _evprof(spark, sf_dir)
    seen = e.groupBy("profile_id").agg(F2.max("ts_ms").alias("as_of"))
    cnt = (
        e.join(seen, "profile_id")
        .filter(
            (F2.col("ctype") == "TRACK") & (F2.col("name") == "Feature Used")
            & (F2.col("ts_ms") - F2.col("ts_ms") % MINUTE_MS
               >= (F2.col("as_of") - DAY_MS) - (F2.col("as_of") - DAY_MS) % MINUTE_MS)
        )
        .groupBy("profile_id").count()
    )
    want_cnt = {r.profile_id: r["count"] for r in cnt.collect()}

    for pid, b in batch.items():
        s = last[pid]
        assert s.user_ids == sorted(b.user_ids), pid
        assert s.emails == sorted(b.emails), pid
        assert s.anonymous_ids == sorted(b.anonymous_ids), pid
        assert s.plan == b.plan and s.country == b.country, pid
        assert s.last_seen_ms == b.last_seen_ms, pid
        assert s.feature_used_24h == want_cnt.get(pid, 0), pid


def test_reengage_event_time_timer(spark, tmp_path, small_state):
    """W10/G3: reengage must ENTER on silence (timer), EXIT on activity."""
    from pulseboard_spark.streaming.stateful import reengage_stateful

    S = 1000  # ms per second
    chunks = [
        [("p1", 0), ("p1", 60 * S), ("p2", 0), ("p2", 300 * S)],
        [("p2", 360 * S), ("p2", 840 * S)],      # watermark passes p1.last + 10m
        [("p2", 900 * S)],                        # p1 timer fires -> ENTER
        [("p1", 960 * S)],                        # p1 activity -> EXIT
        [("p2", 2400 * S)],                       # watermark passes p1's new timer -> ENTER
    ]
    out = str(tmp_path / "reengage_stream")
    schema = "profile_id string, ts_ms bigint"
    for i, rows in enumerate(chunks):
        df = (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        )
        df.coalesce(1).write.parquet(f"{out}/chunk={i}")
    full_schema = spark.read.parquet(f"{out}/chunk=0").schema
    stream = spark.readStream.schema(full_schema).option("maxFilesPerTrigger", "1").parquet(f"{out}/chunk=*")
    q = (
        reengage_stateful(stream)
        .writeStream.format("memory")
        .queryName("reengage_events")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.profile_id, r.segment, r.action, r.ts_ms)
        for r in spark.sql("SELECT * FROM reengage_events").collect()
    }
    want = {
        ("p1", "reengage", "ENTER", 60 * S + 600_000 + 1),
        ("p1", "reengage", "EXIT", 960 * S),
        ("p1", "reengage", "ENTER", 960 * S + 600_000 + 1),
    }
    assert got == want, f"got={sorted(got)}"


def test_incremental_identity_stage(spark, sf_dir, tmp_path, small_state):
    """§3.2 foreachBatch identity stage: after streaming all chunks, the
    incremental (seeded) component map must equal the batch fixpoint, and
    resolved events must cover every valid event."""
    from pulseboard_spark.sources.tables import cdp_events
    from pulseboard_spark.operators.identity import components_for, valid_cdp_events
    from pulseboard_spark.streaming.pipeline import CdpIdentityStage

    raw = cdp_events(spark, sf_dir).orderBy("ts_us", "event_id")
    rows = raw.collect()
    out = str(tmp_path / "cdp_raw")
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, raw.schema).coalesce(1).write.parquet(f"{out}/chunk={i}")

    stream = spark.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1").parquet(f"{out}/chunk=*")
    stage = CdpIdentityStage(spark, str(tmp_path / "idstate"))
    q = (
        stream.writeStream.foreachBatch(stage.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.id, r.component) for r in stage.components().collect()}
    want = {(r.id, r.component) for r in components_for(valid_cdp_events(raw)).collect()}
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"

    resolved_ids = {r.event_id for r in stage.resolved().select("event_id").collect()}
    valid_ids = {r.event_id for r in valid_cdp_events(raw).select("event_id").collect()}
    assert resolved_ids == valid_ids


def test_entity_alert_stream_facade(spark, sf_dir, tmp_path, small_state):
    """§3.1 facade (admission -> dedup -> stateful rules) must equal the
    batch alerts on replayed chunks.  The real testdata exercises the
    admission/dedup volume path but never fires R1/R2/R4, so the firing
    fixture is unioned in to make the equality non-vacuous."""
    from pulseboard_spark.sources.generator import rule_firing_events
    from pulseboard_spark.streaming.pipeline import entity_alert_stream

    # order by the full arrival key (ts_us, event_id): same-ts peers split
    # across chunks in reversed id order would diverge from batch ties
    ev = (
        entity_events(spark, sf_dir)
        .unionByName(rule_firing_events(spark))
        .orderBy("ts_us", "event_id")
    )
    rows = ev.collect()
    out = str(tmp_path / "facade_stream")
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i}")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        entity_alert_stream(stream)
        .writeStream.format("memory")
        .queryName("facade_alerts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql("SELECT rule, entity_id, ts_ms, severity, event_id FROM facade_alerts").collect()
    }
    batch = rules.alerts(
        entity_events(spark, sf_dir).unionByName(rule_firing_events(spark))
    ).filter(F.col("rule") != "R3_GEO_DEVICE_MISMATCH")
    want = {tuple(r) for r in batch.collect()}
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_r3_stateful_matches_batch(spark, sf_dir, entity_chunks_dir):
    """Streaming R3 (per-entity 2-min tag buffer in keyed state) emits
    exactly the batch r3_geo_device_eval rows on an in-order replay."""
    from pulseboard_spark.streaming.stateful import r3_stateful

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        r3_stateful(stream)
        .writeStream.format("memory")
        .queryName("stream_r3")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_r3").collect()}
    want = {
        tuple(r)
        for r in rules.r3_geo_device_eval(entity_events(spark, sf_dir))
        .select(
            "event_id", "entity_id", "type", "profile", "ts_ms",
            "current_geo", "current_device", "geo_conflict", "device_conflict",
            "prev_geo", "prev_device", "n_conflicts",
        )
        .withColumn("severity", F.lit("MEDIUM"))
        .collect()
    }
    missing, extra = want - got, got - want
    assert not missing and not extra, f"missing={list(missing)[:3]} extra={list(extra)[:3]}"


def test_streaming_minute_counts_match_batch(spark, sf_dir, entity_chunks_dir):
    """Built-in windowed-agg twin (A9): complete-mode counts == batch
    tumbling buckets."""
    from pulseboard_spark.operators.windows import minute_counts
    from pulseboard_spark.streaming.pipeline import streaming_minute_counts

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        streaming_minute_counts(stream)
        .writeStream.format("memory")
        .queryName("stream_minutes")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT minute_ms, n_events FROM stream_minutes").collect()}
    want = {tuple(r) for r in minute_counts(entity_events(spark, sf_dir)).collect()}
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_streaming_sessions_match_batch(spark, sf_dir, entity_chunks_dir):
    """Built-in session_window twin: same (entity, start, size) sessions as
    the batch gaps-and-islands operator; built-in end = last_ts + gap."""
    from pulseboard_spark.operators.sessions import sessionize
    from pulseboard_spark.streaming.pipeline import streaming_sessions

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        streaming_sessions(stream)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    gap_ms = 30 * 60 * 1000
    got = {
        (r.entity_id, r.session_start_ms, r.window_end_ms - gap_ms, r.n_events)
        for r in spark.sql(
            "SELECT entity_id, session_start_ms, window_end_ms, n_events FROM stream_sessions"
        ).collect()
    }
    want = {
        (r.entity_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in sessionize(entity_events(spark, sf_dir)).collect()
    }
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_admission_observed_metrics(spark):
    """W2 late-vs-ontime counters ride the scan via observe() — no second
    pass.  Batch form uses Observation; streaming surfaces the same metrics
    in StreamingQueryProgress.observedMetrics."""
    from pyspark.sql import Observation
    from pulseboard_spark.streaming.pipeline import with_admission

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], ["i"]
    ).select(
        F.col("i").cast("string").alias("event_id"),
        # rows 1-3 an hour in the past (late); row 4 an hour ahead (on time)
        F.when(
            F.col("i") < 4, F.current_timestamp() - F.expr("INTERVAL 1 HOUR")
        ).otherwise(F.current_timestamp() + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    obs = Observation("admission")
    out = with_admission(df, observation=obs)
    assert out.count() == 4
    got = obs.get
    assert got["n_admitted"] == 4
    assert got["n_late"] == 3


def test_minute_counts_on_rocksdb_state(spark, sf_dir, entity_chunks_dir):
    """The stateful windowed agg produces identical results on the RocksDB
    state store (the 100 TB-state provider) as on the default heap one."""
    from pulseboard_spark.operators.windows import minute_counts
    from pulseboard_spark.streaming.pipeline import streaming_minute_counts, use_rocksdb_state, ROCKSDB_PROVIDER

    out, schema = entity_chunks_dir
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{out}/chunk=*")
        )
        q = (
            streaming_minute_counts(stream)
            .writeStream.format("memory")
            .queryName("rocksdb_minutes")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = {tuple(r) for r in spark.sql("SELECT minute_ms, n_events FROM rocksdb_minutes").collect()}
    want = {tuple(r) for r in minute_counts(entity_events(spark, sf_dir)).collect()}
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_checkpoint_restart_recovery(spark, sf_dir, entity_chunks_dir, tmp_path):
    """Kill-and-restart exactly-once: a windowed-count query with a file
    sink is stopped after two chunks, then restarted from the same
    checkpoint with all four available.  The restarted query must resume
    from state (no duplicated windows in the sink) and the emitted windows
    must match the batch answer exactly."""
    from pulseboard_spark.operators.windows import minute_counts
    from pulseboard_spark.streaming.pipeline import streaming_minute_counts

    out, schema = entity_chunks_dir
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start(glob):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )
        return (
            streaming_minute_counts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start(f"{out}/chunk={{0,1}}")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    q = start(f"{out}/chunk=*")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(sink).collect()
    minutes = [r.minute_ms for r in got]
    assert len(minutes) == len(set(minutes)), "restart duplicated windows"

    # append mode only finalizes windows the watermark has passed; every
    # emitted window must carry the exact batch count
    want = {r.minute_ms: r.n_events for r in minute_counts(entity_events(spark, sf_dir)).collect()}
    assert got, "no windows finalized"
    for r in got:
        assert want[r.minute_ms] == r.n_events


def test_scheduler_pool_sets_and_restores_property(spark, tmp_path):
    """scheduler_pool pins spark.scheduler.pool around start() and
    restores the previous value (nesting-safe); under the default FIFO
    scheduler the property is inert, so a query started inside a pool
    still runs to completion with correct output."""
    import json

    from pulseboard_spark.streaming.pipeline import scheduler_pool

    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(json.dumps({"id": i % 3}) for i in range(30)))
    with scheduler_pool(spark, "outer"):
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
        with scheduler_pool(spark, "pool_counts"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "pool_counts"
            q = (
                spark.readStream.schema("id LONG").json(str(src))
                .groupBy("id").count()
                .writeStream.outputMode("complete")
                .format("memory").queryName("pool_counts_q")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    got = {r["id"]: r["count"] for r in spark.sql("SELECT * FROM pool_counts_q").collect()}
    assert got == {0: 10, 1: 10, 2: 10}


def test_sized_session_binds_state_partitions(spark, tmp_path):
    """sized_session pins a PER-QUERY state-store partition count (the
    measured latency dial, SCALE.md): two stateful queries started from
    differently-sized clones bind 3- and 8-partition state stores — the
    checkpoint's state/0/ layout is the ground truth Spark itself replays
    from — while the parent session's conf stays untouched and a
    concurrent query on the parent still binds the parent's count."""
    import json

    from pulseboard_spark.streaming.pipeline import sized_session

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"id": i % 5}) for i in range(50))
    )
    parent_before = spark.conf.get("spark.sql.shuffle.partitions")

    def run(session, n, tag):
        ckpt = tmp_path / f"ckpt_{tag}"
        q = (
            session.readStream.schema("id LONG").json(str(src))
            .groupBy("id").count()
            .writeStream.outputMode("update").format("noop")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        # availableNow must finish; a False return would mean we'd count a
        # partially-written state/0/ layout and fail confusingly downstream
        assert q.awaitTermination(120), "availableNow query did not finish in 120s"
        # state/0/ holds one numeric dir per state partition plus _metadata
        return sum(
            1 for p in (ckpt / "state" / "0").iterdir()
            if p.is_dir() and p.name.isdigit()
        )

    assert run(sized_session(spark, 3), 3, "s3") == 3
    assert run(sized_session(spark, 8), 8, "s8") == 8
    assert spark.conf.get("spark.sql.shuffle.partitions") == parent_before
    assert run(spark, None, "parent") == int(parent_before)


def test_fair_allocation_file_shape():
    """write_fair_allocation emits the exact XML contract Spark's FAIR
    scheduler parses (pool name / weight / minShare / FIFO-within) — the
    co-residency weight dial (SCALE.md round-9 latency table).  Parsed
    back with the stdlib to pin structure, not string formatting."""
    import xml.etree.ElementTree as ET

    from pulseboard_spark.session import write_fair_allocation

    path = write_fair_allocation(
        {"pool_alerts": 4, "pool_profiles": 1},
        min_shares={"pool_alerts": 16},
    )
    root = ET.parse(path).getroot()
    assert root.tag == "allocations"
    pools = {p.attrib["name"]: p for p in root.findall("pool")}
    assert set(pools) == {"pool_alerts", "pool_profiles"}
    a = pools["pool_alerts"]
    assert a.findtext("weight") == "4"
    assert a.findtext("minShare") == "16"
    assert a.findtext("schedulingMode") == "FIFO"
    assert pools["pool_profiles"].findtext("weight") == "1"
    assert pools["pool_profiles"].findtext("minShare") == "0"
    # pool names reach the XML from CLI input (tools/probes/multi_stream.py):
    # anything outside [A-Za-z0-9_-]+ is attribute-injectable and must be
    # refused, not interpolated (r09 advisory)
    import pytest as _pytest

    for bad in ('po"ol', "a<b", "a&b", "", "a b"):
        with _pytest.raises(ValueError, match="pool name"):
            write_fair_allocation({bad: 1})


def test_r3_stream_stream_join_matches_batch(spark, sf_dir, entity_chunks_dir, small_state):
    """Native watermarked stream-stream interval join == batch conflict
    pairs (the third R3 twin, after the bucketed batch join and the
    keyed-state buffer)."""
    from pulseboard_spark.operators.rules import r3_conflict_pairs
    from pulseboard_spark.streaming.pipeline import r3_stream_stream_join

    out, schema = entity_chunks_dir

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{out}/chunk=*")
        )

    q = (
        r3_stream_stream_join(src(), src())
        .writeStream.format("memory")
        .queryName("ss_r3")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT event_id, entity_id, ts_ms, prev_event_id, geo_conflict, device_conflict FROM ss_r3"
        ).collect()
    }
    want = {tuple(r) for r in r3_conflict_pairs(entity_events(spark, sf_dir)).collect()}
    assert got == want and got


def test_stream_static_enrichment(spark, sf_dir, entity_chunks_dir, small_state):
    """Stream-static broadcast join: streaming events enriched with a
    static geo dim must match the batch join exactly, with no state.
    (small_state: the complete-mode groupBy re-shuffles every micro-batch;
    32 shuffle partitions over a few thousand rows was the top single
    entry in the r10 gate durations at 81s under load.)"""
    from pulseboard_spark.streaming.pipeline import with_dim_enrichment

    out, schema = entity_chunks_dir
    dim = spark.createDataFrame(
        [("US", "amer"), ("CA", "amer"), ("UK", "emea"), ("DE", "emea"), ("FR", "emea")],
        "geo string, region string",
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        with_dim_enrichment(stream, dim, "geo")
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.region: r.n for r in spark.sql("SELECT * FROM enriched").collect()}
    want = {
        r.region: r.n
        for r in entity_events(spark, sf_dir)
        .join(dim, "geo", "left")
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and set(got) == {"amer", "emea"}


def test_idempotent_foreach_batch_writer(spark, sf_dir, entity_chunks_dir, tmp_path):
    """Redelivered batch ids must not duplicate output: replaying every
    batch through the writer a second time leaves the row count unchanged."""
    from pulseboard_spark.streaming.pipeline import idempotent_parquet_writer

    out, schema = entity_chunks_dir
    sink = str(tmp_path / "fb_sink")
    writer = idempotent_parquet_writer(sink)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(sink)
    n1 = first.count()
    assert n1 == entity_events(spark, sf_dir).count()
    batch_ids = [r.batch_id for r in first.select("batch_id").distinct().collect()]
    # crash-replay simulation: redeliver every committed batch
    for bid in batch_ids:
        writer(spark.read.parquet(f"{sink}/batch_id={bid}"), bid)
    assert spark.read.parquet(sink).count() == n1


def test_shed_oldest_keeps_newest(spark):
    """W9 twin: above the cap a batch sheds its OLDEST rows (by ts_ms,
    event_id) and reports the drop count; below it nothing changes."""
    from pulseboard_spark.streaming.pipeline import shed_oldest

    rows = [(i, 1000 + i) for i in range(20)]  # event_id, ts_ms
    df = spark.createDataFrame(rows, "event_id long, ts_ms long")
    kept, dropped = shed_oldest(df, cap=5)
    assert dropped == 15
    assert sorted(r.event_id for r in kept.collect()) == [15, 16, 17, 18, 19]
    kept_all, dropped0 = shed_oldest(df, cap=100)
    assert dropped0 == 0 and kept_all.count() == 20


def test_profile_upsert_writer_merges_latest(spark, tmp_path):
    """Bucketed parquet UPSERT: later batches overwrite only touched
    buckets; the store converges to the latest row per profile."""
    from pulseboard_spark.streaming.pipeline import profile_upsert_writer

    store = str(tmp_path / "profiles")
    writer = profile_upsert_writer(store, key="profile_id", order=("ts_ms",), n_buckets=4)
    b1 = spark.createDataFrame(
        [("p1", 100, "basic"), ("p2", 100, "basic"), ("p3", 100, "pro")],
        "profile_id string, ts_ms long, plan string",
    )
    writer(b1, 0)
    b2 = spark.createDataFrame(
        [("p1", 200, "pro"), ("p4", 150, "basic")],
        "profile_id string, ts_ms long, plan string",
    )
    writer(b2, 1)
    got = {
        r.profile_id: (r.ts_ms, r.plan)
        for r in spark.read.parquet(store).collect()
    }
    assert got == {
        "p1": (200, "pro"),     # upserted by batch 2
        "p2": (100, "basic"),   # untouched bucket survives
        "p3": (100, "pro"),
        "p4": (150, "basic"),   # inserted by batch 2
    }
    # replaying batch 2 (at-least-once redelivery) changes nothing
    writer(b2, 1)
    again = {
        r.profile_id: (r.ts_ms, r.plan)
        for r in spark.read.parquet(store).collect()
    }
    assert again == got


def test_profile_upsert_tie_breaks_to_batch(spark, tmp_path):
    """Equal order-column values: the incoming batch row must win, not a
    nondeterministic pick."""
    from pulseboard_spark.streaming.pipeline import profile_upsert_writer

    store = str(tmp_path / "profiles_tie")
    writer = profile_upsert_writer(store, key="profile_id", order=("ts_ms",), n_buckets=2)
    writer(spark.createDataFrame([("p1", 100, "basic")], "profile_id string, ts_ms long, plan string"), 0)
    writer(spark.createDataFrame([("p1", 100, "pro")], "profile_id string, ts_ms long, plan string"), 1)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1 and rows[0].plan == "pro"


def test_streaming_transitions_match_batch(spark, sf_dir, entity_chunks_dir):
    """The stateful pair emitter, aggregated, must reproduce the batch
    Markov matrix exactly (counts per (from, to) pair) under in-order
    chunk replay."""
    from pulseboard_spark.operators.timeseries import event_transitions
    from pulseboard_spark.streaming.stateful import transitions_stateful

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        transitions_stateful(stream)
        .writeStream.format("memory")
        .queryName("stream_transitions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.sql(
            "SELECT from_type, to_type, count(*) AS n FROM stream_transitions GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(entity_events(spark, sf_dir)).collect()
    }
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (state-server "
    "protocol) — not shipped in this environment; operator is import-clean "
    "and the applyInPandasWithState twin covers the semantics",
)
def test_transitions_tws_matches_legacy_and_batch(spark, sf_dir, entity_chunks_dir):
    """The transformWithStateInPandas twin (current-gen API, RocksDB
    provider) must reproduce the batch Markov matrix exactly, like the
    applyInPandasWithState twin."""
    from pulseboard_spark.operators.timeseries import event_transitions
    from pulseboard_spark.streaming.pipeline import ROCKSDB_PROVIDER, use_rocksdb_state
    from pulseboard_spark.streaming.stateful import transitions_stateful_tws

    out, schema = entity_chunks_dir
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{out}/chunk=*")
        )
        q = (
            transitions_stateful_tws(stream)
            .writeStream.format("memory")
            .queryName("stream_transitions_tws")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.sql(
            "SELECT from_type, to_type, count(*) AS n FROM stream_transitions_tws GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(entity_events(spark, sf_dir)).collect()
    }
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_streaming_cusum_matches_batch(spark, sf_dir, entity_chunks_dir, small_state):
    """Streaming CUSUM alarms (batch-trained params, O(1) keyed state)
    must reproduce the batch operator's per-key alarm counts exactly
    under in-order chunk replay."""
    from pulseboard_spark.operators.timeseries import cusum_changepoints, cusum_params
    from pulseboard_spark.streaming.stateful import cusum_stateful

    out, schema = entity_chunks_dir
    batch_ev = entity_events(spark, sf_dir)
    params = cusum_params(batch_ev).localCheckpoint()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        cusum_stateful(stream, params)
        .writeStream.format("memory")
        .queryName("stream_cusum")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.entity_id, r.type): (r.up, r.down)
        for r in spark.sql(
            """SELECT entity_id, type,
                      count(*) FILTER (WHERE direction = 'UP') AS up,
                      count(*) FILTER (WHERE direction = 'DOWN') AS down
               FROM stream_cusum GROUP BY 1, 2"""
        ).collect()
    }
    want = {
        (r.entity_id, r.type): (r.n_alarms_up, r.n_alarms_down)
        for r in cusum_changepoints(batch_ev).collect()
        if r.n_alarms_up or r.n_alarms_down
    }
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_streaming_burst_matches_batch(spark, sf_dir, entity_chunks_dir):
    """Streaming hourly burst verdicts (O(24) ring state per type) must
    reproduce the batch operator row-for-row on every CLOSED hour — the
    stream's only legitimate difference is each type's final hour, which
    stays open (no later event has arrived to close it)."""
    from pulseboard_spark.operators.timeseries import burst_windows
    from pulseboard_spark.streaming.stateful import burst_stateful

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        burst_stateful(stream)
        .writeStream.format("memory")
        .queryName("stream_bursts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.type, r.hour_idx): (r.n_events, r.prev24_sum, r.is_burst)
        for r in spark.sql("SELECT * FROM stream_bursts").collect()
    }
    batch = burst_windows(entity_events(spark, sf_dir)).collect()
    last_hour = {}
    for r in batch:
        last_hour[r.type] = max(last_hour.get(r.type, -1), r.hour_idx)
    want = {
        (r.type, r.hour_idx): (r.n_events, r.prev24_sum, r.is_burst)
        for r in batch
        if r.hour_idx != last_hour[r.type]
    }
    assert got == want
    assert len(got) > 0, "replay must close at least one hour per type"


def test_streaming_attribution_matches_batch(spark, sf_dir, entity_chunks_dir):
    """Streaming first/last-touch attribution (touch-key state bounded by
    the lookback) must reproduce the batch RANGE-frame operator
    row-for-row: every purchase is attributed once, with identical
    first/last touch types, across chunked delivery."""
    from pulseboard_spark.operators.sessions import purchase_attribution
    from pulseboard_spark.streaming.stateful import attribution_stateful

    out, schema = entity_chunks_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{out}/chunk=*")
    )
    q = (
        attribution_stateful(stream)
        .writeStream.format("memory")
        .queryName("stream_attr")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.event_id: (r.entity_id, r.purchase_ms, r.first_touch_type, r.last_touch_type)
        for r in spark.sql("SELECT * FROM stream_attr").collect()
    }
    want = {
        r.event_id: (r.entity_id, r.purchase_ms, r.first_touch_type, r.last_touch_type)
        for r in purchase_attribution(entity_events(spark, sf_dir)).collect()
    }
    assert got == want and got, f"empty or diverged: got={sorted(got)[:5]}"


def test_checkpoint_restart_recovery_on_rocksdb(spark, sf_dir, entity_chunks_dir, tmp_path):
    """Kill-and-restart on the RocksDB provider with changelog
    checkpointing: the restarted query rebuilds state from the last
    snapshot plus changelog replay (the production recovery path — the
    heap twin above only proves offset/state recovery on the default
    provider).  Same exactness bar: no duplicated windows, every emitted
    window carries the exact batch count."""
    from pulseboard_spark.operators.windows import minute_counts
    from pulseboard_spark.streaming.pipeline import streaming_minute_counts, use_rocksdb_state, ROCKSDB_PROVIDER

    out, schema = entity_chunks_dir
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER

    def start(glob):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )
        return (
            streaming_minute_counts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    try:
        q = start(f"{out}/chunk={{0,1}}")
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        q = start(f"{out}/chunk=*")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = spark.read.parquet(sink).collect()
    minutes = [r.minute_ms for r in got]
    assert len(minutes) == len(set(minutes)), "restart duplicated windows"
    want = {r.minute_ms: r.n_events for r in minute_counts(entity_events(spark, sf_dir)).collect()}
    assert got, "no windows finalized"
    for r in got:
        assert want[r.minute_ms] == r.n_events


def test_attribution_null_value_purchase_emits_null(spark, tmp_path):
    """A null-valued purchase must emit a NULL value like the batch twin —
    the Arrow float64 input coerces null to NaN inside the kernel, and an
    unmapped NaN diverges from batch in any collected comparison."""
    from pulseboard_spark.operators.sessions import purchase_attribution
    from pulseboard_spark.streaming.stateful import attribution_stateful

    base = 1_704_067_200_000
    rows = [(1, base, "e0", "view", 1.0), (2, base + 1000, "e0", "purchase", None)]
    df = (
        spark.createDataFrame(
            rows, "event_id long, ts_ms long, entity_id string, type string, value double"
        )
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withColumn("ts_us", F.col("ts_ms") * 1000)
    )
    path = str(tmp_path / "src")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        attribution_stateful(stream)
        .writeStream.format("memory")
        .queryName("attr_nullv")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [tuple(r) for r in spark.sql(
        "SELECT event_id, purchase_ms, value, first_touch_type, last_touch_type FROM attr_nullv"
    ).collect()]
    want = [tuple(r) for r in purchase_attribution(df).select(
        "event_id", "purchase_ms", "value", "first_touch_type", "last_touch_type"
    ).collect()]
    assert got == want == [(2, base + 1000, None, "view", "view")]
