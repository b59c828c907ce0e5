"""S6: deterministic synthetic event generator — the Spark twin of the
reference's Simulator (`ingest/Simulator.kt`).

The reference emits profile-shaped random events at ``rps`` with inter-event
jitter ×0.5–1.5 (`Simulator.kt:97-99`), type mixes per profile
(SASE: CONN_OPEN 50% / CONN_BYTES 30% / LOGIN 20%, `Simulator.kt:264-271`;
IGAMING: BET_PLACED 60% / CASHIN 20% / LOGIN 20%, `:273-280`;
CDP: IDENTIFY 20% / TRACK 70% / ALIAS 10%, `:378-385`), ±``latenessSec``
timestamp jitter (`:387-390`) and ~5% duplicate eventIds sampled from the
last 100 (`:392-407`).

Spark-first re-expression: ``spark.range(n)`` plus *hash-derived* uniforms —
``xxhash64(index, tag, seed)`` scaled to [0,1) — so the stream is fully
deterministic given (seed, n, rps): same plan → same rows on any cluster,
any partitioning (no ``rand()``, whose draw depends on partition layout).
Duplicate ids need no state: event ids are a pure function of the index, so
a "duplicate of one of the last 100" is computed directly as the id of a
hash-chosen earlier index.  Everything is column expressions — the
generator parallelizes like any other scan and can feed either a parquet
sink (batch fixtures) or, chunked, the file-source streaming twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulseboard_spark.session import local_df

GEO_POOL = ["US", "UK", "DE", "FR", "CA"]
DEVICE_POOL = ["desktop", "mobile", "tablet"]
BROWSER_POOL = ["chrome", "firefox", "safari", "edge"]
PROTO_POOL = ["tcp", "udp", "http", "https"]
DIRECTION_POOL = ["inbound", "outbound"]


def _u(tag: str, seed: int) -> F.Column:
    """Deterministic uniform in [0,1) from (row index, tag, seed)."""
    h = F.xxhash64(F.col("i"), F.lit(tag), F.lit(seed))
    return (F.pmod(h, F.lit(1 << 32))).cast("double") / F.lit(float(1 << 32))


def _pick(pool: list[str], tag: str, seed: int) -> F.Column:
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (F.floor(_u(tag, seed) * len(pool)) + 1).cast("int"))


def _rand_long(lo: int, hi: int, tag: str, seed: int) -> F.Column:
    """random.nextLong(lo, hi): uniform integer in [lo, hi)."""
    return (F.floor(_u(tag, seed) * (hi - lo)) + lo).cast("long")


def entity_event_generator(
    spark: SparkSession,
    n: int,
    profile: str = "SASE",
    rps: float = 10.0,
    n_entities: int = 20,
    lateness_sec: int = 90,
    seed: int = 42,
    start_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Deterministic EntityEvent stream for profile SASE or IGAMING.

    Columns: event_id, ts, ts_us, ts_ms, entity_id, profile, type, value,
    tags (map<string,string>).  Event times advance at ~1/rps with the
    reference's ×0.5–1.5 spacing jitter, then get ±lateness_sec event-time
    jitter (F5) — so the output is *out of order* exactly like the
    reference's feed, which is what the W2/W3 admission and ordering
    operators need to be exercised against.
    """
    base = spark.range(n).select(F.col("id").alias("i"))
    spacing_ms = 1000.0 / rps
    arrival = F.lit(start_ms) + (F.col("i") * spacing_ms * (0.5 + _u("jit", seed))).cast("long")
    late = (F.floor(_u("late", seed) * (2 * lateness_sec + 1)) - lateness_sec).cast("long")
    ts_ms = arrival + late * 1000

    # 5% duplicates: reuse the id of a hash-chosen index in (i-100, i)
    back = (F.floor(_u("dupsel", seed) * F.least(F.col("i"), F.lit(100))) + 1).cast("long")
    src_i = F.when((_u("dup", seed) < 0.05) & (F.col("i") > 0), F.col("i") - back).otherwise(F.col("i"))
    event_id = F.concat(F.lit(f"evt-{seed}-"), src_i.cast("string"))

    entity_id = F.concat(F.lit("entity-"), F.floor(_u("ent", seed) * n_entities).cast("string"))
    tmix = _u("type", seed)
    if profile == "SASE":
        etype = (
            F.when(tmix < 0.5, F.lit("CONN_OPEN"))
            .when(tmix < 0.8, F.lit("CONN_BYTES"))
            .otherwise(F.lit("LOGIN"))
        )
        failed = _u("fail", seed) < 0.1  # 10% failed logins (`Simulator.kt:282-285`)
        value = (
            F.when(etype == "CONN_OPEN", _rand_long(1, 100, "v1", seed))
            .when(etype == "CONN_BYTES", _rand_long(100, 50_000, "v2", seed))
            .otherwise(F.when(failed, F.lit(0)).otherwise(F.lit(1)).cast("long"))
        )
        tags = F.map_from_arrays(
            F.array(F.lit("geo"), F.lit("device"), F.lit("protocol"), F.lit("result")),
            F.array(
                _pick(GEO_POOL, "geo", seed),
                _pick(DEVICE_POOL, "dev", seed),
                _pick(PROTO_POOL, "proto", seed),
                F.when(etype == "LOGIN", F.when(failed, F.lit("failed")).otherwise(F.lit("success"))),
            ),
        )
    elif profile == "IGAMING":
        etype = (
            F.when(tmix < 0.6, F.lit("BET_PLACED"))
            .when(tmix < 0.8, F.lit("CASHIN"))
            .otherwise(F.lit("LOGIN"))
        )
        value = (
            F.when(etype == "BET_PLACED", _rand_long(1, 500, "v1", seed))
            .when(etype == "CASHIN", _rand_long(10, 5_000, "v2", seed))
            .otherwise(F.lit(1).cast("long"))
        )
        tags = F.map_from_arrays(
            F.array(F.lit("geo"), F.lit("device")),
            F.array(_pick(GEO_POOL, "geo", seed), _pick(DEVICE_POOL, "dev", seed)),
        )
    else:
        raise ValueError(f"profile must be SASE or IGAMING, got {profile!r}")

    return base.select(
        event_id.alias("event_id"),
        F.timestamp_millis(ts_ms).alias("ts"),
        (ts_ms * 1000).alias("ts_us"),
        ts_ms.alias("ts_ms"),
        entity_id.alias("entity_id"),
        F.lit(profile).alias("profile"),
        etype.alias("type"),
        value.alias("value"),
        tags.alias("tags"),
    )


def cdp_event_generator(
    spark: SparkSession,
    n: int,
    rps: float = 10.0,
    n_users: int = 50,
    lateness_sec: int = 90,
    seed: int = 42,
    start_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Deterministic CdpEvent stream: IDENTIFY 20% / TRACK 70% / ALIAS 10%.

    Columns match the raw CDP view contract (sources/tables.cdp_events):
    event_id, ts, ts_us, ts_ms, ctype, user_id_raw, anon_id_raw, email_raw,
    name, plan, country.
    """
    base = spark.range(n).select(F.col("id").alias("i"))
    spacing_ms = 1000.0 / rps
    arrival = F.lit(start_ms) + (F.col("i") * spacing_ms * (0.5 + _u("jit", seed))).cast("long")
    late = (F.floor(_u("late", seed) * (2 * lateness_sec + 1)) - lateness_sec).cast("long")
    ts_ms = arrival + late * 1000

    back = (F.floor(_u("dupsel", seed) * F.least(F.col("i"), F.lit(100))) + 1).cast("long")
    src_i = F.when((_u("dup", seed) < 0.05) & (F.col("i") > 0), F.col("i") - back).otherwise(F.col("i"))
    event_id = F.concat(F.lit(f"cdp-{seed}-"), src_i.cast("string"))

    tmix = _u("type", seed)
    ctype = (
        F.when(tmix < 0.20, F.lit("IDENTIFY"))
        .when(tmix < 0.90, F.lit("TRACK"))
        .otherwise(F.lit("ALIAS"))
    )
    uid = F.floor(_u("user", seed) * n_users).cast("string")
    user_raw = F.concat(F.lit("user-"), uid)
    anon_raw = F.concat(F.lit("anon-"), uid)
    email_raw = F.concat(F.lit("user-"), uid, F.lit("@example.com"))
    name = F.when(ctype == "TRACK", _pick(["Feature Used", "Sign In", "Checkout"], "name", seed))
    plan = F.when(ctype == "IDENTIFY", _pick(["free", "basic", "pro"], "plan", seed))
    country = F.when(ctype == "IDENTIFY", _pick(GEO_POOL, "ctry", seed))

    return base.select(
        event_id.alias("event_id"),
        F.timestamp_millis(ts_ms).alias("ts"),
        (ts_ms * 1000).alias("ts_us"),
        ts_ms.alias("ts_ms"),
        ctype.alias("ctype"),
        F.when(ctype != "ALIAS", user_raw).alias("user_id_raw"),
        F.when((ctype == "ALIAS") | (_u("hasanon", seed) < 0.5), anon_raw).alias("anon_id_raw"),
        F.when(ctype == "IDENTIFY", email_raw).alias("email_raw"),
        name.alias("name"),
        plan.alias("plan"),
        country.alias("country"),
    )


#: Epoch base for the rule-firing fixture: 2024-01-01T00:00:00Z, micros.
_FIRING_BASE_US = 1_704_067_200_000_000

#: (entity_id, profile, type, event_id base, n events, spacing s, values)
#: Three engineered scenarios, one per stateful rule, each with margin:
#:
#: - ``fire-r1``: 25 events 2 s apart, value 1.0 — rate_1m reaches 20-25
#:   while avg_5m stays 1.0 (threshold 3.0), so events 20-25 fire
#:   R1_VELOCITY_SPIKE at MEDIUM (ratio 6.7-8.3).
#: - ``fire-r2``: 9 events of value 1.0 then one of 100.0, 5 s apart —
#:   EWMA(α=0.1, current included) is ~10.9 at the spike, threshold ~43.6,
#:   count_60s=10 ≥ 5, so exactly the last event fires R2_VALUE_SPIKE at
#:   LOW (ratio ~2.3).
#: - ``fire-r4`` (SASE): 15 events of value 200.0, 2 s apart — sum_30s
#:   grows 200·(i+1) past p95_threshold = max(floor(avg_1h·10), 1000)
#:   = 2000, so events 11-15 fire R4_EXFIL at HIGH.
#:
#: geo/device are constant per entity, so R3 never fires — the fixture
#: isolates the R1/R2/R4 positive paths the driver testdata never trips
#: (every alert in sf0.001-0.1 is R3; see tests/test_rule_firing.py).
#:
#: Event ids sit on a 9e12 base so the fixture can be UNIONED with real
#: testdata without violating the stream-wide event_id uniqueness contract
#: (W1 dedup keys on event_id; operators may re-join computed columns on it
#: — duplicate ids cross-contaminate per-event state across entities).
_FIRING_EID_BASE = 9_000_000_000_000
_FIRING_SCENARIOS = [
    ("fire-r1", "IGAMING", "BET_PLACED", _FIRING_EID_BASE + 1000, 25, 2, None),
    ("fire-r2", "IGAMING", "CASHIN", _FIRING_EID_BASE + 2000, 10, 5, {9: 100.0}),
    ("fire-r4", "SASE", "CONN_BYTES", _FIRING_EID_BASE + 3000, 15, 2, None),
]


def rule_firing_events(spark: SparkSession) -> DataFrame:
    """Deterministic 50-row entity-event fixture that FIRES R1, R2 and R4.

    The reference thresholds (`core/Rules.kt:37-200`) are calibrated for
    sustained real-time traffic; the driver's batch testdata never trips
    them, so every batch-vs-streaming alert comparison over testdata is
    trivially empty for R1/R2/R4.  This fixture is the non-vacuous input:
    the same frame feeds the batch union (`operators/rules.alerts`), the
    stateful twin (`streaming/stateful.alert_rules_stateful`) and the
    DuckDB oracle twin (``rule_firing_alerts``), and all three must land
    on the same 12 alerts.

    Schema matches ``sources.tables.entity_events`` exactly.
    """
    rows = []
    for entity_id, profile, etype, eid_base, n, spacing_s, overrides in _FIRING_SCENARIOS:
        base_value = 200.0 if entity_id == "fire-r4" else 1.0
        for i in range(n):
            ts_us = _FIRING_BASE_US + i * spacing_s * 1_000_000
            value = (overrides or {}).get(i, base_value)
            rows.append(
                (eid_base + i, ts_us // 1000, entity_id, profile, etype, value, "US", "desktop")
            )
    df = local_df(
        spark,
        rows,
        "event_id long, ts_ms long, entity_id string, profile string, "
        "type string, value double, geo string, device string",
    )
    return df.select(
        "event_id",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        (F.col("ts_ms") * 1000).alias("ts_us"),
        "ts_ms",
        "entity_id",
        "profile",
        "type",
        "value",
        "geo",
        "device",
    )
