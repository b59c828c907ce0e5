"""Segment engine: membership rules G1-G3 + ENTER/EXIT diff G4.

Reference: `cdp/segments/SegmentEngine.kt` — power_user (Feature-Used
bucketed count >= 5 in 24 h, :125-133), pro_plan (trait plan == 'pro',
:139-141), reengage (now − lastSeen > 10 m strictly, :147-151), and the
per-profile previous-membership diff emitting SegmentEvents (:79-119).

Batch twin: membership is a *snapshot* as of a given event-time "now";
the change stream is the diff of two snapshots (the streaming twin keeps
previous membership in keyed state instead).  Rules are plain boolean
Column expressions — data, not code — so new segments are config entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulseboard_spark.functions.core import lww_order_key
from pulseboard_spark.operators.profiles import DAY_MS, _bucket_ms

REENGAGE_MS = 600_000
POWER_USER_THRESHOLD = 5

#: Segment rules as DATA, not code — the reference hardcodes its three
#: segments and flags that as a limitation (`SegmentEngine.kt:17-23`,
#: `docs/TICKETS.md:409-423`).  Here each segment is a boolean Column
#: expression over the per-profile snapshot metrics (cnt = Feature-Used
#: 24 h bucketed count, plan = LWW plan trait, last_seen_ms / as_of_ms);
#: adding a segment is adding a dict entry, and `segment_membership`
#: accepts custom rule sets.  Defaults reproduce the reference exactly.
#: Each rule takes an optional column resolver (name → Column) so the same
#: expression evaluates against a plain snapshot (default ``F.col``) or a
#: suffixed dual-snapshot row (segment_events' single-pass diff).
DEFAULT_SEGMENTS: dict = {
    "power_user": lambda c=F.col: F.coalesce(c("cnt"), F.lit(0)) >= POWER_USER_THRESHOLD,
    "pro_plan": lambda c=F.col: F.coalesce(c("plan"), F.lit("")) == "pro",
    "reengage": lambda c=F.col: c("as_of_ms") - c("last_seen_ms") > REENGAGE_MS,
}


def segment_membership(evprof: DataFrame, as_of_ms, segments: dict | None = None) -> DataFrame:
    """Snapshot membership per profile at event-time ``as_of_ms``.

    ``as_of_ms`` is a scalar Column (typically an aggregate over the input —
    kept as a broadcast single-row join so nothing is collected).
    ``segments`` maps segment name → thunk returning a boolean Column over
    the snapshot metric columns (default :data:`DEFAULT_SEGMENTS`).
    Returns profile_id plus one boolean column per segment.
    """
    okey = lww_order_key(F.col("ts_us"), F.col("event_id"))
    as_of = evprof.agg(as_of_ms.alias("as_of_ms"))
    e = evprof.crossJoin(F.broadcast(as_of)).filter(F.col("ts_ms") <= F.col("as_of_ms"))

    # One grouped pass for every snapshot metric (same fusion as
    # profiles.build_profiles): LWW plan via max_by with an off-IDENTIFY
    # null ordering key, lastSeen as max, the 24 h Feature-Used counter as
    # a conditional sum — one shuffle instead of three and one scan of the
    # silver table per snapshot.
    cutoff = _bucket_ms(F.col("as_of_ms") - DAY_MS)
    # plan-present-only ordering key: a null trait never overwrites
    # (reference semantics — see profiles.build_profiles)
    ident_okey = F.when((F.col("ctype") == "IDENTIFY") & F.col("plan").isNotNull(), okey)
    feat = (
        (F.col("ctype") == "TRACK")
        & (F.col("name") == "Feature Used")
        & (_bucket_ms(F.col("ts_ms")) >= cutoff)
    )
    per = e.groupBy("profile_id").agg(
        F.max("ts_ms").alias("last_seen_ms"),
        F.first("as_of_ms").alias("as_of_ms"),
        F.max_by("plan", ident_okey).alias("plan"),
        F.sum(feat.cast("long")).alias("cnt"),
    )
    rules = DEFAULT_SEGMENTS if segments is None else segments
    return per.select(
        "profile_id",
        *[expr().alias(name) for name, expr in rules.items()],
    )


def _segment_cols(membership: DataFrame) -> list[str]:
    return [c for c in membership.columns if c != "profile_id"]


def with_segments_array(membership: DataFrame) -> DataFrame:
    """Attach the sorted segments array (sorted name order — matches the
    reference's deterministic build order for its alphabetical defaults)."""
    seg = F.concat(
        *[
            F.when(F.col(name), F.array(F.lit(name))).otherwise(F.array().cast("array<string>"))
            for name in sorted(_segment_cols(membership))
        ]
    )
    return membership.withColumn("segments", seg)


def segment_events(evprof: DataFrame, segments: dict | None = None) -> DataFrame:
    """ENTER/EXIT change rows between the mid-timeline snapshot and the
    final snapshot (G4 diff semantics: new − old → ENTER, old − new → EXIT;
    profiles unseen at mid start from the empty set, matching
    `SegmentEngine.kt:87`).

    Single-pass form: BOTH snapshots' metrics ride one grouped aggregation
    (the mid-snapshot variants are the same aggregates gated on
    ``ts ≤ mid``), each rule evaluates twice against the suffixed columns
    via its resolver, and the diff is a per-row boolean comparison — no
    second scan, no snapshot join.  One shuffle on profile_id total."""
    rules = DEFAULT_SEGMENTS if segments is None else segments
    okey = lww_order_key(F.col("ts_us"), F.col("event_id"))
    bounds = evprof.agg(
        F.max("ts_ms").alias("end_ms"),
        (F.min("ts_ms") + F.floor((F.max("ts_ms") - F.min("ts_ms")) / 2)).cast("long").alias("mid_ms"),
    )
    e = evprof.crossJoin(F.broadcast(bounds))
    ident = F.col("ctype") == "IDENTIFY"
    feat = (F.col("ctype") == "TRACK") & (F.col("name") == "Feature Used")
    at_mid = F.col("ts_ms") <= F.col("mid_ms")
    cut_end = _bucket_ms(F.col("end_ms") - DAY_MS)
    cut_mid = _bucket_ms(F.col("mid_ms") - DAY_MS)
    per = e.groupBy("profile_id").agg(
        F.first("end_ms").alias("as_of_ms_end"),
        F.first("mid_ms").alias("as_of_ms_mid"),
        F.max("ts_ms").alias("last_seen_ms_end"),
        F.max(F.when(at_mid, F.col("ts_ms"))).alias("last_seen_ms_mid"),
        F.max_by("plan", F.when(ident & F.col("plan").isNotNull(), okey)).alias("plan_end"),
        F.max_by("plan", F.when(ident & at_mid & F.col("plan").isNotNull(), okey)).alias("plan_mid"),
        F.sum((feat & (_bucket_ms(F.col("ts_ms")) >= cut_end)).cast("long")).alias("cnt_end"),
        F.sum((feat & at_mid & (_bucket_ms(F.col("ts_ms")) >= cut_mid)).cast("long")).alias("cnt_mid"),
    )
    changes = []
    for name, rule in rules.items():
        in_end = F.coalesce(rule(lambda n: F.col(f"{n}_end")), F.lit(False))
        # a profile with no event ≤ mid did not exist in the mid snapshot:
        # its previous membership is the empty set (SegmentEngine.kt:87)
        in_mid = F.coalesce(
            F.col("last_seen_ms_mid").isNotNull() & rule(lambda n: F.col(f"{n}_mid")),
            F.lit(False),
        )
        changes.append(
            F.when(in_end & ~in_mid, F.struct(F.lit(name).alias("segment"), F.lit("ENTER").alias("action")))
            .when(~in_end & in_mid, F.struct(F.lit(name).alias("segment"), F.lit("EXIT").alias("action")))
        )
    return (
        per.select("profile_id", F.explode(F.array(*changes)).alias("chg"))
        .filter(F.col("chg").isNotNull())
        .select("profile_id", F.col("chg.segment").alias("segment"), F.col("chg.action").alias("action"))
    )
