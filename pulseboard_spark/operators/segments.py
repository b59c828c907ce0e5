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
from pulseboard_spark.operators.profiles import DAY_MS, MINUTE_MS, _bucket_ms

REENGAGE_MS = 600_000
POWER_USER_THRESHOLD = 5

#: Segment rules as DATA, not code — the reference hardcodes its three
#: segments and flags that as a limitation (`SegmentEngine.kt:17-23`,
#: `docs/TICKETS.md:409-423`).  Here each segment is a boolean Column
#: expression over the per-profile snapshot metrics (cnt = Feature-Used
#: 24 h bucketed count, plan = LWW plan trait, last_seen_ms / as_of_ms);
#: adding a segment is adding a dict entry, and `segment_membership`
#: accepts custom rule sets.  Defaults reproduce the reference exactly.
DEFAULT_SEGMENTS: dict = {
    "power_user": lambda: F.coalesce(F.col("cnt"), F.lit(0)) >= POWER_USER_THRESHOLD,
    "pro_plan": lambda: F.coalesce(F.col("plan"), F.lit("")) == "pro",
    "reengage": lambda: F.col("as_of_ms") - F.col("last_seen_ms") > REENGAGE_MS,
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
    ident_okey = F.when(F.col("ctype") == "IDENTIFY", okey)
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


def _members(membership: DataFrame) -> DataFrame:
    parts = [
        membership.filter(F.col(name)).select("profile_id", F.lit(name).alias("segment"))
        for name in _segment_cols(membership)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def segment_events(evprof: DataFrame) -> DataFrame:
    """ENTER/EXIT change rows between the mid-timeline snapshot and the
    final snapshot (G4 diff semantics: new − old → ENTER, old − new → EXIT;
    profiles unseen at mid start from the empty set, matching
    `SegmentEngine.kt:87`)."""
    mid = segment_membership(
        evprof, (F.min("ts_ms") + F.floor((F.max("ts_ms") - F.min("ts_ms")) / 2)).cast("long")
    )
    end = segment_membership(evprof, F.max("ts_ms"))
    m_end = _members(end).alias("e")
    m_mid = _members(mid).alias("m")
    j = m_end.join(
        m_mid,
        (F.col("e.profile_id") == F.col("m.profile_id")) & (F.col("e.segment") == F.col("m.segment")),
        "full_outer",
    )
    return j.filter(F.col("e.profile_id").isNull() | F.col("m.profile_id").isNull()).select(
        F.coalesce(F.col("e.profile_id"), F.col("m.profile_id")).alias("profile_id"),
        F.coalesce(F.col("e.segment"), F.col("m.segment")).alias("segment"),
        F.when(F.col("m.profile_id").isNull(), F.lit("ENTER")).otherwise(F.lit("EXIT")).alias("action"),
    )
