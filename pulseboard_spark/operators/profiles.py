"""Profile materialization: identifier sets, LWW traits, lastSeen, counters.

Reference: `cdp/store/ProfileStore.kt` — mergeIdentifiers (set union, :55-79),
mergeTraits (per-key LWW on event ts with >= tiebreak, :85-122), lastSeen
max (:127-139); Feature-Used counter from `cdp/store/RollingCounter.kt`.

Spark-first: one grouped aggregation per concern over events already tagged
with their canonical profile_id (operators/identity.resolve_profiles), then
a join-up.  All aggregates are algebraic (collect_set, max_by, max, count)
→ partial aggregation map-side, single shuffle each on profile_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulseboard_spark.functions.core import lww_order_key
from pulseboard_spark.functions.ids import strip_prefix

MINUTE_MS = 60_000
DAY_MS = 86_400_000


def _bucket_ms(col):
    """1-minute bucket floor (`cdp/store/RollingCounter.kt:164-168`)."""
    return col - (col % MINUTE_MS)


def build_profiles(evprof: DataFrame) -> DataFrame:
    """Materialize profiles from canonical-id-tagged events.

    Columns: profile_id, user_ids/emails/anonymous_ids (sorted arrays),
    plan, country (LWW), last_seen_ms, feature_used_24h (1-min-bucketed
    trailing count as of the global max event ts — the batch "now").
    """
    okey = lww_order_key(F.col("ts_us"), F.col("event_id"))

    # Pass 1 — every per-event concern in ONE grouped aggregation: LWW
    # traits ride max_by with an ordering key that is null off IDENTIFY
    # rows (max_by skips null orderings, = the old IDENTIFY-only groupBy),
    # lastSeen is a plain max, and the 24 h counter is a conditional sum
    # against the broadcast as-of row.  One shuffle on profile_id instead
    # of three, and the silver table is scanned once here instead of 3×.
    as_of = evprof.agg(F.max("ts_ms").alias("as_of_ms"))
    cutoff = _bucket_ms(F.col("as_of_ms") - DAY_MS)
    # per-TRAIT ordering key: the reference merges only traits PRESENT on
    # the event (`cdp/store/ProfileStore.kt:82-118` — mergedTraits[key] set
    # per present key), so a later IDENTIFY with a null plan must NOT
    # overwrite an earlier non-null one.  A shared IDENTIFY-only key would
    # let max_by return that null (the streaming kernel skips nulls —
    # keeping both engines on the reference's semantics).
    plan_okey = F.when((F.col("ctype") == "IDENTIFY") & F.col("plan").isNotNull(), okey)
    country_okey = F.when((F.col("ctype") == "IDENTIFY") & F.col("country").isNotNull(), okey)
    feat = (
        (F.col("ctype") == "TRACK")
        & (F.col("name") == "Feature Used")
        & (_bucket_ms(F.col("ts_ms")) >= cutoff)
    )
    # Identifier sets ride the SAME aggregation (r10: one fact pass and no
    # join, where the exploded (profile, id) grain cost a second full scan
    # of the silver plus a profile_id join).  normalize_id can RE-TYPE an
    # id (a user_id containing "@" normalizes to "email:…"), so each
    # target set is partitioned by PREFIX across all three source columns
    # — nine in-buffer collect_sets (deduped per group, never a per-event
    # list), concatenated per target.  Set semantics identical to the
    # explode: when() yields NULL off-prefix and collect_set skips NULLs.
    srcs = ("nuser", "nanon", "nemail")

    def _psets(prefix: str, tag: str):
        return [
            F.collect_set(F.when(F.col(c).startswith(prefix), F.col(c))).alias(f"_{tag}{i}")
            for i, c in enumerate(srcs)
        ]

    def _merged(tag: str):
        return F.array_sort(
            F.array_distinct(F.concat(*[F.col(f"_{tag}{i}") for i in range(len(srcs))]))
        )

    per = (
        evprof.crossJoin(F.broadcast(as_of))
        .groupBy("profile_id")
        .agg(
            *_psets("user:", "u"),
            *_psets("email:", "e"),
            *_psets("anon:", "a"),
            F.max_by("plan", plan_okey).alias("plan"),
            F.max_by("country", country_okey).alias("country"),
            F.max("ts_ms").alias("last_seen_ms"),
            F.sum(feat.cast("long")).cast("long").alias("feature_used_24h"),
        )
    )
    return per.select(
        "profile_id",
        _merged("u").alias("user_ids"),
        _merged("e").alias("emails"),
        _merged("a").alias("anonymous_ids"),
        "plan",
        "country",
        "last_seen_ms",
        "feature_used_24h",
    )


def top20_summaries(profiles: DataFrame) -> DataFrame:
    """Top-20 profile summaries by recency (A10 + P6,
    `cdp/api/CdpController.kt:144-174`): prefix-stripped identifiers,
    deterministic (last_seen desc, profile_id) order → TakeOrderedAndProject,
    no full sort."""
    strip = lambda c: F.transform(c, strip_prefix)  # noqa: E731
    return (
        profiles.select(
            "profile_id",
            strip(F.col("user_ids")).alias("user_ids"),
            strip(F.col("emails")).alias("emails"),
            strip(F.col("anonymous_ids")).alias("anonymous_ids"),
            "plan",
            "country",
            "last_seen_ms",
            "feature_used_24h",
        )
        .orderBy(F.desc("last_seen_ms"), F.asc("profile_id"))
        .limit(20)
    )
