"""Rolling counter (A7): per-key event counts over a bucketed trailing window.

Reference: `cdp/store/RollingCounter.kt` — 1-minute buckets
(toBucketTimestamp :164-168), count = sum of buckets >= floor(now − window)
(:80-110), eviction of older buckets (:118-159).

Batch twin: for each TRACK event ("query at event time"), count same-key
events processed at-or-before it whose bucket is inside the trailing 24 h
bucket range — exactly tailMap(cutoffBucket, inclusive).  Implemented as a
time-bounded self-join on (pid, name); the streaming twin is a windowed
count with watermark eviction (the reference's eviction made lossless).

Scale note: the exact per-event form is a bounded self-join (window is
24 h); the scalable aggregate form is two-level — pre-aggregate to 1-min
bucket counts (partial agg map-side), then range-join buckets — which is
what the streaming path and any periodic batch rollup should use.  Both
yield identical counts; the per-event form is what the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulseboard_spark.operators.profiles import DAY_MS, _bucket_ms


def rolling_counter_24h(cvalid: DataFrame) -> DataFrame:
    """Per TRACK event: trailing 24 h bucketed count for (pid, name).

    pid = primary identifier (user id, else anon id) — identity-independent
    counter key, the store's profileId argument."""
    trk = cvalid.filter((F.col("ctype") == "TRACK") & F.col("name").isNotNull()).select(
        "event_id",
        "ts_us",
        "ts_ms",
        "name",
        F.coalesce(F.col("nuser"), F.col("nanon")).alias("pid"),
    )
    e1, e2 = trk.alias("e1"), trk.alias("e2")
    cutoff = _bucket_ms(F.col("e1.ts_ms") - DAY_MS)
    joined = e1.join(
        e2,
        (F.col("e2.pid") == F.col("e1.pid"))
        & (F.col("e2.name") == F.col("e1.name"))
        & (
            (F.col("e2.ts_us") < F.col("e1.ts_us"))
            | ((F.col("e2.ts_us") == F.col("e1.ts_us")) & (F.col("e2.event_id") <= F.col("e1.event_id")))
        )
        & (_bucket_ms(F.col("e2.ts_ms")) >= cutoff),
    )
    return joined.groupBy(
        F.col("e1.event_id").alias("event_id"),
        F.col("e1.pid").alias("pid"),
        F.col("e1.name").alias("name"),
        F.col("e1.ts_ms").alias("ts_ms"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt_24h"))
