"""Trailing (sliding, per-event) window aggregates — the WindowStore layer.

Reference: `core/WindowStore.kt` — per-(entityId, type) deques queried with
inclusive trailing ranges relative to "now":
  * ratePerMin  = count in [now-60s, now]            (`WindowStore.kt:55-67`)
  * sumIn(d)    = sum   in [now-d, now]              (`WindowStore.kt:72-84`)
  * countIn(d)  = count in [now-d, now]              (`WindowStore.kt:89-101`)
  * avgOverLast = sumIn/countIn over N minutes       (`WindowStore.kt:137-147`)

In the reference "now" is the processing-time clock at evaluation; events are
appended before rules run (`ingest/Processor.kt:79-128`), so the current
event is always inside its own window.  The batch twin is event-time exact:
"now" = the current row's ``ts``, expressed as a RANGE frame over epoch
micros — Catalyst evaluates all frames for one partition in a single sort,
no shuffle beyond the hash partition on (entity_id, type).

Scale posture: one shuffle on (entity_id, type); frames are bounded (≤1 h)
so state per key is small.  Skewed entities are handled by AQE skew-join
settings at the shuffle, and the streaming twin bounds state with
watermarks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

US_PER_SEC = 1_000_000


def trailing_window(partition_cols: list[str], seconds: int, order_col: str = "ts_us") -> WindowSpec:
    """RANGE frame covering the inclusive trailing ``seconds`` window."""
    return (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col))
        .rangeBetween(-seconds * US_PER_SEC, 0)
    )


def with_trailing_aggs(
    df: DataFrame,
    partition_cols: list[str] = ("entity_id", "type"),
    value_col: str = "value",
) -> DataFrame:
    """Add the full WindowStore aggregate surface as columns.

    rate_1m (A2), sum_30s (A3), count_60s (A4), avg_5m / avg_1h (A5).
    All windows are inclusive of the current row, matching
    ``countInRange``'s closed interval (`WindowStore.kt:184-191`).

    Tie semantics: the reference evaluates PER ARRIVAL — an event never
    sees a later-arriving event, even at the same timestamp — and the
    engine's total order for arrival is (ts_us, event_id) (the same order
    the EWMA scan, LWW merges and the streaming in-order drain use).  A
    bare RANGE frame ordered by ts_us includes all timestamp PEERS, i.e.
    lets an event see same-ts events that arrive after it (found by
    tests/test_fuzz_rules.py), so each aggregate subtracts the
    contribution of peers with a larger event_id.  At zero ties the
    adjustments are identically 0/0.0 and every value is bit-unchanged.

    Empty value windows are uniformly 0.0: ``sumInRange`` returns 0 when
    nothing (non-null) is in range (`WindowStore.kt:72-84`), so sum_30s
    coalesces the frame total before the peer subtraction — otherwise a
    window whose only rows are null-valued would be NULL while a window
    whose only non-null rows are later peers would be 0.0 (inconsistent,
    and neither matches the reference or the streaming kernel's prefix
    sums, which are 0.0 in both cases).

    Known tolerance (documented, fuzz-masked by a dyadic value alphabet):
    the batch side computes per-arrival sums as frame-total MINUS the
    later-peer suffix, while the streaming kernel sums the arrival-ordered
    prefix directly.  For non-dyadic float values the two roundings can
    differ by ulps and flip a strict ``>`` at a rule threshold.  This is
    inherent to any subtract-vs-accumulate pair of float plans (the same
    class as Spark partial-agg reordering); rules round evidence columns
    before comparison, and at zero same-ts ties (the driver testdata and
    every real CDP feed keyed by event_id) the subtraction is exactly 0.0
    and the plans are bit-identical.
    """
    cols = list(partition_cols)
    w60 = trailing_window(cols, 60)
    w30 = trailing_window(cols, 30)
    w5m = trailing_window(cols, 300)
    w1h = trailing_window(cols, 3600)
    v = F.col(value_col)
    # later-peer contributions: whole peer group minus the running
    # (event_id-ordered) prefix — same hash partitioning, one extra sort
    peers = Window.partitionBy(*cols, "ts_us")
    peer_run = (
        Window.partitionBy(*cols, "ts_us")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows_after = F.count(F.lit(1)).over(peers) - F.count(F.lit(1)).over(peer_run)
    cnt_after = F.count(v).over(peers) - F.count(v).over(peer_run)
    sum_after = F.coalesce(F.sum(v).over(peers), F.lit(0.0)) - F.coalesce(
        F.sum(v).over(peer_run), F.lit(0.0)
    )

    def adj_avg(w: WindowSpec) -> Column:
        cnt = F.count(v).over(w) - cnt_after
        return F.when(cnt > 0, (F.sum(v).over(w) - sum_after) / cnt).otherwise(0.0)

    return (
        df.withColumn("rate_1m", (F.count(F.lit(1)).over(w60) - rows_after).cast("double"))
        .withColumn("sum_30s", F.coalesce(F.sum(v).over(w30), F.lit(0.0)) - sum_after)
        .withColumn("count_60s", F.count(v).over(w60) - cnt_after)
        .withColumn("avg_5m", adj_avg(w5m))
        .withColumn("avg_1h", adj_avg(w1h))
    )


MINUTE_MS = 60_000


def minute_counts(df: DataFrame, ts_col: str = "ts_ms") -> DataFrame:
    """A9 batch twin (`core/StatsService.kt:19-55`): global per-minute
    tumbling event counts — the events/min ops gauge as an event-time table.
    One partial-aggregated groupBy; the streaming twin is a 1-min windowed
    count surfaced through ``observe()``."""
    m = (F.col(ts_col) - F.col(ts_col) % MINUTE_MS).alias("minute_ms")
    return df.groupBy(m).agg(F.count(F.lit(1)).cast("long").alias("n_events"))


def sliding_rate_5m(df: DataFrame, ts_col: str = "ts_ms") -> DataFrame:
    """A15 (`ui/src/lib/slidingWindow.ts:15-79`): per minute, the trailing
    5-minute sliding count and per-minute rate.

    Two-level: pre-aggregate to 1-min buckets (partial agg map-side), then a
    RANGE frame over the bucket table — the frame runs over minutes, not
    events, so the unpartitioned window is over an already-tiny series (the
    global ops gauge; at 100 TB partition the gauge by tenant/profile)."""
    per_min = minute_counts(df, ts_col)
    w = Window.orderBy("minute_ms").rangeBetween(-(4 * MINUTE_MS), 0)
    cnt = F.sum("n_events").over(w)
    return per_min.select(
        "minute_ms",
        cnt.cast("long").alias("cnt_5m"),
        (cnt / F.lit(5.0)).alias("rate_per_min"),
    )


def unique_entities_5m(df: DataFrame, key: str = "entity_id", ts_col: str = "ts_ms") -> DataFrame:
    """A16 (`ui/src/lib/slidingWindow.ts:85-108`): distinct keys per 5-min
    tumbling window.  Exact count_distinct (two-phase: partial distinct
    map-side); the 100 TB path is ``approx_count_distinct`` (HLL merge, no
    distinct shuffle) — same call shape, documented divergence."""
    w5 = (F.col(ts_col) - F.col(ts_col) % (5 * MINUTE_MS)).alias("window_ms")
    return df.groupBy(w5).agg(F.count_distinct(F.col(key)).cast("long").alias("uniques"))


def trailing_percentile(
    df: DataFrame,
    pct: float = 0.95,
    seconds: int = 3600,
    partition_cols: list[str] = ("entity_id", "type"),
    value_col: str = "value",
    out: str = "p95_1h",
) -> DataFrame:
    """Exact trailing percentile per event (A8 done right).

    The reference defers true P95 to a ticket (`docs/TICKETS.md:127-135`)
    and ships a 10×avg fallback (`core/Rules.kt:190-200`); Spark's native
    ``percentile`` gives the real quantile.  At 100 TB scale swap for
    ``percentile_approx`` (t-digest-style mergeable sketch) — same call
    shape, documented divergence from the exact oracle.
    """
    w = trailing_window(list(partition_cols), seconds)
    return df.withColumn(out, F.percentile(F.col(value_col), F.lit(pct)).over(w))
