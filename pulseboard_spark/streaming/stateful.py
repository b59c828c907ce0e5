"""Custom stateful streaming operators: the per-key logic Spark's built-in
windowed aggregations can't express.

All operators here are ``applyInPandasWithState`` (Arrow-batched keyed
state):

* :func:`alert_rules_stateful` — the streaming twin of the reference's
  WindowStore + Rules loop (`ingest/Processor.kt:79-128`): per
  (entity_id, type) it keeps the trailing point buffer + EWMA state and
  evaluates R1/R2/R4 per arriving event.  Exactly the batch semantics
  (operators/rules.py) when events arrive in event-time order — the
  equivalence is pinned by tests/test_streaming.py.

* :func:`r3_stateful` — R3 keyed by entity_id (the rule spans event
  types): a 2-minute tag-carrying predecessor buffer per entity.

* :func:`profile_apply_stateful` / :func:`segment_diff_stateful` /
  :func:`reengage_stateful` — the CDP apply loop, G4 membership diff
  (`cdp/segments/SegmentEngine.kt:79-119`), and the W10 inactivity timer.

State is bounded: point buffers prune to the largest rule window (1 h;
reference horizon is 5 m — `core/WindowStore.kt:46-49` — we keep 1 h
because R4's avg_1h needs it), so per-key state is O(events/hour), evicted
by watermark downstream.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

US = 1_000_000
HORIZON_US = 3600 * US  # largest trailing window (avg_1h)

ALERT_SCHEMA = (
    "rule string, entity_id string, ts_ms bigint, severity string, event_id bigint"
)
_RULE_STATE_SCHEMA = "ts_us array<long>, value array<double>, ewma double, has_ewma boolean"


def _severity(value: float, threshold: float) -> str:
    if threshold <= 0:
        return "HIGH"
    ratio = value / threshold
    if ratio >= 10.0:
        return "HIGH"
    if ratio >= 5.0:
        return "MEDIUM"
    return "LOW"


def _sev_vec(value: np.ndarray, thr: np.ndarray) -> np.ndarray:
    """Vectorized R5 severity ladder; matches _severity element-wise."""
    safe = np.where(thr > 0, thr, 1.0)
    ratio = value / safe
    out = np.where(ratio >= 10.0, "HIGH", np.where(ratio >= 5.0, "MEDIUM", "LOW"))
    return np.where(thr <= 0, "HIGH", out)


def _eval_rules(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per (entity_id, type): replay arriving events in (ts, event_id) order
    against the trailing-window buffer, emitting fired R1/R2/R4 rows.

    Fully vectorized: the merged buffer stays sorted, so every event's
    trailing range is one batched searchsorted pair + prefix-sum lookup,
    clipped to the points processed so far (``upto`` — append-before-eval
    order).  The only sequential piece is the EWMA recurrence, a bare
    multiply-add per non-null value (kept as a scalar loop for bit-exact
    parity with the batch twin's scan — operators/ewma.py)."""
    entity_id, etype = key
    if state.exists:
        ts_list, val_list, ewma, has_ewma = state.get
        buf_ts = np.array(ts_list, dtype=np.int64)
        buf_val = np.array(val_list, dtype=np.float64)
    else:
        buf_ts = np.empty(0, dtype=np.int64)
        buf_val = np.empty(0, dtype=np.float64)
        ewma, has_ewma = 0.0, False

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_us", "event_id"], kind="mergesort")
    n = len(batch)

    n_ts = batch["ts_us"].to_numpy(np.int64)
    n_val = batch["value"].to_numpy(np.float64)
    n_eid = batch["event_id"].to_numpy(np.int64)
    n_tsms = batch["ts_ms"].to_numpy(np.int64)
    profile = batch["profile"].to_numpy()

    all_ts = np.concatenate([buf_ts, n_ts])
    all_val = np.concatenate([buf_val, n_val])
    order = np.argsort(all_ts, kind="mergesort")
    all_ts, all_val = all_ts[order], all_val[order]
    # Null-value events (NaN) stay IN the buffer — they count toward the
    # event rate (batch rate_1m counts all rows) — but are SKIPPED by the
    # value aggregates, exactly like the batch twin's sum(v)/count(v): a
    # raw cumsum would let one NaN poison every later window sum for the
    # key (found by tests/test_fuzz_rules.py).
    valid_all = ~np.isnan(all_val)
    csum = np.concatenate([[0.0], np.cumsum(np.where(valid_all, all_val, 0.0))])
    vcnt = np.concatenate([[0], np.cumsum(valid_all.astype(np.int64))])

    base = len(buf_ts)
    upto = base + np.arange(1, n + 1)  # points processed so far, current included

    def win(dur_us: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(all-row count, null-skipped sum, non-null count) per event."""
        lo = np.minimum(np.searchsorted(all_ts, n_ts - dur_us, side="left"), upto)
        hi = np.minimum(np.searchsorted(all_ts, n_ts, side="right"), upto)
        return hi - lo, csum[hi] - csum[lo], vcnt[hi] - vcnt[lo]

    c60, _, v60 = win(60 * US)
    _, s5m, v5m = win(300 * US)
    _, s1h, v1h = win(3600 * US)
    _, s30, _ = win(30 * US)
    rate_1m = c60.astype(np.float64)
    # batch: coalesce(sum(v)/count(v), 0.0) — empty value window → 0.0
    avg_5m = np.where(v5m > 0, s5m / np.maximum(v5m, 1), 0.0)
    avg_1h = np.where(v1h > 0, s1h / np.maximum(v1h, 1), 0.0)

    # R1 velocity spike
    thr1 = avg_5m * 3.0
    r1 = (rate_1m > thr1) & (rate_1m >= 20.0)

    # R2 value spike: EWMA updated with the current value first.  The
    # recurrence is the one true sequential dependency; loop over non-null
    # values only with the same scalar arithmetic as the batch scan.
    valid = ~np.isnan(n_val)
    ew = np.full(n, np.nan)
    if valid.any():
        vidx = np.flatnonzero(valid)
        evals = np.empty(len(vidx))
        e, he = ewma, has_ewma
        for j, v in enumerate(n_val[vidx].tolist()):
            e = v if not he else 0.1 * v + 0.9 * e
            he = True
            evals[j] = e
        ew[vidx] = evals
        ewma, has_ewma = e, he
    thr2 = ew * 4.0
    # count_60s is the NON-NULL count, like the batch count(v) frame
    r2 = valid & (n_val > thr2) & (v60 >= 5)  # NaN comparisons are False

    # R4 exfil (SASE only); empty value window → avg 0 → the 1000 floor
    p95 = np.maximum(np.floor(avg_1h * 10), 1000.0)
    r4 = (profile == "SASE") & valid & (s30 > p95)

    idx = np.concatenate([np.flatnonzero(r1), np.flatnonzero(r2), np.flatnonzero(r4)])
    rules_a = np.concatenate([
        np.full(int(r1.sum()), "R1_VELOCITY_SPIKE"),
        np.full(int(r2.sum()), "R2_VALUE_SPIKE"),
        np.full(int(r4.sum()), "R4_EXFIL"),
    ])
    sev_a = np.concatenate([
        _sev_vec(rate_1m[r1], thr1[r1]),
        _sev_vec(n_val[r2], thr2[r2]),
        np.full(int(r4.sum()), "HIGH"),
    ])
    ordr = np.argsort(idx, kind="mergesort")  # event order; stable keeps R1<R2<R4 per event

    # prune buffer to the horizon relative to the newest point
    if len(all_ts):
        keep = all_ts >= all_ts[-1] - HORIZON_US
        state.update((all_ts[keep].tolist(), all_val[keep].tolist(), float(ewma), bool(has_ewma)))

    yield pd.DataFrame(
        {
            "rule": rules_a[ordr],
            "entity_id": entity_id,
            "ts_ms": n_tsms[idx[ordr]],
            "severity": sev_a[ordr],
            "event_id": n_eid[idx[ordr]],
        },
        columns=["rule", "entity_id", "ts_ms", "severity", "event_id"],
    )


def alert_rules_stateful(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """Streaming R1/R2/R4 alerts over an entity-event stream.

    Input needs: entity_id, type, profile, ts (timestamp), ts_us, ts_ms,
    value, event_id.  Watermark bounds state and admits 120 s of lateness
    (W2's drop tier, `cdp/runtime/CdpEventProcessor.kt:189-204`); pass
    ``set_watermark=False`` when the stream already carries one (Spark
    disallows redefining it)."""
    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    return (
        entity_stream
        .groupBy("entity_id", "type")
        .applyInPandasWithState(
            _eval_rules,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_RULE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


R3_SCHEMA = (
    "event_id bigint, entity_id string, type string, profile string, ts_ms bigint, "
    "current_geo string, current_device string, geo_conflict boolean, "
    "device_conflict boolean, prev_geo string, prev_device string, "
    "n_conflicts bigint, severity string"
)
# geo/device may be absent on buffered events; state arrays can't hold nulls
# portably, so absence is encoded as "" (tags are never empty strings).
_R3_STATE_SCHEMA = (
    "ts_us array<long>, event_id array<long>, geo array<string>, device array<string>"
)
_R3_WINDOW_US = 120 * US


def _eval_r3(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per entity_id: the streaming twin of rules.r3_geo_device_eval — each
    event checked against its trailing-2-minute predecessors' geo/device
    tags, including predecessors from earlier micro-batches (kept in keyed
    state, pruned to the window relative to the newest event).  Same
    tie-break as batch: among conflicting predecessors the one with the
    greatest (ts, event_id) supplies prev_geo/prev_device."""
    (entity_id,) = key
    if state.exists:
        ts_l, eid_l, geo_l, dev_l = state.get
        buf = [
            (t, e, g or None, d or None)
            for t, e, g, d in zip(ts_l, eid_l, geo_l, dev_l)
        ]
    else:
        buf = []

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    rows: list[tuple] = []
    for r in batch.itertuples(index=False):
        t, eid = int(r.ts_us), int(r.event_id)
        geo = r.geo if isinstance(r.geo, str) else None
        dev = r.device if isinstance(r.device, str) else None
        lo = t - _R3_WINDOW_US
        best_geo = best_dev = None  # (ts, eid, value) of latest conflicting pred
        n_conf = 0
        for pt, pe, pg, pdv in buf:
            if pt < lo or pt > t or (pt == t and pe >= eid):
                continue
            g_conf = geo is not None and pg is not None and pg != geo
            d_conf = dev is not None and pdv is not None and pdv != dev
            if not (g_conf or d_conf):
                continue
            n_conf += 1
            if g_conf and (best_geo is None or (pt, pe) > best_geo[:2]):
                best_geo = (pt, pe, pg)
            if d_conf and (best_dev is None or (pt, pe) > best_dev[:2]):
                best_dev = (pt, pe, pdv)
        if n_conf:
            rows.append(
                (
                    eid, entity_id, r.type, r.profile, int(r.ts_ms),
                    geo, dev, best_geo is not None, best_dev is not None,
                    best_geo[2] if best_geo else None,
                    best_dev[2] if best_dev else None,
                    n_conf, "MEDIUM",
                )
            )
        buf.append((t, eid, geo, dev))

    newest = max(t for t, _, _, _ in buf) if buf else 0
    buf = [b for b in buf if b[0] >= newest - _R3_WINDOW_US]
    state.update((
        [b[0] for b in buf],
        [b[1] for b in buf],
        [b[2] or "" for b in buf],
        [b[3] or "" for b in buf],
    ))
    cols = [
        "event_id", "entity_id", "type", "profile", "ts_ms",
        "current_geo", "current_device", "geo_conflict", "device_conflict",
        "prev_geo", "prev_device", "n_conflicts", "severity",
    ]
    yield pd.DataFrame(rows, columns=cols)


def r3_stateful(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """Streaming R3 geo/device-mismatch alerts, keyed by entity_id (R3 spans
    event types, so it cannot share alert_rules_stateful's (entity_id, type)
    grouping).  Input needs: entity_id, type, profile, ts (timestamp),
    ts_us, ts_ms, event_id, geo, device."""
    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    return (
        entity_stream
        .groupBy("entity_id")
        .applyInPandasWithState(
            _eval_r3,
            outputStructType=R3_SCHEMA,
            stateStructType=_R3_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PROFILE_SNAPSHOT_SCHEMA = (
    "profile_id string, user_ids array<string>, emails array<string>, "
    "anonymous_ids array<string>, plan string, country string, "
    "last_seen_ms bigint, feature_used_24h bigint"
)
_PROFILE_STATE_SCHEMA = (
    "user_ids array<string>, emails array<string>, anon_ids array<string>, "
    "plan string, plan_key string, country string, country_key string, "
    "last_seen_ms bigint, bucket_ms array<long>, bucket_cnt array<long>, "
    "prev_hash string"
)
DAY_MS = 86_400_000
MINUTE_MS = 60_000


def _lww_key(ts_us: int, event_id: str) -> str:
    """Python twin of functions.core.lww_order_key — zero-padded composite
    so cross-batch comparisons order exactly like the batch max_by."""
    return f"{ts_us:020d}|{str(event_id):0>12}"


def _apply_profiles(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per profile_id: apply events in (ts, eventId) order — W3's in-order
    drain — maintaining identifier sets (A11), LWW plan/country on IDENTIFY
    (A12), lastSeen max (A13) and the 1-min-bucketed Feature-Used counter
    (A7 append + evict).  Emits the post-batch snapshot only when it differs
    from the previously emitted one (W7 change-suppression,
    `cdp/api/CdpController.kt:105-139`)."""
    (profile_id,) = key
    if state.exists:
        (users, emails, anons, plan, plan_key, country, country_key,
         last_seen, b_ms, b_cnt, prev_hash) = state.get
        users, emails, anons = set(users), set(emails), set(anons)
        buckets = dict(zip(b_ms, b_cnt))
    else:
        users, emails, anons = set(), set(), set()
        plan = plan_key = country = country_key = None
        last_seen, buckets, prev_hash = None, {}, None

    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
    for r in batch.itertuples(index=False):
        if r.nuser is not None:
            users.add(r.nuser)
        if r.nemail is not None:
            emails.add(r.nemail)
        if r.nanon is not None:
            anons.add(r.nanon)
        okey = _lww_key(int(r.ts_us), r.event_id)
        if r.ctype == "IDENTIFY":
            if r.plan is not None and (plan_key is None or okey >= plan_key):
                plan, plan_key = r.plan, okey
            if r.country is not None and (country_key is None or okey >= country_key):
                country, country_key = r.country, okey
        ts_ms = int(r.ts_ms)
        last_seen = ts_ms if last_seen is None else max(last_seen, ts_ms)
        if r.ctype == "TRACK" and r.name == "Feature Used":
            b = ts_ms - ts_ms % MINUTE_MS
            buckets[b] = buckets.get(b, 0) + 1

    # A7 eviction relative to the newest seen event (lossless: cutoff only grows)
    cutoff = (last_seen - DAY_MS) - (last_seen - DAY_MS) % MINUTE_MS if last_seen is not None else 0
    buckets = {b: c for b, c in buckets.items() if b >= cutoff}
    feature_24h = sum(buckets.values())

    snap = (
        profile_id, sorted(users), sorted(emails), sorted(anons),
        plan, country, last_seen, feature_24h,
    )
    snap_hash = repr(snap)
    state.update((
        sorted(users), sorted(emails), sorted(anons), plan, plan_key,
        country, country_key, last_seen,
        list(buckets.keys()), list(buckets.values()), snap_hash,
    ))
    if snap_hash != prev_hash:
        yield pd.DataFrame(
            [snap],
            columns=[
                "profile_id", "user_ids", "emails", "anonymous_ids",
                "plan", "country", "last_seen_ms", "feature_used_24h",
            ],
        )
    else:
        yield pd.DataFrame(
            columns=[
                "profile_id", "user_ids", "emails", "anonymous_ids",
                "plan", "country", "last_seen_ms", "feature_used_24h",
            ]
        )


def profile_apply_stateful(resolved_stream: DataFrame) -> DataFrame:
    """Streaming profile materialization: the stateful twin of
    operators/profiles.build_profiles over canonical-id-tagged CDP events.

    Input: profile_id, ts (timestamp), ts_us, ts_ms, event_id, ctype, name,
    plan, country, nuser, nanon, nemail.  Output: changed profile snapshots
    per micro-batch (append).  State is bounded: identifier sets are small
    per profile, the counter holds ≤ 1441 minute buckets."""
    return (
        resolved_stream.withWatermark("ts", "120 seconds")
        .groupBy("profile_id")
        .applyInPandasWithState(
            _apply_profiles,
            outputStructType=PROFILE_SNAPSHOT_SCHEMA,
            stateStructType=_PROFILE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


REENGAGE_MS = 600_000
_REENGAGE_STATE_SCHEMA = "last_seen_ms bigint, in_reengage boolean"


def _reengage(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """W10/G3: the time-triggered segment — membership can change with NO
    event arriving (`cdp/segments/SegmentEngine.kt:147-151`: now − lastSeen
    > 10 m strictly).  Pure event-driven evaluation cannot do this (SURVEY
    §7.3); the streaming answer is an event-time timer: every event re-arms
    a timer at lastSeen + 10 m + 1 ms; if the watermark passes it with no
    newer event, the timeout fires and the profile ENTERs reengage.  A new
    event while in reengage emits EXIT (activity ends the silence)."""
    (profile_id,) = key
    rows: list[tuple] = []
    if state.hasTimedOut:
        last_seen, _ = state.get
        rows.append((profile_id, "reengage", "ENTER", last_seen + REENGAGE_MS + 1))
        state.update((last_seen, True))
        # No re-arm: the profile stays in reengage until its next event.
    else:
        if state.exists:
            last_seen, in_reengage = state.get
        else:
            last_seen, in_reengage = None, False
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_ms", kind="mergesort")
        new_last = int(batch["ts_ms"].iloc[-1])
        if last_seen is not None:
            new_last = max(new_last, last_seen)
        if in_reengage:
            rows.append((profile_id, "reengage", "EXIT", int(batch["ts_ms"].iloc[0])))
        state.update((new_last, False))
        # strict '>' in the rule → fire only once the watermark is past +10 m
        state.setTimeoutTimestamp(new_last + REENGAGE_MS + 1)
    yield pd.DataFrame(rows, columns=["profile_id", "segment", "action", "ts_ms"])


def reengage_stateful(profile_events: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Inactivity-triggered reengage ENTER/EXIT stream.

    Input: profile_id, ts (timestamp), ts_ms.  Event-time timers require a
    watermark; timer latency = 10 m silence + watermark delay, exactly the
    session-gap pattern."""
    return (
        profile_events.withWatermark("ts", watermark)
        .groupBy("profile_id")
        .applyInPandasWithState(
            _reengage,
            outputStructType=SEGMENT_EVENT_SCHEMA,
            stateStructType=_REENGAGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


SEGMENT_EVENT_SCHEMA = "profile_id string, segment string, action string, ts_ms bigint"
_SEG_STATE_SCHEMA = "segments array<string>"


def _diff_segments(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (profile_id,) = key
    prev = set(state.get[0]) if state.exists else set()
    rows: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_ms", kind="mergesort")
    for _, r in batch.iterrows():
        current = set(r["segments"])
        for seg in sorted(current - prev):
            rows.append((profile_id, seg, "ENTER", int(r["ts_ms"])))
        for seg in sorted(prev - current):
            rows.append((profile_id, seg, "EXIT", int(r["ts_ms"])))
        prev = current
    state.update((sorted(prev),))
    yield pd.DataFrame(rows, columns=["profile_id", "segment", "action", "ts_ms"])


def segment_diff_stateful(snapshot_stream: DataFrame) -> DataFrame:
    """G4 as a keyed-state stream: input rows are membership snapshots
    (profile_id, segments array<string>, ts, ts_ms); output is the
    ENTER/EXIT change stream."""
    return (
        snapshot_stream.withWatermark("ts", "120 seconds")
        .groupBy("profile_id")
        .applyInPandasWithState(
            _diff_segments,
            outputStructType=SEGMENT_EVENT_SCHEMA,
            stateStructType=_SEG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_SCHEMA = "from_type string, to_type string, ts_ms bigint"
_TRANSITION_STATE_SCHEMA = "last_type string"


def _emit_transitions(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-entity Markov pair emitter: one (from_type, to_type) row per
    arriving event that has a predecessor; state is ONLY the last event's
    type — O(1) per key, the smallest state of any operator in this file
    (no ordering fields: correctness rests on the W3 per-key in-order
    drain contract — time-ordered chunk replay + the in-batch
    (ts_ms, event_id) sort — and storing timestamps would imply an
    out-of-order guard this operator deliberately does not have)."""
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_ms", "event_id"], kind="mergesort"
    )
    types = batch["type"].tolist()
    prev = state.get[0] if state.exists else None
    out_from, out_to = [], []
    for t in types:
        if prev is not None:
            out_from.append(prev)
            out_to.append(t)
        prev = t
    state.update((str(batch.iloc[-1]["type"]),))
    if out_from:
        ts = batch["ts_ms"].tolist()[-len(out_from):]
        yield pd.DataFrame({"from_type": out_from, "to_type": out_to, "ts_ms": ts})


def transitions_stateful(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """Streaming twin of ``operators/timeseries.event_transitions``: emits
    the raw transition PAIR stream (append mode); the matrix itself is one
    tiny downstream rollup per sink flush (foreachBatch / the consumer),
    exactly how the batch operator splits fact-shuffle vs counts-table
    work.  Input needs: entity_id, type, ts (timestamp), ts_ms, event_id."""
    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    return (
        entity_stream.select("entity_id", "type", "ts", "ts_ms", "event_id")
        .groupBy("entity_id")
        .applyInPandasWithState(
            _emit_transitions,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transitions_stateful_tws(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """The transition pair emitter on `transformWithStateInPandas` — the
    current-generation stateful API (typed per-key state handles, RocksDB
    provider required).  Semantics identical to
    :func:`transitions_stateful`; pinned equal by
    ``test_transitions_tws_matches_legacy_and_batch``.  Kept alongside the
    `applyInPandasWithState` twin as the migration template for the rest
    of this file: ValueState replaces the monolithic state tuple, and the
    runtime owns timers/TTL instead of the handler.

    Environment note: the transformWithState Python worker speaks a
    protobuf state-server protocol, so running it needs `google.protobuf`
    (absent in this sandbox — the equivalence test skips cleanly there,
    exactly like the Kafka e2e; the operator itself is import-clean).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Transitions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", "last_type string")

        def handleInputRows(self, key, rows, timer_values):
            batch = pd.concat(list(rows), ignore_index=True).sort_values(
                ["ts_ms", "event_id"], kind="mergesort"
            )
            prev = self._last.get()[0] if self._last.exists() else None
            out_from, out_to = [], []
            for t in batch["type"].tolist():
                if prev is not None:
                    out_from.append(prev)
                    out_to.append(t)
                prev = t
            self._last.update((str(batch.iloc[-1]["type"]),))
            if out_from:
                ts = batch["ts_ms"].tolist()[-len(out_from):]
                yield pd.DataFrame({"from_type": out_from, "to_type": out_to, "ts_ms": ts})

        def close(self) -> None:
            pass

    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    return (
        entity_stream.select("entity_id", "type", "ts", "ts_ms", "event_id")
        .groupBy("entity_id")
        .transformWithStateInPandas(
            _Transitions(),
            outputStructType=TRANSITION_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


CUSUM_ALARM_SCHEMA = (
    "entity_id string, type string, ts_ms bigint, event_id bigint, "
    "direction string, cusum_micro bigint"
)
_CUSUM_STATE_SCHEMA = "sp bigint, sm bigint"


def _emit_cusum_alarms(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-(entity, type) two-sided integer CUSUM with O(1) state (the
    pair of accumulators); emits one row per alarm crossing — the alert
    stream, not the per-event trace.  Exactly the batch recurrence of
    `operators/timeseries.cusum_changepoints`, drained per key in
    (ts_ms, event_id) order (W3)."""
    entity_id, typ = key
    sp, sm = state.get if state.exists else (0, 0)
    # (ts_us, event_id) — the BATCH twin's order; ts_ms ties are real
    # (sub-ms timestamps share a millisecond) and would fork the S+/S-
    # trajectory
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    out = {"ts_ms": [], "event_id": [], "direction": [], "cusum_micro": []}
    for d, h, ts_ms, event_id in zip(
        batch["d"].tolist(), batch["h"].tolist(), batch["ts_ms"].tolist(), batch["event_id"].tolist()
    ):
        sp_raw = max(0, sp + d)
        sm_raw = max(0, sm - d)
        if sp_raw > h:
            out["ts_ms"].append(ts_ms)
            out["event_id"].append(event_id)
            out["direction"].append("UP")
            out["cusum_micro"].append(sp_raw)
            sp = 0
        else:
            sp = sp_raw
        if sm_raw > h:
            out["ts_ms"].append(ts_ms)
            out["event_id"].append(event_id)
            out["direction"].append("DOWN")
            out["cusum_micro"].append(sm_raw)
            sm = 0
        else:
            sm = sm_raw
    state.update((int(sp), int(sm)))
    if out["ts_ms"]:
        yield pd.DataFrame(
            {
                "entity_id": entity_id,
                "type": typ,
                "ts_ms": pd.Series(out["ts_ms"], dtype="int64"),
                "event_id": pd.Series(out["event_id"], dtype="int64"),
                "direction": out["direction"],
                "cusum_micro": pd.Series(out["cusum_micro"], dtype="int64"),
            }
        )


def cusum_stateful(
    entity_stream: DataFrame, params: DataFrame, set_watermark: bool = True
) -> DataFrame:
    """Streaming CUSUM drift detector: the batch-trained per-type
    (mu, h) parameter table (`operators/timeseries.cusum_params`) joins
    the stream broadcast (stream-static join), then keyed state carries
    just the two accumulators per (entity, type) — the train-offline /
    detect-online deployment of the batch operator.  Emits alarm rows in
    append mode; per-key alarm counts are pinned equal to the batch
    summary by ``test_streaming_cusum_matches_batch``."""
    from pulseboard_spark.operators.timeseries import micro_units

    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    narrow = (
        entity_stream.filter(F.col("value").isNotNull())
        .select(
            "entity_id", "type", "ts", "ts_us", "ts_ms", "event_id",
            micro_units(F.col("value")).alias("vu"),
        )
        .join(F.broadcast(params), "type")
        .select(
            "entity_id", "type", "ts", "ts_us", "ts_ms", "event_id",
            (F.col("vu") - F.col("mu")).alias("d"), "h",
        )
    )
    return narrow.groupBy("entity_id", "type").applyInPandasWithState(
        _emit_cusum_alarms,
        outputStructType=CUSUM_ALARM_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BURST_SCHEMA = (
    "type string, hour_idx bigint, n_events bigint, prev24_sum bigint, is_burst boolean"
)
#: ring buffer of closed (hour_idx, count) pairs CSV-encoded (keyed state
#: must be a fixed-width struct) + the still-open hour's accumulator +
#: the type's first-ever hour (the warmup anchor)
_BURST_STATE_SCHEMA = (
    "hours string, counts string, cur_hour bigint, cur_n bigint, first_hour bigint"
)


def _emit_bursts(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-type hourly burst detector with O(24) state: a ring of the
    trailing 24 closed hour-slot counts plus the open hour's counter.
    An hour EMITS when a later hour's first event arrives (per-key
    in-order drain, W3 — same contract as every stateful op here); the
    verdict is the batch operator's exact integer rule — 24-slot warmup
    AND ``n·24 ≥ 2·prev24_sum`` — over the identical window, so closed
    hours match `operators/timeseries.burst_windows` row-for-row.

    An event whose hour is strictly BEFORE the open hour (cross-batch
    reordering past an hour boundary, possible within the watermark) is
    DROPPED, not folded into the open hour: its true hour has already
    emitted, and miscounting the open hour would silently diverge from
    the batch twin on two rows instead of one."""
    (typ,) = key
    if state.exists:
        hours_s, counts_s, cur_hour, cur_n, first_hour = state.get
        ring = (
            [
                (int(h), int(c))
                for h, c in zip(hours_s.split(","), counts_s.split(","))
            ]
            if hours_s
            else []
        )
    else:
        ring, cur_hour, cur_n, first_hour = [], -1, 0, -1
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_ms", "event_id"], kind="mergesort"
    )
    out = {"hour_idx": [], "n_events": [], "prev24_sum": [], "is_burst": []}
    for ts_ms in batch["ts_ms"].tolist():
        h = ts_ms // 3_600_000
        if cur_hour == -1:
            cur_hour, cur_n, first_hour = h, 1, h
        elif h == cur_hour:
            cur_n += 1
        elif h < cur_hour:
            continue  # strictly late: its hour already emitted — drop
        else:
            prev = sum(c for hh, c in ring if cur_hour - 24 <= hh <= cur_hour - 1)
            out["hour_idx"].append(cur_hour)
            out["n_events"].append(cur_n)
            out["prev24_sum"].append(prev)
            out["is_burst"].append(
                cur_hour >= first_hour + 24 and prev > 0 and cur_n * 24 >= 2 * prev
            )
            ring.append((cur_hour, cur_n))
            ring = [(hh, c) for hh, c in ring if hh >= h - 24]
            cur_hour, cur_n = h, 1
    state.update(
        (
            ",".join(str(hh) for hh, _ in ring),
            ",".join(str(c) for _, c in ring),
            int(cur_hour),
            int(cur_n),
            int(first_hour),
        )
    )
    if out["hour_idx"]:
        yield pd.DataFrame(
            {
                "type": typ,
                "hour_idx": pd.Series(out["hour_idx"], dtype="int64"),
                "n_events": pd.Series(out["n_events"], dtype="int64"),
                "prev24_sum": pd.Series(out["prev24_sum"], dtype="int64"),
                "is_burst": pd.Series(out["is_burst"], dtype="bool"),
            }
        )


def burst_stateful(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """Streaming twin of `operators/timeseries.burst_windows`: hourly
    volume bursts per event type, detected online with O(24) keyed state
    instead of a 24-hour batch re-scan.  Each hour's verdict emits as
    soon as the next hour opens (append mode); closed hours are pinned
    row-identical to the batch operator by
    ``test_streaming_burst_matches_batch``."""
    if set_watermark:
        entity_stream = entity_stream.withWatermark("ts", "120 seconds")
    narrow = entity_stream.select("type", "ts", "ts_ms", "event_id")
    return narrow.groupBy("type").applyInPandasWithState(
        _emit_bursts,
        outputStructType=BURST_SCHEMA,
        stateStructType=_BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTRIBUTION_SCHEMA = (
    "entity_id string, event_id bigint, purchase_ms bigint, value double,"
    " first_touch_type string, last_touch_type string"
)
#: CSV of zero-padded "ts|event_id|type" touch keys still inside the
#: lookback horizon of the newest event seen (lexicographic order on the
#: padded keys == (ts, event_id) order, the batch operator's tie-break).
_ATTRIBUTION_STATE_SCHEMA = "touch_keys string, max_ts bigint"

_ATTR_LOOKBACK_MS = 86_400_000
#: single source for BOTH the stream's withWatermark duration and the
#: state-prune slack — they must move together, or touches get pruned
#: before a maximally-late purchase can reach back for them
_ATTR_WATERMARK_MS = 120_000


def _touch_key(ts_ms: int, event_id: int, typ: str) -> str:
    return f"{ts_ms:015d}|{event_id:012d}|{typ}"


def _emit_attribution(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-entity online first/last-touch attribution with the batch
    operator's exact RANGE-frame semantics: a purchase is attributed to
    the min/max zero-padded touch key with ts in
    ``[purchase_ts - lookback, purchase_ts - 1]`` — strictly before the
    purchase's own timestamp, ties resolved by event_id via the padded
    key, identical to `operators/sessions.purchase_attribution`.

    State is the touch keys inside the lookback of the newest event seen
    (O(events-in-window) per entity, the same bound as W5's exact
    trailing windows).  The prune horizon is ``newest ts − lookback −
    watermark``: a purchase may arrive up to the watermark (120 s) late,
    and its own window reaches ``its`` ts − lookback — pruning against
    the newest ts alone would drop exactly that watermark-wide sliver of
    old touches.  A late TOUCH arriving after a newer purchase already
    emitted cannot retro-change it (append mode) — the one documented
    batch/stream difference, bounded by the watermark."""
    (entity_id,) = key
    if state.exists:
        keys_s, max_ts = state.get
        touches = keys_s.split(",") if keys_s else []
        max_ts = int(max_ts)
    else:
        touches, max_ts = [], -1
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_ms", "event_id"], kind="mergesort"
    )
    out = {"event_id": [], "purchase_ms": [], "value": [],
           "first_touch_type": [], "last_touch_type": []}
    for ts_ms, event_id, typ, value in zip(
        batch["ts_ms"].tolist(), batch["event_id"].tolist(),
        batch["type"].tolist(), batch["value"].tolist(),
    ):
        if typ == "purchase":
            lo = f"{max(ts_ms - _ATTR_LOOKBACK_MS, 0):015d}|"
            hi = f"{ts_ms:015d}|"
            eligible = [k for k in touches if lo <= k < hi]
            first = eligible[0] if eligible else None
            last = eligible[-1] if eligible else None
            out["event_id"].append(event_id)
            out["purchase_ms"].append(ts_ms)
            out["value"].append(value)
            # 3rd '|'-field, matching the batch Spark expression and the
            # DuckDB oracle's split_part(key, '|', 3) exactly
            out["first_touch_type"].append(first.split("|")[2] if first else None)
            out["last_touch_type"].append(last.split("|")[2] if last else None)
        else:
            # insert in sorted position (a within-watermark late touch
            # lands mid-list, still visible to future purchases)
            bisect.insort(touches, _touch_key(ts_ms, event_id, typ))
        max_ts = max(max_ts, ts_ms)
    # keep a watermark of slack past the lookback so a late purchase
    # (bounded by the stream's watermark) still finds its window's head
    horizon = f"{max(max_ts - _ATTR_LOOKBACK_MS - _ATTR_WATERMARK_MS, 0):015d}|"
    touches = [k for k in touches if k >= horizon]
    state.update((",".join(touches), int(max_ts)))
    if out["event_id"]:
        yield pd.DataFrame(
            {
                "entity_id": entity_id,
                "event_id": pd.Series(out["event_id"], dtype="int64"),
                "purchase_ms": pd.Series(out["purchase_ms"], dtype="int64"),
                # nullable Float64, NaN mapped back to null: a null-valued
                # purchase must emit null like the batch twin, not the NaN
                # the Arrow float64 input coerced it to
                "value": pd.array(
                    [None if v is None or v != v else v for v in out["value"]],
                    dtype="Float64",
                ),
                "first_touch_type": pd.Series(out["first_touch_type"], dtype="object"),
                "last_touch_type": pd.Series(out["last_touch_type"], dtype="object"),
            }
        )


def attribution_stateful(entity_stream: DataFrame, set_watermark: bool = True) -> DataFrame:
    """Streaming twin of `operators/sessions.purchase_attribution`:
    first/last-touch attribution emitted per purchase as it arrives,
    with keyed touch state bounded by the lookback window.  Pinned
    row-identical to the batch operator by
    ``test_streaming_attribution_matches_batch``."""
    if set_watermark:
        entity_stream = entity_stream.withWatermark(
            "ts", f"{_ATTR_WATERMARK_MS // 1000} seconds"
        )
    narrow = entity_stream.select("entity_id", "ts", "ts_ms", "event_id", "type", "value")
    return narrow.groupBy("entity_id").applyInPandasWithState(
        _emit_attribution,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTRIBUTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
