#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across headline queries (lower is better).
Each query is forced with a count() so the full plan executes; results are
never collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulseboard_spark.registry import QUERIES  # noqa: E402
from pulseboard_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q18_large_volume",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_share_of_total",
    "tpch_q20_half_volume_suppliers",
    "asof_last_purchase",
    "user_sessions",
    "inter_event_deltas",
    "gap_fill_hours",
    "revenue_wow",
    "value_outliers",
    "dominant_event_type",
    "fuzzy_customer_pairs",
    "top_parts_per_brand",
    "win_trailing_aggs",
    "ewma",
    "r1_velocity_spike",
    "r2_value_spike",
    "r3_geo_device_mismatch",
    "r4_exfil",
    "rolling_counter_24h",
    "identity_components",
    "cdp_profiles",
    "cdp_segments",
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "similarity_topk",
    "text_quality",
    "token_stats",
    "corpus_summary",
    "resize_media",
    "trait_history",
    "value_histogram",
    "inverted_index",
    "term_cooccurrence",
    "bigram_stats",
    "gopher_quality",
    "geo_heavy_hitters",
    "value_mad_outliers",
    "hourly_trending",
    "rfm_scores",
    "value_drift_psi",
    "label_centroids",
    "label_noise_suspects",
    "bpe_merge_candidates",
    "doc_split_assign",
    "seasonal_deviation",
    "hard_negatives",
    "media_text_pairs",
    "lineitem_profile",
    "multimodal_features",
    "audio_features",
    "video_frame_features",
    "doc_lm_score",
    "cdp_trait_fidelity",
    "purchase_attribution",
    "canonical_sessions",
    # round 8: the two new oracle-checked surfaces
    "unicode_token_stats",
    "jpeg_features",
    # round 10: the corrupt-corpus quarantine surface (decode + injected
    # corruption; measures that the per-row try/except costs nothing)
    "jpeg_features_quarantine",
]


def _loadavg() -> list[float]:
    try:
        return [float(x) for x in open("/proc/loadavg").read().split()[:3]]
    except OSError:  # non-Linux fallback: absent, not fabricated
        return []


def _spin_canary(iters: int = 2_000_000, reps: int = 5) -> float:
    """Single-core spin calibration: MEDIAN wall seconds for a FIXED
    amount of pure-Python integer work, over ``reps`` back-to-back runs
    (single readings swing ~2x on this host as the outside-the-guest
    throttle comes and goes — the same throttle being measured).  The r07
    artifact (60.96s vs a 37.49s idle run of the identical tree) needed
    an out-of-band re-run to attribute to host throttling; this canary
    makes the artifact self-adjudicating: measured idle band on this host
    ~0.20-0.45s (SCALE.md "Reading the bench artifact"); throttling
    inflates it roughly in proportion to every other single-thread span.
    Recorded at start AND end so a mid-run throttle shows up as skew."""
    times = []
    acc = 1
    for _ in range(reps):
        t0 = time.monotonic()
        for _ in range(iters):
            acc = (acc * 1103515245 + 12345) & 0xFFFFFFFF
        times.append(time.monotonic() - t0)
    if acc == 0:  # keep the loop un-eliminable
        print(acc, file=sys.stderr)
    return round(sorted(times)[reps // 2], 3)


def _spin_canary_mc(procs: int = 8, iters: int = 2_000_000) -> float:
    """Aggregate-CPU throttle detector: the SAME fixed spin in ``procs``
    concurrent subprocesses, wall seconds.  A host throttle that caps
    total guest CPU (rather than per-core speed) leaves the single-core
    canary in its idle band while inflating every parallel span — the
    round-8 latency session measured exactly that (single-core spin
    0.21s = idle, yet the identical untuned probe ran 1.7x its r07
    numbers).  Idle band on this host: ~0.5-0.8s for 8 procs (spin +
    interpreter startup); aggregate throttling inflates it directly."""
    import subprocess

    code = (
        "acc = 1\n"
        f"for _ in range({iters}):\n"
        "    acc = (acc * 1103515245 + 12345) & 0xFFFFFFFF\n"
    )
    t0 = time.monotonic()
    ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(procs)]
    for p in ps:
        p.wait()
    return round(time.monotonic() - t0, 3)


def _membw_canary(mb: int = 256, reps: int = 5) -> float:
    """Memory-bandwidth canary: median GB/s for a fixed big-array copy.
    The round-8 session measured a host mode where BOTH spin canaries sat
    in their idle bands while Arrow/Python-worker-heavy queries ran 2-3x
    slow — compute wasn't throttled, memory/IPC was.  numpy copy is the
    cheapest proxy for that axis.  Idle band on this host: see SCALE.md
    "Reading the bench artifact" (recorded there from drained readings)."""
    import numpy as np

    a = np.zeros(mb * 1024 * 1024 // 8)
    rates = []
    for _ in range(reps):
        t0 = time.monotonic()
        b = a.copy()
        dt = time.monotonic() - t0
        rates.append(2 * mb / 1024 / dt)  # read + write
        del b
    return round(sorted(rates)[reps // 2], 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_start, spin_start, spin_mc_start = _loadavg(), _spin_canary(), _spin_canary_mc()
    membw_start = _membw_canary()
    # Stream bench runs FIRST and in its OWN SparkContext: round 2 ran it
    # after 61 batch queries and the accumulated memory pressure cost ~30%
    # of the recorded rate (11204 -> 7718 eps); conversely, state-store and
    # Python-worker residue from streaming inflates the Arrow-heavy batch
    # queries (multimodal_features measured 4x slower post-stream), so each
    # phase gets a clean context.
    spark = get_spark("pulseboard-bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    stream_eps, stream_pass_eps = _stream_throughput(spark, sf_dir)
    print(f"# streaming_rules_eps: {stream_eps:.0f} events/sec (baseline target 10000)", file=sys.stderr)
    spark.stop()

    spark = get_spark("pulseboard-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers so per-query numbers measure the plans
    QUERIES["tpch_q1_pricing_summary"](spark, sf_dir).count()

    # Two runs per query: "queries" reports the warm best (plan cost with
    # warm Python workers and the memoized silver tables a real pipeline
    # materializes once per corpus); "queries_cold" keeps each first run —
    # including one-time silver builds — so nothing hides.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        best, n = float("inf"), 0
        for run in range(2):
            t0 = time.monotonic()
            n = QUERIES[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            if run == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: warm {timings[name]:.3f}s cold {cold[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # The recorder keeps only the LAST 2000 BYTES of output and parses the
    # final JSON line from that window (measured r11: BENCH_r01 is a real
    # parse failure, every recorded tail is exactly 2000 bytes, and the r10
    # line was 1984 bytes — 16 bytes of slack).  The full 66-entry cold map
    # therefore CANNOT ride the stdout line (~1.7 KB on its own): it goes to
    # stderr, to a best-effort sidecar file, and the line carries the
    # aggregate "cold_total" (r10 verdict item 8, adapted to the window).
    print("# cold: " + json.dumps(cold), file=sys.stderr)
    # per-pass stream rates: diagnostics, stderr (freed ~45 bytes of window)
    print("# stream_eps_passes: " + json.dumps([round(e) for e in stream_pass_eps]), file=sys.stderr)
    try:  # sidecar with both maps, for the committed evidence trail
        side = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
        os.makedirs(side, exist_ok=True)
        with open(os.path.join(side, "bench_cold_last.json"), "w") as f:
            json.dump({"queries": timings, "queries_cold": cold, "sf": sf}, f)
    except OSError as e:  # read-only checkout etc. — the sidecar is best-effort
        print(f"# cold sidecar not written: {e!r}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                # sum of each query's FIRST run (incl. one-time silver/cache
                # builds) — pins the cold story in the parsed artifact; the
                # per-query cold map is on stderr + the sidecar file
                "cold_total": round(sum(cold.values()), 2),
                "stream_eps": round(stream_eps),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-contention self-adjudication (SCALE.md "Reading the
                # bench artifact"), [start, end] pairs (compact names r11 —
                # the 2000-byte window forced the rename):
                # load: 1/5/15-min loadavg.
                # spin: fixed single-core spin, median of 5 (idle 0.20-0.45s).
                # mcspin: the same spin in 8 concurrent procs (idle 0.5-0.8s)
                #   — catches aggregate-CPU throttle the single spin misses.
                # membw: big-array copy GB/s (idle ~5-8) — catches the
                #   memory/IPC throttle mode that slows Arrow paths while
                #   both spins sit in their idle bands.
                "load": [load_start, _loadavg()],
                "spin": [spin_start, _spin_canary()],
                "mcspin": [spin_mc_start, _spin_canary_mc()],
                "membw": [membw_start, _membw_canary()],
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


def _stream_throughput(spark, sf_dir: str) -> float:
    """Sustained throughput of the streaming anomaly path (R1/R2/R4 in keyed
    state): events/sec through alert_rules_stateful on the sf events replayed
    through a file-source stream.  The reference's design target is 10 000+
    events/sec *sustained* (`cdp/runtime/CdpEventProcessor.kt:37`,
    BASELINE.md), so the measured batch is a WARM one: batch 0 pays the
    one-time costs (state-store init, Python worker spin-up, codegen) and is
    excluded; the same rows are then re-fed as new files and timed."""
    import glob
    import shutil
    import tempfile
    import time as _t

    from pulseboard_spark.sources.tables import entity_events
    from pulseboard_spark.streaming.stateful import alert_rules_stateful

    spark.catalog.clearCache()  # batch-query silver tables skew the measure
    work = tempfile.mkdtemp(prefix="pb_stream_bench_")
    try:
        src = f"{work}/events"
        ev = entity_events(spark, sf_dir)
        n = ev.count()
        ev.write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            alert_rules_stateful(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", f"{work}/ckpt")
            .start()
        )
        q.processAllAvailable()  # warm-up batch (startup costs, cold state)
        # four timed replay passes; report the MEAN rate (total events /
        # total time) — a sustained measure, not a best-of max, so the
        # recorded stream_eps is what the label implies.  Four passes, not
        # two: each pass is only seconds of work at this SF, so a single
        # straggler batch/GC pause was swinging the recorded rate ~2×
        # run-to-run (observed 35.4k vs 15.2k same-day); per-pass rates go
        # to stderr so a skewed record is diagnosable.  One extra WARM
        # replay pass runs un-timed between batch 0 and the timed passes:
        # the RocksDB soak showed the first replay still pays residual
        # state-store/JIT warmth (~10%), which is startup cost, not
        # sustained throughput — the r05 driver artifact recorded 29,968
        # eps against an idle-machine 32.5k for exactly this reason.
        elapsed = 0.0
        replays = 4
        parts = sorted(glob.glob(f"{src}/part-*.parquet"))
        pass_eps: list[float] = []
        for rep in range(-1, replays):
            # Stage the replay batch as dot-prefixed files (invisible to
            # Spark's file listing) and expose it with instant renames —
            # copying in place races the RUNNING stream, which picks up a
            # partial file set as its own micro-batch and splits the pass
            # in two (measured: 2-stage passes at ~10k eps vs 1-stage at
            # ~35k — the whole run-to-run variance was this race).
            staged = []
            for i, f in enumerate(parts):
                tmp = f"{src}/.replay-{rep}-{i}.parquet"
                shutil.copy(f, tmp)
                staged.append((tmp, f"{src}/replay-{rep}-{i}.parquet"))
            # timer starts BEFORE the renames: if the poller catches a
            # partial set mid-rename the pass still counts every second of
            # its processing — a split can lower a pass's rate (variance)
            # but can never move work outside the timed region (bias)
            t0 = _t.monotonic()
            for tmp, final in staged:
                os.rename(tmp, final)
            q.processAllAvailable()
            dt = _t.monotonic() - t0
            if rep < 0:  # warm replay: absorbs residual state-store/JIT cost
                print(f"# stream warm pass: {n / dt:.0f} eps (untimed)", file=sys.stderr)
                continue
            elapsed += dt
            pass_eps.append(n / dt)
            print(f"# stream pass {rep}: {n / dt:.0f} eps", file=sys.stderr)
        q.stop()
        return replays * n / elapsed, pass_eps
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()