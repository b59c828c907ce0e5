#!/usr/bin/env python
"""64x-amplified CORRECTNESS: hash-parity at scale, not just wall-time.

tools/probes/amplified_bench.py measures how fast the plans run at 64x
sf0.1; nothing yet checks that the ANSWERS are still right there.  Plans
that are correct at sf0.1 can diverge at 64x through int32/int64
overflow on summed measures, float association order under much wider
partial-aggregation trees, broadcast-vs-sort-merge plan flips under AQE,
or window-frame spills.  This probe runs the in-repo driver-replica
parity harness (pulseboard_spark/parity.py — row count, columns, and the
strict stringified value hash) against the amplified directory, DuckDB
recomputing every oracle from the same amplified parquet (38.4M lineitem
/ 6.4M events / 320k docs / 128k vectors at the default 64x).

The slice covers the plan families the round-5 brief named: RANGE-frame
windows, the 24h rolling counter, identity CC + component rollup,
exact + MinHash dedup, the CDP profile/segment pipeline, sessionization,
Arrow text kernels, and one TPC-H aggregate as the overflow canary
(sum(l_extendedprice) at 38M rows exercises DECIMAL vs HUGEINT width).

Run: python tools/probes/amplified_parity.py [AMP]   (default 64)
Results -> SCALE.md ("Amplified-tier correctness").
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import amplified_bench as ab  # noqa: E402

# Family-representative slice.  Per-event-output queries (win_trailing_aggs,
# rolling_counter_24h) are deliberately included even though comparing them
# means canonicalizing 6.4M-row frames on both engines — the per-event
# grain is exactly where association-order drift would hide.
#
# identity_components / component_sizes are NOT hash-checked here: their
# DuckDB oracle is a recursive-CTE min-label propagation whose frontier is
# quadratic on hub-skewed graphs — at 64x (6.4M events, 7 shared anon hubs
# by construction) it spilled 56 GB of temp and ran the disk out while the
# Spark fixpoint finished in seconds.  That is an ORACLE-algorithm ceiling,
# not an engine doubt; at this tier the identity family is checked by
# `identity_invariants` below (every edge intra-component + component label
# == min member id — the two properties that DEFINE the answer).
SLICE = [
    "tpch_q1_pricing_summary",   # 38M-row sum/avg — overflow/width canary
    "win_trailing_aggs",         # RANGE frames, per-event output
    "rolling_counter_24h",       # bucketed 24h counter, per-event output
    "ewma",                      # Decimal recurrence, per-event output
    "dedup_exact",               # md5 canonical groups at 320k docs
    "dedup_minhash",             # banding + verify at 64x bucket mass
    "cdp_profiles",              # 2-shuffle profile pipeline + as-of join
    "cdp_segments",              # segment predicates over profiles
    "user_sessions",             # keyed sessionization
    "text_quality",              # Arrow text kernel, per-doc output
    # round-6 session-2 extension: the sessions/attribution/timeseries
    # families (r05-green at sf0.01, unchecked above it until now)
    "canonical_sessions",        # shared session-number subtree + RANGE frame
    "purchase_attribution",      # first/last-touch over lookback frames
    "burst_windows",             # hourly bucket verdicts, per-hour output
    "value_autocorr",            # lag-join autocovariance aggregate
    # round-8 extension: the round's new/changed per-doc surfaces
    "unicode_token_stats",       # NFC pandas kernel + \p{L} tokens, per-doc
    "jpeg_features",             # full JPEG entropy decode, per-doc
    "source_length_bands",       # post NULL-n_chars-exclusion quantiles
]

# Gram-kernel family (round-7 extension): exact cosine answers are
# recall-MEASURED at 128k (tools/probes/ann_recall.py) but were never
# hash-checked above sf0.1.  The DuckDB oracle for these is an O(n^2)
# cross-join scoring pass, so its ceiling is the vector count, not Spark's:
# 8x is the largest tier the single-node oracle sustains comfortably —
# include the family only there (at 64x the oracle would score 128k^2
# ~ 16G pairs; Spark's sliced-broadcast kernel is fine, the oracle isn't —
# the same asymmetry as the identity CTE above).
GRAM_SLICE = ["similarity_topk", "hard_negatives", "dedup_embedding"]
GRAM_MAX_AMP = 8

#: DuckDB resource caps for the 64x oracles: a blown-up oracle plan must
#: fail fast instead of spilling the disk full (the identity-CTE lesson).
DUCK_LIMITS = [
    "SET memory_limit='24GB'",
    "SET temp_directory='/tmp/pb_duck_spill'",
    "SET max_temp_directory_size='40GB'",
]


def identity_invariants(spark, sf_dir: str) -> tuple[bool, str, int]:
    """Oracle-free correctness check of the CC answer at scale, via the two
    properties that define min-label connected components:

    1. every identity edge joins two ids with the SAME component label;
    2. every component's label equals the minimum member id.

    Violating either is exactly how a broken fixpoint breaks (early stop
    -> split components / cross-component edges; wrong merge direction ->
    label != min).  Both checks are Spark joins/aggregations — no
    recursive SQL, so they run at any tier."""
    from pyspark.sql import functions as F

    from pulseboard_spark.operators.identity import identity_edges
    from pulseboard_spark.registry import _components, _cvalid

    cvalid = _cvalid(spark, sf_dir)
    comp = _components(spark, sf_dir)  # (id, component) — the declared query output
    edges = identity_edges(cvalid)
    a = comp.select(F.col("id").alias("a"), F.col("component").alias("ca"))
    b = comp.select(F.col("id").alias("b"), F.col("component").alias("cb"))
    joined = edges.join(a, "a", "left").join(b, "b", "left")
    cross = joined.filter(
        F.col("ca").isNull() | F.col("cb").isNull() | (F.col("ca") != F.col("cb"))
    ).count()
    bad_label = (
        comp.groupBy("component").agg(F.min("id").alias("min_id"))
        .filter(F.col("component") != F.col("min_id")).count()
    )
    n = comp.count()
    ok = cross == 0 and bad_label == 0
    return ok, f"ids={n} cross_or_unlabeled_edges={cross} label_neq_min={bad_label}", n


def main() -> None:
    from pulseboard_spark import parity
    from pulseboard_spark.session import get_spark

    amp = int(sys.argv[1]) if len(sys.argv) > 1 else ab.AMP
    amp_dir = f"/tmp/pb_amp{amp}"

    spark = get_spark("pb-amp-parity")
    spark.sparkContext.setLogLevel("ERROR")
    ab.build_amp_dir(spark, ab.BASE, amp_dir, amp)

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    slice_ = SLICE + (GRAM_SLICE if amp <= GRAM_MAX_AMP else [])
    results = []
    for name in slice_:
        if only and name not in only:
            continue
        con = parity.duck_connection(amp_dir)  # fresh con: cap per-query memory
        for stmt in DUCK_LIMITS:
            con.execute(stmt)
        t0 = time.monotonic()
        try:
            r = parity.compare(spark, con, name, amp_dir)
        except Exception as exc:  # surface, don't abort the sweep
            r = parity.ParityResult(name, False, -1, -1, f"{type(exc).__name__}: {exc}")
        dt = time.monotonic() - t0
        results.append((r, dt))
        status = "OK " if r.ok else "FAIL"
        print(f"# {status} {name}: rows={r.spark_rows} {dt:.0f}s {r.detail[:200]}", file=sys.stderr)
        con.close()

    t0 = time.monotonic()
    inv_ok, inv_detail, inv_rows = identity_invariants(spark, amp_dir)
    inv_dt = time.monotonic() - t0
    print(f"# {'OK ' if inv_ok else 'FAIL'} identity_invariants: {inv_detail} {inv_dt:.0f}s", file=sys.stderr)

    print(f"\n| query | rows ({amp}x) | hash parity | wall (both engines) |")
    print("|---|---|---|---|")
    for r, dt in results:
        print(f"| {r.name} | {r.spark_rows:,} | {'OK' if r.ok else 'FAIL: ' + r.detail[:120]} | {dt:.0f}s |")
    print(f"| identity_components+sizes | {inv_rows:,} | {'OK (invariant audit)' if inv_ok else 'FAIL: ' + inv_detail} | {inv_dt:.0f}s |")
    bad = [r for r, _ in results if not r.ok]
    print(f"\n{len(results) - len(bad)}/{len(results)} hash-parity at {amp}x; identity invariants {'OK' if inv_ok else 'FAIL'}")
    if bad or not inv_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
