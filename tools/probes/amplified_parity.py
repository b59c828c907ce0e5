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
SLICE = [
    "tpch_q1_pricing_summary",   # 38M-row sum/avg — overflow/width canary
    "win_trailing_aggs",         # RANGE frames, per-event output
    "rolling_counter_24h",       # bucketed 24h counter, per-event output
    "ewma",                      # Decimal recurrence, per-event output
    "identity_components",       # CC fixpoint over the 64x identity graph
    "component_sizes",           # rollup over the CC labels
    "dedup_exact",               # md5 canonical groups at 320k docs
    "dedup_minhash",             # banding + verify at 64x bucket mass
    "cdp_profiles",              # 2-shuffle profile pipeline + as-of join
    "cdp_segments",              # segment predicates over profiles
    "user_sessions",             # keyed sessionization
    "text_quality",              # Arrow text kernel, per-doc output
]


def main() -> None:
    from pulseboard_spark import parity
    from pulseboard_spark.session import get_spark

    amp = int(sys.argv[1]) if len(sys.argv) > 1 else ab.AMP
    amp_dir = f"/tmp/pb_amp{amp}"

    spark = get_spark("pb-amp-parity")
    spark.sparkContext.setLogLevel("ERROR")
    ab.build_amp_dir(spark, ab.BASE, amp_dir, amp)

    results = []
    for name in SLICE:
        con = parity.duck_connection(amp_dir)  # fresh con: cap per-query memory
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

    print(f"\n| query | rows ({amp}x) | hash parity | wall (both engines) |")
    print("|---|---|---|---|")
    for r, dt in results:
        print(f"| {r.name} | {r.spark_rows:,} | {'OK' if r.ok else 'FAIL: ' + r.detail[:120]} | {dt:.0f}s |")
    bad = [r for r, _ in results if not r.ok]
    print(f"\n{len(results) - len(bad)}/{len(results)} hash-parity at {amp}x")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
