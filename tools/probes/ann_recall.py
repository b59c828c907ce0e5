#!/usr/bin/env python
"""ANN recall at the amplified tier: measure, don't extrapolate.

`ann_topk` is the routed corpus-scale default above the exact kernels'
ceiling (23s vs 252s exact at 128k vectors, SCALE.md), and its recall is
pinned by test at sf0.001 — but recall is scale-dependent (buckets get
DENSER as n grows at fixed n_planes, raising recall and cost together;
more planes shrink buckets, cutting both).  This probe measures
recall@k on the REAL 128k-vector amplified corpus against the exact
top-k as ground truth, across the two knobs the operator exposes:

  n_planes  — bucket granularity (expected bucket size n / 2^planes)
  n_tables  — independent plane families merged by cosine (recall is
              deterministically monotone in T; see ann_topk docstring)

Output: one markdown table (recall@k, mean wall per config) -> SCALE.md
("ANN recall at 128k").  The exact truth pass reuses whichever exact
route the guard picks (broadcast kernel under the ceiling at 128k).

Run: python tools/probes/ann_recall.py [AMP] [K]   (default 64, 10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

CONFIGS = [  # (n_planes, n_tables)
    (6, 1),
    (6, 2),
    (6, 4),
    (8, 1),
    (8, 2),
    (8, 4),
]


def truth_topk(embs, k: int) -> dict[int, frozenset[int]]:
    """Exact top-k neighbor ID sets, via whatever exact route the size
    guard picks (broadcast kernel under the ceiling, sliced above)."""
    from pulseboard_spark.operators.similarity import cosine_topk

    out: dict[int, set[int]] = {}
    for r in cosine_topk(embs, k).select("vec_id", "neighbor_id").collect():
        out.setdefault(r[0], set()).add(r[1])
    return {q: frozenset(s) for q, s in out.items()}


def measure_recall(embs, k: int, configs=CONFIGS, truth: dict | None = None):
    """recall@k per (n_planes, n_tables) config: mean over queries of
    |ann ∩ truth| / |truth| (truth sets can be < k only in degenerate
    tiny corpora).  Returns [(planes, tables, recall, wall_sec), ...]."""
    from pulseboard_spark.operators.similarity import ann_topk

    if truth is None:
        truth = truth_topk(embs, k)
    rows = []
    for planes, tables in configs:
        t0 = time.monotonic()
        got: dict[int, set[int]] = {}
        for r in ann_topk(embs, k, n_planes=planes, n_tables=tables).select("vec_id", "neighbor_id").collect():
            got.setdefault(r[0], set()).add(r[1])
        wall = time.monotonic() - t0
        recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items() if t]
        recall = sum(recalls) / max(len(recalls), 1)
        rows.append((planes, tables, recall, wall))
        print(f"# planes={planes} tables={tables}: recall@{k} {recall:.3f} wall {wall:.1f}s", file=sys.stderr)
    return rows


def main() -> None:
    import amplified_bench as ab

    from pulseboard_spark.session import get_spark

    amp = int(sys.argv[1]) if len(sys.argv) > 1 else ab.AMP
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    amp_dir = f"/tmp/pb_amp{amp}"

    spark = get_spark("pb-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    ab.build_amp_dir(spark, ab.BASE, amp_dir, amp)
    # spread across the executor threads: the amplified parquet lands as 2
    # row groups, and a raw read hands the Arrow kernels 2 partitions — the
    # truth pass then runs on one core (the `_spread` lesson from the r5
    # bench tier).  One up-front shuffle, amortized across every config.
    embs = spark.read.parquet(f"{amp_dir}/embeddings.parquet").repartition(64).cache()
    n = embs.count()
    print(f"# corpus: {n} vectors", file=sys.stderr)

    t0 = time.monotonic()
    truth = truth_topk(embs, k)
    print(f"# exact truth pass: {time.monotonic() - t0:.0f}s", file=sys.stderr)

    rows = measure_recall(embs, k, truth=truth)
    print(f"\n| n_planes | n_tables | recall@{k} ({n} vecs) | wall |")
    print("|---|---|---|---|")
    for planes, tables, recall, wall in rows:
        print(f"| {planes} | {tables} | {recall:.3f} | {wall:.1f}s |")


if __name__ == "__main__":
    main()
