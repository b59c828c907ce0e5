#!/usr/bin/env python
"""Fuzzy-pairs hot-block budget: measure what the blocking choice costs.

`blocked_fuzzy_pairs` is quadratic WITHIN a block.  The declared
`fuzzy_customer_pairs` query used to block on c_nationkey alone — fine at
sf0.1 (600-row blocks), but block size grows linearly with customers, so
the hot block's n² dominates at scale.  Round 7 switched the query to
FastSS deletion-neighborhood blocking (`operators/dedup.py`), whose worst
block is the largest near-dup cluster, independent of table size.

This probe measures, at sf0.1 / 8x / 64x synthetic customer tiers
(replicas get fresh TPC-H-derived names, 'Customer#' || 9 digits, so the
near-dup structure stays realistic instead of gaining exact twins):

  * worst block size + total intra-block pair count for the naive nation
    block vs the deletion-neighborhood block;
  * wall time of both plans (the naive plan is *run*, not projected, so
    the quadratic cliff is a measured number);
  * equality of the two answers at every tier (the neighborhood plan must
    stay exact, per the FastSS max_dist=1 guarantee).

Run: python tools/probes/fuzzy_block_budget.py   (results -> SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIERS = [1, 8, 64]
# The naive plan is only RUN up to this tier: at 64x it is ~37.8 G
# levenshtein comparisons and did not finish a 10-minute budget on
# local[32] (measured once, then excluded) — that cliff is the number;
# equality vs the neighborhood answer is asserted at the tiers where the
# naive plan is feasible at all.
NAIVE_MAX_AMP = 8


def build_customer(spark, amp: int):
    from pyspark.sql import functions as F

    cust = spark.read.parquet(os.path.join(BASE, "customer.parquet"))
    if amp == 1:
        return cust.select("c_custkey", "c_name", "c_nationkey")
    rep = spark.range(amp).withColumnRenamed("id", "r")
    key = F.col("c_custkey") + F.col("r") * F.lit(10**7)
    return (
        cust.crossJoin(rep)
        .select(
            key.alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.lpad(key.cast("string"), 9, "0")).alias("c_name"),
            "c_nationkey",
        )
    )


def block_stats(df, cols) -> tuple[int, int]:
    """(worst block size, total intra-block ordered-pair count)."""
    from pyspark.sql import functions as F

    g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    row = g.agg(
        F.max("n").alias("worst"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
    ).collect()[0]
    return int(row["worst"]), int(row["pairs"])


def main() -> None:
    from pyspark.sql import functions as F

    from pulseboard_spark.operators.dedup import _deletion_neighborhood, blocked_fuzzy_pairs
    from pulseboard_spark.session import get_spark

    spark = get_spark("pb-fuzzy-budget")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for amp in TIERS:
        cust = build_customer(spark, amp).cache()
        n = cust.count()

        worst_naive, pairs_naive = block_stats(cust, ["c_nationkey"])
        nbr = cust.select("c_nationkey", F.explode(_deletion_neighborhood("c_name")).alias("v"))
        worst_nbr, pairs_nbr = block_stats(nbr, ["c_nationkey", "v"])

        def run(neighborhood: bool) -> tuple[float, int]:
            t0 = time.monotonic()
            cnt = blocked_fuzzy_pairs(
                cust, key="c_custkey", name="c_name", block="c_nationkey",
                max_dist=1, neighborhood=neighborhood,
            ).count()
            return time.monotonic() - t0, cnt

        t_nbr, n_nbr = run(True)
        if amp <= NAIVE_MAX_AMP:
            t_naive, n_naive = run(False)
            assert n_nbr == n_naive, f"answers diverge at {amp}x: {n_nbr} vs {n_naive}"
            naive_wall = f"{t_naive:.1f}s"
        else:
            naive_wall = ">600s (timed out)"
        rows.append((amp, n, worst_naive, pairs_naive, naive_wall,
                     worst_nbr, pairs_nbr, t_nbr, n_nbr))
        print(f"# {amp}x: customers={n:,} pairs={n_nbr:,} | naive worst={worst_naive:,} "
              f"cmp={pairs_naive:,} {naive_wall} | nbr worst={worst_nbr:,} "
              f"cmp={pairs_nbr:,} {t_nbr:.1f}s", file=sys.stderr, flush=True)
        cust.unpersist()

    print("\n| tier | customers | naive worst block | naive levenshtein cmp | naive wall "
          "| FastSS worst block | FastSS candidate cmp | FastSS wall | matches |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (amp, n, wn, pn, tn, wb, pb, tb, cnt) in rows:
        eq = "equal" if amp <= NAIVE_MAX_AMP else "nbr only"
        print(f"| {amp}x | {n:,} | {wn:,} | {pn:,} | {tn} "
              f"| {wb:,} | {pb:,} | {tb:.1f}s | {cnt:,} ({eq}) |")


if __name__ == "__main__":
    main()
