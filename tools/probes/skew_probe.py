#!/usr/bin/env python
"""Empirical skew probe: where key skew actually hurts, and which
mitigation pays — measured, not guessed.

Builds an amplified skewed fact (N_ROWS rows, ~N_KEYS keys, with one hot
key holding HOT_SHARE of all rows — the bot-entity / boilerplate-bucket
shape SCALE.md's skew chapter describes) and times three shapes that a
100 TB plan would meet, each against its mitigation:

A. **Algebraic aggregation** (sum/count groupBy): plain vs
   `skew.salted_agg`.  Hypothesis under test: hash aggregation's
   map-side partial combine already neutralizes row-count skew — each
   scan task reduces its own hot-key rows to ONE partial row, so the
   shuffle carries ~n_partitions rows per key regardless of skew, and
   salting only adds a phase.

B. **Window over the skewed partition key** (row_number + trailing sum):
   windows have NO partial aggregation — every hot-key row lands on one
   reducer and gets sorted there.  Mitigation measured: the two-level
   pre-aggregate form (bucket first, window over buckets) the gauge /
   rolling-counter layers use.

C. **Sort-merge join with a hot key**: fact ⋈ per-key dim with
   broadcast disabled (the bucketed-SMJ regime where AQE's OptimizeSkewedJoin
   is the designed mitigation).  Measured with AQE skew splitting on vs
   off, with thresholds lowered so the splitter can see local-scale
   partitions (defaults trigger at 256 MB partitions — production sizes
   reach them naturally; the probe documents the mechanism).

Run: python tools/probes/skew_probe.py  (results → SCALE.md)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pulseboard_spark.operators.skew import salted_agg

N_ROWS = 4_000_000
N_KEYS = 100_000
HOT_SHARE = 0.5  # one key holds half the fact


def build(spark: SparkSession):
    """Skewed fact: row i -> hot key 0 for i < N*share, else uniform."""
    df = (
        spark.range(0, N_ROWS, 1, 32)
        .withColumn(
            "key",
            F.when(F.col("id") < int(N_ROWS * HOT_SHARE), F.lit(0)).otherwise(
                F.abs(F.xxhash64("id")) % N_KEYS
            ),
        )
        .withColumn("ts", (F.col("id") % 86_400).cast("long"))
        # full-entropy values: AQE's skew detector operates on COMPRESSED
        # map-output bytes, and a low-entropy synthetic column (e.g.
        # hash % 1000) lz4-compresses a 2M-row hot partition under 1 MB —
        # below any realistic threshold, so the splitter never fires on
        # data real events would trigger (measured; see SCALE.md)
        .withColumn("value", (F.xxhash64("id", F.lit("v")).cast("double") / F.lit(1e9)))
    )
    return df.localCheckpoint()  # pin the input so probes time the operator, not the generator


def bench(label: str, fn, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    print(f"{label:55s} {best:7.2f}s")
    return best


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact = build(spark)
    fact.count()
    hot = fact.filter(F.col("key") == 0).count()
    print(f"fact: {N_ROWS} rows, hot key holds {hot} ({100 * hot / N_ROWS:.0f}%)\n")

    # --- A: algebraic aggregation ------------------------------------------
    plain = lambda: fact.groupBy("key").agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")
    ).write.format("noop").mode("overwrite").save()
    salted = lambda: salted_agg(
        fact, ["key"], {"s": ("sum", "value"), "c": ("count", "value")}
    ).write.format("noop").mode("overwrite").save()
    a1 = bench("A. plain groupBy sum/count (skewed key)", plain)
    a2 = bench("A. salted_agg same", salted)

    # --- B: window over the skewed key -------------------------------------
    w = Window.partitionBy("key").orderBy("ts", "id")
    win = lambda: fact.select(
        "key", F.row_number().over(w).alias("rn"), F.sum("value").over(w).alias("run")
    ).write.format("noop").mode("overwrite").save()

    # two-level twin for the trailing sum at bucket grain: pre-aggregate to
    # (key, ts) — map-side combined, skew-immune — then window over buckets
    bw = Window.partitionBy("key").orderBy("ts")
    two_level = lambda: (
        fact.groupBy("key", "ts")
        .agg(F.sum("value").alias("bucket_sum"), F.count(F.lit(1)).alias("bucket_n"))
        .select("key", "ts", F.sum("bucket_sum").over(bw).alias("run"))
        .write.format("noop").mode("overwrite").save()
    )
    b1 = bench("B. window row_number+sum over skewed key", win)
    b2 = bench("B. two-level (bucket agg, window over buckets)", two_level)

    # --- C: skewed SMJ, AQE skew split off vs on ---------------------------
    dim = (
        spark.range(0, N_KEYS, 1, 8)
        .select(F.col("id").alias("key"), (F.col("id") % 7).alias("attr"))
        .localCheckpoint()
    )

    def smj(skew_on: bool) -> bool:
        """Returns whether the splitter actually fired (plan-verified —
        a wall-clock delta without the marker proves nothing).

        The aggregate MUST carry `value` through the join: with a
        count-only rollup, column pruning shuffles the fact side as the
        bare join key, and 2M identical hot-key rows lz4-compress under
        1 MB — the skew detector (which reads compressed map-output
        sizes) then sees nothing to split (measured; see SCALE.md)."""
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # let the splitter see local-scale partitions (defaults: 256 MB)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = (
            fact.join(dim, "key")
            .groupBy("attr")
            .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        df.collect()  # collect, not write: keeps the executed QueryExecution inspectable
        return "skew=true" in df._jdf.queryExecution().executedPlan().toString()

    fired = {}
    c1 = bench("C. skewed SMJ, AQE skew split OFF", lambda: fired.setdefault(False, smj(False)))
    c2 = bench("C. skewed SMJ, AQE skew split ON", lambda: fired.setdefault(True, smj(True)))
    print(f"   skew split fired: off={fired[False]} on={fired[True]}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")

    print("\nsummary:")
    print(f"  A plain {a1:.2f}s vs salted {a2:.2f}s  (partial combine already uniform)")
    print(f"  B window {b1:.2f}s vs two-level {b2:.2f}s")
    print(f"  C skew-split off {c1:.2f}s vs on {c2:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
