#!/usr/bin/env python
"""Per-stage wall/metric breakdown for one or more queries (guide §1.1/§7.1).

Runs each query warm (twice, metrics from the second run) on a session with
the UI enabled, then prints per-stage: wall span, task-time sum, shuffle
read/write bytes, input bytes, and the stage name — the empirical side of
the measure-first loop, without leaving the terminal.

Usage: python tools/probes/stage_metrics.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import SparkSession  # noqa: E402

from pulseboard_spark.registry import QUERIES  # noqa: E402
from pulseboard_spark.session import tune  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = tune(
        SparkSession.builder.appName("pulseboard-stage-metrics")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("PB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    QUERIES["tpch_q1_pricing_summary"](spark, sf_dir).count()

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.load(r)

    for name in names:
        QUERIES[name](spark, sf_dir).count()  # warm-up run
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"metrics:{name}")
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).count()
        wall = time.monotonic() - t0
        new = [s for s in stages() if s["stageId"] not in seen and s["status"] == "COMPLETE"]
        new.sort(key=lambda s: s["stageId"])
        print(f"\n=== {name}: warm wall {wall:.3f}s, {len(new)} stages ===")
        total_task = 0.0
        for s in new:
            task_s = s["executorRunTime"] / 1000.0
            total_task += task_s
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"taskTime={task_s:7.2f}s in={s['inputBytes']:>9} "
                f"sRead={s['shuffleReadBytes']:>8} sWrite={s['shuffleWriteBytes']:>8} "
                f"| {s['name'].splitlines()[0][:70]}"
            )
        print(f"  task-time total {total_task:.2f}s over {wall:.3f}s wall "
              f"(parallel eff {total_task / max(wall, 1e-9) / cpus:.0%} of {cpus} cores)")
    spark.stop()


if __name__ == "__main__":
    main()
