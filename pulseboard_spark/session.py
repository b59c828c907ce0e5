"""SparkSession construction and runtime tuning.

Every public query entry point calls :func:`tune` on whatever session it is
handed (the correctness driver owns its own session), so all settings here
must be *runtime-settable* SQL confs, not static Spark confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to any session we touch.
#:
#: - ``nanosAsLong``: the driver testdata's ``events.parquet`` stores
#:   TIMESTAMP(NANOS) which Spark's parquet reader rejects; reading nanos as
#:   LongType and rebuilding the timestamp ourselves (see sources.tables)
#:   keeps the scan vectorized.
#: - UTC session timezone so epoch arithmetic matches the DuckDB oracle.
#: - AQE + skew handling on: at 100 TB the runtime re-plan (dynamic
#:   coalescing, skew-join splitting, broadcast demotion) is the difference
#:   between a tuned plan and a hand-tuned one.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few applyInPandas operators (EWMA); batched transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Test-harness scale: AQE coalesces upward on a real cluster; a foreign
    # session's default 200 shuffle partitions just adds task overhead at
    # local data sizes.
    "spark.sql.shuffle.partitions": "32",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs; idempotent and safe on a foreign session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — proceed; loaders
            # have a pyarrow fallback for the nanos issue.
            pass
    return spark


def get_spark(app_name: str = "pulseboard-spark", cpus: int | None = None) -> SparkSession:
    """Build a local session sized for the test harness.

    On a real cluster this builder is replaced by spark-submit confs; the
    operator layer never assumes local mode.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # One shuffle partition per core locally; on a cluster AQE coalesces
        # from a higher initial number instead.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("PB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    return tune(spark)
