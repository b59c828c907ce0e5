"""Feature-preparation operators for training-data pipelines: per-group
standardization (z-scores / outlier flags) and equal-frequency binning.

The reference has no feature layer at all — its only per-distribution
computation is the P95 window in rule R4 (`ingest/WindowStore.kt`,
SURVEY §2.4 A8).  These operators cover what an ML pipeline does right
before writing training shards: normalize features against per-group
statistics and discretize skewed numerics.

Scale notes (100 TB posture):
  * ``standardize`` is the aggregate-then-broadcast pattern: the stats
    table is |groups| rows (tiny), so rejoining it to the fact is a
    broadcast hash join — the fact is scanned once, never shuffled.
    Moments are DECIMAL-exact sums (same rationale as
    ``relational.value_stats_per_type``): a parallel ``stddev_samp`` has
    partition-order-dependent low bits; exact Σv/Σv² make every z-score
    reproducible across partitionings and engines.
  * ``quantile_bins`` is ntile over a per-group sort — one shuffle on the
    group key.  Equal-frequency bin EDGES could be computed from
    ``percentile`` without the full sort, but per-ROW bin assignment is
    the point here, and ntile's rank arithmetic is deterministic with the
    (value, id) tie-break where edge-interpolation binning is not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_moments(df: DataFrame, value: str, by: Sequence[str]) -> DataFrame:
    """Per-group n / mean / sample-std from decimal-exact moment sums."""
    s1 = F.sum(F.col(value).cast("decimal(30,6)")).cast("double")
    s2 = F.sum((F.col(value) * F.col(value)).cast("decimal(30,6)")).cast("double")
    agged = df.where(F.col(value).isNotNull()).groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"), s1.alias("_s1"), s2.alias("_s2")
    )
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")) / (
        F.col("_n") - 1
    )
    return agged.select(
        *by,
        F.col("_n").alias("n"),
        (F.col("_s1") / F.col("_n")).alias("mean"),
        F.sqrt(var).alias("std"),
    )


def standardize(
    df: DataFrame, value: str, by: Sequence[str], z_col: str = "zscore"
) -> DataFrame:
    """Attach the per-group z-score of ``value`` to every row (NULL where
    the value is NULL or the group is degenerate: n < 2 or zero variance).
    Stats ride a broadcast join back onto the fact — one scan, no fact
    shuffle."""
    by = list(by)
    stats = group_moments(df, value, by)
    z = F.when(
        F.col("std") > 0, (F.col(value) - F.col("mean")) / F.col("std")
    )
    return (
        df.join(F.broadcast(stats), by, "left")
        .withColumn(z_col, z)
        .drop("n", "mean", "std")
    )


def value_outliers(ev: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Events whose value is a >N-sigma outlier within its event type —
    the query-shaped face of :func:`standardize`."""
    z = standardize(ev, "value", ["type"])
    return (
        z.where(F.abs(F.col("zscore")) > threshold)
        .select(
            "event_id",
            "entity_id",
            "type",
            F.round("value", 4).alias("value"),
            F.round("zscore", 4).alias("zscore"),
        )
    )


def quantile_bins(
    df: DataFrame,
    value: str,
    by: Sequence[str],
    n_bins: int = 10,
    bin_col: str = "bin",
) -> DataFrame:
    """Equal-frequency bin assignment (ntile) of ``value`` within each
    group; ties broken deterministically by event_id so the binning is
    reproducible across engines and partitionings."""
    w = Window.partitionBy(*by).orderBy(F.col(value), F.col("event_id"))
    return df.where(F.col(value).isNotNull()).withColumn(
        bin_col, F.ntile(n_bins).over(w)
    )


def value_decile_profile(ev: DataFrame) -> DataFrame:
    """Per (type, decile) population and value range — the compact,
    query-shaped face of :func:`quantile_bins`."""
    binned = quantile_bins(ev, "value", ["type"], 10, "decile")
    return binned.groupBy("type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


def value_histogram(ev: DataFrame, n_bins: int = 20) -> DataFrame:
    """Per-type equal-width histogram of ``value`` (the feature-profiling
    pass a training pipeline runs before choosing clips/transforms).

    Two-phase: the per-type min/max is a tiny aggregate broadcast back
    onto the fact — the fact table itself is shuffled exactly once, for
    the final (type, bin) count.  Bin index is
    ``floor((v - min) / ((max - min) / n_bins))`` clamped to the last
    bin so v == max lands in bin n-1; a degenerate type (min == max)
    collapses to bin 0.  All arithmetic is double-precision IEEE in a
    fixed operation order so the DuckDB oracle reproduces it bit-exactly.
    """
    vals = ev.filter(F.col("value").isNotNull()).select(
        "type", F.col("value").cast("double").alias("v")
    )
    stats = vals.groupBy("type").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(n_bins))
    binned = vals.join(F.broadcast(stats), "type").withColumn(
        "bin",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("v") - F.col("vmin")) / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("int"),
    )
    return binned.groupBy("type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(F.col("vmin") + F.col("bin") * width), 4).alias("bin_lo"),
        F.round(F.min(F.col("vmin") + (F.col("bin") + 1) * width), 4).alias("bin_hi"),
    )


def _discrete_median(df: DataFrame, key: str, valcol: str, out: str) -> DataFrame:
    """Per-key LOWER DISCRETE median: the smallest value whose cumulative
    count reaches ceil(n/2) — an actual element of the data, so the result
    is bit-identical on any engine (interpolated quantiles are a proven
    cross-engine hash-drift source: implementations disagree on the
    interpolation convention).  Computed over the (key, value) distinct
    histogram (map-side combined), so the ordered cumulative window sorts
    distinct values — a big win for discrete-valued columns.  For
    continuous doubles distinct ≈ rows, so the per-key window degrades to
    a per-key sort — the same per-group gather ``F.percentile`` does
    internally; an exact median fundamentally costs a per-group selection.
    At 100 TB route continuous columns to ``percentile_approx`` (the
    sketch twin, `approx_value_quantiles`) unless exactness is required."""
    from pyspark.sql import Window

    hist = df.groupBy(key, valcol).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(key)
    cum = hist.withColumn("_cum", F.sum("_c").over(w.orderBy(valcol))).withColumn(
        "_tot", F.sum("_c").over(w)
    )
    return (
        cum.where(F.col("_cum") >= F.expr("(_tot + 1) div 2"))
        .groupBy(key)
        .agg(F.min(valcol).alias(out))
    )


def mad_outliers(ev: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust per-type outlier stats via median absolute deviation.

    Unlike the z-score path (:func:`standardize`), MAD is immune to the
    outliers it hunts.  Medians are LOWER DISCRETE (:func:`_discrete_median`)
    — actual data elements, engine-exact with no rounding at the surface —
    then median of |v − med|; a value is an outlier when
    |v − med| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    normality).  The fact is never shuffled — both stats tables are tiny
    per-type aggregates broadcast back, and the final reduction is a
    per-type count.  Degenerate types (MAD = 0) flag every v ≠ median.
    """
    vals = ev.filter(F.col("value").isNotNull()).select(
        "type", F.col("value").cast("double").alias("v")
    )
    med = _discrete_median(vals, "type", "v", "med")
    dev = vals.join(F.broadcast(med), "type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    mad = _discrete_median(dev, "type", "adev", "mad").join(med, "type")
    flagged = vals.join(F.broadcast(mad), "type").withColumn(
        "is_out",
        F.abs(F.col("v") - F.col("med")) > F.lit(k) * F.lit(1.4826) * F.col("mad"),
    )
    return (
        flagged.groupBy("type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            # raw doubles: discrete medians are data elements, identical
            # bits on any engine — rounding would REINTRODUCE drift
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad_value"),
            F.sum(F.col("is_out").cast("long")).alias("n_outliers"),
        )
        # integer bp — the exact-rational count ratio must not round as a
        # double at the hash boundary
        .select(
            "type",
            "n_values",
            "median_value",
            "mad_value",
            "n_outliers",
            F.expr("(n_outliers * 10000) div n_values").alias("outlier_frac_bp"),
        )
    )


def rfm_scores(ev: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM behavioral features: per entity, recency (last event), frequency
    (event count), monetary (decimal-exact value sum), each quantile-scored
    into ``n_tiles`` buckets, plus the concatenated RFM segment label —
    the classic CDP-to-ML feature block.

    One fact shuffle (the per-entity aggregate); the three ntile windows
    run over entity-cardinality rows.  Every ntile carries an entity_id
    tie-break so equal metrics score identically on any engine or
    partitioning.
    """
    from pyspark.sql import Window

    agg = ev.groupBy("entity_id").agg(
        F.max("ts_ms").alias("last_ms"),
        F.count(F.lit(1)).alias("n_events"),
        # decimal-exact sum cast straight to double — unrounded, since both
        # engines cast the identical decimal identically; a round() here is
        # the cross-engine half-case drift class that failed round 1
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
    ).withColumn("total_value", F.coalesce(F.col("total_value"), F.lit(0.0)))
    t = lambda col: F.ntile(n_tiles).over(  # noqa: E731
        Window.orderBy(F.asc(col), F.asc("entity_id"))
    ).cast("int")
    scored = agg.select(
        "entity_id",
        "last_ms",
        "n_events",
        "total_value",
        t("last_ms").alias("r_score"),
        t("n_events").alias("f_score"),
        t("total_value").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def value_drift_psi(ev: DataFrame, n_bins: int = 10) -> DataFrame:
    """Population stability index per event type: how far the value
    distribution drifted between the first and second half of the time
    range — the standard feature-drift monitor a training pipeline runs
    between corpus snapshots.

    Periods split at the integer midpoint of the global [min_ts, max_ts];
    both halves share fixed equal-width bins from per-type global
    min/max (broadcast stats — the fact shuffles once, for the final
    (type, period, bin) count).  Laplace-smoothed shares avoid ln(0);
    each bin's PSI term is rounded then summed through DECIMAL so the
    ≤ n_bins additions are order-insensitive and engine-exact.
    """
    # integer midpoint: `div` truncates identically on both engines; the
    # double-divide-then-cast it replaces truncated in Spark but rounded in
    # DuckDB, flipping the period of boundary events when min+max is odd
    bounds = ev.agg(F.min("ts_ms").alias("_mn"), F.max("ts_ms").alias("_mx")).select(
        F.expr("(_mn + _mx) div 2").alias("mid_ms")
    )
    vals = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "type",
            F.col("value").cast("double").alias("v"),
            F.when(F.col("ts_ms") < F.col("mid_ms"), F.lit("a")).otherwise(F.lit("b")).alias("period"),
        )
    )
    stats = vals.groupBy("type").agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(n_bins))
    binned = vals.join(F.broadcast(stats), "type").withColumn(
        "bin",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(F.least(F.floor((F.col("v") - F.col("vmin")) / width), F.lit(n_bins - 1)))
        .cast("int"),
    )
    counts = binned.groupBy("type", "period", "bin").agg(F.count(F.lit(1)).alias("n"))
    wide = (
        counts.groupBy("type", "bin")
        .pivot("period", ["a", "b"])
        .agg(F.first("n"))
        .na.fill(0, ["a", "b"])
    )
    totals = vals.groupBy("type").agg(
        F.sum((F.col("period") == "a").cast("long")).alias("n_a"),
        F.sum((F.col("period") == "b").cast("long")).alias("n_b"),
    )
    j = wide.join(F.broadcast(totals), "type")
    p = (F.col("a") + F.lit(0.5)) / (F.col("n_a") + F.lit(0.5) * n_bins)
    q = (F.col("b") + F.lit(0.5)) / (F.col("n_b") + F.lit(0.5) * n_bins)
    term = F.round((p - q) * F.log(p / q), 10).cast("decimal(27,12)")
    return j.groupBy("type").agg(
        F.min("n_a").alias("n_a"),
        F.min("n_b").alias("n_b"),
        F.round(F.sum(term).cast("double"), 4).alias("psi"),
    )
