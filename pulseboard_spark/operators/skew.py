"""Skew-handling utilities: salted two-phase aggregation.

At 100 TB a handful of hot keys (a bot entity emitting millions of
events/hour, a boilerplate LSH bucket) turn one reducer into the job's
critical path.  AQE's skew-join splitting covers *joins*; skewed
*aggregations* need salting: spread each key over N salt buckets, partial-
aggregate per (key, salt), then merge the partials — valid for any
algebraic aggregate (sum/count/min/max and compositions like avg =
sum/count).  Cost: one extra (tiny) shuffle over the partials; benefit:
the heavy first shuffle is uniform by construction.

This is the documented escape hatch referenced in SCALE.md for the
trailing-window and profile layers; the default plans rely on AQE and
don't pay the extra phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge function for each algebraic aggregate's partials
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation immune to key skew.

    ``aggs`` maps output column → (op, input column) with op in
    sum/count/min/max.  Phase 1 groups by (keys…, salt) — uniform by
    construction — and phase 2 merges the ≤ n_salts partial rows per key.
    Result is identical to ``df.groupBy(keys).agg(...)`` for these
    algebraic ops regardless of data distribution.
    """
    for out, (op, _col) in aggs.items():
        if op not in _MERGE:
            raise ValueError(f"{out}: op must be one of {sorted(_MERGE)}, got {op!r}")

    salt = (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id())) % n_salts).alias(
        "__salt"
    )
    phase1 = (
        df.select(*df.columns, salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                (F.count(F.lit(1)) if op == "count" else getattr(F, op)(F.col(col))).alias(out)
                for out, (op, col) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[op](F.col(out)).alias(out) for out, (op, _col) in aggs.items()]
    )


def with_salted_key(df: DataFrame, key: str, n_salts: int = 32, out: str = "salted_key") -> DataFrame:
    """Join-side salting helper: explode the *small* side over all salts and
    salt the big side's key, turning a skewed equi-join into a uniform one
    (the classic replicate-broadcast-salt pattern; use when AQE's skew
    splitting isn't available, e.g. bucketed SMJ pipelines)."""
    return df.withColumn(
        out,
        F.concat(
            F.col(key),
            F.lit("#"),
            (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("string"),
        ),
    )
