"""EWMA — the one order-dependent per-key scan in the rule layer (A6).

Reference: `core/WindowStore.kt:106-132` — per (entityId, type):
    state absent  → state = value            (so ewma_1 = α·v1 + (1-α)·v1 = v1)
    update        → ewma = α·v + (1-α)·ewma_prev
R2 reads the *updated* EWMA for its threshold (`core/Rules.kt:65-74`).

A per-key linear recurrence can't be expressed as a built-in window
aggregate, so this is the designated Pandas-UDF escape hatch: grouped
``applyInPandas`` with pandas' ``ewm(alpha, adjust=False)``, whose
recurrence y_t = (1-α)·y_{t-1} + α·x_t with y_0 = x_0 is exactly the
reference's.  Arrow-batched, one shuffle on the key, vectorized C inside
each group — no row-at-a-time Python.

Order: the reference applies events in arrival order; the deterministic
batch twin sorts by (ts_us, event_id).  The streaming twin
(streaming/stateful.py) keeps the same recurrence in keyed state.

Scale posture: shuffle on (entity_id, type) only; each group is processed
sequentially (inherent to the recurrence) but groups parallelize across
executors.  For monster keys, the algebraic form ewma_n = Σ α(1-α)^{n-i}v_i
admits a segmented-scan formulation; not needed at this state size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_ewma(
    df: DataFrame,
    partition_cols: list[str] = ("entity_id", "type"),
    value_col: str = "value",
    alpha: float = 0.1,
    out: str = "ewma",
) -> DataFrame:
    """Append per-event EWMA (post-update value) over non-null values.

    Rows with null ``value`` pass through with null ewma — the reference
    skips them entirely (`core/Rules.kt:66`).
    """
    cols = list(partition_cols)
    schema_str = df.schema.simpleString()[7:-1] + f",{out}:double"

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        mask = pdf[value_col].notna()
        e = pd.Series(float("nan"), index=pdf.index)
        if mask.any():
            e.loc[mask] = (
                pdf.loc[mask, value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
            )
        pdf[out] = e
        return pdf

    nonnull = df.filter(F.col(value_col).isNotNull())
    nulls = df.filter(F.col(value_col).isNull()).withColumn(out, F.lit(None).cast("double"))
    result = nonnull.groupBy(*cols).applyInPandas(_ewma, schema=schema_str)
    return result.unionByName(nulls)
