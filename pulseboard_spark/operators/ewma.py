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

    # Narrow projection through the Python seam: only (key, order, value)
    # crosses Arrow; the full row set never leaves the JVM and is joined
    # back on event_id (broadcast-size right side relative to the fact
    # table is wrong here — both sides are the same cardinality — but the
    # join is co-partitioned on the same key as downstream consumers).
    narrow = df.select(*cols, "ts_us", "event_id", F.col(value_col).alias("__v"))
    dt = dict(narrow.dtypes)
    schema_str = ", ".join(f"{c} {dt[c]}" for c in narrow.columns) + f", {out} double"

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        mask = pdf["__v"].notna()
        e = pd.Series(float("nan"), index=pdf.index)
        if mask.any():
            e.loc[mask] = pdf.loc[mask, "__v"].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        pdf[out] = e
        return pdf

    ewma_rows = (
        narrow.groupBy(*cols)
        .applyInPandas(_ewma, schema=schema_str)
        .select("event_id", out)
    )
    return df.join(ewma_rows, "event_id", "left")
