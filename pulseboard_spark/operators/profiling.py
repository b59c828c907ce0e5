"""Table profiling: the null/distinct census a pipeline runs before
trusting a new dataset.

The naive form is one scan per column (how the SQL oracle spells it —
N UNION ALL branches).  The engine form is ONE pass: every column's
count/countDistinct rides the same aggregate, partial-aggregated map-side,
then the wide single row unpivots to (column, stats) rows with ``stack``.
At 100 TB that is the difference between N full scans and one.

Distinct counts here are exact (count-distinct per column in one agg is
fine at dimension scale); for fact-scale profiling swap in
``approx_count_distinct`` — same plan shape, sketch merge instead of
distinct state (cf. `registry.approx_user_counts_q`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, approx: bool = False, rsd: float = 0.05) -> DataFrame:
    """One row per column: total rows, non-null count, distinct count —
    computed in a single pass over the table.  ``approx=True`` swaps the
    exact per-column distinct state for HLL++ sketches
    (``approx_count_distinct``, relative error ``rsd``) — the fact-scale
    setting: identical plan shape, constant-size merge state per column
    instead of distinct sets."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        nd = (
            F.approx_count_distinct(F.col(c), rsd)
            if approx
            else F.countDistinct(F.col(c))
        )
        aggs.append(nd.alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n_rows as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column_name, n_nonnull, n_distinct)",
    ).select("column_name", "n_rows", "n_nonnull", "n_distinct")
