"""Core scalar expression builders shared by rule and profile operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duck_round(col: Column, n: int) -> Column:
    """Round a DOUBLE with DuckDB's semantics: ``x·10ⁿ``, half away from
    zero, ``/10ⁿ`` — all in double arithmetic.

    Spark's ``F.round`` converts the exact binary double to BigDecimal and
    rounds HALF_UP on the true value; DuckDB multiplies first, and that
    multiply can round a value like 72.660941499999993 up onto the .5
    boundary (×1e6 → exactly 72660941.5) which then rounds away from zero.
    For columns produced by long FP recurrences (EWMA) the two disagree in
    this ambiguous zone, so oracle-compared outputs of such columns must
    round THIS way — replicating the oracle's op sequence exactly.
    """
    p = F.lit(float(10**n))
    return F.signum(col) * F.floor(F.abs(col) * p + F.lit(0.5)) / p


def severity(value: Column, threshold: Column) -> Column:
    """R5 severity ladder (`core/Rules.kt:220-231`): ratio = value/threshold;
    >=10 HIGH, >=5 MEDIUM, else LOW; non-positive threshold → HIGH."""
    ratio = value / threshold
    return (
        F.when(threshold <= 0, F.lit("HIGH"))
        .when(ratio >= 10.0, F.lit("HIGH"))
        .when(ratio >= 5.0, F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )


def lww_order_key(ts_us: Column, event_id: Column) -> Column:
    """Total-order key for last-write-wins merges.

    The reference resolves same-timestamp trait writes as 'later processed
    write wins' (`cdp/store/ProfileStore.kt:97` uses >=); in a set-based
    batch engine we pin the deterministic twin: order by (ts, event_id).
    Encoded as a zero-padded string so it is a single comparable key in both
    Spark and the DuckDB oracle.
    """
    return F.concat(
        F.lpad(ts_us.cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(event_id.cast("string"), 12, "0"),
    )
