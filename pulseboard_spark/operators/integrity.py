"""Cross-engine data-integrity audits — the checks a team runs when
MIGRATING between engines or validating a nightly load: per-table row
counts + deterministic key checksums (do both engines see the same
data?), primary-key duplicate counts, and foreign-key orphan counts.

These are the operational complement to the per-query DuckDB oracle:
the oracle proves query semantics match; these prove the *inputs*
match, which is the first thing to check when they don't.

Shape at scale: every audit is one aggregate per table (map-side
combined, no shuffle beyond the final 1-row merge) or one anti-join per
FK relation (broadcast while the parent's key projection is small; at
fact scale the anti-join shuffles on the key — the minimal-width plan).
The checksum is the stable md5-derived ``hash_int`` (mod 1e9 so a
billion-row sum stays far inside int64) summed over the key column —
order-independent, partition-independent, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulseboard_spark.audit_spec import FK_RELATIONS, PK_COLUMNS
from pulseboard_spark.operators.sampling import hash_int

__all__ = [
    "FK_RELATIONS",
    "PK_COLUMNS",
    "fk_orphans",
    "load_audit_tables",
    "table_checksums",
]


def table_checksums(tables: dict[str, DataFrame]) -> DataFrame:
    """One row per table: row count, distinct-PK count, duplicate-PK row
    count, and the order-independent key checksum.  ``tables`` maps each
    PK_COLUMNS entry's name to its DataFrame."""
    parts = []
    for name, pk in PK_COLUMNS:
        df = tables[name]
        parts.append(
            df.select((hash_int(F.col(pk)) % 1_000_000_000).alias("h"), F.col(pk).alias("k")).agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct("k").cast("long").alias("n_distinct_keys"),
                (F.count(F.lit(1)) - F.countDistinct("k")).cast("long").alias("n_dup_key_rows"),
                F.sum("h").cast("long").alias("key_checksum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fk_orphans(tables: dict[str, DataFrame]) -> DataFrame:
    """One row per FK relation: child row count and orphan count (child
    rows whose FK value has no matching parent PK).  NULL FKs are not
    orphans (SQL FK semantics)."""
    parts = []
    for child, fk, parent, pk in FK_RELATIONS:
        c = tables[child].select(F.col(fk).alias("fk"))
        p = tables[parent].select(F.col(pk).alias("fk")).distinct()
        orphans = c.filter(F.col("fk").isNotNull()).join(p, "fk", "left_anti")
        parts.append(
            orphans.agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relation"),
                F.count(F.lit(1)).cast("long").alias("n_orphans"),
            ).crossJoin(
                c.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows"))
            ).select("relation", "n_child_rows", "n_orphans")
        )
    out = parts[0]
    for p2 in parts[1:]:
        out = out.unionByName(p2)
    return out


def load_audit_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from pulseboard_spark.sources.tables import load_table

    names = {n for n, _ in PK_COLUMNS} | {c for c, _, _, _ in FK_RELATIONS} | {
        p for _, _, p, _ in FK_RELATIONS
    }
    return {n: load_table(spark, sf_dir, n) for n in sorted(names)}
