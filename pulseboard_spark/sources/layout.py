"""Physical data layout: bucketed tables and partitioned writes.

The reference keeps everything in heap maps, so "layout" doesn't exist for
it (`ingest/WindowStore.kt`, `cdp/store/ProfileStore.kt` — SURVEY §2.1).
At 100 TB, layout is the single biggest lever this engine has:

  * **Bucketing** pre-shuffles a table ONCE at write time.  Every later
    join or aggregation on the bucket key reads co-located buckets and
    skips its Exchange entirely — for a fact⋈fact join that is the
    dominant cost of the query.  Bucket counts should match between
    co-joined tables (Spark joins bucketed tables exchange-free when the
    bucket counts are equal, or one is a multiple of the other with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
  * **Partitioned writes** (directory partitioning on a low-cardinality
    time/category column) turn time-range predicates into partition
    pruning: files outside the range are never opened — the plan shows
    them under ``PartitionFilters``.
  * **Sorted-within-partition writes** tighten parquet row-group min/max
    stats so even intra-file predicate pushdown skips pages.

Bucket-count sizing: target 128–512 MB of post-compression data per
bucket at the expected table size (so a 10 TB fact at 256 MB/bucket →
~40 k buckets); too few buckets caps join parallelism, too many makes
small files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) external table.

    Sorting by the bucket key lets sort-merge joins skip their Sort too
    when each bucket holds a single file — pre-repartitioning on the
    bucket key achieves that (one writer task per bucket).
    """
    cols = list(bucket_cols)
    writer = df.repartition(num_buckets, *cols).write.bucketBy(num_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.option("path", path).mode("overwrite").format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Directory-partitioned parquet write; optionally sorted within
    partitions so row-group min/max stats stay tight for pushdown."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.partitionBy(*list(partition_cols)).mode("overwrite").parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a previously written bucketed table (bucketing metadata comes
    from the catalog, so reads must go through the table name, not the
    path — a raw ``spark.read.parquet(path)`` loses bucket info)."""
    return spark.table(table)
