"""Embedding similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline (oracle-checked), plus an
LSH-bucketed variant as the 100 TB scale path.

All vector math is JVM-side via higher-order functions (zip_with +
aggregate fold in double precision) — no Python in the hot path.  The
brute-force form is a block-nested cross join: at n vectors it is n²·d
multiply-adds, fine for re-ranking candidate sets; the scale path first
buckets by random-hyperplane signs (SimHash-style LSH) so only same-bucket
pairs are scored, then optionally re-ranks with the exact kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return embeddings.withColumn("v", v).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def cosine_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self-pairs excluded).

    Deterministic selection: rank on (cosine rounded to 6, neighbor id) —
    the rounding makes the ordering engine-portable, the id breaks ties.
    Output: vec_id, neighbor_id, cosine, rank.
    """
    e = with_norm(embeddings).select("vec_id", "v", "norm")
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def label_knn_accuracy(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Diagnostic: per-label majority agreement of the top-k neighbors —
    a cheap quality signal for the ANN variants against the exact kernel."""
    topk = cosine_topk(embeddings, k)
    lbl = embeddings.select("vec_id", "label")
    j = (
        topk.join(lbl.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("label", "n_label"), "neighbor_id")
        .join(lbl, "vec_id")
    )
    return (
        j.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.avg((F.col("label") == F.col("n_label")).cast("double")), 6).alias("same_label_rate"),
        )
    )


def simhash_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets.

    Deterministic "random" hyperplanes: plane j's component for dimension i
    is derived from md5(j:i) — reproducible across engines and runs without
    a driver-side RNG.  Vectors sharing a bucket signature are candidate
    neighbors; expected bucket size n/2^planes keeps the per-bucket join
    quadratic cost bounded."""
    e = with_norm(embeddings)
    sig = None
    for j in range(n_planes):
        # hash-derived ±1 pattern per dimension, folded against the vector
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.transform(F.col("v"), lambda _x, i: F.when(
                    (F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), i.cast("string"))), 1, 6), 16, 10).cast("long") % 2) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))
        sig = bit if sig is None else F.concat(sig, bit)
    return e.withColumn("bucket", sig).select("vec_id", "v", "norm", "bucket")


def ann_topk(embeddings: DataFrame, k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH buckets only.

    Recall < 1 by construction (documented approximation); the exact twin
    is cosine_topk.  Join is bucket-partitioned — no cross join."""
    e = simhash_buckets(embeddings, n_planes)
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
