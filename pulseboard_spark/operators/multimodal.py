"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
stages so the Spark-side shape (schema, partitioning, batch signature) is
real and tested even where the codec itself is stubbed (media libraries are
not available in this container — the decode seam raises or fakes
deterministically, clearly marked).

At 100 TB the pattern is: payloads stay columnar in parquet, metadata-only
queries never touch bytes (column pruning), and decode stages scale by
repartitioning on a content key before the mapInPandas pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta_width int, meta_height int, meta_n_bytes bigint"
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: the text bytes
    stand in for an opaque payload; metadata derives from content."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        payload.alias("payload"),
        (F.col("n_chars") % 1024 + 16).cast("int").alias("meta_width"),
        (F.col("n_chars") % 768 + 16).cast("int").alias("meta_height"),
        F.length(payload).cast("bigint").alias("meta_n_bytes"),
    )


FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, checksum bigint, decoded boolean"


def extract_features(media: DataFrame, *, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_decode=True`` is the seam where PIL/librosa/ffmpeg would run —
    STUBBED: raises NotImplementedError (the container ships no media
    codecs).  The default path computes deterministic byte-level features,
    exercising the exact mapInPandas batch shape a real decoder uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in this environment"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # cheap rolling checksum — a deterministic stand-in for
                    # decoded-content features
                    "checksum": payloads.map(lambda b: sum(b) % 1_000_000_007).astype("int64"),
                    "decoded": False,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, out_width int, out_height int, "
    "out_n_bytes bigint, payload binary"
)


def resize_media(media: DataFrame, max_dim: int = 224, *, real_decode: bool = False) -> DataFrame:
    """Resize stage: aspect-preserving downscale to ``max_dim`` on the long
    side.  The geometry (out_width/out_height) is exact integer arithmetic;
    the pixel path is the STUBBED decode seam (``real_decode=True`` raises —
    no codecs in this container).  The fake payload is a deterministic
    truncation to out_w·out_h bytes, preserving the real operator's batch
    shape: binary in, binary out, one Arrow batch at a time, memory bounded
    by batch size × payload size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "media resize requires image codecs not present in this environment"
                )
            w = pdf["meta_width"].astype("int64")
            h = pdf["meta_height"].astype("int64")
            long_side = w.combine(h, max)
            # scale = max_dim / long_side, capped at 1 (never upscale);
            # floor arithmetic in int space: out = max(1, dim * max_dim // long)
            scale_needed = long_side > max_dim
            out_w = w.where(~scale_needed, (w * max_dim // long_side).clip(lower=1)).astype("int32")
            out_h = h.where(~scale_needed, (h * max_dim // long_side).clip(lower=1)).astype("int32")
            n_out = (out_w.astype("int64") * out_h.astype("int64"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "out_n_bytes": n_out.combine(pdf["payload"].map(len), min).astype("int64"),
                    "payload": [
                        bytes(p[: int(n)]) for p, n in zip(pdf["payload"], n_out)
                    ],
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame/chunk sampling *plan*: one row per sampled offset, computed
    without touching payload bytes (pure metadata arithmetic) — the shape
    of a video frame-sampler where the decode stage fills in pixels."""
    n = (F.col("meta_n_bytes") / every_n_bytes).cast("int")
    return media.select(
        "doc_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("chunk_index"),
    ).withColumn("byte_offset", (F.col("chunk_index") * every_n_bytes).cast("bigint"))


def media_text_pairs(documents: DataFrame, caption_chars: int = 100) -> DataFrame:
    """Multimodal training-pair manifest: one row per (media payload,
    caption) pair with the quality gate and split assignment a
    vision/audio-text training job consumes.

    Chains the multimodal metadata (:func:`synth_media`), the Gopher
    quality gate (`text.gopher_quality`) and the deterministic split
    (`sampling.train_val_test_split`) — captions are the leading
    ``caption_chars`` characters of the paired text.  Everything is
    metadata + narrow joins on doc_id; payload bytes never shuffle for
    the manifest (column pruning drops them at the scan).
    """
    from pulseboard_spark.operators.sampling import train_val_test_split
    from pulseboard_spark.operators.text import gopher_quality

    media = synth_media(documents).select("doc_id", "media_type", "meta_n_bytes")
    quality = gopher_quality(documents).select("doc_id", "passes")
    split = train_val_test_split(documents.select("doc_id"), "doc_id").select(
        "doc_id", "split"
    )
    captions = documents.select(
        "doc_id", F.substring(F.col("text"), 1, caption_chars).alias("caption")
    )
    return (
        media.join(captions, "doc_id")
        .join(quality, "doc_id")
        .join(split, "doc_id")
        .select("doc_id", "media_type", "meta_n_bytes", "caption", "passes", "split")
    )
