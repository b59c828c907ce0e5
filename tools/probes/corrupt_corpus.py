#!/usr/bin/env python
"""Corrupt-corpus scale probe: quarantine under amplified corruption.

Round 10 made every media feature operator corpus-grade fail-safe —
payloads that raise inside the codec exception contract
(``jpeg.MEDIA_DECODE_ERRORS``) are quarantined as ``decoded=false``
rows instead of killing the stage.  The operator-level pytest pins the
semantics on one bad row; this probe measures the posture AT SCALE,
which is the claim that actually matters on a 100 TB corpus:

  1. Amplify the sf0.1 media corpora AMP-fold (doc_id + r*10^9 per
     replica — every synth generator derives payload bytes from doc_id,
     so replicas are distinct payloads, not exact twins).
  2. Inject deterministic corruption at ~2% (doc_id % 101 == 3 →
     payload truncated to 20 bytes, mid-structure; doc_id % 101 == 5 →
     first two magic bytes zeroed, wrong-container), JVM-side, exactly
     like the driver query `jpeg_features_quarantine`.
  3. Run all four feature operators (JPEG luma, image RGB, audio PCM,
     video frame sampler) over the CLEAN and the CORRUPT corpus and
     assert:
       - the corrupt pass COMPLETES (pre-r10 it threw — survival is the
         point),
       - quarantined == the closed-form expected count (both corruption
         classes are doc_id arithmetic; the expectation needs no
         decoder),
       - every non-corrupted payload still decodes (clean rows ==
         corrupt-pass decoded rows + quarantined for the 1-row-per-
         payload operators),
       - wall(corrupt) <= wall(clean) * 1.15 — the per-row try/except
         plus early-exit on bad payloads must cost nothing (corrupt
         passes decode FEWER full payloads, so they should be at worst
         equal).

Pass criterion: all asserts hold on every operator.  Results → SCALE.md.

Run: python tools/probes/corrupt_corpus.py [AMP]   (default 16)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import DataFrame, functions as F

from pulseboard_spark.operators import jpeg, multimodal
from pulseboard_spark.session import get_spark
from pulseboard_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def amplified_docs(spark, amp: int) -> DataFrame:
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    out = docs
    for r in range(1, amp):
        out = out.unionAll(docs.select((F.col("doc_id") + r * 10**9).alias("doc_id")))
    # one narrow column, amp*5k rows: repartition so the decode stage gets
    # even slices (the union tree otherwise inherits 1 file-partition per leaf)
    return out.repartition(32)


def corrupt(media: DataFrame) -> DataFrame:
    """The driver query's corruption scheme, verbatim semantics."""
    return media.withColumn(
        "payload",
        F.when(F.col("doc_id") % 101 == 3, F.expr("substring(payload, 1, 20)"))
        .when(
            F.col("doc_id") % 101 == 5,
            F.concat(F.lit(bytearray(b"\x00\x00")),
                     F.expr("substring(payload, 3, 1073741824)")),
        )
        .otherwise(F.col("payload")),
    )


def run_pass(feat: DataFrame) -> tuple[float, int, int]:
    """Full decode pass: (wall_s, rows, quarantined)."""
    t0 = time.monotonic()
    row = feat.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(~F.col("decoded"), 1).otherwise(0)).alias("quarantined"),
    ).collect()[0]
    return time.monotonic() - t0, int(row["rows"]), int(row["quarantined"] or 0)


def main() -> int:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("pb-corrupt-corpus")
    docs = amplified_docs(spark, amp)
    docs.cache().count()

    operators = {
        "jpeg_luma": (jpeg.synth_jpeg, jpeg.decoded_jpeg_features),
        "image_rgb": (multimodal.synth_images, multimodal.decoded_features),
        "audio_pcm": (multimodal.synth_audio, multimodal.decoded_audio_features),
        "video_frames": (multimodal.synth_video, multimodal.sampled_frame_features),
    }
    # closed-form: both corruption classes are pure doc_id arithmetic
    expected_bad = docs.filter((F.col("doc_id") % 101).isin(3, 5)).count()
    n_docs = docs.count()

    results, failures = {}, []
    for name, (synth, feature) in operators.items():
        w_clean, r_clean, q_clean = run_pass(feature(synth(docs)))
        w_corr, r_corr, q_corr = run_pass(feature(corrupt(synth(docs))))
        ok = True
        if q_clean != 0:
            failures.append(f"{name}: clean pass quarantined {q_clean}"); ok = False
        if q_corr != expected_bad:
            failures.append(f"{name}: quarantined {q_corr} != expected {expected_bad}"); ok = False
        if name != "video_frames" and r_corr != r_clean:
            # 1 row per payload operators: corrupt rows = clean rows (bad
            # payloads still emit their quarantine row)
            failures.append(f"{name}: corrupt rows {r_corr} != clean rows {r_clean}"); ok = False
        if name == "video_frames" and r_corr >= r_clean:
            # sampler: a corrupt clip collapses its n_sampled rows into ONE
            failures.append(f"{name}: corrupt rows {r_corr} !< clean rows {r_clean}"); ok = False
        if w_corr > w_clean * 1.15:
            failures.append(f"{name}: corrupt wall {w_corr:.2f}s > 1.15x clean {w_clean:.2f}s"); ok = False
        results[name] = {
            "clean_s": round(w_clean, 2), "corrupt_s": round(w_corr, 2),
            "rows_clean": r_clean, "rows_corrupt": r_corr,
            "quarantined": q_corr, "ok": ok,
        }
        print(f"# {name}: clean {w_clean:.2f}s/{r_clean} rows, "
              f"corrupt {w_corr:.2f}s/{r_corr} rows, quarantined {q_corr}", flush=True)

    print(json.dumps({
        "probe": "corrupt_corpus", "amp": amp, "n_payloads": n_docs,
        "expected_bad": expected_bad, "results": results,
        "failures": failures,
    }))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
