"""Soak the M11/M12 band-bucket bound at 10x with injected
near-duplicates (round 13, r12 verdict Next #6 — the r2 LSH-soak
pattern applied to the media dedup family).

The question the soak answers: when the image corpus is 10x the gate
scale AND dominated by near-duplicate captures (each base image spawns
9 variants with a single perturbed byte — the re-encode/re-crop class
aHash exists to catch), does the 8-bit prefix band keep every bucket
small enough that the within-bucket Hamming verify stays a bounded-block
quadratic?  Reports the full band8 population histogram (max / p99 /
mean bucket, Sum b^2/2 candidate volume) and times the banded
bit_count(xor) verify end-to-end.  Asserts max bucket <= 1000 (the
r12 verdict's threshold) and that the verify actually flags the
planted variants as near (recall of the banding at Hamming <= 8).

Usage: python scripts/soak_hamming.py [sf_dir] [dup_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe import multimodal as M
    from project_obsidian_core_spark.plans.datapipe_queries import (
        _AHASH_NIBBLES,
        _HAMMING_NEAR,
    )
    from project_obsidian_core_spark.session import build_session

    from project_obsidian_core_spark.plans.common import load

    spark = build_session(app_name="soak-hamming", shuffle_partitions=16)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = M.attach_media(docs).filter(F.col("media_type") == "image")

    # dup-factor variants: v=0 is the original; v>0 perturbs ONE payload
    # byte at a v-dependent offset with a (doc, v)-dependent value — the
    # near-identical-capture class a perceptual hash must bucket together
    n_payload = M.PAYLOAD_BLOCKS * 16
    media = (
        base.select(
            "doc_id",
            "media_type",
            "content",
            F.explode(F.sequence(F.lit(0), F.lit(dup - 1))).alias("v"),
        )
        .withColumn(
            "content",
            F.when(F.col("v") == 0, F.col("content")).otherwise(
                F.expr(
                    f"overlay(content PLACING"
                    f" unhex(lpad(hex((doc_id * 31 + v) % 256), 2, '0'))"
                    f" FROM ((v * 7) % {n_payload}) + 1 FOR 1)"
                )
            ),
        )
        .select(
            (F.col("doc_id") * dup + F.col("v")).alias("doc_id"),
            "media_type",
            "content",
        )
    )

    h = M.image_ahash(media).withColumn(
        "band8", F.substring("ahash_hex", 1, 2)
    )
    h.persist()
    n_images = h.count()

    hist = sorted(
        r["n"] for r in h.groupBy("band8").agg(F.count("*").alias("n")).collect()
    )
    mx, p99 = hist[-1], hist[int(len(hist) * 0.99) - 1]
    mean = sum(hist) / len(hist)
    cand = sum(b * (b - 1) // 2 for b in hist)

    # the banded verify end-to-end, timed
    ham = F.expr(
        f"aggregate(sequence(1, {_AHASH_NIBBLES}), 0L, (acc, k) -> acc"
        f" + bit_count(cast(conv(substring(a.ahash_hex, k, 1), 16, 10)"
        f"                  as long)"
        f"             ^ cast(conv(substring(b.ahash_hex, k, 1), 16, 10)"
        f"                    as long)))"
    )
    t0 = time.time()
    pairs = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.band8") == F.col("b.band8"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
    )
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("hamming") <= _HAMMING_NEAR).cast("long")).alias("n_near"),
        # banding recall proxy: planted same-base pairs that the band kept
        F.sum(
            (
                (F.col("doc_a") / dup).cast("long")
                == (F.col("doc_b") / dup).cast("long")
            ).cast("long")
        ).alias("n_same_base_kept"),
    ).collect()[0]
    wall = time.time() - t0

    # planted same-base pair volume: dup*(dup-1)/2 per base image
    n_planted = (n_images // dup) * dup * (dup - 1) // 2
    out = {
        "metric": "hamming_band_soak",
        "sf_dir": sf_dir,
        "dup_factor": dup,
        "n_images": n_images,
        "n_buckets": len(hist),
        "bucket_max": mx,
        "bucket_p99": p99,
        "bucket_mean": round(mean, 1),
        "candidate_pairs": cand,
        "verified_pairs": agg["n_pairs"],
        "near_pairs": agg["n_near"],
        "same_base_pairs_kept": agg["n_same_base_kept"],
        "same_base_pairs_planted": n_planted,
        "band_recall_pct": round(
            100.0 * agg["n_same_base_kept"] / max(n_planted, 1), 1
        ),
        "verify_wall_s": round(wall, 1),
    }
    assert agg["n_pairs"] == cand, "join pair count != Sum b(b-1)/2"
    assert mx <= 1000, f"band bucket blew the bound: {mx}"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
