"""PQ/ADC ANN quality + containment-dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import dedup as D
from project_obsidian_core_spark.datapipe import similarity as S
from project_obsidian_core_spark.plans.common import load


def test_pq_codes_shape_and_range(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    books = S.pq_codebooks(emb)
    codes = S.pq_encode(emb, books)
    row = codes.agg(
        F.min(F.size("codes")).alias("lo"),
        F.max(F.size("codes")).alias("hi"),
        F.max(F.array_max("codes")).alias("cmax"),
        F.min(F.array_min("codes")).alias("cmin"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert row.lo == row.hi == S.PQ_M
    assert 0 <= row.cmin and row.cmax < S.PQ_KSUB
    assert row.n == emb.count()


def test_pq_adc_recall_vs_brute(spark, sf_dir):
    """ADC top-10 must substantially overlap the exact euclidean top-10.

    PQ approximates squared euclidean distance, so recall is measured
    against the euclidean (not cosine) ground truth. With 4x16 codebooks
    of 8 codewords this is a coarse quantizer; >=12% mean recall@10 on
    the synthetic corpus is the sanity floor (random would be ~2%;
    measured ~22% at sf0.001).
    """
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = S.pq_adc_topk(emb, queries, k=10).collect()

    from project_obsidian_core_spark.datapipe import clustering as KM

    q = KM.quantize(emb)
    qq = KM.quantize(queries).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv")
    )
    exact = (
        q.join(F.broadcast(qq), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            KM._qdist(F.col("qv"), F.col("q_qv")).alias("d"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "q_id"
                ).orderBy(F.asc("d"), F.asc("cand_id"))
            ),
        )
        .filter(F.col("rank") <= 10)
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r.q_id, set()).add(r.cand_id)
    got = {}
    for r in approx:
        got.setdefault(r.q_id, set()).add(r.cand_id)
    recalls = [len(truth[q] & got[q]) / 10 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.12, recalls


def test_containment_detects_substring_inclusion(spark):
    df = spark.createDataFrame(
        [
            (1, "blk", "the quick brown fox jumps over the lazy dog"),
            (2, "blk", "PREFIX the quick brown fox jumps over the lazy dog "
                       "SUFFIX plus a lot of extra unrelated trailing text here"),
            (3, "blk", "zzzz completely different content wwww"),
        ],
        "doc_id int, source string, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): (r.cont_a_ppm, r.cont_b_ppm)
        for r in D.ngram_containment_pairs(df).collect()
    }
    a_in_b, b_in_a = pairs[(1, 2)]
    # doc 1 is fully contained in doc 2: near-total containment from side a
    assert a_in_b >= 950_000
    # ... while doc 2 is NOT contained in doc 1 (asymmetry)
    assert b_in_a < 600_000
    # unrelated pair scores near zero in both directions
    assert max(pairs[(1, 3)]) < 100_000


def test_containment_max_block_guard(spark):
    df = spark.createDataFrame(
        [(i, "hot", f"text number {i} with shared shingles") for i in range(6)]
        + [(10, "cold", "another doc"), (11, "cold", "another doc too")],
        "doc_id int, source string, text string",
    )
    out = D.ngram_containment_pairs(df, max_block=4)
    blocks = {r.block for r in out.select("block").distinct().collect()}
    assert blocks == {"cold"}  # the oversized hot block was dropped, guarded


def test_minhash_containment_detects_inclusion(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lam mu"),
            (3, "entirely different words nothing shared here at all ok fine"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): (r.cont_a_ppm, r.cont_b_ppm)
        for r in D.minhash_containment_pairs(df).collect()
    }
    # (1,2) must surface as an LSH candidate and show the asymmetry
    a_in_b, b_in_a = pairs[(1, 2)]
    assert a_in_b == 1_000_000  # every shingle of doc 1 is inside doc 2
    assert b_in_a < 1_000_000
    # the unrelated doc shares no band with either
    assert not any(3 in k for k in pairs)
