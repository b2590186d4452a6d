"""Q18: hashed n-gram importance weighting for data selection (DSIR-style).

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") scores raw documents by how target-domain-like their hashed
n-gram profile is: bag-of-ngrams models are fit on the TARGET subset and
on the RAW corpus, and each doc's importance is the product of per-feature
probability ratios.  This module computes the exact-integer rank proxy of
that score — per-feature Laplace-smoothed target-vs-raw LIFT in ppm, and
per-doc the feature-count-weighted mean lift — following the repo rule
that transcendentals never enter gated projections (the X20 PMI precedent:
log-free integer lift preserves the ranking the log-sum would induce
per-feature; the per-doc arithmetic mean of lifts is the documented
variant of DSIR's geometric mean, chosen so the whole statistic stays
bit-reproducible in ANSI SQL).

Reference parity: no counterpart in fortxun/project-obsidian-core — part
of the §2.11 training-data extension surface.

Scale design (100 TB / 1000 executors)
--------------------------------------
- Features (unigrams + bigrams) are per-row array expressions; the only
  explode is one row per token-feature — hashed to a BUCKET id (int64 %
  B) map-side, so shuffles carry small ints, never n-gram text.
- The bucket model is B rows (default 4096) regardless of corpus size:
  it broadcasts to the per-doc join, so scoring 100 TB is one explode +
  two partial-agg shuffles + a broadcast hash join.
- Overflow bound: per-feature lift multiplies (n_tgt+1) by the corpus
  ratio q = (R+B)·10⁶ div (T+B).  With a 1% target slice q ≈ 10⁸, so
  n_tgt must stay below ~9·10¹⁰ per bucket before int64 overflows —
  re-quantize (raise B, or score per-shard and sum) beyond that, same
  re-quantization rule as the CUSUM operator documents.

Determinism: md5-derived 60-bit hash (shared with the DuckDB oracle),
integer div everywhere, Laplace +1 smoothing so empty buckets are defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe.text import shared_hash60

#: hashed-feature buckets (DSIR uses 10k; 4096 keeps the gate corpus from
#: spreading its ~50k features too thin while staying a broadcastable model).
DSIR_BUCKETS = 4096


def _features(text_col: str) -> Column:
    """Unigrams + bigrams over whitespace-normalised tokens, one array.
    The size>=2 guard keeps sequence() from descending on 1-token docs."""
    # tokenization bound ONCE per row (single-element transform wrapper):
    # Spark does not hoist lambda-invariant subexpressions, so the naive
    # form re-ran regexp_replace + split TWICE per bigram position —
    # O(L²) per row with a regex pass each time (r16 optimization round)
    toks = f"split(trim(regexp_replace({text_col}, '\\\\s+', ' ')), ' ')"
    return F.expr(
        f"element_at(transform(array({toks}), tk ->"
        f" concat(tk, "
        f"  case when size(tk) >= 2 then"
        f"    transform(sequence(1, size(tk) - 1),"
        f"      i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
        f"  else array() end)), 1)"
    )


def dsir_importance(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    staged: bool = True,
) -> DataFrame:
    """Per-document DSIR-style importance score.

    ``is_target`` marks the target-domain rows (e.g. ``F.col('lang') ==
    'en'``) — the model contrasts that subset's hashed-feature
    distribution against the whole corpus.  Output per doc:
    (id_col, n_features, importance_ppm) where importance_ppm is the
    feature-count-weighted mean of per-bucket Laplace-smoothed lifts

        lift(b) = (n_tgt(b)+1) · [(R+B)·10⁶ div (T+B)] div (n_raw(b)+1)

    1 000 000 ≈ "looks like the corpus average"; higher = more
    target-like.  Selection is then a threshold or weighted sample over
    this column.
    """
    feats = df.select(
        F.col(id_col),
        is_target.cast("int").alias("is_tgt"),
        F.explode(_features(text_col)).alias("feat"),
    ).select(
        id_col,
        "is_tgt",
        (shared_hash60(F.col("feat")) % buckets).alias("b"),
    )
    # doc_feat feeds the bucket model AND the scoring join: persist it so
    # the token-feature explode runs ONCE (unstaged, Spark recomputes the
    # explode subtree per consumer — 3 Generates in the executed plan).
    # Released via release_after below; at 100 TB this is a staged table.
    # ``staged=False`` keeps the whole plan lazy (plan-shape tests pin
    # the join topology, which the checkpoint scan would hide).
    doc_feat = feats.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).alias("n_f"), F.max("is_tgt").alias("is_tgt")
    )
    if staged:
        doc_feat = doc_feat.persist()
    # the bucket model CASCADES off doc_feat (already (doc,b)-reduced):
    # one explode pass feeds both aggregates instead of two scans of the
    # token-feature fan-out — the partial-agg cascade a 100 TB corpus needs
    bucket = doc_feat.groupBy("b").agg(
        F.sum("n_f").alias("n_raw"),
        F.sum(F.col("n_f") * F.col("is_tgt")).alias("n_tgt"),
    )
    totals = bucket.agg(
        F.sum("n_raw").alias("R"), F.sum("n_tgt").alias("T")
    )
    scored = (
        bucket.crossJoin(F.broadcast(totals))
        .withColumn("q", F.expr(f"(R + {buckets}) * 1000000L DIV (T + {buckets})"))
        .select(
            "b",
            F.expr("(n_tgt + 1) * q DIV (n_raw + 1)").alias("lift_ppm"),
        )
    )
    from project_obsidian_core_spark.functions.cache import release_after

    result = (
        doc_feat.join(F.broadcast(scored), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n_f").alias("n_features"),
            F.expr("sum(n_f * lift_ppm) DIV sum(n_f)").alias("importance_ppm"),
        )
    )
    return release_after(result, doc_feat) if staged else result
