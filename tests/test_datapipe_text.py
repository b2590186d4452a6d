"""Text-analysis operator semantics on hand-built fixtures."""

from __future__ import annotations

import pytest

from project_obsidian_core_spark.datapipe import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE QUICK  BROWN fox, jumps over the lazy dog!!"),  # noisy dup of 1
        (3, "table query join table query join table query join"),
        (4, "x"),  # shorter than fingerprint k
        (5, "scan hash merge batch stream window row column scan"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_token_stats(docs):
    r = by_id(T.with_token_stats(docs))
    assert r[1]["n_ws_tokens"] == 9
    assert r[1]["n_distinct_tokens"] == 8  # 'the' twice
    assert r[4]["n_ws_tokens"] == 1
    # doc 2: double space -> empty ws token (10 total); BPE splits ',' and
    # '!!' into single-symbol tokens: 9 words + ',' + '!' + '!' = 12
    assert r[2]["n_ws_tokens"] == 10
    assert r[2]["n_bpe_tokens"] == 12


def test_quality_monotone_in_diversity(docs):
    r = by_id(T.with_quality_score(docs))
    # doc 3 repeats 3 words -> low uniq ratio -> lower quality than doc 1
    assert r[3]["uniq_ratio"] < r[1]["uniq_ratio"]
    assert r[3]["quality_score"] < r[1]["quality_score"]
    for d in r.values():
        assert 0.0 <= d["quality_score"] <= 1.0


def test_lang_id_argmax_and_ties(docs):
    r = by_id(T.with_lang_id(docs))
    assert r[3]["lang_pred"] == "sql"
    assert r[5]["lang_pred"] == "exec"
    assert r[1]["lang_pred"] == "common"
    # all-zero scores fall back to first declared profile
    assert r[4]["lang_pred"] == "common"


def test_fingerprint_robust_to_case_punct_whitespace(docs):
    r = by_id(T.with_fingerprint(docs))
    # doc 2 is doc 1 up to case, doubled spaces and punctuation
    assert r[1]["fingerprint"] == r[2]["fingerprint"]
    assert r[1]["fingerprint"] != r[3]["fingerprint"]
    # short doc takes the whole-string hash branch and still yields a value
    assert r[4]["fingerprint"] is not None


def test_approx_quantiles_track_exact(spark, sf_dir):
    """The percentile_approx scale twin of qan_latency_quantiles: the
    t-digest sketch must stay within 5% relative error of the exact
    interpolated percentiles (same pinning pattern as the HLL twin)."""
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.plans.common import cents, load

    ev = load(spark, sf_dir, "events").select(cents("value").alias("c"))
    row = ev.agg(
        F.expr("percentile(c, array(0.5, 0.95, 0.99))").alias("exact"),
        F.expr("percentile_approx(c, array(0.5, 0.95, 0.99), 1000)").alias("approx"),
    ).collect()[0]
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) / e < 0.05, (e, a)


def test_token_anomaly_flag_fires_on_bomb_not_on_prose(spark, tmp_path):
    """X31 threshold (r15 ADVICE #4): the maxlen flag is per-source
    greatest(40, 2*p99) — ordinary prose (the old static 8 flagged it
    near-totally) stays clean, a base64/URL-regime token fires."""
    from project_obsidian_core_spark.plans.datapipe_queries import (
        text_token_anomalies,
    )

    prose = "the quick brown fox jumped over the lazy dog again"
    bomb = "see " + "A" * 60 + " for details"
    rows = [(i, prose, "clean") for i in range(101)]
    rows += [(1000 + i, prose, "bomby") for i in range(100)]
    rows.append((2000, bomb, "bomby"))
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["source"]: r.asDict()
        for r in text_token_anomalies(spark, str(tmp_path)).collect()
    }
    # prose p99 is 6 ("jumped"): threshold max(40, 12) = 40 -> no flags
    assert out["clean"]["n_flag_maxlen"] == 0
    assert out["clean"]["p99_max_token_len"] == 6
    # the bomb is rank 101 of 101 -> p99 stays the prose 6, and the
    # 60-char token clears the 40 floor
    assert out["bomby"]["n_flag_maxlen"] == 1
    assert out["bomby"]["p99_max_token_len"] == 6
    assert out["bomby"]["n_docs"] == 101


def test_extract_main_content_golden(spark):
    """X34 golden: hand-built markup, hand-computed expectations."""
    from project_obsidian_core_spark.datapipe.text import (
        extract_main_content,
    )

    body = "This sentence is the real article body of the page."  # 52
    linky = "Read <a href=x>first related article</a> and <a>more</a> now"
    html = "\n".join(
        [
            "<nav>Home | About</nav>",          # 12 chars stripped -> short
            f"<p>{body}</p>",                    # kept
            f"<aside>{linky}</aside>",           # link density >= 50%
            "<footer>(c) corp</footer>",         # 8 chars stripped -> short
        ]
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    row = extract_main_content(df).collect()[0]
    assert row["content"] == body
    assert row["n_lines"] == 4
    assert row["n_boiler"] == 3
    assert row["content_chars"] == len(body)
    assert row["raw_chars"] == len(html)
    # the aside's numbers: content 'Read first related article and more now'
    # = 39 chars, anchor text 'first related article'+'more' = 25 chars,
    # density 641025 ppm >= 500000 -> dropped by the link rule, not length
    stripped_aside = "Read first related article and more now"
    assert len(stripped_aside) == 39
    # inline anchor does NOT kill a long content line
    html2 = f"<p>{body} see <a>ref</a></p>"
    row2 = extract_main_content(
        spark.createDataFrame([(2, html2)], ["doc_id", "html"])
    ).collect()[0]
    assert row2["n_boiler"] == 0
    assert row2["content"] == f"{body} see ref"
