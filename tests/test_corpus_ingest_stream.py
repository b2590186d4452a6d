"""Streaming corpus ingestion: readStream -> curate -> partitioned sink.

The ingest path a continuously-crawled corpus needs: documents arrive as
files, each micro-batch is quality-filtered + split-assigned and appended
to the split=/lang= partitioned layout. The replay must land exactly the
rows the batch pipeline produces — streaming/batch equivalence again, at
the sink.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import pipeline as P
from project_obsidian_core_spark.datapipe.text import with_quality_score


def _curate(df):
    q = with_quality_score(df).select("doc_id", "quality_score")
    kept = df.join(q, "doc_id").filter(F.col("quality_score") >= 0.3)
    return P.assign_splits(kept).select("doc_id", "text", "lang", "split")


def test_stream_ingest_matches_batch(spark):
    rows = [
        (i, f"word{i % 9} thing{i % 4} item{i % 6} data{i % 3} end of doc {i}", "en" if i % 2 else "fr")
        for i in range(80)
    ]
    tmp = tempfile.mkdtemp(prefix="corpus_ingest_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    # two file groups so the availableNow replay sees multiple input splits
    df.filter("doc_id < 40").write.mode("append").parquet(src)
    df.filter("doc_id >= 40").write.mode("append").parquet(src)

    batch = sorted(map(tuple, _curate(spark.read.parquet(src)).collect()))

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    def sink(batch_df, epoch_id):
        P.write_corpus(
            _curate(batch_df), out, partition_cols=("split", "lang"), mode="append"
        )

    q = (
        stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.parquet(out).select("doc_id", "text", "lang", "split")
    assert sorted(map(tuple, back.collect())) == batch
    # layout: both splits and langs appear as directories
    import glob

    assert glob.glob(f"{out}/split=train/lang=en/*.parquet")
