"""Custom stateful streaming dedup (applyInPandasWithState)."""

from __future__ import annotations

from ingestion3_spark.streaming.stateful import dedup_stream

SCHEMA = "seq long, doc_id string, n_tok int"


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1); state carries over
    spark.createDataFrame(
        [(1, "A", 1), (3, "A", 2), (10, "B", 3)], SCHEMA
    ).coalesce(1).write.parquet(str(feed / "f1.parquet"))
    spark.createDataFrame(
        [(2, "A", 9), (3, "A", 9), (5, "A", 4), (10, "B", 9), (11, "B", 5)], SCHEMA
    ).coalesce(1).write.parquet(str(feed / "f2.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed) + "/*")
    )
    out_dir = str(tmp_path / "out")
    q = (
        dedup_stream(stream, output_schema=SCHEMA)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = sorted(
        (r.doc_id, r.seq, r.n_tok) for r in spark.read.parquet(out_dir).collect()
    )
    # stale seq 2, duplicate seq 3 (A) and duplicate seq 10 (B) suppressed;
    # the n_tok values prove the FIRST delivery of each seq won
    assert rows == [
        ("A", 1, 1), ("A", 3, 2), ("A", 5, 4), ("B", 10, 3), ("B", 11, 5)
    ]
