"""Watermarked windowed aggregation (streaming/windows.py) and the
embedding-cosine near-dup operator (functions/dedupe.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ingestion3_spark.streaming.windows import session_event_counts, windowed_event_counts

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ev(minute, typ="click", uid=1):
    return (T0 + dt.timedelta(minutes=minute), typ, uid)


EV_SCHEMA = "ts timestamp, event_type string, user_id int"


def test_windowed_counts_batch(spark):
    df = spark.createDataFrame(
        [_ev(0), _ev(1), _ev(5, "view"), _ev(11), _ev(12, "view"), _ev(19)],
        EV_SCHEMA,
    )
    out = {
        (r.window_start.minute, r.event_type): r.n
        for r in windowed_event_counts(df, window="10 minutes").collect()
    }
    assert out == {(0, "click"): 2, (0, "view"): 1, (10, "click"): 2, (10, "view"): 1}


def test_session_counts_batch(spark):
    df = spark.createDataFrame(
        [_ev(0, uid=1), _ev(10, uid=1), _ev(70, uid=1), _ev(0, uid=2)], EV_SCHEMA
    )
    rows = session_event_counts(df, gap="30 minutes").collect()
    per_user = sorted((r.user_id, r.n_events) for r in rows)
    assert per_user == [(1, 1), (1, 2), (2, 1)]


@pytest.mark.slow
def test_watermark_drops_late_event(spark, tmp_path):
    """Append-mode windows emit once; an event behind the checkpointed
    watermark is dropped (never re-emits its window)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(EV_SCHEMA).parquet(str(feed))
        q = (
            windowed_event_counts(stream, window="10 minutes", watermark="5 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return [
            ((r.window_start.minute, r.event_type), r.n)
            for r in spark.read.parquet(out_dir).collect()
        ]

    # run 1: events to 12:20 -> watermark 12:15 -> [12:00,12:10) finalized
    spark.createDataFrame([_ev(1), _ev(2), _ev(20)], EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    out1 = run()
    assert out1 == [((0, "click"), 2)]

    # run 2: one late event (12:03, behind the 12:15 watermark -> dropped)
    # plus 12:45 to advance the watermark (-> 12:40) past [12:20,12:30) end
    spark.createDataFrame([_ev(3), _ev(45)], EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    out2 = sorted(run())
    # the late event neither re-emits [12:00,12:10) nor changes its count
    assert out2 == [((0, "click"), 2), ((20, "click"), 1)]


def test_embed_near_pairs_matches_brute_force(spark):
    from ingestion3_spark.functions.dedupe import embed_near_pairs

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r.id_a, r.id_b): round(r.cos, 6)
        for r in embed_near_pairs(e, threshold=0.3, sign_dims=8).collect()
    }
    # brute-force oracle restricted to same-sign-bucket candidates
    import itertools

    rows = e.collect()
    buckets = {}
    for r in rows:
        sb = "".join("1" if v >= 0 else "0" for v in r.embedding[:8])
        buckets.setdefault(sb, []).append(r)
    want = {}
    for grp in buckets.values():
        for a, b in itertools.combinations(sorted(grp, key=lambda r: r.vec_id), 2):
            dp = sum(float(x) * float(y) for x, y in zip(a.embedding, b.embedding))
            na = sum(float(x) ** 2 for x in a.embedding) ** 0.5
            nb = sum(float(x) ** 2 for x in b.embedding) ** 0.5
            cos = dp / (na * nb)
            if cos >= 0.3:
                want[(a.vec_id, b.vec_id)] = round(cos, 6)
    assert got == want
    assert len(got) > 0
