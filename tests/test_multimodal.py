"""Multimodal plumbing: binary media columns through mapInPandas with error
routing. Decoders are deterministic fakes (no media libs in the container);
the distributed contract (schemas, batch shapes, per-row error capture) is
fully exercised."""

from __future__ import annotations

import pytest

from ingestion3_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_media_fixture(spark, n=40, seed=7)


def test_extract_features_shapes(media):
    out = mm.extract_features(media)
    rows = out.collect()
    assert len(rows) == 40
    ok = [r for r in rows if r["ok"]]
    bad = [r for r in rows if not r["ok"]]
    assert all(len(r["feature"]) == 8 for r in ok)
    # seeded-bad empty payloads routed as errors, not crashes
    assert len(bad) == len([i for i in range(40) if i % 17 == 0])
    assert all("empty media payload" in r["error"] for r in bad)
    assert all(r["feature"] is None for r in bad)


def test_features_deterministic(media):
    a = {r["doc_id"]: r["feature"] for r in mm.extract_features(media).collect() if r["ok"]}
    b = {r["doc_id"]: r["feature"] for r in mm.extract_features(media).collect() if r["ok"]}
    assert a == b


def test_sample_frames_counts(media):
    vids = media.filter("mime = 'video/mp4' and length(media) > 0")
    durations = {r["doc_id"]: r["duration_ms"] for r in vids.collect()}
    frames = mm.sample_frames(vids, every_ms=1000)
    got = frames.groupBy("doc_id").count().collect()
    for r in got:
        assert r["count"] == max(1, durations[r["doc_id"]] // 1000)


def test_unknown_mime_is_routed(spark):
    df = spark.createDataFrame(
        [("x", bytearray(b"abc"), "application/pdf", 1, 1, 1)], mm.MEDIA_SCHEMA
    )
    row = mm.extract_features(df).collect()[0]
    assert not row["ok"] and "NotImplementedError" in row["error"]
