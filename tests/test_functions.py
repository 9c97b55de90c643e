"""Unit tests for text / dedup / similarity kernels (SURVEY.md §5 layer 1,
mirroring the reference's enrichment unit-test layer,
``enrichments/StringNormalizationUtilsTest.scala``)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ingestion3_spark.functions import dedupe, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat on the mat in the sun"),
        (2, "the cat and the dog sat on the mat in the sun"),  # exact dup
        (3, "the cat and the dog sat on the mat in the rain"),  # near dup
        (4, "der Hund und die Katze sind nicht ein Fisch mit und und"),
        (5, "completely unrelated words quantum flux capacitor engaged"),
        (6, "THE CAT and the DOG  sat on the mat in the sun "),  # dup after norm
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_word_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world 42 foo-bar!")], "id int, text string")
    row = df.select(
        text.word_count("text").alias("w"),
        text.token_count("text").alias("t"),
    ).collect()[0]
    assert row["w"] == 4
    assert row["t"] == 8  # Hello , world 42 foo - bar !


def test_stopword_ratio_and_lang(docs):
    got = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", text.predict_lang("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[4] == "de"
    assert got[5] == "und"  # no stopword signal


def test_quality_score_bounds(docs):
    rows = docs.select(text.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprint_normalization(docs):
    fps = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", text.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[6]  # case/whitespace-insensitive
    assert fps[1] != fps[3]


def test_exact_dup_groups(docs):
    groups = dedupe.exact_dup_groups(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3
    kept = dedupe.drop_exact_dups(docs, "text", "doc_id")
    assert kept.count() == 4
    assert kept.filter("doc_id = 1").count() == 1  # min-id winner


def test_ngram_jaccard(docs):
    pairs = dedupe.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert not any(5 in p for p in got)


def test_minhash_lsh_finds_near_dups(docs):
    cands = dedupe.minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in got
    assert not any(5 in p for p in got)
    sig = docs.select(F.col("doc_id").alias("id"),
                      dedupe.minhash_signature(F.col("text")).alias("sig"))
    sims = dedupe.minhash_similarity(cands, sig)
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in sims.collect()}
    assert est[(1, 2)] == 1.0


def test_simhash_near_pairs(docs):
    pairs = dedupe.simhash_near_pairs(docs, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert not any(5 in p for p in got)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_brute_force_topk(vecs):
    q = vecs.filter("vec_id = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = similarity.brute_force_topk(vecs, q, k=2).collect()
    order = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order == [1, 4]
    top = [r for r in got if r["rank"] == 1][0]
    assert math.isclose(top["cos"], 0.9 / math.sqrt(0.82), rel_tol=1e-6)


def test_lsh_topk_recall_on_self(vecs):
    planes = similarity.hyperplanes(3, 2, seed=1)
    q = vecs.filter("vec_id = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = similarity.lsh_topk(vecs, q, planes, k=3).collect()
    # candidates share the bucket; nearest surviving neighbor ranked first
    if got:  # bucket may isolate the query; both outcomes are valid LSH
        assert got[0]["vec_id"] in (1, 4)


def test_ivf_cells_partition_space(spark, vecs):
    cents = similarity.kmeans_centroids(vecs, "embedding", n_cells=2, iters=3)
    assert len(cents) == 2
    cells = vecs.select("vec_id", similarity.ivf_cell("embedding", cents).alias("cell"))
    vals = {r["cell"] for r in cells.collect()}
    assert vals <= {0, 1} and len(vals) == 2


def test_dedupe_record_fields(spark):
    """A10 per-field multi-valued dedup (Deduplication.scala:16-75):
    first-occurrence order, info message appended only on change, and the
    token payload untouched when not named."""
    from ingestion3_spark.cdc import validate as val
    from ingestion3_spark.functions.normalize import dedupe_record_fields

    df = spark.sql(
        "select 'd1' doc_id, array('b','a','b','c','a') subject, "
        "array('x','y') format, array(7,7,8) tokens, "
        "cast(array() as " + val.MESSAGE_SCHEMA + ") messages"
    )
    out = dedupe_record_fields(df, ["subject", "format"]).collect()[0]
    assert out["subject"] == ["b", "a", "c"]  # first-occurrence order
    assert out["format"] == ["x", "y"]        # unchanged
    assert out["tokens"] == [7, 7, 8]         # sequences never deduped
    msgs = out["messages"]
    assert len(msgs) == 1
    assert msgs[0]["level"] == "info" and msgs[0]["field"] == "subject"
    assert (msgs[0]["value"], msgs[0]["enrichedValue"]) == ("5", "3")

    # without a messages column: values dedup, no message bookkeeping
    out2 = dedupe_record_fields(df.drop("messages"), ["subject"]).collect()[0]
    assert out2["subject"] == ["b", "a", "c"]
