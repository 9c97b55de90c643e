"""Gate-config vs production-config sketch parity (VERDICT r2 #3).

The correctness gate runs the sketches with ``portable=True`` (md5-based
hash family, DuckDB-checkable); production defaults to xxhash64. Nothing
else ties the two code paths together, so a regression in the unverified
fast path would be invisible to the gate. These tests pin the two configs
to the same candidate-pair SEMANTICS on a deterministic planted corpus at
the gate thresholds (minhash 32 hashes / 8 bands, simhash hamming<=8).
"""

from __future__ import annotations

import pytest

from ingestion3_spark.functions import dedupe

# 10 planted near-dup pairs (one-word substitution in a 240-word document —
# large margins: ~2-4 simhash bits vs the hamming<=8 gate, true 3-shingle
# jaccard ~0.97) + 10
# unrelated documents (random word streams: jaccard ~0, hamming ~32).
# Seeded, so every assertion that passes once passes forever. Docs are
# LONG deliberately: short docs (few shingles) put bit-majority sketches
# in the noisy regime where the two hash families legitimately disagree on
# borderline pairs, which is not the contract under test.
import random as _random

_VOCAB = [f"w{k:03d}" for k in range(200)]
_N_PAIRS = 10


def _doc(seed: int, n_words: int = 240) -> str:
    rng = _random.Random(seed)
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(_N_PAIRS):
        base = _doc(1000 + i)
        rows.append((i, base))
        words = base.split()
        words[120] = "altered"  # one interior word -> near-dup
        rows.append((100 + i, " ".join(words)))
    for i in range(10):
        rows.append((200 + i, _doc(5000 + i)))
    return spark.createDataFrame(rows, "doc_id int, text string")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


PLANTED = {(i, 100 + i) for i in range(_N_PAIRS)}


def test_simhash_configs_agree(spark, corpus):
    """Simhash near-pair sets at the gate threshold must be identical
    between the portable and xxhash64 hash families on the planted corpus
    (both are bit-majority sketches over the same shingle multiset; the
    planted pairs are far inside the threshold, unrelated docs far
    outside)."""
    gate = _pairs(dedupe.simhash_near_pairs(corpus, max_hamming=8, portable=True))
    prod = _pairs(dedupe.simhash_near_pairs(corpus, max_hamming=8, portable=False))
    assert PLANTED <= gate
    assert PLANTED <= prod
    assert gate == prod


def test_minhash_configs_agree(spark, corpus):
    """MinHash+LSH candidates (32 hashes / 8 bands, the gate shape): both
    configs must (a) recall every planted near-dup, (b) admit no pair of
    unrelated docs, (c) agree on the candidate set to >=80% (banding is
    probabilistic per hash family, so exact equality is not the contract —
    candidate SEMANTICS at the thresholds is)."""
    gate = _pairs(
        dedupe.minhash_lsh_candidates(corpus, num_hashes=32, bands=8, portable=True)
    )
    prod = _pairs(
        dedupe.minhash_lsh_candidates(corpus, num_hashes=32, bands=8, portable=False)
    )
    assert PLANTED <= gate
    assert PLANTED <= prod
    unrelated_ids = set(range(200, 200 + 10))
    for s in (gate, prod):
        assert not {
            p for p in s if p[0] in unrelated_ids and p[1] in unrelated_ids
        }
    agreement = len(gate & prod) / max(len(gate | prod), 1)
    assert agreement >= 0.8, (gate ^ prod)
