"""Feed-generator unit tests (pure Python, no Spark).

The int32 ListArray offset ceiling (2^31 - 1 flat tokens) is real at
10^8-order feeds: 50M events x ~64 avg tokens = 3.2B offsets overflowed
the pre-fix monolithic construction ("Negative offsets in list array").
The chunked builder must produce identical VALUES regardless of where
chunk boundaries land.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ingestion3_spark.cdc.generator as g


def test_chunked_tokens_values_match_monolithic(monkeypatch):
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 9, size=200).astype(np.int64)
    flat = rng.integers(0, 1000, size=int(lens.sum()), dtype=np.int32)
    mask = rng.random(200) < 0.1

    whole = g._tokens_list_array(lens, flat, mask)
    assert whole.num_chunks == 1

    # shrink the cap so the same inputs need many chunks mid-row-range
    monkeypatch.setattr(g, "_LIST_OFFSET_CAP", 17)
    chunked = g._tokens_list_array(lens, flat, mask)
    assert chunked.num_chunks > 5
    assert chunked.to_pylist() == whole.to_pylist()
    # every chunk respects the cap (single rows may not exceed it here)
    for c in chunked.chunks:
        assert len(c.values) <= 17


def test_make_events_deterministic_and_chunk_invariant(monkeypatch):
    # shuffle=False: the shuffle's take() consolidates chunks, which would
    # hide whether the multi-chunk path actually ran
    a = g.make_events(3000, n_base_docs=100, seed=21, n_parts=4, max_len=16,
                      shuffle=False)
    monkeypatch.setattr(g, "_LIST_OFFSET_CAP", 1000)
    b = g.make_events(3000, n_base_docs=100, seed=21, n_parts=4, max_len=16,
                      shuffle=False)
    assert b["tokens"].num_chunks > 1
    assert a.combine_chunks().equals(b.combine_chunks())
    # the shuffled table is chunk-invariant too (values only)
    sa = g.make_events(3000, n_base_docs=100, seed=21, n_parts=4, max_len=16)
    sb_cap = g.make_events(3000, n_base_docs=100, seed=21, n_parts=4, max_len=16)
    assert sa.combine_chunks().equals(sb_cap.combine_chunks())


def test_take_rows_large_list_path_bit_identical(monkeypatch):
    """Above the offset ceiling the dup/shuffle gathers route tokens
    through large_list and re-chunk — output must equal the plain-take
    path exactly (masks, dups, and permutation order included)."""
    a = g.make_events(5000, n_base_docs=100, seed=33, n_parts=4, max_len=16)
    monkeypatch.setattr(g, "_LIST_OFFSET_CAP", 2000)
    b = g.make_events(5000, n_base_docs=100, seed=33, n_parts=4, max_len=16)
    assert a.combine_chunks().equals(b.combine_chunks())


def test_make_corpus_chunk_invariant(monkeypatch):
    a = g.make_corpus(500, seed=8, max_len=12)
    monkeypatch.setattr(g, "_LIST_OFFSET_CAP", 300)
    b = g.make_corpus(500, seed=8, max_len=12)
    assert b["tokens"].num_chunks > 1
    assert a.combine_chunks().equals(b.combine_chunks())
    # (part, seq) uniqueness + per-part monotone seq still hold on feeds
    ev = g.make_events(2000, n_base_docs=0, seed=4, n_parts=3, max_len=8)
    ps = sorted(zip(ev["part"].to_pylist(), ev["seq"].to_pylist()))
    assert len(set(ps)) == len(ps) - int(2000 * 0.01)  # dup_rate re-deliveries
