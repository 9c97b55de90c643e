"""Deterministic seeded CDC event-feed generator (FIXTURES.md §1-2).

Generates the ``corpus`` base table and the ``events`` change feed with the
adversarial cases the replay engine must survive: duplicate deliveries,
multiple events per doc per batch, invalid deletes, out-of-order rows,
update-after-delete, wrong ``n_tok``, null-token errors, and a Zipf-skewed
hot-key variant. Pure numpy; same seed => byte-identical tables.

This is the new engine's analog of the reference's harvest fixtures
(``src/test/resources/*.xml`` one-doc golden files) scaled to a feed: the
event envelope mirrors ``avro/OriginalRecord.avsc:1-16`` (id/ingestDate/
provider/document -> doc_id/seq/source/tokens) and the op set mirrors the
merge classification {insert, update, delete} (``utils/NaraMergeUtil.scala:
246-264``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SOURCES = ["cc", "books", "code", "wiki", "synth"]
VOCAB = 50257
MAX_LEN_DEFAULT = 512  # keep unit fixtures small; bench overrides


def _tokens_arrays(rng: np.random.Generator, n: int, max_len: int):
    """(lens:int64[n], flat:int32[sum lens]) fully vectorized."""
    lens = rng.integers(1, max_len + 1, size=n).astype(np.int64)
    flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
    return lens, flat


# int32 ListArray offset ceiling; module-level so tests can shrink it to
# exercise the multi-chunk path without building 2^31 tokens
_LIST_OFFSET_CAP = (1 << 31) - 1


def _tokens_list_array(
    lens: np.ndarray, flat: np.ndarray, mask: np.ndarray | None = None
) -> pa.ChunkedArray:
    """``list<int32>`` column from per-row lengths, CHUNKED so each chunk's
    flat token count stays below the int32 ListArray offset ceiling
    (2^31 - 1). One monolithic ListArray overflows its int32 offsets at
    ~33M rows x 64 avg tokens — observed as "Negative offsets in list
    array" generating a 50M-event feed — so 10^8-order fixtures require
    the chunked construction."""
    cap = _LIST_OFFSET_CAP
    csum = np.cumsum(lens)
    n = len(lens)
    chunks: list[pa.Array] = []
    row0, flat0 = 0, 0
    while row0 < n:
        row1 = max(int(np.searchsorted(csum, flat0 + cap, side="right")), row0 + 1)
        local = lens[row0:row1]
        # the row0+1 forced-progress step means ONE row longer than the cap
        # would otherwise wrap silently under the int32 cast below — fail
        # loudly instead (unreachable with production max_len bounds, but
        # tests shrink the cap via monkeypatch)
        if int(local.sum()) > cap:
            raise ValueError(
                f"single row of {int(local.sum())} tokens exceeds the list "
                f"offset cap {cap}; cannot chunk"
            )
        offsets = np.concatenate([[0], np.cumsum(local)]).astype(np.int32)
        flat1 = flat0 + int(local.sum())
        chunks.append(
            pa.ListArray.from_arrays(
                pa.array(offsets),
                pa.array(flat[flat0:flat1]),
                mask=pa.array(mask[row0:row1]) if mask is not None else None,
            )
        )
        row0, flat0 = row1, flat1
    return pa.chunked_array(chunks)


def _doc_id_array(idx: np.ndarray) -> pa.Array:
    """Vectorized 'doc-%08d' formatting via numpy char ops."""
    # zfill(8) == f"doc-{i:08d}" (longer ids pass through unpadded)
    return pa.array(np.char.add("doc-", np.char.zfill(idx.astype(np.uint64).astype("U20"), 8)))


def _take_rows(tbl: pa.Table, indices: np.ndarray) -> pa.Table:
    """Row-gather that survives >2^31 flat tokens.

    Arrow's ``Table.take`` concatenates each column's chunks for random
    access, so on a 10^8-order feed the tokens column overflows its int32
    list offsets ("offset overflow while concatenating arrays") even when
    the column itself is safely chunked. Below the ceiling this IS
    ``tbl.take`` (bit-identical output); above it, gather the tokens
    through ``large_list`` (int64 offsets), then re-chunk the result back
    under the int32 ceiling. (The doc_id string column has the same kind
    of ceiling at 2^31 BYTES ≈ 170M rows — beyond today's fixture sizes.)
    """
    idx = pa.array(indices)
    tok = tbl.column("tokens")
    if sum(len(c.values) for c in tok.chunks) < _LIST_OFFSET_CAP:
        return tbl.take(idx)
    others = tbl.drop_columns(["tokens"]).take(idx)
    big = pa.chunked_array(
        [c.cast(pa.large_list(pa.int32())) for c in tok.chunks]
    ).take(idx).combine_chunks()
    # rebuild list<int32> chunks from RELATIVE offsets: casting (even a
    # slice) validates the child buffer's absolute extent against int32,
    # so any view over a >2^31-value child is rejected wholesale
    off = big.offsets.to_numpy().astype(np.int64)
    vals = big.values
    nulls = pc.is_null(big).to_numpy(zero_copy_only=False)
    csum = off[1:]  # cumulative physical extent per row
    chunks: list[pa.Array] = []
    row0 = 0
    n = len(big)
    while row0 < n:
        row1 = max(
            int(np.searchsorted(csum, off[row0] + _LIST_OFFSET_CAP, side="right")),
            row0 + 1,
        )
        if int(off[row1] - off[row0]) > _LIST_OFFSET_CAP:
            # same forced-progress hazard as _tokens_list_array: one row
            # wider than the cap must error, not wrap in the int32 cast
            raise ValueError(
                f"single row extent {int(off[row1] - off[row0])} exceeds the "
                f"list offset cap {_LIST_OFFSET_CAP}; cannot chunk"
            )
        rel = (off[row0 : row1 + 1] - off[row0]).astype(np.int32)
        chunks.append(
            pa.ListArray.from_arrays(
                pa.array(rel),
                vals.slice(int(off[row0]), int(off[row1] - off[row0])),
                mask=pa.array(nulls[row0:row1]),
            )
        )
        row0 = row1
    out = others.add_column(
        tbl.schema.get_field_index("tokens"),
        tbl.schema.field("tokens"),
        pa.chunked_array(chunks),
    )
    return out


def make_corpus(n_docs: int, seed: int = 42, max_len: int = MAX_LEN_DEFAULT) -> pa.Table:
    """Base table ``(doc_id, tokens, n_tok, source)``; doc-{i:08d} keys."""
    rng = np.random.default_rng(seed)
    lens, flat = _tokens_arrays(rng, n_docs, max_len)
    src = rng.choice(len(SOURCES), size=n_docs)
    return pa.table(
        {
            "doc_id": _doc_id_array(np.arange(n_docs, dtype=np.int64)),
            "tokens": _tokens_list_array(lens, flat),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(np.array(SOURCES)[src]),
        }
    )


def make_events(
    n_events: int,
    n_base_docs: int,
    seed: int = 42,
    n_parts: int = 8,
    max_len: int = MAX_LEN_DEFAULT,
    start_seq: int = 1,
    op_weights: tuple[float, float, float] = (0.3, 0.6, 0.1),
    dup_rate: float = 0.01,
    bad_ntok_rate: float = 0.02,
    null_tokens_rate: float = 0.005,
    invalid_delete_rate: float = 0.005,
    skew: bool = False,
    zipf_s: float = 1.2,
    shuffle: bool = True,
) -> pa.Table:
    """CDC feed ``(seq, part, op, doc_id, tokens, n_tok, source, ts)``.

    ``seq`` is strictly increasing per part and ``(part, seq)`` is unique;
    the global truth order is ``(seq, part)``. ``bad_ntok_rate`` rows carry a
    wrong n_tok (engine must recompute: warn); ``null_tokens_rate``
    insert/update rows carry null tokens (engine must route to the error
    table); ``invalid_delete_rate`` deletes target never-seen doc_ids.
    ``dup_rate`` rows are exact re-deliveries appended at the end.
    """
    rng = np.random.default_rng(seed + 1)
    ops = rng.choice(3, size=n_events, p=list(op_weights))  # 0=ins 1=upd 2=del

    # target doc ids (vectorized): inserts allocate fresh ids above the base
    # range (id = n_base + #inserts-before); updates/deletes draw uniformly
    # (or Zipf-skewed) from the currently-live id range [0, n_base + #inserts).
    is_ins = ops == 0
    ins_before = np.cumsum(is_ins) - is_ins  # inserts strictly before i
    hi = np.maximum(n_base_docs + ins_before, 1)
    u = rng.random(n_events)
    if skew:
        zipf_draw = rng.zipf(zipf_s, size=n_events).astype(np.int64)
        target = np.minimum(zipf_draw - 1, hi - 1)
    else:
        target = (u * hi).astype(np.int64)
    doc_idx = np.where(is_ins, n_base_docs + ins_before, target).astype(np.int64)
    # invalid deletes: retarget some deletes at ids that never exist
    inv_del = (ops == 2) & (rng.random(n_events) < invalid_delete_rate)
    doc_idx[inv_del] = 10_000_000_000 + rng.integers(0, 1 << 30, size=int(inv_del.sum()))

    parts = rng.integers(0, n_parts, size=n_events).astype(np.int32)
    # seq = global position: strictly increasing within every part, (part,
    # seq) globally unique.
    seqs = np.arange(start_seq, start_seq + n_events, dtype=np.int64)

    lens, flat = _tokens_arrays(rng, n_events, max_len)
    nulls = rng.random(n_events) < null_tokens_rate
    bad_ntok = rng.random(n_events) < bad_ntok_rate
    src = rng.choice(len(SOURCES), size=n_events)

    payload_null = (ops == 2) | nulls  # tokens/n_tok null on delete or seeded-bad
    ntok = lens.astype(np.int64) + np.where(bad_ntok, rng.integers(1, 7, size=n_events), 0)
    op_names = np.array(["insert", "update", "delete"])

    tokens_arr = _tokens_list_array(lens, flat, mask=payload_null)
    base_ts = np.int64(1_700_000_000) * 1_000_000
    tbl = pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "part": pa.array(parts, pa.int32()),
            "op": pa.array(op_names[ops]),
            "doc_id": _doc_id_array(doc_idx),
            "tokens": tokens_arr,
            "n_tok": pa.array(np.where(payload_null, 0, ntok).astype(np.int32),
                              mask=payload_null),
            "source": pa.array(np.array(SOURCES)[src], mask=(ops == 2)),
            "ts": pa.array(base_ts + seqs * 1_000_000, pa.timestamp("us")),
        }
    )

    # exact duplicate re-deliveries (same (part, seq) rows appended)
    n_dup = int(n_events * dup_rate)
    if n_dup:
        idx = rng.integers(0, n_events, size=n_dup)
        tbl = pa.concat_tables([tbl, _take_rows(tbl, idx)])

    if shuffle:
        order = rng.permutation(tbl.num_rows)
        tbl = _take_rows(tbl, order)
    return tbl


def to_spark(spark, tbl: pa.Table):
    """Arrow table -> Spark DataFrame (forces the Arrow conversion path;
    the plain inference path cannot handle ndarray cells)."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark.createDataFrame(tbl.to_pandas())


def write_fixture(path: str, tbl: pa.Table, row_group_size: int = 65536) -> str:
    """Write a fixture parquet with SMALL row groups.

    Spark parallelizes a parquet scan at row-group granularity; pyarrow's
    default (1M rows/group) caps a 2M-row feed at 2-way read parallelism.
    64k-row groups let a 32-core local run actually fan out.
    """
    import pyarrow.parquet as pq

    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path
