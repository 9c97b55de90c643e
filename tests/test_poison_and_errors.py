"""Regression tests for pathological batches and error-sink layout.

Covers the round-3 hardening (ADVICE r2):
- a poison batch (every event fails validation) must commit its checkpoint
  and route all events to the error table without touching the winner
  observation (AQE empty-relation / CollectMetrics crash);
- errfirst/optimistic modes must survive an empty/fully-redelivered batch;
- a doc whose every event carries an unknown op must NOT be phantom-deleted
  in optimistic mode (NULL packed winner key);
- the v2 (batch_id-partitioned) error sink must coexist with a legacy v1
  error dir (batch_id as data column) instead of corrupting the read.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ingestion3_spark.cdc.generator import make_corpus, make_events
from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state
from ingestion3_spark.cdc.replay import ReplayEngine


def _spark_df(spark, tbl: pa.Table):
    return spark.createDataFrame(tbl.to_pandas())


def _seed_table(spark, path, base: pa.Table, num_buckets=4):
    table = ReplayEngine.create_table(spark, path, num_buckets=num_buckets)
    files = table.write_files(_spark_df(spark, base))
    table.commit("append", add_files=files)
    return table


def _poison_feed(n=50, n_parts=2) -> pa.Table:
    """Every event errors: insert/update with null tokens."""
    return pa.table(
        {
            "seq": pa.array(range(1, n + 1), pa.int64()),
            "part": pa.array([i % n_parts for i in range(n)], pa.int32()),
            "op": pa.array(["insert" if i % 2 else "update" for i in range(n)]),
            "doc_id": pa.array([f"doc{i % 10:08d}" for i in range(n)]),
            "tokens": pa.array([None] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([None] * n, pa.int32()),
            "source": pa.array(["s3"] * n),
        }
    )


@pytest.mark.parametrize("mode", ["concurrent", "errfirst", "optimistic"])
def test_poison_batch_all_errors(spark, tmp_table_path, tmp_path, monkeypatch, mode):
    """Non-empty batch where EVERY event fails validation: the batch must
    commit (checkpoint advances so errors are not reprocessed), all events
    land in the error table, and the base state is untouched."""
    monkeypatch.setenv("I3S_WINNER_MODE", mode)
    base = make_corpus(30, seed=11, max_len=16)
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    stats = eng.apply_batch(_spark_df(spark, _poison_feed(50)), batch_id=0)
    assert stats.events_in == 50
    assert stats.errors == 50
    assert stats.changes == 0
    assert eng.errors_df().count() == 50
    # checkpoint advanced: redelivery of the same poison feed is a no-op
    ckpt = table.checkpoint()
    assert ckpt and max(ckpt.values()) == 50
    stats2 = eng.apply_batch(_spark_df(spark, _poison_feed(50)), batch_id=1)
    assert stats2.events_in == 0 and stats2.errors == 0
    # base untouched
    assert not diff_states(
        replay_oracle(base, _poison_feed(50)),
        table_state([r.asDict() for r in table.read().collect()]),
    )


def test_poison_batch_without_error_sink(spark, tmp_table_path, monkeypatch):
    """Same poison batch, no error_dir configured (concurrent fallback):
    metrics come from a plain count, the commit still lands."""
    monkeypatch.delenv("I3S_WINNER_MODE", raising=False)
    base = make_corpus(10, seed=12, max_len=16)
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=None)
    stats = eng.apply_batch(_spark_df(spark, _poison_feed(20)), batch_id=0)
    assert stats.events_in == 20 and stats.errors == 20 and stats.changes == 0
    assert table.read().count() == 10


@pytest.mark.parametrize("mode", ["errfirst", "optimistic"])
def test_empty_batch_in_alt_modes(spark, tmp_table_path, tmp_path, monkeypatch, mode):
    """Fully-redelivered batch under errfirst/optimistic: the early return
    must fire BEFORE _route_errors touches its observation."""
    monkeypatch.setenv("I3S_WINNER_MODE", mode)
    base = make_corpus(50, seed=13, max_len=16)
    events = make_events(500, n_base_docs=50, seed=13, n_parts=2, max_len=16)
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=1)
    stats = eng.apply_batch(_spark_df(spark, events), batch_id=9)
    assert stats.events_in == 0 and stats.changes == 0
    assert not diff_states(
        replay_oracle(base, events),
        table_state([r.asDict() for r in table.read().collect()]),
    )


def test_unknown_op_doc_not_phantom_deleted(spark, tmp_table_path, tmp_path, monkeypatch):
    """Optimistic mode selects winners over UNvalidated rows; a doc whose
    only event has an unknown op packs to a NULL winner key. It must be
    dropped from winner selection (all its events are error-routed), NOT
    unpacked into a phantom delete of the doc's live base row."""
    monkeypatch.setenv("I3S_WINNER_MODE", "optimistic")
    base = make_corpus(20, seed=14, max_len=16)
    tok = pa.array([[1, 2, 3]] * 3, pa.list_(pa.int32()))
    feed = pa.table(
        {
            "seq": pa.array([1, 2, 3], pa.int64()),
            "part": pa.array([0, 0, 0], pa.int32()),
            # doc-00000000: only a bogus-op event; doc-00000001: normal update
            "op": pa.array(["bogus", "update", "update"]),
            "doc_id": pa.array(["doc-00000000", "doc-00000001", "doc-00000002"]),
            "tokens": tok,
            "n_tok": pa.array([3, 3, 3], pa.int32()),
            "source": pa.array(["s1", "s1", "s1"]),
        }
    )
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    stats = eng.apply_batch(_spark_df(spark, feed), batch_id=0)
    assert stats.errors == 1
    state = table_state([r.asDict() for r in table.read().collect()])
    # the bogus-op doc keeps its base row; the two updates applied
    assert "doc-00000000" in state
    assert state["doc-00000001"] == ((1, 2, 3), 3, "s1")
    assert state["doc-00000002"] == ((1, 2, 3), 3, "s1")


def test_legacy_error_dir_coexists(spark, tmp_table_path, tmp_path):
    """A pre-existing round-1 layout (batch_id as DATA column in errors/)
    must stay readable alongside new v2 partitioned writes."""
    import os

    from ingestion3_spark.cdc import validate as val

    err_root = tmp_path / "err"
    # legacy v1 row: batch_id embedded as a data column, empty messages
    legacy = spark.sql(
        "select cast(0 as long) batch_id, cast(0 as int) part, cast(999 as long) seq, "
        "'docA' doc_id, 'insert' op, cast(array() as " + val.MESSAGE_SCHEMA + ") messages"
    )
    legacy.write.parquet(str(err_root / "errors"))

    base = make_corpus(10, seed=15, max_len=16)
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(err_root))
    stats = eng.apply_batch(_spark_df(spark, _poison_feed(10)), batch_id=3)
    assert stats.errors == 10
    df = eng.errors_df()
    assert df.count() == 11  # 10 new v2 rows + 1 legacy row
    assert os.path.exists(str(err_root / "errors_v2"))


@pytest.mark.parametrize("mode", ["concurrent", "errfirst", "optimistic"])
def test_null_op_routes_to_errors_not_dropped(
    spark, tmp_table_path, tmp_path, monkeypatch, mode
):
    """NULL op must classify as an unknown-op ERROR (round-3 advisory): the
    old three-valued error_predicate() made filter(pred) and filter(~pred)
    BOTH drop the row — it vanished silently while the checkpoint advanced
    past its seq, and clean_count overcounted. Now the predicate is
    NULL-definite: the row lands in the error table, the event/error
    counters reconcile, and the doc's base row is untouched."""
    monkeypatch.setenv("I3S_WINNER_MODE", mode)
    base = make_corpus(20, seed=17, max_len=16)
    tok = pa.array([[5, 6], None, [7, 8]], pa.list_(pa.int32()))
    feed = pa.table(
        {
            "seq": pa.array([1, 2, 3], pa.int64()),
            "part": pa.array([0, 0, 0], pa.int32()),
            # doc 0: NULL op WITH payload; doc 1: NULL op, no payload;
            # doc 2: normal update
            "op": pa.array([None, None, "update"], pa.string()),
            "doc_id": pa.array(["doc-00000000", "doc-00000001", "doc-00000002"]),
            "tokens": tok,
            "n_tok": pa.array([2, None, 2], pa.int32()),
            "source": pa.array(["s1", None, "s1"]),
        }
    )
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    stats = eng.apply_batch(_spark_df(spark, feed), batch_id=0)
    assert stats.events_in == 3
    assert stats.errors == 2, "NULL-op rows must be error-routed, not dropped"
    err = eng.errors_df()
    assert err.count() == 2
    state = table_state([r.asDict() for r in table.read().collect()])
    assert "doc-00000000" in state  # base row survives the NULL-op event
    assert "doc-00000001" in state
    assert state["doc-00000002"] == ((7, 8), 2, "s1")


def test_replay_with_debug_key_verification(
    spark, tmp_table_path, tmp_path, monkeypatch
):
    """I3S_DEBUG=1 re-verifies, per late-materialized row, that the payload
    joined via the packed (seq, part) long belongs to the winner's key —
    the defensive check the packed-key fast path dropped (round-3 advisory).
    A contract-abiding feed must replay to the exact oracle state with the
    assertion enabled."""
    monkeypatch.setenv("I3S_DEBUG", "1")
    base = make_corpus(100, seed=23, max_len=32)
    events = make_events(800, n_base_docs=100, seed=23, n_parts=4, max_len=32)
    table = _seed_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=2)
    expected = replay_oracle(base, events)
    actual = table_state([r.asDict() for r in table.read().collect()])
    assert not diff_states(expected, actual)
