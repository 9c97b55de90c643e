"""Merge-on-read (MOR) table mode: delta-file merges + reconciling reads.

Same oracle-equality bar as the COW e2e suite — the final reconciled state
must equal the dict replay including token arrays — plus MOR-specific
contracts: merges never rewrite base files, compaction folds delta layers
back to base, and reads after compaction equal reads before.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ingestion3_spark.cdc.generator import make_corpus, make_events
from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state
from ingestion3_spark.cdc.replay import ReplayEngine


def _spark_df(spark, tbl: pa.Table):
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark.createDataFrame(tbl.to_pandas())


def _mor_table(spark, path, base=None):
    table = ReplayEngine.create_table(spark, path, num_buckets=4, merge_mode="mor")
    if base is not None:
        files = table.write_files(_spark_df(spark, base))
        table.commit("append", add_files=files)
    return table


def _state(table):
    return table_state([r.asDict() for r in table.read().collect()])


@pytest.fixture(scope="module")
def fixtures():
    base = make_corpus(300, seed=5, max_len=48)
    events = make_events(3000, n_base_docs=300, seed=5, n_parts=4, max_len=48)
    return base, events


def test_mor_single_batch_matches_oracle(spark, tmp_table_path, tmp_path, fixtures):
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    base_paths = {e.path for e in table.live_files()}
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    stats = eng.replay(_spark_df(spark, events), num_batches=1)
    assert stats[0].errors > 0
    assert not diff_states(replay_oracle(base, events), _state(table))
    # merge appended deltas, never rewrote base
    live = table.live_files()
    assert base_paths <= {e.path for e in live}
    assert any(e.kind == "delta" for e in live)
    assert table.current_snapshot.operation == "merge-delta"


def test_mor_multi_batch_and_redelivery(spark, tmp_table_path, tmp_path, fixtures):
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=3)
    expected = replay_oracle(base, events)
    assert not diff_states(expected, _state(table))
    snap = table.current_snapshot.snapshot_id
    # full redelivery is a no-op (exactly-once via checkpoint)
    stats = eng.replay(_spark_df(spark, events), num_batches=2)
    assert all(s.changes == 0 for s in stats)
    assert table.current_snapshot.snapshot_id == snap
    assert not diff_states(expected, _state(table))


def test_mor_compaction_folds_deltas(spark, tmp_table_path, tmp_path, fixtures):
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=2)
    expected = _state(table)
    n = table.compact(min_files=2)
    assert n > 0
    assert all(e.kind == "base" for e in table.live_files())
    assert not diff_states(expected, _state(table))
    # post-compaction file rows are exact again: live rows == state size
    assert sum(e.rows for e in table.live_files()) == len(expected)
    # further replay on top of the compacted base still matches the oracle
    more = make_events(1000, n_base_docs=300, seed=6, n_parts=4, max_len=48,
                       start_seq=100_000)
    eng.replay(_spark_df(spark, more), num_batches=1)
    both = pa.concat_tables([events, more])
    assert not diff_states(replay_oracle(base, both), _state(table))


def test_mor_minor_compact_folds_delta_stack(spark, tmp_table_path, tmp_path, fixtures):
    """compact_deltas() folds K delta layers into ONE without touching any
    base file: read-equality before/after, base paths identical, exactly one
    delta layer (one file per bucket — the fanout write reuses the fold's
    bucket clustering), checkpoint carried forward, and further replay plus
    a later major compact still match the dict-replay oracle."""
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=3)
    expected = _state(table)
    ckpt = table.checkpoint()
    base_paths = {e.path for e in table.live_files() if e.kind == "base"}
    layers_before = {e.batch_dir for e in table.live_files() if e.kind == "delta"}
    assert len(layers_before) >= 2

    assert table.compact_deltas() == len(layers_before)
    live = table.live_files()
    assert {e.path for e in live if e.kind == "base"} == base_paths
    deltas = [e for e in live if e.kind == "delta"]
    assert len({e.batch_dir for e in deltas}) == 1
    by_bucket = {}
    for e in deltas:
        by_bucket.setdefault(e.bucket, []).append(e)
    assert all(len(es) == 1 for es in by_bucket.values())
    assert table.checkpoint() == ckpt
    assert table.current_snapshot.operation == "replace-deltas"
    assert not diff_states(expected, _state(table))

    # a second fold is a no-op (single layer left)
    assert table.compact_deltas() == 0
    # replay continues on the folded stack; major compact still exact
    more = make_events(1000, n_base_docs=300, seed=9, n_parts=4, max_len=48,
                       start_seq=200_000)
    eng.replay(_spark_df(spark, more), num_batches=1)
    both = pa.concat_tables([events, more])
    assert not diff_states(replay_oracle(base, both), _state(table))
    assert table.compact(min_files=2) > 0
    assert not diff_states(replay_oracle(base, both), _state(table))


def test_mor_replay_with_maintenance_cadence(spark, tmp_table_path, tmp_path, fixtures):
    """replay(minor_every=2, compact_every=4) runs folds inside the loop:
    final state still matches the dict-replay oracle, the layer count is
    bounded by the cadence, and the checkpoint survives every maintenance
    commit (exactly-once on a full redelivery)."""
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=4, minor_every=2,
               compact_every=4)
    assert not diff_states(replay_oracle(base, events), _state(table))
    # batch 4 ended on the major cadence: fully folded back to base
    assert all(e.kind == "base" for e in table.live_files())
    ops = [s.operation for s in table.snapshots()]
    assert "replace-deltas" in ops and "replace" in ops
    # redelivery after maintenance commits is still a no-op
    stats = eng.replay(_spark_df(spark, events), num_batches=2)
    assert all(s.changes == 0 for s in stats)


def test_mor_minor_compact_keeps_tombstones(spark, tmp_table_path, tmp_path):
    """A delete of a BASE row must survive the fold as a tombstone: the
    base file still holds the old row, so dropping the delete during minor
    compaction would resurrect it on the next read."""
    base = make_corpus(20, seed=11, max_len=16)
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table)
    import datetime as dt
    rows = [
        (1, 0, "delete", "doc-00000003", None, None, None),
        (2, 0, "update", "doc-00000005", [7, 7], 2, "cc"),
    ]
    df = spark.createDataFrame(
        [r + (dt.datetime(2026, 1, 1),) for r in rows],
        "seq long, part int, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, ts timestamp",
    )
    eng.replay(df, num_batches=2)  # two delta layers
    assert table.compact_deltas() == 2
    folded = [e for e in table.live_files() if e.kind == "delta"]
    assert folded  # the tombstone is still materialized as a delta row
    state = _state(table)
    assert "doc-00000003" not in state
    assert list(state["doc-00000005"][0]) == [7, 7]
    assert len(state) == 20 - 1


def test_mor_insert_delete_insert_one_key(spark, tmp_table_path, tmp_path):
    table = _mor_table(spark, tmp_table_path)
    eng = ReplayEngine(spark, table)
    rows = [
        (1, 0, "insert", "doc-x", [1, 2], 2, "cc"),
        (2, 0, "delete", "doc-x", None, None, None),
        (3, 0, "insert", "doc-x", [9], 1, "wiki"),
        (4, 0, "delete", "doc-y", None, None, None),  # invalid delete
    ]
    import datetime as dt
    df = spark.createDataFrame(
        [r + (dt.datetime(2026, 1, 1),) for r in rows],
        "seq long, part int, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, ts timestamp",
    )
    stats = eng.replay(df, num_batches=4)
    state = _state(table)
    assert list(state) == ["doc-x"]
    assert list(state["doc-x"][0]) == [9]
    inv = sum(s.merge.counts["invalid_deletes"] for s in stats if s.merge)
    assert inv == 1


def test_mor_resume_from_checkpoint(spark, tmp_table_path, tmp_path, fixtures):
    """Restart mid-replay under MOR (the headline bench mode): apply a
    prefix, reload the table fresh, hand the FULL feed to a new engine —
    overlap skipped via the snapshot checkpoint, suffix applied, final
    reconciled state matches the dict-replay oracle."""
    from ingestion3_spark.lakehouse.table import LakeTable

    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    df = _spark_df(spark, events)
    eng.apply_batch(df.filter("seq <= 1500"), batch_id=0)

    table2 = LakeTable.load(spark, tmp_table_path)
    assert table2.merge_mode == "mor"
    eng2 = ReplayEngine(spark, table2, error_dir=str(tmp_path / "err"))
    eng2.replay(df, num_batches=3)
    assert not diff_states(replay_oracle(base, events), _state(table2))


def test_mor_resume_across_compaction(spark, tmp_table_path, tmp_path, fixtures):
    """A compaction between crash and resume must not lose the checkpoint:
    its snapshot carries the offsets forward, so the resumed full feed
    skips the already-applied prefix instead of re-applying it."""
    from ingestion3_spark.lakehouse.table import LakeTable

    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    df = _spark_df(spark, events)
    eng.apply_batch(df.filter("seq <= 1500"), batch_id=0)
    ckpt_before = table.checkpoint()
    assert ckpt_before  # non-trivial offsets applied before the crash
    assert table.compact(min_files=2) > 0
    assert table.checkpoint() == ckpt_before  # offsets survive the compact

    table2 = LakeTable.load(spark, tmp_table_path)
    eng2 = ReplayEngine(spark, table2, error_dir=str(tmp_path / "err"))
    eng2.replay(df, num_batches=2)
    assert not diff_states(replay_oracle(base, events), _state(table2))


def test_mor_bucket_aligned_reconcile_single_exchange(spark, tmp_table_path, tmp_path, fixtures):
    """Compaction's scale contract: the bucket-aligned reconcile must plan
    exactly ONE exchange (on __bucket), with the (__bucket, key) groupBy
    satisfied by that clustering — a second exchange would re-shuffle the
    full wide payload. Also: the paired fanout rewrite still yields one
    file per bucket (a bucket never spans tasks)."""
    base, events = fixtures
    table = _mor_table(spark, tmp_table_path, base)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    eng.replay(_spark_df(spark, events), num_batches=2)

    plan = table.read(bucket_aligned=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    expected = _state(table)

    assert table.compact(min_files=2) > 0
    by_bucket = {}
    for e in table.live_files():
        by_bucket.setdefault(e.bucket, []).append(e)
    assert all(len(es) == 1 for es in by_bucket.values())
    assert not diff_states(expected, _state(table))
