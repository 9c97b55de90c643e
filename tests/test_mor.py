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
    ckpt_before = table.checkpoint
    assert table.compact(min_files=2) > 0
    assert table.checkpoint == ckpt_before  # offsets survive the compact

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
