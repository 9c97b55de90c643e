"""SIGKILL mid-replay, then resume: the atomic-commit exactly-once claim.

The reference's merge has no crash story (a killed NaraMergeUtil run
leaves a half-written output dir, ``utils/NaraMergeUtil.scala:131,181``).
Here every batch commits {data files, checkpoint offsets, lineage} in one
atomic snapshot publish, so a process killed at ANY instant leaves the
table at the last committed snapshot and a re-run of the SAME feed
converges to the exact oracle state with nothing double-applied.

The kill is a real SIGKILL to a separate CLI process (no atexit, no
finally blocks run) aimed mid-replay. Host speed drifts, so the test
asserts convergence whichever side of a batch boundary the kill lands on
— and records whether the first run actually died (it should, given the
timeout is far below the measured full-run time).
"""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from ingestion3_spark.cdc.generator import make_corpus, make_events
from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state
from ingestion3_spark.cdc.replay import ReplayEngine


def _replay_cmd(feed, table, err, batches=4):
    return [
        sys.executable, "-m", "ingestion3_spark.cli", "--cores", "4",
        "replay", "--feed", feed, "--table", table, "--err-dir", err,
        "--batches", str(batches), "--buckets", "4",
    ]


@pytest.mark.slow
def test_sigkill_mid_replay_then_resume(spark, tmp_path):
    feed = str(tmp_path / "feed.parquet")
    table_path = str(tmp_path / "tbl")
    err = str(tmp_path / "err")
    gen = subprocess.run(
        [sys.executable, "-m", "ingestion3_spark.cli", "--cores", "4",
         "generate", "--out", feed, "--events", "40000", "--seed", "13"],
        capture_output=True, text=True, check=True,
    )
    assert any(ln.startswith("{") for ln in gen.stdout.splitlines())

    # run 1: SIGKILL deterministically MID-replay — poll the table's
    # metadata dir and kill the instant the first batch commit publishes
    # (v2.metadata.json; create() wrote v1), while >=3 batches of work
    # remain. A fixed timer raced host drift both ways: a fast window let
    # the whole 4-batch replay finish first, a slow one killed before any
    # commit existed.
    import glob as _glob
    import os as _os
    import time as _t

    p = subprocess.Popen(_replay_cmd(feed, table_path, err),
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = _t.time() + 240
    killed = False
    while _t.time() < deadline and p.poll() is None:
        if len(_glob.glob(_os.path.join(table_path, "metadata",
                                        "v*.metadata.json"))) >= 2:
            p.kill()
            p.wait()
            killed = True
            break
        _t.sleep(0.2)
    if p.poll() is None:  # deadline without a single commit: hung run
        p.kill()
        p.wait()

    # run 2: same feed, fresh process — must converge regardless of where
    # the kill landed, applying only what the checkpoint says is missing
    out = subprocess.run(_replay_cmd(feed, table_path, err),
                         capture_output=True, text=True, check=True)
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    final = lines[-1]

    from ingestion3_spark.lakehouse.table import LakeTable

    events = pq.read_table(feed)
    want = replay_oracle(None, events)
    t = LakeTable.load(spark, table_path)
    got = table_state([r.asDict() for r in t.read().collect()])
    assert not diff_states(want, got)
    assert final["rows"] == len(want)
    # checkpoint covers every feed partition at its max seq
    max_seq = {}
    for part, seq in zip(events["part"].to_pylist(), events["seq"].to_pylist()):
        max_seq[part] = max(max_seq.get(part, -1), seq)
    assert {int(k): v for k, v in final["checkpoint"].items()} == max_seq
    assert killed, "kill landed after full completion — raise event count"

# ---------------------------------------------------------------------------
# Crash at the commit boundary, parametrized over BOTH adapters: the
# exactly-once convergence must be a property of the ENGINE's
# replay-from-checkpoint protocol, not of LakeTable's os.replace publish.
# The SIGKILL test above kills a real process mid-LakeTable-replay; here
# the crash is injected at the most adversarial instant — the batch's
# commit call itself, AFTER data files were written but BEFORE the
# snapshot publishes — then the same feed is redelivered in full.


class _InjectedCrash(RuntimeError):
    pass


def _crashy(table, fail_on_call: int):
    """Wrap ``table.commit`` to raise on its Nth call (1-based)."""
    orig = table.commit
    state = {"calls": 0}

    def commit(*a, **k):
        state["calls"] += 1
        if state["calls"] == fail_on_call:
            raise _InjectedCrash("crash before snapshot publish")
        return orig(*a, **k)

    table.commit = commit
    return lambda: setattr(table, "commit", orig)


def _mk_lake(spark, tmp_path):
    table = ReplayEngine.create_table(
        spark, str(tmp_path / "tbl"), num_buckets=4
    )
    reload = lambda: __import__(  # noqa: E731
        "ingestion3_spark.lakehouse.table", fromlist=["LakeTable"]
    ).LakeTable.load(spark, str(tmp_path / "tbl"))
    return table, reload


def _mk_mem(spark, tmp_path):
    from tests.test_adapter_seam import MemTable

    table = MemTable(spark, num_buckets=4)
    # MemTable's durable state is its committed snapshot log; "reload"
    # hands back the same object (uncommitted writes were never live)
    return table, lambda: table


@pytest.mark.parametrize("mk", [_mk_lake, _mk_mem], ids=["lake", "mem"])
def test_commit_crash_then_redelivery_converges(spark, tmp_path, mk):
    from tests.test_adapter_seam import _spark_df

    base = make_corpus(150, seed=9, max_len=32)
    events = make_events(2000, n_base_docs=150, seed=9, n_parts=4, max_len=32)

    table, reload = mk(spark, tmp_path)
    table.commit("append", add_files=table.write_files(_spark_df(spark, base)))

    # crash on the SECOND engine commit: batch 1 lands, batch 2 dies at
    # the publish boundary with its files written, batches 3-4 never run
    disarm = _crashy(table, fail_on_call=2)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    with pytest.raises(_InjectedCrash):
        eng.replay(_spark_df(spark, events), num_batches=4)
    disarm()

    # durable state shows exactly one applied batch — the dead batch's
    # files exist but are NOT live (nothing references them)
    t2 = reload()
    applied = [s for s in t2.snapshots() if s.operation != "append"]
    assert len(applied) == 1

    # full redelivery against the recovered table: checkpoint filtering
    # must skip batch 1's rows, apply the rest exactly once
    eng2 = ReplayEngine(spark, t2, error_dir=str(tmp_path / "err2"))
    eng2.replay(_spark_df(spark, events), num_batches=4)
    expected = replay_oracle(base, events)
    actual = table_state([r.asDict() for r in t2.read().collect()])
    assert not diff_states(expected, actual)

    # and a third full replay is a pure no-op (exactly-once, again)
    stats = eng2.replay(_spark_df(spark, events), num_batches=1)
    assert all(s.changes == 0 for s in stats)
    assert not diff_states(
        expected, table_state([r.asDict() for r in t2.read().collect()])
    )
