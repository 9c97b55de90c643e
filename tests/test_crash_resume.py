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

from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state


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

    # run 1: SIGKILL well before a 4-batch replay of 40k events can finish
    # (startup ~10s + ~4 batches x ~5-10s); 25s typically lands in batch 1-2
    p = subprocess.Popen(_replay_cmd(feed, table_path, err),
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                         text=True)
    try:
        p.wait(timeout=25)
        killed = False
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
        killed = True

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
