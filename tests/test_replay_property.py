"""Property-based replay test: random op sequences over a tiny key pool.

The seeded generator (cdc/generator.py) covers rate-based adversarial
cases; hypothesis covers *structural* ones it can't reach at low rates —
e.g. insert->delete->insert of one key in one batch, every event of a feed
hitting the same key, all-delete feeds, empty-token-array payloads.
Engine state must equal the dict-replay oracle on every generated feed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state
from ingestion3_spark.cdc.replay import ReplayEngine

KEYS = [f"doc-{i:08d}" for i in range(4)]

event_st = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 3),                     # key index
    st.integers(0, 1),                     # part
    st.lists(st.integers(0, 100), max_size=4),  # tokens (may be empty)
    st.booleans(),                         # wrong n_tok
)


def _feed(events) -> pa.Table:
    seqs, parts, ops, ids, toks, ntoks = [], [], [], [], [], []
    for i, (op, ki, part, tokens, bad) in enumerate(events):
        seqs.append(i + 1)
        parts.append(part)
        ops.append(op)
        ids.append(KEYS[ki])
        if op == "delete":
            toks.append(None)
            ntoks.append(None)
        else:
            toks.append(tokens)
            ntoks.append(len(tokens) + (3 if bad else 0))
    n = len(events)
    return pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "part": pa.array(parts, pa.int32()),
            "op": pa.array(ops, pa.string()),
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "n_tok": pa.array(ntoks, pa.int32()),
            "source": pa.array(["synth"] * n, pa.string()),
            "ts": pa.array(
                np.int64(1_700_000_000) * 1_000_000 + np.arange(n) * 1_000_000,
                pa.timestamp("us"),
            ),
        }
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event_st, min_size=1, max_size=24),
    st.integers(1, 3),
    st.sampled_from(["cow", "mor"]),
)
def test_random_feed_matches_oracle(spark, tmp_path_factory, events, n_batches, mode):
    tmp = tmp_path_factory.mktemp("prop")
    feed = _feed(events)
    table = ReplayEngine.create_table(
        spark, str(tmp / "tbl"), num_buckets=2, merge_mode=mode
    )
    eng = ReplayEngine(spark, table, error_dir=str(tmp / "err"))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    eng.replay(spark.createDataFrame(feed.to_pandas()), num_batches=n_batches)
    expected = replay_oracle(None, feed)
    actual = table_state([r.asDict() for r in table.read().collect()])
    assert not diff_states(expected, actual)
