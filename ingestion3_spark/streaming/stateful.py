"""Custom stateful streaming operator: per-key seq high-watermark dedup.

``applyInPandasWithState`` implementation of the engine's exactly-once core
for a *continuous* feed: for each ``doc_id`` keep the highest sequence
number applied so far in the state store and emit only events that advance
it (stale re-deliveries and out-of-order duplicates are suppressed
in-stream). This is the streaming twin of the batch last-(seq)-wins dedup
(cdc/dedup.py) — state is partitioned by key across executors, Arrow-batched
per group, no per-row Python.

The reference has no stateful streaming at all (SURVEY.md §2.9); its
dedup is ``dropDuplicates("id")`` per merge (``utils/NaraMergeUtil.scala:
129-135``). Here the same contract survives an unbounded feed: state per
key is one int64, so 10^9 keys ≈ tens of GB spread over the cluster's
state stores (RocksDB state backend on a real cluster).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "max_seq long"


def _dedup_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (max_seq,) = state.get if state.exists else (-1,)
    for pdf in pdfs:
        pdf = pdf.sort_values("seq", kind="stable")
        # suppress stale deliveries (<= state high-water mark) AND
        # within-batch re-deliveries of the same seq (stable sort -> the
        # first delivery of each seq wins, mirroring the batch dedup twin)
        fresh = pdf[pdf["seq"] > max_seq].drop_duplicates(subset=["seq"])
        if len(fresh):
            max_seq = int(fresh["seq"].max())
            yield fresh
    state.update((max_seq,))


def dedup_stream(
    events: DataFrame,
    key_col: str = "doc_id",
    output_schema: str | None = None,
) -> DataFrame:
    """Suppress events whose seq does not advance the per-key high-water
    mark. Works on a streaming DataFrame (update-mode state) and, for
    tests, on a batch DataFrame grouped the same way."""
    # per-field DDL (NOT simpleString().replace) — a ':' inside a nested
    # type (e.g. array<struct<...>> messages) would corrupt the DDL
    schema = output_schema or events.schema
    return events.groupBy(key_col).applyInPandasWithState(
        _dedup_group,
        outputStructType=schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
