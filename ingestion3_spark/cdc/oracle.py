"""Pure-Python dict-replay oracle (FIXTURES.md §6).

The ground truth for end-to-end tests: apply events in global ``(seq, part)``
order to an in-memory dict, with the SAME validation contract as the engine
(error rows are skipped as if never delivered; wrong n_tok is recomputed).
The final dict is compared to the engine's table state with exact
token-array (int32) equality per doc_id — the upgrade of the reference's
count-reconciliation oracle (``utils/NaraMergeUtil.scala:284,435-499``) to
full-state equality.
"""

from __future__ import annotations

import pyarrow as pa


def replay_oracle(
    base: pa.Table | None,
    events: pa.Table,
    upto_seq: int | None = None,
) -> dict[str, tuple[tuple[int, ...], int, str]]:
    """Return {doc_id: (tokens, n_tok, source)} after replaying events.

    Validation contract (mirrors engine + FIXTURES.md §4):
    - unknown or NULL op              -> error, event skipped;
    - insert/update with null tokens  -> error, event skipped;
    - n_tok != len(tokens)            -> warn, n_tok recomputed;
    - delete of unknown doc_id        -> 'invalid delete', no-op;
    - duplicate (part, seq)           -> applied once (idempotent);
    - truth order                     -> ascending (seq, part).
    """
    state: dict[str, tuple[tuple[int, ...], int, str]] = {}
    if base is not None:
        for row in base.to_pylist():
            state[row["doc_id"]] = (tuple(row["tokens"]), len(row["tokens"]), row["source"])

    seen: set[tuple[int, int]] = set()
    rows = events.select(["seq", "part", "op", "doc_id", "tokens", "source"]).to_pylist()
    rows.sort(key=lambda r: (r["seq"], r["part"]))
    for r in rows:
        if upto_seq is not None and r["seq"] > upto_seq:
            continue
        key = (r["part"], r["seq"])
        if key in seen:
            continue
        seen.add(key)
        if r["op"] not in ("insert", "update", "delete"):
            continue  # unknown/NULL op -> error-routed (validate.py
            # error_predicate is NULL-definite; the row must land in the
            # error channel, never silently vanish or merge)
        if r["op"] == "delete":
            state.pop(r["doc_id"], None)  # unknown id -> invalid delete no-op
        else:
            if r["tokens"] is None:
                continue  # error-routed
            toks = tuple(r["tokens"])
            state[r["doc_id"]] = (toks, len(toks), r["source"])
    return state


def table_state(tbl_rows: list[dict]) -> dict[str, tuple[tuple[int, ...], int, str]]:
    """Normalize engine output rows (collect()'d dicts) to oracle shape."""
    out = {}
    for row in tbl_rows:
        out[row["doc_id"]] = (tuple(row["tokens"]), row["n_tok"], row["source"])
    return out


def diff_states(expected: dict, actual: dict, limit: int = 5) -> list[str]:
    """Human-readable diffs for assertion messages; empty list == equal."""
    msgs = []
    for k in expected.keys() - actual.keys():
        msgs.append(f"missing doc {k}")
        if len(msgs) >= limit:
            return msgs
    for k in actual.keys() - expected.keys():
        msgs.append(f"unexpected doc {k}")
        if len(msgs) >= limit:
            return msgs
    for k, v in expected.items():
        a = actual.get(k)
        if a is not None and a != v:
            msgs.append(f"mismatch {k}: expected {v[:2]}..., got {a[:2]}...")
            if len(msgs) >= limit:
                return msgs
    return msgs
