"""Vectorized validation / normalization pass with per-record error routing.

The new engine's analog of the reference's Mapper validation cascade +
MessageCollector (``mappers/Mapper.scala:193-630``, ``messages/
IngestMessage.scala:24-31``): every check appends a message struct to a
``messages`` array column instead of throwing; rows with any
``level=='error'`` message are excluded from the merge and routed to the
error table (``executors/MappingExecutor.scala:116-118``). 100% built-in
Spark expressions — no Python UDF in the hot path (input_hint: "no per-row
Python").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MESSAGE_SCHEMA = (
    "array<struct<message:string,level:string,id:string,"
    "field:string,value:string,enrichedValue:string>>"
)


def _msg(message, level, id_col, field, value, enriched):
    return F.struct(
        F.lit(message).alias("message"),
        F.lit(level).alias("level"),
        F.col(id_col).cast("string").alias("id"),
        F.lit(field).alias("field"),
        value.cast("string").alias("value"),
        enriched.cast("string").alias("enrichedValue"),
    )


def validate_events(df: DataFrame, payload_cols: tuple[str, ...] | None = None) -> DataFrame:
    """Append ``messages`` and normalized payload columns.

    Checks (FIXTURES.md §4):
    - ERROR ``unknown op``                 — op outside {insert,update,delete};
    - ERROR ``null tokens on non-delete``  — insert/update without payload;
    - WARN  ``n_tok mismatch, recomputed`` — stored n_tok != size(tokens);
    - INFO  ``payload on delete ignored``  — delete carrying a payload.
    Normalizations: ``n_tok`` recomputed from ``size(tokens)``; delete rows
    get null payload columns.

    ``payload_cols`` defaults to every non-envelope column — schema
    evolution (added/renamed payload columns) flows through untouched.
    """
    envelope = {"seq", "part", "op", "doc_id", "ts", "messages"}
    if payload_cols is None:
        payload_cols = tuple(c for c in df.columns if c not in envelope)

    is_delete = F.col("op") == "delete"
    null_payload = F.col("tokens").isNull()
    true_ntok = F.size("tokens")
    has_ntok = "n_tok" in df.columns
    ntok_bad = (~is_delete) & (~null_payload) & (
        F.col("n_tok").isNull() | (F.col("n_tok") != true_ntok)
    ) if has_ntok else F.lit(False)
    payload_present = None
    for c in payload_cols:
        cond = F.col(c).isNotNull()
        payload_present = cond if payload_present is None else (payload_present | cond)
    payload_on_delete = is_delete & payload_present

    checks = [
        # NULL-definite: op IS NULL must classify as unknown-op error, not
        # three-valued-NULL (which F.when treats as false and filter()
        # silently drops on BOTH branches — the round-3 advisory)
        F.when(
            F.col("op").isNull() | ~F.col("op").isin("insert", "update", "delete"),
            _msg("unknown op", "error", "doc_id", "op",
                 F.coalesce(F.col("op"), F.lit("<null>")), F.lit("")),
        ),
        F.when(
            (~is_delete) & null_payload,
            _msg("null tokens on non-delete", "error", "doc_id", "tokens",
                 F.lit(""), F.lit("")),
        ),
        F.when(
            payload_on_delete,
            _msg("payload on delete ignored", "info", "doc_id", "op",
                 F.lit("delete"), F.lit("")),
        ),
    ]
    if has_ntok:
        checks.insert(1, F.when(
            ntok_bad,
            _msg("n_tok mismatch, recomputed", "warn", "doc_id", "n_tok",
                 F.col("n_tok"), true_ntok),
        ))
    messages = F.filter(F.array(*checks), lambda m: m.isNotNull()).cast(MESSAGE_SCHEMA)

    out = df.withColumn("messages", messages)
    return normalize_payload(out, payload_cols)


def normalize_payload(
    df: DataFrame, payload_cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Payload normalization ONLY (no messages column): ``n_tok`` recomputed
    from ``size(tokens)``, delete rows get null payload columns.

    Identical mutations to :func:`validate_events` — used on hot scans
    (winner selection's late-materialization join) where rows are already
    known clean, so the per-row message-struct construction can be skipped
    entirely (``test_replay_property.py`` pins the equivalence).
    """
    envelope = {"seq", "part", "op", "doc_id", "ts", "messages"}
    if payload_cols is None:
        payload_cols = tuple(c for c in df.columns if c not in envelope)
    is_delete = F.col("op") == "delete"
    true_ntok = F.size("tokens")
    out = df
    ntok_type = dict(df.dtypes).get("n_tok", "int")
    for c in payload_cols:
        if c == "n_tok":
            out = out.withColumn(
                c, F.when(is_delete, F.lit(None)).otherwise(true_ntok).cast(ntok_type)
            )
        else:
            out = out.withColumn(c, F.when(is_delete, F.lit(None)).otherwise(F.col(c)))
    return out


def error_predicate():
    """Cheap router predicate over RAW feed rows — no message structs.

    True exactly when :func:`has_error` is true over
    ``validate_events(df)``: the only error-level checks are ``unknown op``
    and ``null tokens on non-delete`` (warn/info messages never route).
    Hot 10^7-row scans (winner selection, late materialization, the
    error-routing scan's clean majority) evaluate THIS instead of building
    a per-row message array; full messages are constructed only for the
    errored subset. Equivalence is property-tested
    (tests/test_replay_property.py::test_error_predicate_matches_messages).

    NULL-definite by construction: a NULL ``op`` makes the first disjunct
    TRUE outright (TRUE OR NULL = TRUE), and with ``op`` non-null every
    sub-expression is two-valued — so ``filter(pred)`` / ``filter(~pred)``
    partition the feed exactly; no row can vanish from both branches (the
    round-3 advisory's silent-drop divergence).
    """
    unknown_op = F.col("op").isNull() | ~F.col("op").isin(
        "insert", "update", "delete"
    )
    return unknown_op | (
        (F.col("op") != "delete") & F.col("tokens").isNull()
    )


def has_error(col: str = "messages"):
    """Router predicate: any error-level message (MappingExecutor.scala:116-118)."""
    return F.array_contains(F.col(f"{col}.level"), "error")


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, errored) — errored rows never reach the merge."""
    return df.filter(~has_error()), df.filter(has_error())


def explode_messages(df: DataFrame) -> DataFrame:
    """Flatten the messages array to one row per message.

    Single ``inline`` replaces the reference's 6-way aligned posexplode
    (``messages/MessageProcessor.scala:19-47``).
    """
    return df.select(F.inline("messages"))


def message_summary(df: DataFrame) -> DataFrame:
    """Counts by (message, field, level) — MessageProcessor.scala:71-77 analog."""
    return (
        explode_messages(df)
        .groupBy("message", "field", "level")
        .agg(F.count("id").alias("n"))
        .orderBy(F.desc("n"), "message")
    )
