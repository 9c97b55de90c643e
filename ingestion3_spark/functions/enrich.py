"""Vocabulary-enrichment operators (J4/J5).

Re-expression of the reference's lookup enrichments —
``enrichments/LanguageEnrichment.scala:8-109`` (ISO-639 code -> English
name, loaded from resource CSVs) and ``enrichments/TypeEnrichment.scala:
17-209`` (a ~180-term string -> DCMI-type map) — as a single broadcast
map-join operator: normalize the term, join the (tiny) vocabulary,
merge the enriched value, and emit a warn-level message on miss (the
MessageCollector ``enrichment failed`` analog).

The bundled vocabularies are public-knowledge subsets (ISO 639-1 codes,
DCMI Type terms); production deployments pass their full maps — the
OPERATOR (normalize -> broadcast join -> merge -> message) is the
component under test, and it is exactly-verifiable against a literal
VALUES table in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ISO 639-1 subset: code -> English name (languages/*.csv analog)
ISO639_1 = {
    "ar": "Arabic", "bn": "Bengali", "cs": "Czech", "da": "Danish",
    "de": "German", "el": "Greek", "en": "English", "es": "Spanish",
    "et": "Estonian", "fa": "Persian", "fi": "Finnish", "fr": "French",
    "he": "Hebrew", "hi": "Hindi", "hu": "Hungarian", "id": "Indonesian",
    "it": "Italian", "ja": "Japanese", "ko": "Korean", "la": "Latin",
    "nl": "Dutch", "no": "Norwegian", "pl": "Polish", "pt": "Portuguese",
    "ro": "Romanian", "ru": "Russian", "sv": "Swedish", "sw": "Swahili",
    "th": "Thai", "tr": "Turkish", "uk": "Ukrainian", "ur": "Urdu",
    "vi": "Vietnamese", "zh": "Chinese",
}

# term -> DCMI Type (TypeEnrichment.scala:17-209 mechanism; subset)
DCMI_TYPE_MAP = {
    "book": "Text", "books": "Text", "document": "Text", "letter": "Text",
    "manuscript": "Text", "newspaper": "Text", "pamphlet": "Text",
    "periodical": "Text", "text": "Text", "writing": "Text",
    "image": "Image", "photograph": "Image", "photo": "Image",
    "picture": "Image", "postcard": "Image", "poster": "Image",
    "print": "Image", "drawing": "Image", "map": "Image",
    "painting": "Image", "illumination": "Image", "still image": "StillImage",
    "audio": "Sound", "sound": "Sound", "recording": "Sound",
    "music": "Sound", "oral history": "Sound",
    "video": "MovingImage", "film": "MovingImage", "movie": "MovingImage",
    "moving image": "MovingImage", "motion picture": "MovingImage",
    "artifact": "PhysicalObject", "object": "PhysicalObject",
    "physical object": "PhysicalObject", "specimen": "PhysicalObject",
    "sculpture": "PhysicalObject", "furnishing": "PhysicalObject",
    "dataset": "Dataset", "data": "Dataset",
    "collection": "Collection", "software": "Software",
    "interactive resource": "InteractiveResource",
}


def normalize_term(col) -> Column:
    """Vocabulary lookup key normalization: lowercase, trim, collapse
    whitespace (TypeEnrichment ``enrich`` pre-pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def vocab_enrich(
    df: DataFrame,
    col: str,
    mapping: dict[str, str],
    out_col: str,
    miss_message: str = "enrichment failed",
) -> DataFrame:
    """Broadcast vocabulary join: ``out_col`` carries the enriched value
    (null on miss) and ``{out_col}_msg`` a warn message struct on miss
    (null on hit) — callers fold it into their messages column.

    Scale shape: the vocabulary is at most a few thousand rows, so this is
    always a broadcast hash join probed map-side — no shuffle of the fact
    table, regardless of its size.
    """
    spark = df.sparkSession
    vocab = spark.createDataFrame(
        [(k, v) for k, v in sorted(mapping.items())],
        f"_vocab_term string, {out_col} string",
    )
    miss = F.col(col).isNotNull() & F.col(out_col).isNull()
    msg = F.when(
        miss,
        F.struct(
            F.lit(miss_message).alias("message"),
            F.lit("warn").alias("level"),
            F.col(col).cast("string").alias("value"),
        ),
    )
    return (
        df.withColumn("_vocab_term", normalize_term(col))
        .join(F.broadcast(vocab), "_vocab_term", "left")
        .withColumn(f"{out_col}_msg", msg)
        .drop("_vocab_term")
    )


def eligibility_join(
    df: DataFrame,
    keys: tuple[str, str],
    table: dict[tuple[str, str], dict],
    out_cols: tuple[str, ...],
) -> DataFrame:
    """Multi-key eligibility lookup (J6 — the mechanism of
    ``wiki/WikiMapper.scala:85-152`` + ``InstitutionsLoader.scala``: a
    (partner, dataProvider) pair joined against a small institutions table
    to attach eligibility flags).

    ``table`` maps a 2-tuple of key values to a dict of ``out_cols``
    values; rows with no entry get nulls (ineligible). Broadcast hash join
    on the composite key — probed map-side, no fact shuffle.
    """
    spark = df.sparkSession
    rows = [
        tuple(k) + tuple(v.get(c) for c in out_cols)
        for k, v in sorted(table.items())
    ]
    schema = ", ".join(
        [f"_ek{i} string" for i in range(2)]
        + [f"{c} string" for c in out_cols]
    )
    lookup = spark.createDataFrame(rows, schema)
    cond = (F.col(keys[0]) == F.col("_ek0")) & (F.col(keys[1]) == F.col("_ek1"))
    return df.join(F.broadcast(lookup), cond, "left").drop("_ek0", "_ek1")


def mapping_values_sql(mapping: dict[str, str]) -> str:
    """The vocabulary as a literal SQL VALUES table (for DuckDB oracles) —
    generated from the SAME dict the Spark join uses."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(
        f"('{esc(k)}', '{esc(v)}')" for k, v in sorted(mapping.items())
    )
    return f"(VALUES {rows})"
