"""XML payload extraction (the reference's primary input format).

Re-expression of the NodeSeq extractor DSL (``mappers/utils/Extractor.
scala:10-258`` — extractString/extractStrings over element paths) and the
OAI page parser's record split + error routing (``harvesters/oai/
OaiXmlParser.scala:14-90``) as Spark-native operators:

* :func:`parse_xml` — ``from_xml`` in PERMISSIVE mode: a malformed
  payload yields a null struct instead of killing the batch, and
  :func:`xml_error` routes it as an error-level message (the
  MessageCollector analog; OaiXmlParser emits a harvest error per
  unparseable record the same way).
* :func:`extract_string` / :func:`extract_strings` — field access on the
  parsed struct, the extractString / extractStrings analogs.
* :func:`xpath_strings` — raw XPath over the XML text for paths deeper
  than the declared schema (Extractor's ``\\``/``\\\\`` traversal analog);
  only safe on pre-validated XML (Spark's xpath udf throws on malformed
  input, so run it behind the parse_xml validity gate).

Everything is expression-only (JVM codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_xml(df: DataFrame, col: str, schema_ddl: str, out: str = "xml") -> DataFrame:
    """Parse an XML-string column into ``out`` struct<schema_ddl>.

    PERMISSIVE: malformed XML -> null struct fields (route with
    :func:`xml_error`), so one bad record never fails the scan.
    """
    return df.withColumn(
        out,
        F.from_xml(F.col(col), schema_ddl, {"mode": "PERMISSIVE"}),
    )


def xml_error(parsed_col: str, required_field: str) -> Column:
    """Error predicate: parse produced no value for a required field
    (MappingException / OaiXmlParser error-record analog)."""
    return F.col(f"{parsed_col}.{required_field}").isNull()


def extract_string(parsed_col: str, field: str) -> Column:
    """extractString analog: first/scalar value of a field."""
    return F.col(f"{parsed_col}.{field}")


def extract_strings(parsed_col: str, field: str) -> Column:
    """extractStrings analog: array field -> array<string>, empty-safe."""
    c = F.col(f"{parsed_col}.{field}")
    return F.coalesce(c, F.array())


def xpath_strings(col, path: str) -> Column:
    """Raw XPath extraction (array<string>) for ad-hoc deep paths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xpath(c, F.lit(path))
