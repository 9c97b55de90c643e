"""Sources & sinks (SURVEY.md §2.1 S1-S12, re-expressed Spark-first).

Primary storage is parquet/LakeTable. The reference's Avro pipeline format
(S1/S2) maps to ``format("avro")`` WHEN the spark-avro module is on the
classpath (it is an external module, version-matched to the Spark
install); when it is absent (as in this sandbox — no network to fetch
it), the helpers fall back to :mod:`ingestion3_spark.sources.avro_codec`,
a distributed pure-Python implementation of the public Avro container
spec (binaryFile scan + mapInPandas decode; executor-side partition-file
writes). The fallback is spec-conformant (cross-checked against the JVM
DataFileReader in tests) but Python-decode-bound — production clusters
should ship the jar.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --------------------------------------------------------------- avro (S1/S2)
def avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-path-probe")
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source: avro" not in str(e)
    return True


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (MappingExecutor.scala:91 analog): spark-avro when on the
    classpath, else the distributed pure-Python codec fallback."""
    if avro_available(spark):
        return spark.read.format("avro").load(path)
    from ingestion3_spark.sources.avro_codec import read_avro_distributed

    return read_avro_distributed(spark, path)


def write_avro(df: DataFrame, path: str, avro_schema: str | None = None) -> None:
    """Avro sink with optional explicit schema (HarvestExecutor.scala:97-100):
    spark-avro when on the classpath, else the distributed codec fallback
    (which always writes the DataFrame's own schema — pass data already
    cast when an explicit schema is required)."""
    if avro_available(df.sparkSession):
        w = df.write.format("avro").mode("overwrite")
        if avro_schema:
            w = w.option("avroSchema", avro_schema)
        w.save(path)
        return
    from ingestion3_spark.sources.avro_codec import write_avro_distributed

    write_avro_distributed(df, path)


# ------------------------------------------------------------- jsonl (S4/S5)
def write_jsonl_gz(df: DataFrame, path: str) -> None:
    """One gzipped JSON doc per line (JsonlExecutor.scala:53-58 analog):
    ``to_json(struct(*))`` replaces the reference's per-record jsonlRecord
    string builder (model/package.scala:115-243)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.option(
        "compression", "gzip"
    ).mode("overwrite").text(path)


def count_jsonl(spark: SparkSession, path: str) -> int:
    """Post-write record count (JsonlExecutor.scala:61 analog)."""
    return spark.read.text(path).count()


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


# ---------------------------------------------------------------- csv (S6)
def write_csv_log(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Error/warning log CSV (utils/Utils.scala:170-181 analog).

    ``coalesce(1)`` only for genuinely small logs — it serializes the write."""
    out = df.coalesce(1) if single_file else df
    out.write.option("header", "true").mode("overwrite").csv(path)


# ------------------------------------------- paged cursor source (S7/S9/S10)
class PagedCursorSource:
    """Resumption-token paged source — the OAI-PMH harvester analog
    (harvesters/oai/OaiMultiPageResponseBuilder.scala:32-120).

    The reference tails a remote feed single-threaded on the driver and
    spools to a local Avro file (its S10 anti-pattern). Here the cursor
    loop only FETCHES (driver-side, inherently sequential protocol); each
    page lands as a parquet file in a spool directory which executors read
    — so parse/validate/merge stay distributed, and the spool dir doubles
    as a replayable file-drop feed for Structured Streaming.

    ``fetch(token) -> (rows, next_token|None)`` abstracts the protocol
    (OAI resumptionToken, API page cursor, ...). The cursor itself is
    checkpointed to ``_cursor.json`` after each page so a killed harvest
    resumes from the last spooled page (at-least-once spool; the replay
    engine's seq-dedup makes it exactly-once end-to-end).
    """

    def __init__(self, spool_dir: str, fetch, schema: "str | None" = None):
        import os

        self.spool_dir = spool_dir
        self.fetch = fetch
        self.schema = schema
        os.makedirs(spool_dir, exist_ok=True)
        self._cursor_path = f"{spool_dir}/_cursor.json"

    def _load_cursor(self):
        import os

        if os.path.exists(self._cursor_path):
            with open(self._cursor_path) as f:
                return json.load(f)
        return {"token": None, "pages": 0, "done": False}

    def _save_cursor(self, cur) -> None:
        import os
        import uuid

        tmp = self._cursor_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, self._cursor_path)

    def harvest(self, max_pages: int | None = None) -> int:
        """Tail the feed to completion (or max_pages). Returns pages spooled."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cur = self._load_cursor()
        spooled = 0
        while not cur["done"]:
            if max_pages is not None and spooled >= max_pages:
                break
            rows, next_token = self.fetch(cur["token"])
            if rows:
                tbl = pa.Table.from_pylist(rows)
                pq.write_table(tbl, f"{self.spool_dir}/page-{cur['pages']:08d}.parquet")
            cur = {"token": next_token, "pages": cur["pages"] + 1, "done": next_token is None}
            self._save_cursor(cur)
            spooled += 1
        return spooled

    def to_df(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        return reader.option("pathGlobFilter", "page-*.parquet").parquet(self.spool_dir)
