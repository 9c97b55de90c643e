"""Driver-side Avro container-file round-trip (S1/S2 verification path).

The reference's on-disk harvest format is Avro (``avro/OriginalRecord.
avsc``, ``harvesters/Harvester.scala``). The DISTRIBUTED Avro path in this
engine is ``sources/io.py`` read_avro/write_avro, which needs the
``spark-avro`` DataSource jar (``--packages org.apache.spark:
spark-avro_2.13``). That jar is NOT in this sandbox and cannot be fetched
(no network) — but the core ``avro-1.12`` jar IS on Spark's classpath, so
this module implements a real, verified Avro container round-trip through
py4j on the driver: schema translation, GenericRecord encode, DataFile
write/read. It is the fixture/spool/schema path (bounded rows), not the
bulk path; it exists so S1/S2 semantics are actually exercised instead of
only the guard branch.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PRIMITIVES = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def spark_schema_to_avro(schema: T.StructType, name: str = "record0") -> str:
    """Spark StructType -> Avro record schema JSON (nullable unions)."""

    def field_type(dt: T.DataType):
        for cls, avro in _PRIMITIVES.items():
            if isinstance(dt, cls):
                return avro
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": field_type(dt.elementType)}
        if isinstance(dt, T.StructType):
            return json.loads(spark_schema_to_avro(dt, name=f"{name}_n"))
        raise TypeError(f"unsupported type for avro: {dt}")

    fields = [
        {"name": f.name, "type": ["null", field_type(f.dataType)], "default": None}
        for f in schema.fields
    ]
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )


def _to_java(jvm, dt: T.DataType, v):
    if v is None:
        return None
    if isinstance(dt, T.LongType):
        return jvm.java.lang.Long(int(v))
    if isinstance(dt, T.IntegerType):
        return jvm.java.lang.Integer(int(v))
    if isinstance(dt, T.DoubleType):
        return jvm.java.lang.Double(float(v))
    if isinstance(dt, T.FloatType):
        return jvm.java.lang.Float(float(v))
    if isinstance(dt, T.BooleanType):
        return jvm.java.lang.Boolean(bool(v))
    if isinstance(dt, T.ArrayType):
        lst = jvm.java.util.ArrayList()
        for x in v:
            lst.add(_to_java(jvm, dt.elementType, x))
        return lst
    return v  # strings pass through


def write_avro_driver(df: DataFrame, path: str, max_rows: int = 200_000) -> int:
    """Write df to ONE Avro container file (driver-side; bounded collect).

    Returns the number of records written. Mirrors the reference's
    ``HarvestExecutor`` avro sink semantics: explicit schema, snappy-less
    container (null codec), one record per row.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"driver-side avro sink is bounded to {max_rows} rows; "
            "use sources.io.write_avro with spark-avro for bulk data"
        )
    schema_json = spark_schema_to_avro(df.schema)
    parser = jvm.org.apache.avro.Schema.Parser()
    avro_schema = parser.parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(avro_schema)
    )
    writer.create(avro_schema, jvm.java.io.File(path))
    try:
        for row in rows:
            rec = jvm.org.apache.avro.generic.GenericData.Record(avro_schema)
            for f in df.schema.fields:
                rec.put(f.name, _to_java(jvm, f.dataType, row[f.name]))
            writer.append(rec)
    finally:
        writer.close()
    return len(rows)


def _from_java(dt: T.DataType, v):
    if v is None:
        return None
    if isinstance(dt, T.StringType):
        return str(v)  # avro Utf8 -> str
    if isinstance(dt, T.ArrayType):
        return [_from_java(dt.elementType, x) for x in v]
    return v


def read_avro_driver(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read an Avro container file back into a DataFrame (driver-side)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    try:
        while reader.hasNext():
            rec = reader.next()
            out.append(
                tuple(_from_java(f.dataType, rec.get(f.name)) for f in schema.fields)
            )
    finally:
        reader.close()
    return spark.createDataFrame(out, schema)
