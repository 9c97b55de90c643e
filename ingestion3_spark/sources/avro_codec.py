"""Distributed Avro container I/O with a pure-Python codec (no jar needed).

The reference's entire inter-stage I/O is Avro container files
(``executors/MappingExecutor.scala:91,124``, ``harvesters/Harvester.scala``).
The idiomatic Spark path is the ``spark-avro`` DataSource
(``--packages org.apache.spark:spark-avro_2.13:<ver>``) — see
``sources/io.py`` — but that connector jar is not bundled with a stock
PySpark install and this sandbox has no network to fetch it. This module
closes the gap with a self-contained implementation of the PUBLIC Avro 1.x
container-file spec (https://avro.apache.org/docs/current/specification/):

* ``read_avro_distributed``  — ``spark.read.format("binaryFile")`` (one
  task per container file) + ``mapInPandas`` decoding executor-side; the
  schema is discovered from one file header on the driver.
* ``write_avro_distributed`` — ``mapInPandas`` writer: each task encodes
  its partition into its own container file in the target directory —
  executors write, nothing is spooled through the driver (the S10
  anti-pattern this replaces, ``NaraDeltaHarvester.scala:113-126``).

Scope/limits (documented, not hidden): codecs ``null`` and ``deflate``;
types null/boolean/int/long/float/double/bytes/string/record/array/map/
enum + ``["null", T]`` unions — the OriginalRecord/MAPRecord subset.
Parallelism is per FILE (binaryFile rows are not block-splittable); write
many files for wide scans, exactly like the reference's multi-part Avro
output dirs. Per-record decode cost is Python-interpreter-bound — for
bulk production use, ship the spark-avro jar and use ``sources/io.py``;
this path is the no-jar-available fallback and the semantic reference.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

MAGIC = b"Obj\x01"
_SYNC_SIZE = 16


# ----------------------------------------------------------- binary primitives
def _encode_long(n: int) -> bytes:
    """Zigzag varint (Avro long/int encoding)."""
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        buf, pos = self.buf, self.pos
        b = buf[pos]
        n = b & 0x7F
        shift = 7
        while b & 0x80:
            pos += 1
            b = buf[pos]
            n |= (b & 0x7F) << shift
            shift += 7
        self.pos = pos + 1
        return (n >> 1) ^ -(n & 1)

    def bytes_(self) -> bytes:
        ln = self.long()
        out = self.buf[self.pos : self.pos + ln]
        self.pos += ln
        return out

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


# ------------------------------------------------------------- schema helpers
def _normalize(schema):
    """Resolve the schema json into a simple recursive form."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return [_normalize(s) for s in schema]
    return schema


def _make_decoder(schema):
    """Compile an avro schema (parsed json) into a decode(Reader) closure."""
    schema = _normalize(schema)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda r: None
        if t == "boolean":
            return lambda r: r.raw(1) == b"\x01"
        if t in ("int", "long"):
            return lambda r: r.long()
        if t == "float":
            return lambda r: struct.unpack("<f", r.raw(4))[0]
        if t == "double":
            return lambda r: struct.unpack("<d", r.raw(8))[0]
        if t == "bytes":
            return lambda r: r.bytes_()
        if t == "string":
            return lambda r: r.bytes_().decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union
        branches = [_make_decoder(s) for s in schema]

        def dec_union(r, branches=branches):
            return branches[r.long()](r)

        return dec_union
    t = schema["type"]
    if t == "record":
        field_decs = [_make_decoder(f["type"]) for f in schema["fields"]]
        names = [f["name"] for f in schema["fields"]]

        def dec_record(r, field_decs=field_decs, names=names):
            return {n: d(r) for n, d in zip(names, field_decs)}

        return dec_record
    if t == "array":
        item = _make_decoder(schema["items"])

        def dec_array(r, item=item):
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    r.long()
                for _ in range(n):
                    out.append(item(r))

        return dec_array
    if t == "map":
        val = _make_decoder(schema["values"])

        def dec_map(r, val=val):
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(n):
                    k = r.bytes_().decode("utf-8")
                    out[k] = val(r)

        return dec_map
    if t == "enum":
        syms = schema["symbols"]
        return lambda r, syms=syms: syms[r.long()]
    if t in ("int", "long", "string", "bytes", "float", "double", "boolean", "null"):
        return _make_decoder(t)  # {"type": "long"} form
    raise ValueError(f"unsupported avro type {t!r}")


def _make_encoder(schema):
    """Compile an avro schema into an encode(value, out: bytearray) closure."""
    schema = _normalize(schema)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda v, o: None
        if t == "boolean":
            return lambda v, o: o.append(1 if v else 0)
        if t in ("int", "long"):
            return lambda v, o: o.extend(_encode_long(int(v)))
        if t == "float":
            return lambda v, o: o.extend(struct.pack("<f", float(v)))
        if t == "double":
            return lambda v, o: o.extend(struct.pack("<d", float(v)))
        if t == "bytes":
            return lambda v, o: (o.extend(_encode_long(len(v))), o.extend(v))
        if t == "string":

            def enc_str(v, o):
                b = v.encode("utf-8")
                o.extend(_encode_long(len(b)))
                o.extend(b)

            return enc_str
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union — assume ["null", T] (our writer shape)
        if len(schema) == 2 and _normalize(schema[0]) == "null":
            enc_val = _make_encoder(schema[1])

            def enc_union(v, o, enc_val=enc_val):
                if v is None:
                    o.extend(_encode_long(0))
                else:
                    o.extend(_encode_long(1))
                    enc_val(v, o)

            return enc_union
        raise ValueError("only [null, T] unions supported for writing")
    t = schema["type"]
    if t == "record":
        field_encs = [(f["name"], _make_encoder(f["type"])) for f in schema["fields"]]

        def enc_record(v, o, field_encs=field_encs):
            for n, e in field_encs:
                e(v.get(n) if isinstance(v, dict) else getattr(v, n), o)

        return enc_record
    if t == "array":
        item = _make_encoder(schema["items"])

        def enc_array(v, o, item=item):
            if v is None:
                v = []
            if len(v):
                o.extend(_encode_long(len(v)))
                for x in v:
                    item(x, o)
            o.extend(_encode_long(0))

        return enc_array
    if t == "map":
        val = _make_encoder(schema["values"])

        def enc_map(v, o, val=val):
            if v:
                o.extend(_encode_long(len(v)))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    o.extend(_encode_long(len(kb)))
                    o.extend(kb)
                    val(x, o)
            o.extend(_encode_long(0))

        return enc_map
    if t == "enum":
        idx = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda v, o, idx=idx: o.extend(_encode_long(idx[v]))
    if t in ("int", "long", "string", "bytes", "float", "double", "boolean", "null"):
        return _make_encoder(t)
    raise ValueError(f"unsupported avro type {t!r}")


# ------------------------------------------------------------- container file
def read_container_header(blob: bytes) -> tuple[dict, str, bytes, int]:
    """Parse magic + metadata map + sync; return (schema, codec, sync, pos)."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro container file (bad magic)")
    r = _Reader(blob, 4)
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.bytes_().decode("utf-8")
            meta[k] = r.bytes_()
    sync = r.raw(_SYNC_SIZE)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    return schema, codec, sync, r.pos


def decode_container(blob: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file -> (schema_json, rows as dicts)."""
    schema, codec, sync, pos = read_container_header(blob)
    dec = _make_decoder(schema)
    rows: list[dict] = []
    r = _Reader(blob, pos)
    total = len(blob)
    while r.pos < total:
        count = r.long()
        data = r.bytes_()
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        br = _Reader(data)
        for _ in range(count):
            rows.append(dec(br))
        if r.raw(_SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt avro block)")
    return schema, rows


def encode_container(
    schema: dict | str,
    rows,
    codec: str = "null",
    block_rows: int = 4096,
) -> bytes:
    """Encode rows (dicts) into one Avro container blob."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    enc = _make_encoder(schema)
    sync = uuid.uuid4().bytes
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out.write(_encode_long(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_encode_long(len(kb)))
        out.write(kb)
        out.write(_encode_long(len(v)))
        out.write(v)
    out.write(_encode_long(0))
    out.write(sync)
    buf = bytearray()
    n_in_block = 0
    for row in rows:
        enc(row, buf)
        n_in_block += 1
        if n_in_block >= block_rows:
            _flush_block(out, buf, n_in_block, codec, sync)
            buf = bytearray()
            n_in_block = 0
    if n_in_block:
        _flush_block(out, buf, n_in_block, codec, sync)
    return out.getvalue()


def _flush_block(out, buf, count, codec, sync):
    data = bytes(buf)
    if codec == "deflate":
        data = zlib.compress(data)[2:-4]  # raw deflate, no zlib header/adler
    out.write(_encode_long(count))
    out.write(_encode_long(len(data)))
    out.write(data)
    out.write(sync)


# ------------------------------------------------------------- schema mapping
def avro_schema_to_spark(schema) -> "object":
    """Avro schema json -> Spark StructType (inverse of
    ``avro_local.spark_schema_to_avro``)."""
    from pyspark.sql import types as T

    prim = {
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
        "null": T.NullType(),
    }

    def conv(s):
        s = _normalize(s)
        if isinstance(s, str):
            return prim[s]
        if isinstance(s, list):
            non_null = [x for x in s if _normalize(x) != "null"]
            if len(non_null) != 1:
                raise ValueError("only [null, T] unions supported")
            return conv(non_null[0])
        t = s["type"]
        if t == "record":
            return T.StructType(
                [T.StructField(f["name"], conv(f["type"]), True) for f in s["fields"]]
            )
        if t == "array":
            return T.ArrayType(conv(s["items"]), True)
        if t == "map":
            return T.MapType(T.StringType(), conv(s["values"]), True)
        if t == "enum":
            return T.StringType()
        if t in prim:
            return prim[t]
        raise ValueError(f"unsupported avro type {t!r}")

    st = conv(schema)
    from pyspark.sql import types as T2

    if not isinstance(st, T2.StructType):
        raise ValueError("top-level avro schema must be a record")
    return st


# --------------------------------------------------------- distributed read
def read_avro_distributed(spark, path: str):
    """Distributed Avro scan: one binaryFile row per container file, decoded
    executor-side in ``mapInPandas`` (S1 without the spark-avro jar).

    Predicate/column pruning happens AFTER decode (the codec always decodes
    whole records) — same trade the reference accepts by reading whole Avro
    records into case classes. Parallelism = number of container files.
    """
    import glob as _glob

    first = sorted(
        _glob.glob(os.path.join(path, "*.avro"))
        or _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
        or ([path] if os.path.isfile(path) else [])
    )
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as f:
        head = f.read(1 << 20)
    schema, _codec, _sync, _pos = read_container_header(head)
    spark_schema = avro_schema_to_spark(schema)
    cols = [f.name for f in spark_schema.fields]

    bf = spark.read.format("binaryFile").load(
        path if os.path.isfile(path) else os.path.join(path, "*.avro")
    ).select("content")

    def decode_files(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                _s, rows = decode_container(bytes(blob))
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in cols}, columns=cols
                )

    return bf.mapInPandas(decode_files, schema=spark_schema)


# --------------------------------------------------------- distributed write
def write_avro_distributed(
    df,
    out_dir: str,
    codec: str = "null",
    n_files: int | None = None,
) -> list[dict]:
    """Distributed Avro sink: every task encodes its partition into its own
    container file under ``out_dir`` (S2 without the spark-avro jar; the
    executor-writes replacement for the reference's driver Avro spool,
    ``NaraDeltaHarvester.scala:113-126``). Returns the written manifest
    [{path, rows}]."""
    from ingestion3_spark.sources.avro_local import spark_schema_to_avro

    os.makedirs(out_dir, exist_ok=True)
    schema_json = spark_schema_to_avro(df.schema)
    schema = json.loads(schema_json)
    cols = [f.name for f in df.schema.fields]
    if n_files:
        df = df.repartition(n_files)

    def write_part(batches):
        import pandas as pd

        def row_iter():
            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    yield {
                        c: _plain(v) for c, v in zip(cols, t)
                    }

        it = row_iter()
        try:
            first_row = next(it)
        except StopIteration:
            return
        import itertools

        blob = encode_container(schema, itertools.chain([first_row], it), codec=codec)
        fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, fname)
        # count back from the written container (cheap header+block scan)
        n = _count_rows(blob)
        yield pd.DataFrame({"path": [fname], "rows": [n]})

    manifest = [
        r.asDict()
        for r in df.mapInPandas(write_part, "path string, rows long").collect()
    ]
    if not manifest:  # empty df: still materialize schema as one empty file
        blob = encode_container(schema, [], codec=codec)
        fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        with open(fname, "wb") as f:
            f.write(blob)
        manifest = [{"path": fname, "rows": 0}]
    return manifest


def _plain(v):
    """numpy/pandas scalar & array -> plain python for the encoder."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        if np.isnan(v):
            return None
        return float(v)
    if isinstance(v, float) and v != v:  # NaN (pandas null for numeric cols)
        return None
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def _count_rows(blob: bytes) -> int:
    _schema, codec, sync, pos = read_container_header(blob)
    r = _Reader(blob, pos)
    n = 0
    while r.pos < len(blob):
        n += r.long()
        r.bytes_()
        r.raw(_SYNC_SIZE)
    return n
