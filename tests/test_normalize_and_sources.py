"""Units for normalization/date kernels (reference-parity pairs mirroring
StringNormalizationUtilsTest.scala / DateBuilderTest.scala), sources/sinks,
reports, and the streaming front-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestion3_spark.cdc.generator import make_events, to_spark
from ingestion3_spark.cdc.replay import ReplayEngine
from ingestion3_spark.functions import normalize as N
from ingestion3_spark.operators import reports
from ingestion3_spark.sources.io import (
    PagedCursorSource,
    count_jsonl,
    read_jsonl,
    write_csv_log,
    write_jsonl_gz,
)


def _one(spark, expr, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(expr("s").alias("out")).collect()[0]["out"]


CASES = [
    (N.reduce_whitespace, "a \t\n b  c ", "a b c"),
    (N.cleanup_leading_punctuation, ";-, hello", "hello"),
    (N.cleanup_ending_punctuation, "hello ;-,", "hello"),
    (N.cleanup_ending_comma_and_space, "hello, ", "hello"),
    (N.strip_ending_period, "hello.", "hello"),
    (N.strip_ending_period, "hello..", "hello.."),
    (N.capitalize_first_char, "...hello world", "...Hello world"),
    (N.capitalize_first_char, "123", "123"),
    (N.strip_dbl_quotes, 'say "hi" now', "say hi now"),
    (N.strip_unmatched_opening_brackets, "[abc", "abc"),
    (N.strip_unmatched_opening_brackets, "[abc]", "[abc]"),
    (N.strip_unmatched_closing_brackets, "abc]", "abc"),
    (N.cleanup_geocoordinates, "35.58N, 83.50W", "35.58, 83.50"),
    (N.cleanup_geocoordinates, "not coords", ""),
    (N.strip_html, "<p>Hello &amp; <b>world</b></p>", "Hello & world"),
    (N.convert_to_sentence_case, "see spot. see spot run.", "See spot. See spot run"),
    (N.normalize_rights_uri, "https://www.rightsstatements.org/page/NoC-US/1.0/?lang=en",
     "http://rightsstatements.org/vocab/NoC-US/1.0/"),
]


@pytest.mark.parametrize("fn,inp,expected", CASES, ids=[f"{f.__name__}:{i[:12]}" for f, i, _ in CASES])
def test_normalization_parity(spark, fn, inp, expected):
    assert _one(spark, fn, inp) == expected


def test_split_at_delimiter(spark):
    df = spark.createDataFrame([("a; b ;; c",)], "s string")
    assert df.select(N.split_at_delimiter("s").alias("o")).collect()[0]["o"] == ["a", "b", "c"]


DATE_CASES = [
    ("1984", ("1984", "1984")),
    ("1984-1990", ("1984", "1990")),
    ("1984 - 1990", ("1984", "1990")),
    ("1950s", ("1950", "1959")),
    ("circa 1920", ("1920", "1920")),
    ("c. 1920", ("1920", "1920")),
    ("2001-05", ("2001-05", "2001-05")),
    ("2001-05-09", ("2001-05-09", "2001-05-09")),
    ("unknown", (None, None)),
]


@pytest.mark.parametrize("inp,expected", DATE_CASES, ids=[c[0] for c in DATE_CASES])
def test_date_begin_end(spark, inp, expected):
    got = _one(spark, N.date_begin_end, inp)
    assert (got["begin"], got["end"]) == expected


EDTF_CASES = [
    ("1984?", ("1984", "1984")),
    ("1984~", ("1984", "1984")),
    ("198u", ("1980", "1989")),
    ("19uu", ("1900", "1999")),
    ("1984/1985", ("1984", "1985")),
    ("1984-06/1984-08", ("1984-06", "1984-08")),
    ("gibberish", (None, None)),
    # EDTF level-2 additions (round 3): seasons, qualified/unknown/open
    # intervals, timestamps, remaining unspecified forms — semantics from
    # utils/EDTFDate.scala:115-218 ('' = matched-but-unbounded endpoint)
    ("1984-21", ("1984", "1984")),           # spring -> bare year (clean)
    ("1984-24", ("1984", "1984")),           # winter
    ("1984?~", ("1984", "1984")),            # stacked qualifiers
    ("1984?/1986~", ("1984", "1986")),       # qualified interval
    ("1984-06~/1984-08?", ("1984-06", "1984-08")),
    ("unknown/2000~", ("", "2000")),         # unknown begin
    ("1973/unknown", ("1973", "")),          # unknown end
    ("1973/open", ("1973", "")),             # open interval
    ("1984-05-12T10:30:00Z", ("1984-05-12", "1984-05-12")),
    ("1984-05-12T10:30:00+05:00", ("1984-05-12", "1984-05-12")),
    ("1984-05-uu", ("1984-05", "1984-05")),  # unspecified day
    ("1984-uu-uu", ("1984-01-01", "1984-12-31")),
    ("1984-uu", ("", "")),                   # matched, unspecified range
    ("1984-22/1985-23", ("1984", "1985")),   # seasons inside an interval
]


@pytest.mark.parametrize("inp,expected", EDTF_CASES, ids=[c[0] for c in EDTF_CASES])
def test_edtf_begin_end(spark, inp, expected):
    got = _one(spark, N.edtf_begin_end, inp)
    assert (got["begin"], got["end"]) == expected


def test_allow_block_filters(spark):
    df = spark.createDataFrame([(["3 pages", "ill.", "12 x 9 cm", "maps"],)], "a array<string>")
    allowed = df.select(
        N.apply_allow_filter("a", [r"\d+\s*pages?", r"\d+\s*x\s*\d+\s*cm"]).alias("o")
    ).collect()[0]["o"]
    assert allowed == ["3 pages", "12 x 9 cm"]
    blocked = df.select(N.apply_block_filter("a", [r"ill\.", r"maps"]).alias("o")).collect()[0]["o"]
    assert blocked == ["3 pages", "12 x 9 cm"]


URI_CASES = [
    (N.uri_is_valid, "http://example.org/x", True),
    (N.uri_is_valid, "not a uri", False),
    (N.has_bare_ip_host, "http://192.168.0.1/item/7", True),
    (N.has_bare_ip_host, "https://[2001:db8::1]:8080/x", True),
    (N.has_bare_ip_host, "http://example.org/192.168.0.1", False),
    (N.is_recognized_rights_uri, "http://rightsstatements.org/vocab/NoC-US/1.0/", True),
    (N.is_recognized_rights_uri, "http://creativecommons.org/licenses/by-sa/4.0/", True),
    (N.is_recognized_rights_uri, "http://example.org/rights/", False),
]


@pytest.mark.parametrize(
    "fn,inp,expected", URI_CASES, ids=[f"{f.__name__}:{i[:24]}" for f, i, _ in URI_CASES]
)
def test_uri_validation(spark, fn, inp, expected):
    assert _one(spark, fn, inp) is expected


# ------------------------------------------------------------ sources/sinks
def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    path = str(tmp_path / "out.jsonl")
    write_jsonl_gz(df, path)
    assert count_jsonl(spark, path) == 2
    back = read_jsonl(spark, path, "id int, s string")
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_csv_log_single_file(spark, tmp_path):
    df = spark.createDataFrame([("e1", "error"), ("e2", "warn")], "id string, level string")
    path = str(tmp_path / "logs")
    write_csv_log(df, path)
    import glob

    files = glob.glob(f"{path}/*.csv")
    assert len(files) == 1
    assert spark.read.option("header", "true").csv(path).count() == 2


def test_paged_cursor_source_resumes(spark, tmp_path):
    pages = {None: ([{"id": 1}, {"id": 2}], "t1"), "t1": ([{"id": 3}], "t2"), "t2": ([{"id": 4}], None)}
    calls = []

    def fetch(token):
        calls.append(token)
        return pages[token]

    spool = str(tmp_path / "spool")
    src = PagedCursorSource(spool, fetch)
    assert src.harvest(max_pages=2) == 2  # partial harvest, cursor saved

    src2 = PagedCursorSource(spool, fetch)  # simulated restart
    assert src2.harvest() == 1  # resumes at t2, not from scratch
    assert calls == [None, "t1", "t2"]
    assert sorted(r["id"] for r in src2.to_df(spark).collect()) == [1, 2, 3, 4]


# ---------------------------------------------------------------- reports
def test_reports(spark, tmp_table_path, tmp_path):
    from ingestion3_spark.cdc.merge import lineage_df

    table = ReplayEngine.create_table(spark, tmp_table_path, num_buckets=4)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    ev = make_events(2000, n_base_docs=0, seed=13, n_parts=2, max_len=16)
    eng.replay(to_spark(spark, ev), num_batches=2)

    lin = lineage_df(table)
    log = reports.ops_log(lin)
    assert log.count() == 2  # one row per batch
    summary = reports.merge_summary_text(
        lin, 0, sum(e.rows for e in table.live_files())
    )
    assert "[OK]" in summary

    msgs = eng.errors_df().select(F.inline("messages"))
    if msgs.count():
        top = reports.message_field_summary(msgs).collect()[0]
        assert top["message"] == "null tokens on non-delete"
        assert reports.distinct_id_count(msgs) > 0

    comp = reports.completeness_report(table.read(), ["tokens", "n_tok", "source"]).collect()[0]
    assert comp["mean_completeness"] == 1.0

    freq = reports.value_frequency_report(
        table.read().select(F.array("source").alias("v")), "v"
    )
    assert freq.count() == 5  # the five sources


# ---------------------------------------------------------------- streaming
def test_stream_replay_file_feed(spark, tmp_table_path, tmp_path):
    from ingestion3_spark.cdc.generator import write_fixture
    from ingestion3_spark.cdc.oracle import diff_states, replay_oracle, table_state
    from ingestion3_spark.streaming.stream_replay import file_feed_stream, stream_replay

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    ev1 = make_events(1500, n_base_docs=0, seed=17, n_parts=2, max_len=16)
    ev2 = make_events(1500, n_base_docs=900, seed=18, n_parts=2, max_len=16, start_seq=10_001)
    write_fixture(str(feed_dir / "drop1.parquet"), ev1)
    write_fixture(str(feed_dir / "drop2.parquet"), ev2)

    table = ReplayEngine.create_table(spark, tmp_table_path, num_buckets=4)
    eng = ReplayEngine(spark, table, error_dir=str(tmp_path / "err"))
    stream = file_feed_stream(spark, str(feed_dir), max_files_per_trigger=1)
    q = stream_replay(eng, stream, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)

    import pyarrow as pa

    both = pa.concat_tables([ev1, ev2])
    expected = replay_oracle(None, both)
    actual = table_state([r.asDict() for r in table.read().collect()])
    assert not diff_states(expected, actual)
    # micro-batches committed with checkpointed offsets
    assert table.checkpoint()[0] > 10_000


def test_avro_driver_roundtrip(spark, tmp_path):
    """S1/S2 verified: a real Avro container round-trip via the avro jar on
    Spark's classpath (the spark-avro DataSource jar is absent in this
    sandbox; sources/io.py read_avro/write_avro cover it on real clusters)."""
    from ingestion3_spark.sources.avro_local import (
        read_avro_driver, write_avro_driver,
    )

    df = spark.createDataFrame(
        [
            ("doc-1", [1, 2, 3], 3, "cc"),
            ("doc-2", None, None, "wiki"),
            ("doc-3", [], 0, None),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    path = str(tmp_path / "round.avro")
    n = write_avro_driver(df, path)
    assert n == 3
    back = read_avro_driver(spark, path, df.schema)
    assert back.schema == df.schema
    a = sorted([r.asDict() for r in df.collect()], key=lambda r: r["doc_id"])
    b = sorted([r.asDict() for r in back.collect()], key=lambda r: r["doc_id"])
    assert a == b
