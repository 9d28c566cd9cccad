"""Format round-trips: the same manifest through parquet/orc/json/csv reads
back value-identical with explicit schemas; streaming dedup drops in-window
duplicates only.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftbulkuploader_spark.sources.formats import FORMATS, read_table, write_table

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("mtime", T.TimestampType()),
    T.StructField("uploaded", T.BooleanType()),
])

ROWS = [
    (1, "/a/x.txt", 10, datetime.datetime(2024, 1, 1, 12, 0, 0), False),
    (2, "/b/it's \"quoted\", with commas.txt", 0, datetime.datetime(2024, 6, 15, 23, 59, 59), True),
    (3, "/c/文件.bin", 2**40, None, False),
    (4, None, None, None, None),
]


@pytest.mark.parametrize("fmt", FORMATS)
def test_round_trip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, SCHEMA)
    assert back.schema == SCHEMA
    got = sorted([tuple(r) for r in back.collect()], key=str)
    want = sorted(ROWS, key=str)
    assert got == want, fmt


def test_adversarial_string_round_trip(spark, tmp_path):
    """Batched adversarial round-trip (property-style, one Spark pass per
    format): strings with commas, both quote styles, newlines, tabs,
    backslashes, unicode — the reference's own pain points
    (prepareupload.py:39-44) — must survive csv and json exactly."""
    import random

    rnd = random.Random(1234)
    pieces = [
        "plain", "comma,inside", 'quote"double', "quote'single", "both'\"",
        "new\nline", "tab\tchar", "back\\slash", "文件名", "café",
        " lead", "trail ", "", "x" * 200, "\\n literal", '"""', ",,,",
    ]
    rows = []
    for i in range(200):
        s = "".join(rnd.choice(pieces) for _ in range(rnd.randint(1, 4)))
        rows.append((i, s))
    schema_t = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
    ])
    df = spark.createDataFrame(rows, schema_t)
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"adv_{fmt}")
        write_table(df, path, fmt)
        back = read_table(spark, path, fmt, schema_t)
        got = {r["id"]: r["s"] for r in back.collect()}
        want = dict(rows)
        # empty string: csv cannot distinguish "" from null (both unquoted
        # empty field) — normalize that one case, assert the rest exact
        if fmt == "csv":
            want = {k: (v if v != "" else None) for k, v in want.items()}
            got = {k: (v if v != "" else None) for k, v in got.items()}
        assert got == want, fmt


def test_binary_column_round_trip(spark, tmp_path):
    """BinaryType survives parquet exactly (the media-column contract)."""
    rows = [(1, b"\x00\x01\xff:COLON:"), (2, b""), (3, None)]
    schema_t = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ])
    path = str(tmp_path / "bin")
    spark.createDataFrame(rows, schema_t).write.parquet(path)
    got = {r["id"]: (bytes(r["data"]) if r["data"] is not None else None)
           for r in spark.read.parquet(path).collect()}
    assert got == {1: b"\x00\x01\xff:COLON:", 2: b"", 3: None}


def test_schema_evolution_additive(spark, tmp_path):
    """Files written before a column existed read as null under the current
    catalog schema — both via explicit projection (no footer scan) and via
    mergeSchema (exploratory path)."""
    from pyspark.sql import types as T

    from swiftbulkuploader_spark.sources.formats import read_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id: long, path: string") \
        .write.mode("append").parquet(path)
    spark.createDataFrame([(2, "b", 99)], "id: long, path: string, size: long") \
        .write.mode("append").parquet(path)

    current = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
    ])
    for df in (read_evolved(spark, path, current), read_evolved(spark, path)):
        rows = {r["id"]: (r["path"], r["size"]) for r in df.collect()}
        assert rows == {1: ("a", None), 2: ("b", 99)}


def test_tolerant_read_quarantines_corrupt_rows(spark, tmp_path):
    """One malformed line must become a quarantine ROW, not a job failure;
    clean rows parse normally alongside it."""
    from pyspark.sql import types as T

    from swiftbulkuploader_spark.sources.formats import read_tolerant

    path = tmp_path / "raw.json"
    path.write_text(
        '{"id": 1, "path": "/a"}\n'
        'THIS IS NOT JSON\n'
        '{"id": 3, "path": "/c"}\n'
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("path", T.StringType()),
    ])
    df = read_tolerant(spark, str(path), "json", schema).cache()
    clean = df.filter("_corrupt_record IS NULL")
    quarantined = df.filter("_corrupt_record IS NOT NULL")
    assert {r["id"] for r in clean.collect()} == {1, 3}
    assert quarantined.count() == 1
    assert "NOT JSON" in quarantined.first()["_corrupt_record"]
    df.unpersist()


def test_tolerant_read_accepts_what_write_table_wrote(spark, tmp_path):
    """Well-formed rows from write_table (incl. embedded newlines) must NOT
    be quarantined by the tolerant csv reader."""
    from pyspark.sql import types as T

    from swiftbulkuploader_spark.sources.formats import read_tolerant

    schema_t = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
    ])
    df = spark.createDataFrame([(1, "line one\nline two"), (2, "plain")], schema_t)
    path = str(tmp_path / "clean_csv")
    write_table(df, path, "csv")
    back = read_tolerant(spark, path, "csv", schema_t).cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    assert {r["id"]: r["s"] for r in back.collect()} == {
        1: "line one\nline two", 2: "plain"
    }
    back.unpersist()


def test_bad_format_rejected(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), "avro")


class TestStreamingDedup:
    def test_in_window_duplicates_dropped(self, spark, tmp_path):
        from swiftbulkuploader_spark.streaming.dedup_stream import stream_dedup_exact

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, "same text", t0),
            (2, "same   TEXT", t0 + datetime.timedelta(minutes=5)),   # dup (normalized)
            (3, "different entirely", t0 + datetime.timedelta(minutes=6)),
            (4, "same text", t0 + datetime.timedelta(minutes=10)),    # dup again
        ]
        src = str(tmp_path / "docs")
        spark.createDataFrame(rows, "doc_id: long, text: string, ts: timestamp").write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
        q = (
            stream_dedup_exact(stream)
            .writeStream.format("memory").queryName("deduped")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM deduped").collect())
        # exactly ONE of the three same-fingerprint copies survives (which
        # one is arbitrary within a micro-batch), plus the distinct doc
        assert len(kept) == 2
        assert 3 in kept
        assert len({1, 2, 4} & set(kept)) == 1
