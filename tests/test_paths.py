"""F1-F5 path/key transforms — including the reference's own pain points
(quotes, unicode, leading slashes; prepareupload.py:39-44, bulkupload.py:44-45).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from swiftbulkuploader_spark.functions.paths import (
    object_key,
    path_basename,
    path_cutoff,
    path_join,
    segment_name,
    strip_leading_slash,
)


def _one(spark, col) -> str:
    return spark.range(1).select(col.alias("v")).first()["v"]


def _apply(spark, fn, path: str, *args) -> str:
    return spark.createDataFrame([(path,)], "p: string").select(
        fn(F.col("p"), *args).alias("v")
    ).first()["v"]


class TestCutoff:
    def test_strips_through_component(self, spark):
        # the reference's readme example (readme.md:58-67): intent, not lstrip
        assert _apply(spark, path_cutoff, "/Users/John/Doe/assets/x.txt", "Doe") == "assets/x.txt"

    def test_charset_bug_not_replicated(self, spark):
        # str.lstrip("Doe") would eat the leading 'e' of 'everything'
        assert _apply(spark, path_cutoff, "/Doe/everything.txt", "Doe") == "everything.txt"

    def test_absent_cutoff_is_identity(self, spark):
        assert _apply(spark, path_cutoff, "/a/b/c.txt", "zzz") == "/a/b/c.txt"

    def test_empty_cutoff_is_identity(self, spark):
        assert _apply(spark, path_cutoff, "/a/b/c.txt", "") == "/a/b/c.txt"

    def test_regex_metachars_in_cutoff(self, spark):
        assert _apply(spark, path_cutoff, "/data/v1.2+x/files/f.bin", "v1.2+x") == "files/f.bin"

    def test_first_occurrence_only(self, spark):
        assert _apply(spark, path_cutoff, "/a/cut/b/cut/c.txt", "cut") == "b/cut/c.txt"


class TestSlashAndKey:
    def test_strip_one_leading_slash(self, spark):
        assert _apply(spark, strip_leading_slash, "/a/b") == "a/b"
        assert _apply(spark, strip_leading_slash, "a/b") == "a/b"

    def test_object_key_composition(self, spark):
        assert _apply(spark, object_key, "/srv/data/x/y.bin", "data") == "x/y.bin"
        assert _apply(spark, object_key, "/srv/data/x/y.bin") == "srv/data/x/y.bin"

    @pytest.mark.parametrize("path", [
        "/a/it's here/f.txt",
        '/a/say "hi"/f.txt',
        """/a/both'and"quotes/f.txt""",
        "/данные/файл.txt",
        "/数据/文件.txt",
    ])
    def test_adversarial_paths_survive(self, spark, path):
        # the reference error-logs paths with both quote styles
        # (olrcdb.py:54-70); here they are plain data
        out = _apply(spark, object_key, path)
        assert out == path.lstrip("/") or out == path[1:]


class TestJoinBasenameSegment:
    def test_join(self, spark):
        df = spark.createDataFrame([("/base", "f.txt")], "d: string, n: string")
        assert df.select(path_join(F.col("d"), F.col("n")).alias("v")).first()["v"] == "/base/f.txt"

    def test_join_absolute_name_overrides(self, spark):
        df = spark.createDataFrame([("/base", "/abs/f.txt")], "d: string, n: string")
        assert df.select(path_join(F.col("d"), F.col("n")).alias("v")).first()["v"] == "/abs/f.txt"

    def test_basename(self, spark):
        assert _apply(spark, path_basename, "/a/b/c.txt") == "c.txt"

    def test_segment_name_padding(self, spark):
        df = spark.createDataFrame([("f.bin", 7)], "b: string, n: int")
        got = df.select(segment_name(F.col("b"), F.col("n")).alias("v")).first()["v"]
        assert got == "f.bin-0007.txt"


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"), min_size=1, max_size=50))
def test_strip_leading_slash_law(path):
    """Property: output never starts with '/' unless input was '//...'."""
    import re

    out = re.sub("^/", "", path)  # mirror of the Column expression
    assert not out.startswith("/") or path.startswith("//")


class TestPropertiesOnSpark:
    """Property-style laws driven through the ACTUAL Column expressions,
    batched into one DataFrame pass (hypothesis-per-example would pay a
    Spark job each)."""

    def test_object_key_laws_on_adversarial_batch(self, spark):
        import random

        rnd = random.Random(99)
        pieces = ["data", "v1.2+x", "it's", 'say "hi"', "文件", "café",
                  "a b", "x" * 50, "-", "_", "0", "dir.with.dots"]
        paths = []
        for i in range(200):
            depth = rnd.randint(1, 6)
            paths.append("/" + "/".join(rnd.choice(pieces) for _ in range(depth)))
        cutoff = "data"
        df = spark.createDataFrame([(p,) for p in paths], "p: string")
        rows = df.select(
            "p",
            object_key(F.col("p"), cutoff).alias("key"),
            object_key(F.col("p")).alias("key_nocut"),
            path_basename(F.col("p")).alias("base"),
        ).collect()
        for r in rows:
            # law 1: keys never start with '/'
            assert not r["key"].startswith("/"), r["p"]
            # law 2: no cutoff -> key is exactly the path minus ONE slash
            assert r["key_nocut"] == r["p"][1:], r["p"]
            # law 3: key is always a suffix of the original path
            assert r["p"].endswith(r["key"]) or r["key"] == r["p"][1:], r["p"]
            # law 4: basename is the final component
            assert r["base"] == r["p"].rsplit("/", 1)[-1], r["p"]
