"""Adversarial crafted-URL pins for the canonicalizer + registered-domain
extraction (r9 verdict ask #3): case, default/mismatched/explicit ports,
%-encoding, utf-8, tracking params, fragments, trailing slashes, www
stripping, PSL longest-match and no-match fallback — plus substrate
liveness for the contract queries (dup groups must exist at every SF;
the x6_ab_test dead-substrate lesson)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swiftbulkuploader_spark.functions.urls import (
    canonical_host,
    canonicalize_url,
    with_registered_domain,
)

SF_SMOKE = "/root/testdata/sf0.001"

# (raw, expected canonical) — each pins one documented rule
CANON_CASES = [
    # scheme + host case, default port drop, fragment drop
    ("HTTP://WWW.Example.COM:80/a/b?x=1#frag", "http://example.com/a/b?x=1"),
    # https default port drop
    ("https://site.org:443/p", "https://site.org/p"),
    # MISMATCHED default port is a real port — kept
    ("https://site.org:80/p", "https://site.org:80/p"),
    ("http://site.org:443/p", "http://site.org:443/p"),
    # explicit non-default port kept
    ("http://site.org:8080/p", "http://site.org:8080/p"),
    # tracking params dropped, survivors byte-sorted, '?' kept
    ("http://a.com/x?z=2&utm_source=f&a=1&fbclid=q&gclid=g&ref=r",
     "http://a.com/x?a=1&z=2"),
    # all params tracking -> '?' dropped
    ("http://a.com/x?utm_campaign=c&fbclid=q", "http://a.com/x"),
    # empty query -> no '?'
    ("http://a.com/x?", "http://a.com/x"),
    # trailing slash stripped once; bare / and empty path -> /
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/", "http://a.com/"),
    ("http://a.com", "http://a.com/"),
    # %-escapes pass through UNCHANGED (no re-encoding, either case)
    ("http://a.com/a%20b/c%2Fd?k=v%26w", "http://a.com/a%20b/c%2Fd?k=v%26w"),
    ("http://a.com/a%2fb", "http://a.com/a%2fb"),
    # raw utf-8 passes through unchanged (quoting pain class:
    # reference prepareupload.py:39-44)
    ("http://a.com/café/日本?q=ü",
     "http://a.com/café/日本?q=ü"),
    # the whole leading www. run stripped (idempotence), not infixes
    ("http://www.www.a.com/x", "http://a.com/x"),
    ("http://wwwa.com/x", "http://wwwa.com/x"),
    # duplicate params both survive, sorted (no dedup of keys)
    ("http://a.com/x?b=2&b=1&a=0", "http://a.com/x?a=0&b=1&b=2"),
]

# (host, expected registered domain)
REGDOM_CASES = [
    ("example.com", "example.com"),
    ("deep.sub.example.com", "example.com"),
    ("b.co.uk", "b.co.uk"),
    ("a.b.co.uk", "b.co.uk"),          # longest suffix wins over .uk
    ("x.ac.uk", "x.ac.uk"),
    ("user.github.io", "user.github.io"),
    ("pages.user.github.io", "user.github.io"),
    ("plain.uk", "plain.uk"),          # 1-label .uk rule
    ("localhost", "localhost"),        # no dot, no rule -> fallback
    ("host.internal", "host.internal"),  # unknown suffix -> fallback
    ("com", "com"),                    # suffix itself, no label left
]


class TestCanonicalizeUrl:
    def test_crafted_urls(self, spark):
        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)],
            "i: int, url: string",
        ).select("i", canonicalize_url(F.col("url")).alias("c"))
        got = {r["i"]: r["c"] for r in df.collect()}
        for i, (raw, want) in enumerate(CANON_CASES):
            assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"

    def test_idempotent(self, spark):
        """canonicalize(canonicalize(u)) == canonicalize(u) on every pin."""
        df = spark.createDataFrame(
            [(i, want) for i, (_, want) in enumerate(CANON_CASES)],
            "i: int, url: string",
        ).select("i", canonicalize_url(F.col("url")).alias("c"))
        got = {r["i"]: r["c"] for r in df.collect()}
        for i, (_, want) in enumerate(CANON_CASES):
            assert got[i] == want


class TestRegisteredDomain:
    def test_crafted_hosts(self, spark):
        df = spark.createDataFrame(
            [(i, h) for i, (h, _) in enumerate(REGDOM_CASES)],
            "i: int, host: string",
        )
        out = with_registered_domain(df, "host")
        got = {r["i"]: r["registered_domain"] for r in out.collect()}
        for i, (h, want) in enumerate(REGDOM_CASES):
            assert got[i] == want, f"{h!r}: {got[i]!r} != {want!r}"

    def test_canonical_host_strips_port_and_www(self, spark):
        df = spark.createDataFrame(
            [("https://WWW.A.b.CO.uk:8443/x?q=1",)], "url: string"
        ).select(canonical_host(F.col("url")).alias("h"))
        assert df.collect()[0]["h"] == "a.b.co.uk"


class TestContractSubstrateLiveness:
    @pytest.fixture(scope="class")
    def dedup_frame(self, spark):
        from swiftbulkuploader_spark.operators.urlops import x1_url_dedup
        return x1_url_dedup(spark, SF_SMOKE).cache()

    def test_dup_groups_alive(self, dedup_frame):
        stats = dedup_frame.agg(
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
            F.countDistinct(
                F.when(F.col("group_size") > 1, F.col("canonical_url"))
            ).alias("n_groups"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        # live on BOTH sides: real dup groups exist AND not everything
        # collapsed into one group
        assert stats["n_dups"] > 0 and stats["n_groups"] > 1
        assert stats["n_dups"] < stats["n"]

    def test_keeper_is_group_min(self, dedup_frame):
        bad = dedup_frame.filter(
            (F.col("is_dup") & (F.col("doc_id") == F.col("keeper_doc")))
            | (~F.col("is_dup") & (F.col("doc_id") != F.col("keeper_doc")))
        ).count()
        assert bad == 0

    def test_domain_stats_alive(self, spark):
        from swiftbulkuploader_spark.operators.urlops import (
            x1_url_domain_stats,
        )
        rows = x1_url_domain_stats(spark, SF_SMOKE).collect()
        doms = {r["registered_domain"] for r in rows}
        # multi-label public suffixes must be live in the substrate
        assert any(d.endswith(".co.uk") for d in doms)
        assert any(d.endswith(".github.io") for d in doms)
        assert len(doms) > 1


class TestUrlRobots:
    def test_rfc_longest_match_semantics(self, spark):
        """Every RFC 9309 branch on the sf0.001 fixture: bucket-1 paths
        re-allowed under the /articles/p disallow (longest match wins),
        %-escaped /articles/a paths disallowed, bucket-4 paths hit the
        equal-length allow/disallow pair and ALLOW wins the tie."""
        from swiftbulkuploader_spark.operators.urlops import x1_url_robots

        rows = {r["doc_id"]: r
                for r in x1_url_robots(spark, SF_SMOKE).collect()}
        assert rows
        for d, r in rows.items():
            if d % 9 == 4:                      # escaped segment class
                assert r["rule"] == "/articles/a" and not r["allowed"]
            elif 100 <= d < 200:                # p1xx bucket: re-allowed
                assert r["rule"] == "/articles/p1" and r["allowed"]
            elif 400 <= d < 500:                # p4 tie: allow wins
                assert r["rule"] == "/articles/p4" and r["allowed"]
            else:                               # the broad /p disallow
                assert r["rule"] == "/articles/p" and not r["allowed"]
        allowed = sum(1 for r in rows.values() if r["allowed"])
        assert 0 < allowed < len(rows)          # both verdicts live


class TestCrawlManifestComposition:
    def test_every_stage_drops_and_manifest_live(self, spark):
        """x10_crawl_manifest liveness (r10 ask #7): the composition is
        only meaningful if each front-end stage actually gates rows at
        the contract SF — URL dedup halves the corpus (canonical
        collisions), robots denies a real share, and the packed
        manifest still carries multiple chunks within budget."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from swiftbulkuploader_spark.operators.training_prep import (
            TOKEN_BUDGET,
        )
        from swiftbulkuploader_spark.operators.urlops import (
            ROBOTS_RULES,
            _canon_frame,
            x10_crawl_manifest,
        )

        sf = "/root/testdata/sf0.01"
        canon = _canon_frame(spark, sf)
        n_docs = canon.count()
        w = Window.partitionBy("canonical_url")
        keepers = canon.select(
            "doc_id", "canonical_url",
            F.min("doc_id").over(w).alias("k"),
        ).filter("doc_id = k")
        n_keep = keepers.count()
        path = F.regexp_extract(
            F.col("canonical_url"),
            "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1,
        )
        rules = spark.createDataFrame(
            list(ROBOTS_RULES), "rule string, allow boolean"
        )
        hit = keepers.select("doc_id", path.alias("path")).join(
            F.broadcast(rules),
            F.col("path").startswith(F.col("rule")), "left",
        )
        wr = Window.partitionBy("doc_id").orderBy(
            F.length("rule").desc(), F.col("allow").desc(),
            F.col("rule").asc(),
        )
        n_adm = (
            hit.withColumn("rn", F.row_number().over(wr))
            .filter("rn = 1")
            .filter(F.coalesce(F.col("allow"), F.lit(True)))
            .count()
        )
        # every front-end stage gates: 500 -> 250 -> 78 at sf0.01
        assert n_docs > n_keep > n_adm > 0

        rows = x10_crawl_manifest(spark, sf).collect()
        assert len(rows) > 1                       # multiple chunks live
        assert sum(r["n_docs"] for r in rows) <= n_adm  # content gates too
        for r in rows:
            assert r["n_docs"] > 0 and r["chunk_tokens"] > 0
