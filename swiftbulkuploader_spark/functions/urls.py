"""URL canonicalization + registered-domain extraction primitives
(SURVEY.md §2.9 X1 extension; r9 verdict ask #3). URL-level dedup is the
FIRST dedup stage of a web-crawl pipeline — it runs before any content
screen, so these are native string/array expressions end-to-end
(JVM-side, whole-stage codegen for the regex/concat parts; the one
higher-order `filter` over query params is interpreted but runs on a
handful of short strings per row).

Canonical form (the documented contract, pinned on adversarial crafted
URLs in tests/test_urlops.py):

* scheme and host lowercased; the leading run of ``www.`` labels stripped (idempotent)
* default ports dropped (``:80`` for http, ``:443`` for https); any
  other explicit port kept — including a MISMATCHED default (``:80`` on
  https is a real port)
* fragment dropped
* tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
  surviving params byte-sorted; the ``?`` dropped when none survive
* one trailing slash stripped; empty path and bare ``/`` normalize to
  ``/``
* percent-escapes and non-ASCII bytes pass through UNCHANGED — no
  re-encoding, so canonicalization never changes what the server sees
  (the reference's own path-quoting pain class: prepareupload.py:39-44
  fought exactly this with urllib.quote round-trips)

Registered-domain extraction is the scale-correct shape: the host's own
trailing-label candidates (last 1..K labels) are EXPLODED and equi-joined
against a broadcast public-suffix rules table — a hash join keyed on the
candidate string, never a per-suffix scan or a non-equi endswith join
over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params dropped by canonicalization (prefix match on "key=" form;
# utm_* covers utm_source/medium/campaign/term/content)
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

# public-suffix-style rules (a bounded broadcast table; the real PSL is
# ~10k rows — same plan shape). Multi-label suffixes make the longest-
# match requirement real: host a.b.co.uk registers b.co.uk, not co.uk.
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "uk", "co.uk", "ac.uk", "github.io",
)

# candidate trailing-label windows generated per host (real PSL needs 4-5)
MAX_SUFFIX_LABELS = 3

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def url_scheme(u: Column) -> Column:
    return F.regexp_extract(u, _SCHEME_RE, 1)


def url_host(u: Column) -> Column:
    """Hostname (no port, original case)."""
    return F.regexp_extract(F.regexp_extract(u, _AUTH_RE, 1), r"^([^:]*)", 1)


def url_port(u: Column) -> Column:
    """Explicit port digits, or '' when none."""
    return F.regexp_extract(
        F.regexp_extract(u, _AUTH_RE, 1), r":([0-9]+)$", 1
    )


def url_path(u: Column) -> Column:
    return F.regexp_extract(u, _PATH_RE, 1)


def url_query(u: Column) -> Column:
    """Raw query string (no '?'), or '' when none."""
    return F.regexp_extract(u, r"\?([^#]*)", 1)


def canonical_host(u: Column) -> Column:
    """Lowercased host with the leading www. label run stripped."""
    return F.regexp_replace(F.lower(url_host(u)), r"^(www\.)+", "")


def _keep_param(p: Column) -> Column:
    drop = p == ""
    for pre in TRACKING_PREFIXES:
        drop = drop | p.startswith(pre)
    return ~drop


def canonical_query(u: Column) -> Column:
    """Surviving params, byte-sorted, '&'-joined; '' when none."""
    return F.array_join(
        F.array_sort(F.filter(F.split(url_query(u), "&"), _keep_param)),
        "&",
    )


def canonicalize_url(u: Column) -> Column:
    """The canonical form of an absolute http(s) URL (module contract
    above). Inputs without a scheme://host are not defined."""
    scheme = F.lower(url_scheme(u))
    host = canonical_host(u)
    port = url_port(u)
    port_c = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = url_path(u)
    path_c = F.when(path.isin("", "/"), F.lit("/")).otherwise(
        F.regexp_replace(path, "/$", "")
    )
    qs = canonical_query(u)
    return F.concat(
        scheme, F.lit("://"), host, port_c, path_c,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def suffix_rules_df(spark) -> DataFrame:
    """(suffix, n_labels) — the broadcast public-suffix table."""
    rows = [(s, s.count(".") + 1) for s in PUBLIC_SUFFIXES]
    return spark.createDataFrame(rows, "suffix: string, n_labels: int")


def with_registered_domain(df: DataFrame, host_col: str,
                           out_col: str = "registered_domain") -> DataFrame:
    """Append the registered domain (public suffix + one label) of
    ``host_col`` via the candidate-suffix equi-join. Hosts matching no
    rule fall back to the host itself (coalesce — never NULL).

    Plan: one broadcast HASH join per candidate arity k=1..K — the
    host's trailing-k-label string (a PROPER suffix needs a label to its
    left, hence the n > k guard) equi-joined against the k-label rules
    slice. No explode, no groupBy, no corpus shuffle: K bounded
    broadcast joins and a CASE picking the longest match. This is the
    shape that survives 100 TB — the 10k-row real PSL broadcasts the
    same way."""
    spark = df.sparkSession
    rules = suffix_rules_df(spark)

    def _labels() -> Column:
        return F.split(F.col(host_col), r"\.")

    out = df
    for k in range(1, MAX_SUFFIX_LABELS + 1):
        cand_k = F.when(
            F.size(_labels()) > k,
            F.array_join(F.slice(_labels(), -k, k), "."),
        )
        rules_k = rules.filter(F.col("n_labels") == k).select(
            F.col("suffix").alias(f"_sfx{k}")
        )
        out = out.join(
            F.broadcast(rules_k), cand_k == F.col(f"_sfx{k}"), "left"
        )
    reg = F.col(host_col)
    for k in range(1, MAX_SUFFIX_LABELS + 1):
        reg = F.when(
            F.col(f"_sfx{k}").isNotNull(),
            F.array_join(F.slice(_labels(), -(k + 1), k + 1), "."),
        ).otherwise(reg)
    return out.withColumn(out_col, reg).drop(
        *[f"_sfx{k}" for k in range(1, MAX_SUFFIX_LABELS + 1)]
    )
