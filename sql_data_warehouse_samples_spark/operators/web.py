"""URL/domain curation for web-scale corpora (L-w1).

Every public web-corpus pipeline gates documents on their source URL
before any content filter runs — C4 drops pages from a bad-word domain
list (Raffel et al. 2020, §2.2) and RefinedWeb's first stage is URL
filtering against a curated blocklist + domain scoring (Penedo et al.
2023, §3.1).  The reference warehouse has no URL surface (BI facts), so
this is driver-mandate §2.15 territory: the operators below are the
Spark-native building blocks, exercised on synthetic frames in
tests/test_operators.py.

Scale shape: everything is a pure-Column projection (``parse_url`` is a
JVM builtin — no Python in the hot path) except the blocklist gate,
which is a BROADCAST anti-join: blocklists are small (10⁴–10⁶ domains ≈
MBs) against a 100 TB corpus, so the big side never shuffles.  Matching
is by REGISTERED domain, so ``evil.example.co.uk`` is caught by a
blocklist entry ``example.co.uk`` without the O(labels) explode a
suffix-walk join would cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multi-label public suffixes the 2-label heuristic must extend —
#: the high-traffic subset (a full public-suffix-list snapshot drops in
#: via the ``extra_suffixes`` argument without changing the operator)
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_host(url: Column | str) -> Column:
    """Lower-cased host of a URL (empty/NULL-safe; ``parse_url`` is the
    JVM builtin — stays inside whole-stage codegen)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for dedup keys: lower-cased scheme+host, default
    ports and fragments stripped, tracking parameters (utm_*, fbclid,
    gclid) removed, trailing slash trimmed.  Near-dup URL variants
    (``HTTP://Site.com/a?utm_source=x#frag`` vs ``http://site.com/a``)
    collapse to one key — the URL-level analogue of content-hash dedup."""
    c = F.col(url) if isinstance(url, str) else url
    # scheme+host lowered, rest untouched
    c = F.regexp_replace(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)",
                         F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)))
    c = F.regexp_replace(c, r"#.*$", "")                      # fragment
    c = F.regexp_replace(c, r"(:80)(?=/|$|\?)", "")           # default ports
    c = F.regexp_replace(c, r"(:443)(?=/|$|\?)", "")
    # tracking params (with their separator); if the leading '?' went
    # with them, promote the first surviving '&' back to '?'
    c = F.regexp_replace(c, r"[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "")
    c = F.regexp_replace(c, r"^([^?]*)&", r"$1?")
    c = F.regexp_replace(c, r"[?&]$", "")
    c = F.regexp_replace(c, r"/$", "")
    return c


def registered_domain(
    host: Column | str,
    extra_suffixes: tuple[str, ...] = (),
) -> Column:
    """The registrable (pay-level) domain of a HOST column: the last two
    labels, or three when the 2-label tail is a known multi-label public
    suffix (``a.b.evil.co.uk`` → ``evil.co.uk``).  Pure-Column: one
    split + two slices, no explode.  Feed it ``url_host(url)`` when
    starting from full URLs."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3))
    suffixes = list(MULTI_LABEL_SUFFIXES) + list(extra_suffixes)
    return F.when(n <= 2, h).otherwise(
        F.when(last2.isin(suffixes), last3).otherwise(last2)
    )


def filter_url_blocklist(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | list[str],
    domain_col: str = "domain",
    keep_unparseable: bool = False,
) -> DataFrame:
    """Drop documents whose URL's registered domain is blocklisted
    (C4 §2.2 / RefinedWeb §3.1 first-stage gate).

    ``blocked`` is a one-column frame (or plain list) of registered
    domains — broadcast to every executor, so the corpus side is a
    map-only scan + broadcast anti-join: no shuffle of the big side.
    Unparseable/missing URLs drop by default (RefinedWeb's conservative
    stance); ``keep_unparseable=True`` keeps them for pipelines that
    gate on content instead."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked], f"{domain_col}: string"
        )
    bl = blocked.select(F.lower(F.col(domain_col)).alias("__bl_domain")).distinct()
    with_dom = df.withColumn(
        "__reg_domain", registered_domain(url_host(F.col(url_col)))
    )
    kept = with_dom.join(
        F.broadcast(bl),
        with_dom["__reg_domain"] == bl["__bl_domain"],
        "left_anti",
    )
    if not keep_unparseable:
        kept = kept.filter(
            F.col("__reg_domain").isNotNull() & (F.col("__reg_domain") != "")
        )
    return kept.drop("__reg_domain")
