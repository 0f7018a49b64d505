"""URL canonicalization (functions/urls.py) — the Common-Crawl dedup-key
primitive: pure column expressions, DuckDB-oracle-gated in the driver
(`url_canonicalize`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.functions.urls import canonicalize_url

CASES = [
    # scheme+host lowercased, default port dropped, tracking params out,
    # fragment stripped, path case preserved
    ("HTTP://Example.COM:80/Path/Page?utm_source=f&id=7&fbclid=x#frag",
     "http://example.com/Path/Page?id=7"),
    ("https://a.b:443/x?gclid=1", "https://a.b/x"),
    # non-default port kept; param order preserved
    ("https://a.b:8443/x?id=1&utm_medium=m&q=2", "https://a.b:8443/x?id=1&q=2"),
    ("http://HOST/", "http://host/"),
    # non-URL strings pass through (minus fragment/tracking handling)
    ("plainstring", "plainstring"),
    ("relative/path?utm_a=1&keep=2#f", "relative/path?keep=2"),
    # bare trailing '?' collapses
    ("https://h/p?", "https://h/p"),
    # unknown scheme: port kept (no default known)
    ("ftp://Mixed.Case:21/File", "ftp://mixed.case:21/File"),
    # https default port only drops for https
    ("http://x:443/y", "http://x:443/y"),
    ("", ""),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for url, want in CASES:
        assert got[url] == want, (url, got[url], want)


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES if u], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(F.col("c").alias("url")).select(
        canonicalize_url(F.col("url")).alias("c")
    )
    assert sorted(r["c"] for r in once.collect()) == sorted(
        r["c"] for r in twice.collect()
    )


def test_canonical_url_stays_jvm_side(spark):
    """The kernel must be pure column expressions — whole-stage codegen,
    no Python runner in the plan."""
    df = spark.range(100).select(
        F.concat(F.lit("HTTP://A.B:80/x?utm_a=1&id="), F.col("id").cast("string")).alias("url")
    )
    plan = df.select(canonicalize_url(F.col("url")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
