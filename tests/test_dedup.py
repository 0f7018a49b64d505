"""Dedup family: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    token_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    far = "completely different words about spark shuffles and partition pruning"
    rows = [
        (1, base), (2, base),          # exact dups
        (3, near),                      # near dup of 1/2
        (4, far), (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_dedup(docs):
    d = exact_dedup(docs)
    assert d.count() == 4  # 5 docs, one exact-dup pair collapses
    dup = d.filter(F.col("n_dups") == 2).first()
    assert dup["keep_id"] == "1"


def test_token_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    sh = token_shingles(df, n=3)
    got = {r["shingle"] for r in sh.collect()}
    assert got == {"a b c", "b c d", "c d e"}


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert ("1", "2") in pairs and pairs[("1", "2")] == 1.0
    assert ("1", "3") in pairs and 0.5 <= pairs[("1", "3")] < 1.0
    assert not any("4" in p for p in pairs)


def test_ngram_jaccard_max_df_is_precision_safe(docs):
    """With a df cap, exact duplicates still pair (their rare shingles
    carry them) and no NEW pairs appear vs the exact computation."""
    exact = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    capped = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=3).collect()}
    assert capped <= exact
    assert ("1", "2") in capped


def test_ngram_jaccard_hot_df_tripwire(docs, recwarn):
    """max_df=None warns when the hottest shingle's df exceeds the bound
    (round-6 verdict item 5: the exact join is O(df²) in the hot key), is
    silent below it, and NEVER changes the output — same pairs, same
    jaccards, with and without the tripwire."""
    quiet = ngram_jaccard_pairs(docs, threshold=0.5, hot_df_warn=10_000)
    assert not [w for w in recwarn.list if "hottest shingle" in str(w.message)]
    with pytest.warns(UserWarning, match=r"hottest shingle .* O\(df²\)|hot-key"):
        loud = ngram_jaccard_pairs(docs, threshold=0.5, hot_df_warn=1)
    lazy = ngram_jaccard_pairs(docs, threshold=0.5, hot_df_warn=None)
    rows = lambda df: {(r["a"], r["b"]): r["jaccard"] for r in df.collect()}  # noqa: E731
    assert rows(quiet) == rows(loud) == rows(lazy) and len(rows(lazy)) > 0


def test_minhash_lsh_pairs(docs):
    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert ("1", "2") in got      # identical docs always collide
    assert ("1", "3") in got      # near dups collide with high probability
    assert not any("4" in p and ("1" in p or "2" in p) for p in got)


def test_simhash_properties(docs):
    sh = {r["id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    assert sh["1"] == sh["2"]
    assert len(sh["1"]) == 16 and set(sh["1"]) <= {"0", "1"}
    ham_near = sum(a != b for a, b in zip(sh["1"], sh["3"]))
    ham_far = sum(a != b for a, b in zip(sh["1"], sh["4"]))
    assert ham_near < ham_far
