"""get_candidate mining path: gold-free candidates joined back by key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.plans.candidates import mine_candidates


def test_mine_candidates(spark, corpus):
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")

    out = mine_candidates(spark, pages, spans, ents, golds, top_k=10)
    rows = out.collect()
    # every span re-emitted exactly once (key join, never positional)
    assert len(rows) == spans.count()
    gold_seen = 0
    for r in rows:
        # hard_negatives never contain golds (dense.py:116-120 contract)
        assert not set(r["hard_negatives"]) & set(r["labels"] or [])
        assert len(r["hard_negatives"]) <= 10
        # candidates = raw top-k: golds NOT removed (dense.py:115)
        assert len(r["candidates"]) <= 10
        gold_seen += bool(set(r["candidates"]) & set(r["labels"] or []))
    # raw candidates DO contain golds for most mentions (retrieval works)
    assert gold_seen > len(rows) * 0.5
    # both lists mined for most mentions
    assert sum(1 for r in rows if r["hard_negatives"]) > len(rows) * 0.5


def test_mine_from_hits_edges(spark):
    """J4 list assembly from pre-ranked hits: no-gold passthrough (negs ==
    raw candidates), gold removal + truncation, and the empty-array
    fallback for spans that were never searched."""
    from mix_blink_spark.plans.candidates import mine_from_hits

    # m1 searched with golds, m2 searched without golds, m3 never searched
    hits = spark.createDataFrame(
        [("m1", f"e{i}", 1.0 - i / 10.0, i) for i in range(1, 5)]
        + [("m2", f"e{i}", 1.0 - i / 10.0, i) for i in range(1, 4)],
        "rid string, hit_id string, score double, rank int",
    )
    spans = spark.createDataFrame(
        [(f"u{i}", f"m{i}", 0, 1) for i in (1, 2, 3)],
        "url string, mention_id string, start int, end int",
    )
    golds = spark.createDataFrame(
        [("m1", ["e2"])], "mention_id string, labels array<string>"
    )
    out = {
        r["mention_id"]: r
        for r in mine_from_hits(hits, spans, golds, top_k=2).collect()
    }
    assert len(out) == 3
    # raw candidates keep the gold; negatives drop it, re-rank, truncate
    assert out["m1"]["candidates"] == ["e1", "e2"]
    assert out["m1"]["hard_negatives"] == ["e1", "e3"]
    # no golds: both lists are the raw top-k
    assert out["m2"]["candidates"] == ["e1", "e2"]
    assert out["m2"]["hard_negatives"] == ["e1", "e2"]
    # never searched: empty arrays, not nulls (key-join fallback)
    assert out["m3"]["candidates"] == []
    assert out["m3"]["hard_negatives"] == []


def test_dedup_decisions(spark):
    from mix_blink_spark.operators.dedup import dedup_decisions

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base), (2, base),
        (3, base + " yesterday evening"),
        (4, "completely different words about spark shuffle behavior"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["id"]: (r["action"], r["partner"]) for r in dedup_decisions(d, 0.7, n=1).collect()}
    assert got["1"] == ("keep", None)
    assert got["2"] == ("drop_exact", "1")
    assert got["3"][0] == "drop_near" and got["3"][1] in ("1", "2")
    assert got["4"] == ("keep", None)
