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
