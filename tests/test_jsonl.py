"""Reference-format JSONL reader: explode semantics + the 6-vs-8 invariant
(reference tests/test_dataset.py:64-67 analog on our own toy corpus)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.sources.jsonl import read_reference_dataset
from mix_blink_spark.sources.pages import resolve_labels

# structurally identical to the reference toy corpus, own content:
# 5 docs, 8 mentions (one multi-gold w/ NIL, two pure-NIL, one zero-entity)
TOY = [
    {"doc-id": "d1", "examples": [
        {"id": "d1-P1", "text": "Ada Lovelace joined Acme.", "entities": [
            {"start": 20, "end": 24, "label": ["X01"], "title": ["Acme Corp"],
             "text": "Acme makes anvils.", "hard_negatives": ["X02", "X03"]}]}]},
    {"doc-id": "d2", "examples": [
        {"id": "d2-P1", "text": "Borealis ships today.", "entities": [
            {"start": 0, "end": 8, "label": ["X02"], "hard_negatives": ["X01"]}]},
        {"id": "d2-P2", "text": "Cascade in the north.", "entities": [
            {"start": 0, "end": 7, "label": ["X03"], "hard_negatives": ["-1", "X01"]}]}]},
    {"doc-id": "d3", "examples": [
        {"id": "d3-P1", "text": "We met at Datum.", "entities": [
            {"start": 10, "end": 15, "label": ["X04"], "hard_negatives": ["X01"]}]},
        {"id": "d3-P2", "text": "We met at acme.", "entities": [
            {"start": 10, "end": 14, "label": ["X01", "-1"], "hard_negatives": ["X02"]}]}]},
    {"doc-id": "d4", "examples": [
        {"id": "d4-P1", "text": "Umbra made a car", "entities": [
            {"start": 0, "end": 5, "label": ["-1"], "hard_negatives": ["X01"]}]},
        {"id": "d4-P2", "text": "Datum and Vertex sold cars", "entities": [
            {"start": 0, "end": 5, "label": ["X04"], "hard_negatives": ["-1"]},
            {"start": 10, "end": 16, "label": ["-1"], "hard_negatives": ["X02"]}]}]},
    {"doc-id": "d5", "examples": [
        {"id": "d5-P1", "text": "I have an apple.", "entities": []}]},
]

DICT_IDS = [("X01",), ("X02",), ("X03",), ("X04",)]


@pytest.fixture(scope="module")
def toy_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "toy.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in TOY))
    return str(p)


def test_explode_counts_and_surfaces(spark, toy_path):
    m = read_reference_dataset(spark, toy_path)
    rows = m.collect()
    assert len(rows) == 8  # zero-entity example d5-P1 vanishes
    by_id = {r["mention_id"]: r for r in rows}
    assert by_id["d1-P1#0"]["surface"] == "Acme"
    assert by_id["d3-P2#0"]["surface"] == "acme"
    assert by_id["d3-P2#0"]["labels"] == ["X01", "-1"]
    assert by_id["d4-P2#1"]["surface"] == "Vertex"


def test_candidate_writeback_roundtrip(spark, toy_path, tmp_path):
    """read → inject candidates → write JSONL → re-read: same mentions,
    candidates present, entities ordered by start."""
    from mix_blink_spark.plans.candidates import inject_candidates

    m = read_reference_dataset(spark, toy_path)
    cand = spark.createDataFrame(
        [
            ("d1-P1#0", ["X01", "X05", "X02"], ["X05", "X02"]),
            ("d4-P2#0", ["X04", "X03"], ["X03"]),
        ],
        "mention_id string, candidates array<string>, hard_negatives array<string>",
    )
    nested = inject_candidates(m, cand)
    out = str(tmp_path / "cands")
    nested.coalesce(1).write.mode("overwrite").json(out)

    back = read_reference_dataset(spark, out)
    assert back.count() == m.count()
    roundtrip = {r["mention_id"]: r for r in back.collect()}
    assert roundtrip["d3-P2#0"]["labels"] == ["X01", "-1"]
    # per-entity title/text carried through the roundtrip
    assert roundtrip["d1-P1#0"]["title"] == ["Acme Corp"]
    assert roundtrip["d1-P1#0"]["ent_text"] == "Acme makes anvils."

    got = {r["doc-id"]: r for r in nested.collect()}
    d4 = got["d4"]
    p2 = [e for ex in d4["examples"] if ex["id"] == "d4-P2" for e in ex["entities"]]
    assert [e["start"] for e in p2] == sorted(e["start"] for e in p2)
    # mined mentions: candidates = raw top-k (gold included),
    # hard_negatives REPLACED by the mined gold-free list
    assert p2[0]["candidates"] == ["X04", "X03"]
    assert p2[0]["hard_negatives"] == ["X03"]
    # unmined mentions: empty candidates, input hard_negatives preserved
    assert p2[1]["candidates"] == []
    assert p2[1]["hard_negatives"] == ["X02"]
    d1 = got["d1"]
    e1 = d1["examples"][0]["entities"][0]
    assert e1["candidates"] == ["X01", "X05", "X02"]
    assert e1["hard_negatives"] == ["X05", "X02"]
    assert e1["title"] == ["Acme Corp"] and e1["text"] == "Acme makes anvils."


def test_nil_invariant_6_vs_8(spark, toy_path):
    """remove_nil=True over a NIL-less dictionary keeps 6 of 8 features
    (the two pure-NIL mentions drop); with NIL in the dictionary all 8
    survive — the reference's tests/test_dataset.py:64-67 invariant."""
    from mix_blink_spark.sources.dictionary import NIL_ID

    m = read_reference_dataset(spark, toy_path)
    d = spark.createDataFrame(DICT_IDS, "id string")
    assert resolve_labels(m, d, remove_nil=True).count() == 6
    d_nil = d.union(spark.createDataFrame([(NIL_ID,)], "id string"))
    assert resolve_labels(m, d_nil, remove_nil=True).count() == 8
