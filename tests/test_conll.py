"""CoNLL ingest: parser-kernel semantics (whitespace-join offsets, BIO
split rules, doc/id handling — zelda.py:19-133 parity on own fixtures)
plus the Spark file-parallel path feeding read_reference_dataset."""

from __future__ import annotations

import pytest

from mix_blink_spark.sources.conll import parse_conll_str, read_conll_dataset

FIXTURE = """-DOCSTART-
# doc1\textra-field
Steve\tB-Q1\tB-Steve_Jobs
Jobs\tI-Q1\tI-Steve_Jobs
founded\tO\tO
Apple\tB-Q2\tB-Apple_Inc
.\tO\tO

He\tO\tO
left\tO\tO
NeXT\tB-Q3\tB-NeXT
-DOCSTART-
# doc2
Berlin\tB-Q4\tB-Berlin
Paris\tB-Q5\tB-Paris
Madrid\tI-Q6\tI-Madrid
"""


def test_offsets_and_bio_spans():
    docs = parse_conll_str(FIXTURE)
    assert [d["doc-id"] for d in docs] == ["doc1", "doc2"]
    d1 = docs[0]
    assert [ex["id"] for ex in d1["examples"]] == ["doc1-0", "doc1-1"]
    s0 = d1["examples"][0]
    assert s0["text"] == "Steve Jobs founded Apple ."
    ents = s0["entities"]
    # multi-token span joins with a space; offsets index the joined text
    assert ents[0]["start"] == 0 and ents[0]["end"] == 10
    assert ents[0]["text"] == "Steve Jobs"
    assert ents[0]["label"] == ["Q1"] and ents[0]["title"] == ["Steve_Jobs"]
    assert ents[1]["text"] == "Apple"
    assert s0["text"][ents[1]["start"] : ents[1]["end"]] == "Apple"
    # span open at end-of-sentence closes via the virtual trailing O
    s1 = d1["examples"][1]
    assert s1["entities"][0]["text"] == "NeXT"


def test_bio_split_rules():
    d2 = parse_conll_str(FIXTURE)[1]
    ents = d2["examples"][0]["entities"]
    # adjacent B- tags split; an I- with a NEW label also opens a new span
    assert [e["text"] for e in ents] == ["Berlin", "Paris", "Madrid"]
    assert [e["label"][0] for e in ents] == ["Q4", "Q5", "Q6"]


def test_missing_doc_id_falls_back_to_ordinal():
    docs = parse_conll_str("-DOCSTART-\nA\tB-X\tB-T\n")
    assert docs[0]["doc-id"] == "0"


def test_spark_path_feeds_reference_reader(spark, tmp_path):
    from mix_blink_spark.sources.jsonl import read_reference_dataset

    p = tmp_path / "in" / "f1.conll"
    p.parent.mkdir()
    p.write_text(FIXTURE)
    df = read_conll_dataset(spark, str(p.parent))
    out = str(tmp_path / "out")
    df.coalesce(1).write.mode("overwrite").json(out)
    m = read_reference_dataset(spark, out)
    rows = {r["mention_id"]: r for r in m.collect()}
    assert len(rows) == 6
    assert rows["doc1-0#0"]["surface"] == "Steve Jobs"
    assert rows["doc1-0#0"]["labels"] == ["Q1"]
    assert rows["doc1-0#0"]["title"] == ["Steve_Jobs"]
    assert rows["doc2-0#2"]["surface"] == "Madrid"
