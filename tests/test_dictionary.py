"""Dictionary semantics parity (reference tests/test_dictionary.py +
data/dictionary.py, data/dataset.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.sources.dictionary import (
    NIL_DESCRIPTION,
    NIL_ID,
    NIL_NAME,
    explode_surfaces,
    with_dense_ids,
    with_encoding_text,
    with_nil,
)
from mix_blink_spark.sources.pages import resolve_labels


@pytest.fixture(scope="module")
def toy_dict(spark):
    # mirror of reference tests/test_data/dictionary_toy.jsonl (5 companies)
    rows = [
        ("000011", "Google", "Google is a global company"),
        ("000012", "Apple", "Apple is a global company"),
        ("000013", "Meta", "Meta is a global company"),
        ("000014", "Amazon", "Amazon is a global company"),
        ("000015", "Microsoft", ""),
    ]
    return spark.createDataFrame(rows, "id string, name string, description string")


def test_nil_append(spark, toy_dict):
    """5 -> 6 rows with NIL (reference test_dictionary.py len assertion)."""
    d = with_nil(toy_dict)
    assert d.count() == 6
    nil = d.filter(F.col("id") == NIL_ID).first()
    assert nil["name"] == NIL_NAME
    assert nil["description"] == NIL_DESCRIPTION


def test_encoding_text_composition(toy_dict):
    """name + [ENT] + description, fallback when empty (dictionary.py:99-103)."""
    d = with_encoding_text(toy_dict)
    rows = {r["id"]: r["enc_text"] for r in d.collect()}
    assert rows["000011"] == "Google[ENT]Google is a global company"
    assert rows["000015"] == "Microsoft[ENT]Microsoft is an entity in this dictionary."


def test_dense_ids_follow_dictionary_order(toy_dict):
    d = with_dense_ids(with_nil(toy_dict))
    rows = d.orderBy("dense_id").collect()
    assert [r["dense_id"] for r in rows] == list(range(6))
    assert rows[5]["id"] == NIL_ID  # NIL appended last, gets last dense id


def test_explode_surfaces_excludes_nil(spark):
    d = spark.createDataFrame(
        [("E1", "Acme", "d", ["acme", "Acme Inc"]), (NIL_ID, NIL_NAME, NIL_DESCRIPTION, None)],
        "id string, name string, description string, aliases array<string>",
    )
    s = explode_surfaces(d)
    surfaces = {r["surface"] for r in s.collect()}
    assert surfaces == {"Acme", "acme", "Acme Inc"}


def _toy_mentions(spark):
    # 8 mentions from dataset_toy.jsonl incl. multi-gold and NIL-gold
    rows = [
        ("u1", "m1", ["000012"]),
        ("u2", "m2", ["000015"]),
        ("u2", "m3", ["000011"]),
        ("u3", "m4", ["000013"]),
        ("u3", "m5", ["000014", "-1"]),
        ("u4", "m6", ["-1"]),           # Toyota
        ("u4", "m7", ["000014"]),
        ("u4", "m8", ["-1"]),           # Sony
    ]
    return spark.createDataFrame(rows, "url string, mention_id string, labels array<string>")


def test_resolve_labels_remove_nil(spark, toy_dict):
    """Reference invariant: 8 mentions -> 6 features with remove_nil=True
    (dictionary WITHOUT NIL), 8 with NIL in the dictionary
    (tests/test_dataset.py:64-67)."""
    m = _toy_mentions(spark)
    kept = resolve_labels(m, toy_dict, remove_nil=True)
    assert kept.count() == 6
    # multi-gold ["000014","-1"] survives with "-1" stripped
    m5 = kept.filter(F.col("mention_id") == "m5").first()
    assert m5["labels"] == ["000014"]

    kept_nil = resolve_labels(m, with_nil(toy_dict), remove_nil=True)
    assert kept_nil.count() == 8


def test_resolve_labels_strict_raises(spark, toy_dict):
    m = _toy_mentions(spark)
    strict = resolve_labels(m, toy_dict, remove_nil=False)
    with pytest.raises(Exception, match="not found in label2id mapping"):
        strict.collect()
