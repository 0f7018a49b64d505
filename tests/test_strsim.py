"""String-similarity kernels: JW parity vs DuckDB oracle, Levenshtein."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mix_blink_spark.functions.strsim import jaro, jaro_winkler, jaro_winkler_udf, levenshtein_sim

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("acme systems", "acme systens"),
    ("global dynamics", "global partners"),
    ("", "abc"),
    ("same", "same"),
    ("a", "b"),
]


def test_jaro_winkler_matches_duckdb_oracle():
    for a, b in PAIRS:
        expected = duckdb.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(expected, abs=1e-9), (a, b)


def test_jaro_classic_values():
    assert jaro("martha", "marhta") == pytest.approx(0.944444, abs=1e-5)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.961111, abs=1e-5)


def test_jw_udf_batched(spark):
    df = spark.createDataFrame(PAIRS, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.withColumn("jw", jaro_winkler_udf(F.col("a"), F.col("b"))).collect()
    }
    for a, b in PAIRS:
        assert got[(a, b)] == pytest.approx(jaro_winkler(a, b), abs=1e-12)


def test_levenshtein_sim(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("", ""), ("abc", "abc")], "a string, b string")
    vals = [r["s"] for r in df.select(levenshtein_sim(F.col("a"), F.col("b")).alias("s")).collect()]
    assert vals[0] == pytest.approx(1 - 3 / 7)
    assert vals[1] == 1.0
    assert vals[2] == 1.0
