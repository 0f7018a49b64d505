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


def _lev_ref(a: str, b: str) -> int:
    """Textbook codepoint DP — the semantics of Spark's F.levenshtein
    (verified: F.levenshtein(' xé…', 'cyc…') == 16 == this, while DuckDB
    counts UTF-8 BYTES for non-ASCII and says 18; the vectorized kernel
    must match SPARK, its production counterpart)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_levenshtein_np_matches_spark_semantics():
    import random

    from mix_blink_spark.operators.localpairs import levenshtein_np

    rng = random.Random(5)
    alph = "abcd xyzé"
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"), ("é", "e")]
    for _ in range(300):
        a = "".join(rng.choice(alph) for _ in range(rng.randrange(0, 20)))
        b = "".join(rng.choice(alph) for _ in range(rng.randrange(0, 20)))
        cases.append((a, b))
    got = levenshtein_np([c[0] for c in cases], [c[1] for c in cases])
    for (a, b), g in zip(cases, got):
        assert int(g) == _lev_ref(a, b), (a, b, int(g), _lev_ref(a, b))


def test_jaro_winkler_np_matches_scalar_random():
    import random

    from mix_blink_spark.functions.strsim import jaro_winkler, jaro_winkler_np

    rng = random.Random(11)
    alph = "abcdefg XYZé中"
    cases = []
    for _ in range(2000):
        a = "".join(rng.choice(alph) for _ in range(rng.randrange(0, 30)))
        b = "".join(rng.choice(alph) for _ in range(rng.randrange(0, 30)))
        if rng.random() < 0.25:
            b = a
        cases.append((a, b))
    vec = jaro_winkler_np([c[0] for c in cases], [c[1] for c in cases])
    for (a, b), v in zip(cases, vec):
        assert jaro_winkler(a, b) == v, (a, b)
