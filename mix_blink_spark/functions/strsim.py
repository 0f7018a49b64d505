"""String-similarity kernels for pairwise scoring.

Levenshtein stays JVM-side (``F.levenshtein`` — whole-stage codegen).
Jaro-Winkler has no Spark built-in, so it is an Arrow ``pandas_udf``
(batched; the only Python in this stage). Semantics follow the standard
Winkler definition (prefix ≤ 4, p = 0.1, boost threshold 0.7) so results
are checkable against DuckDB's ``jaro_winkler_similarity`` oracle.

Reference analog: the reference scores pairs only with dense embeddings
(trainer.py:228-235); lexical scores are additional semantics mandated by
BASELINE.json north_star ("Jaro-Winkler/Levenshtein string scores ...
evaluated as pandas_udf over Arrow record batches").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.functions import pandas_udf


def jaro(s1: str, s2: str) -> float:
    """Plain Jaro similarity (match window floor(max/2)-1, transpositions/2).
    Either side empty → 0.0, including both-empty (DuckDB convention, so the
    oracle parity is exact)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * l2
    match1 = []
    for i, c in enumerate(s1):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                match1.append(c)
                break
    m = len(match1)
    if m == 0:
        return 0.0
    match2 = [s2[j] for j in range(l2) if flags2[j]]
    t = sum(a != b for a, b in zip(match1, match2)) // 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched JW over Arrow record batches (SURVEY.md §2.8 kernel 3)."""
    out = [
        jaro_winkler(x, y) if (x is not None and y is not None) else None
        for x, y in zip(a, b)
    ]
    return pd.Series(out, dtype="float64")


def levenshtein_sim(a: Column, b: Column) -> Column:
    """1 - lev/max(len) — JVM-side, codegen'd; 1.0 for two empty strings."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / ml.cast("double")
    )
