"""Pairwise scoring (SURVEY.md §2.5, north_star stage 2).

Dense measures reproduce the reference exactly
(mix_blink/retriever/dense.py:41-46, trainer.py:228-235):

  - ``ip``  — inner product (default, argparser.py:42), descending;
  - ``cos`` — L2-normalize both sides then inner product
    (dense.py:81-82,92-93), descending;
  - ``l2``  — **squared** Euclidean distance (FAISS IndexFlatL2 contract),
    ascending;
  - anything else raises ``NotImplementedError(f"{measure} is not
    supported")`` (dense.py:41-42; asserted by reference
    tests/test_retriever.py:44-56).

Lexical scores (Jaro-Winkler via Arrow pandas_udf, Levenshtein via the
JVM built-in) are combined with the dense score into ``score`` — the
single column thresholded/ranked downstream. Similarities are rounded to
4 decimals only in *prediction payloads* (predict.py:46), never before
ranking.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.functions import pandas_udf

from ..functions.strsim import jaro_winkler_udf, levenshtein_sim

MEASURES = ("ip", "cos", "l2")


def check_measure(measure: str) -> None:
    if measure not in MEASURES:
        raise NotImplementedError(f"{measure} is not supported")


def score_ascending(measure: str) -> bool:
    """l2 ranks ascending (smaller distance = better); ip/cos descending."""
    check_measure(measure)
    return measure == "l2"


def _dense_np(a: np.ndarray, b: np.ndarray, measure: str) -> np.ndarray:
    if measure == "cos":
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        return np.einsum("ij,ij->i", a, b)
    if measure == "ip":
        return np.einsum("ij,ij->i", a, b)
    if measure == "l2":  # squared L2, FAISS contract
        d = a - b
        return np.einsum("ij,ij->i", d, d)
    raise NotImplementedError(f"{measure} is not supported")


def make_dense_score_udf(measure: str):
    """Row-aligned dense score over two ArrayType(Float) columns.
    Arrow-batched; numpy einsum inside — no per-row Python."""
    check_measure(measure)

    @pandas_udf(DoubleType())
    def dense_score(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a_ser, b_ser in batches:
            a = np.stack(a_ser.to_numpy())
            b = np.stack(b_ser.to_numpy())
            yield pd.Series(_dense_np(a.astype(np.float64), b.astype(np.float64), measure))

    return dense_score


def score_pairs(
    pairs: DataFrame,
    measure: str = "cos",
    dense_weight: float = 0.5,
    emb_a: str = "emb_a",
    emb_b: str = "emb_b",
    norm_a: str = "norm_a",
    norm_b: str = "norm_b",
) -> DataFrame:
    """Attach dense + lexical + combined scores to candidate pairs.

    ``score`` = dense_weight · dense_sim + (1-dense_weight) · max(jw, lev).
    For ``l2`` the dense part enters as a similarity via 1/(1+dist) so the
    combined score still ranks descending.
    """
    check_measure(measure)
    dense_udf = make_dense_score_udf(measure)
    out = pairs.withColumn("dense", dense_udf(F.col(emb_a), F.col(emb_b)))
    dense_sim = (
        (1.0 / (1.0 + F.col("dense"))) if measure == "l2" else F.col("dense")
    )
    out = out.withColumn("jw", jaro_winkler_udf(F.col(norm_a), F.col(norm_b)))
    out = out.withColumn("lev", levenshtein_sim(F.col(norm_a), F.col(norm_b)))
    lex = F.greatest(F.col("jw"), F.col("lev"))
    return out.withColumn(
        "score", F.lit(dense_weight) * dense_sim + F.lit(1.0 - dense_weight) * lex
    )
