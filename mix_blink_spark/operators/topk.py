"""Top-k retrieval (SURVEY.md §2.4 J1-J3, §2.7 T1-T5).

Two physical strategies for the same logical "kNN join":

  - ``knn_broadcast`` — exact kNN of every query row against a broadcast
    candidate matrix (the Spark form of the reference's FAISS flat index,
    retriever/dense.py:43-99): ``mapInPandas`` + one BLAS matmul per Arrow
    batch + ``argpartition``. The candidate side must be dimension-sized
    (entity dictionary); queries stream through without shuffling.
  - ``topk_within`` — window rank over pre-blocked scored pairs (the
    scale path: block-local scoring replaces the full cross product).

Reference contracts kept:
  - k ≤ 0 → ValueError; k > |candidates| → clamp with a warning
    (dense.py:86-91, tests/test_retriever.py:131-136);
  - hard negatives: search k + max(|labels|), drop golds, truncate to k
    (dense.py:101-122; mined lists never contain golds,
    tests/test_retriever.py:185-190);
  - ordering: descending for ip/cos, ascending for l2 (T5).
"""

from __future__ import annotations

import warnings
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .scoring import check_measure, score_ascending


def clamp_k(k: int, n_candidates: int) -> int:
    """dense.py:86-91 semantics."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if k > n_candidates:
        warnings.warn(
            f"k={k} exceeds candidate count {n_candidates}; clamping", stacklevel=2
        )
        return n_candidates
    return k


def knn_broadcast(
    queries: DataFrame,
    cand_matrix: np.ndarray,
    cand_ids: list[str],
    k: int,
    measure: str = "ip",
    id_col: str = "rid",
    emb_col: str = "emb",
) -> DataFrame:
    """Exact top-k of each query against the broadcast candidate matrix.

    Output: (rid, hit_id, score, rank) — rank 1-based, best first. The
    matrix ships to executors once as a broadcast variable (J1:
    the entity-embedding index); each Arrow batch does one matmul.
    """
    check_measure(measure)
    k = clamp_k(k, len(cand_ids))
    asc = score_ascending(measure)

    spark = queries.sparkSession
    mat = cand_matrix.astype(np.float64)
    if measure == "cos":
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    b_mat = spark.sparkContext.broadcast(mat)
    b_ids = spark.sparkContext.broadcast(list(cand_ids))
    kk = k
    meas = measure

    # Bound the per-chunk score matrix: an Arrow batch can be 10k rows
    # (session bytes-cap), and 10k queries x a 20k-candidate matrix is a
    # 1.6 GB float64 intermediate per batch plus an equally large
    # argpartition — re-chunk so each matmul/argpartition works on at
    # most CHUNK query rows (~80 MB at 20k candidates). Output is
    # row-wise, so chunking is invisible in the result. 512 measured the
    # same single-process speed as 1024 (chunk ladder in
    # OPTIMIZATION_r08.md) at half the per-task burst — the self-kNN
    # stage runs next to memory-churning neighbors in the bench loop and
    # the smaller footprint is worth more than the larger matmul.
    CHUNK = 512

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b_mat.value
        ids = np.asarray(b_ids.value)
        for big in batches:
            if len(big) == 0:
                continue
            for c0 in range(0, len(big), CHUNK):
                yield from _score_chunk(big.iloc[c0 : c0 + CHUNK], m, ids)

    def _score_chunk(pdf: pd.DataFrame, m, ids) -> Iterator[pd.DataFrame]:
        q = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        if meas == "cos":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if meas in ("ip", "cos"):
            scores = q @ m.T
            order_scores = -scores
        else:  # squared l2 via ||q||² - 2q·c + ||c||²
            scores = (
                (q * q).sum(axis=1, keepdims=True)
                - 2.0 * (q @ m.T)
                + (m * m).sum(axis=1)
            )
            order_scores = scores
        n = scores.shape[1]
        take = min(kk, n)
        part = np.argpartition(order_scores, take - 1, axis=1)[:, :take]
        inner = np.argsort(np.take_along_axis(order_scores, part, axis=1), axis=1, kind="stable")
        idx = np.take_along_axis(part, inner, axis=1)  # (rows, take) sorted best-first
        nq = len(pdf)
        yield pd.DataFrame(
            {
                id_col: np.repeat(pdf[id_col].to_numpy(), take),
                "hit_id": ids[idx.ravel()],
                "score": np.take_along_axis(scores, idx, axis=1).ravel(),
                "rank": np.tile(np.arange(1, take + 1, dtype=np.int32), nq),
            }
        )

    schema = f"{id_col} string, hit_id string, score double, rank int"
    return queries.select(id_col, emb_col).mapInPandas(compute, schema=schema)


def topk_within(
    scored: DataFrame,
    k: int,
    measure: str = "cos",
    group_col: str = "a",
    score_col: str = "score",
) -> DataFrame:
    """T1-T3: per-group top-k via window rank over block-local scores."""
    check_measure(measure)
    order = F.col(score_col).asc() if score_ascending(measure) else F.col(score_col).desc()
    w = Window.partitionBy(group_col).orderBy(order, F.col("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    hits: DataFrame,
    golds: DataFrame,
    k: int,
    id_col: str = "rid",
) -> DataFrame:
    """J3: drop gold ids from ranked hits, re-rank, truncate to k.

    ``hits``: (rid, hit_id, score, rank) from a search with
    k' = k + max(|labels|). ``golds``: (rid, labels array<string>).
    """
    joined = hits.join(golds.select(id_col, "labels"), id_col, "left")
    filtered = joined.filter(
        F.col("labels").isNull() | ~F.array_contains(F.col("labels"), F.col("hit_id"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("rank").asc())
    return (
        filtered.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(id_col, "hit_id", "score", F.col("neg_rank").alias("rank"))
    )


def predictions_payload(
    hits: DataFrame,
    entities: DataFrame,
    top_k: int = 5,
    id_col: str = "rid",
) -> DataFrame:
    """T1 + P8 + F5: top-5 per mention with name/id/similarity (4 dp) and
    description truncated to 300 chars (predict.py:40-52)."""
    e = F.broadcast(entities.select(F.col("id").alias("hit_id"), "name", "description"))
    return (
        hits.filter(F.col("rank") <= top_k)
        .join(e, "hit_id", "left")
        .select(
            id_col,
            "rank",
            "name",
            F.col("hit_id").alias("id"),
            F.round(F.col("score"), 4).alias("similarity"),
            F.substring(F.col("description"), 1, 300).alias("description"),
        )
    )
