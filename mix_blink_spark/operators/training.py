"""Training-side scoring-matrix semantics (SURVEY.md J5/F4/A3) — the
in-batch-negatives objective re-expressed as a batch-grouped operator.

Reference behavior (mix_blink/training/trainer.py:192-239 and
mix_blink/data/collator.py:60-103):

  - a batch of B mentions is collated with B in-batch candidates (the
    encoding of each mention's FIRST gold label, collator.py:68) plus each
    mention's own H hard negatives (collator.py:70-72, reshaped
    ``[bs, -1, hs]`` — so H must be uniform across the batch or the
    reference's reshape crashes; we raise the same constraint explicitly);
  - the score matrix is B x (B+H): row i holds sim(q_i, gold_j) for every
    in-batch gold j plus sim(q_i, neg_{i,h}) for its OWN negatives
    (trainer.py:221-226);
  - measures: ``ip`` = inner product, ``cos`` = normalized inner product,
    ``l2`` = **plain Euclidean distance via torch.cdist** used directly as
    logits (trainer.py:228-235 — NOT negated and NOT squared; a reference
    quirk reproduced faithfully);
  - loss = cross_entropy(scores / temperature, labels=arange(B),
    reduction='mean') (trainer.py:237; temperature from argparser);
  - train-time recall (A3) = fraction of rows whose argmax is the
    diagonal (trainer.py:172-189 compute_metrics).

This is a pure *scoring/metrics* operator (no gradient step — training a
torch model is out of scope for the Spark engine, SURVEY.md §3.4): it
gives Spark users the reference's loss/recall numbers over arbitrarily
many batches in one pass, e.g. for encoder-quality monitoring of an
embedding column at corpus scale. One grouped-map task per batch_id; the
batch never leaves its executor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import check_measure

_OUT_SCHEMA = (
    "batch_id string, loss double, recall double, n_mentions int, n_negatives int"
)


def _batch_scores(
    Q: np.ndarray, G: np.ndarray, N: np.ndarray | None, measure: str
) -> np.ndarray:
    """B x (B+H) score matrix with the reference's per-measure forms."""
    if measure == "cos":
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        Gn = G / np.maximum(np.linalg.norm(G, axis=1, keepdims=True), 1e-12)
        scores = Qn @ Gn.T
        if N is not None:
            Nn = N / np.maximum(np.linalg.norm(N, axis=2, keepdims=True), 1e-12)
            neg = np.einsum("bd,bhd->bh", Qn, Nn)
            scores = np.concatenate([scores, neg], axis=1)
        return scores
    if measure == "ip":
        scores = Q @ G.T
        if N is not None:
            scores = np.concatenate([scores, np.einsum("bd,bhd->bh", Q, N)], axis=1)
        return scores
    # l2: plain (non-squared) Euclidean distance as logits — the
    # reference's torch.cdist path, reproduced verbatim
    d = Q[:, None, :] - G[None, :, :]
    scores = np.sqrt(np.maximum(np.einsum("bgd,bgd->bg", d, d), 0.0))
    if N is not None:
        dn = Q[:, None, :] - N
        neg = np.sqrt(np.maximum(np.einsum("bhd,bhd->bh", dn, dn), 0.0))
        scores = np.concatenate([scores, neg], axis=1)
    return scores


def _ce_diag(scores: np.ndarray, temperature: float) -> float:
    """mean cross-entropy with labels = arange(B) (the diagonal)."""
    z = scores / temperature
    z = z - z.max(axis=1, keepdims=True)  # stable logsumexp
    lse = np.log(np.exp(z).sum(axis=1))
    diag = z[np.arange(len(z)), np.arange(len(z))]
    return float((lse - diag).mean())


def inbatch_scoring_numpy(
    Q: np.ndarray, G: np.ndarray, N: np.ndarray | None, measure: str, temperature: float
) -> tuple[float, float]:
    """(loss, recall) for one batch — the kernel, exposed for oracle tests."""
    scores = _batch_scores(
        Q.astype(np.float64), G.astype(np.float64),
        None if N is None else N.astype(np.float64), measure,
    )
    loss = _ce_diag(scores, temperature)
    preds = scores.argmax(axis=1)
    recall = float((preds == np.arange(len(scores))).mean())
    return loss, recall


def inbatch_score_matrix(
    batches: DataFrame,
    measure: str = "ip",
    temperature: float = 1.0,
    batch_col: str = "batch_id",
) -> DataFrame:
    """One row per batch: (batch_id, loss, recall, n_mentions, n_negatives).

    Input rows: (batch_id, rid, emb array<float>, gold_emb array<float>,
    neg_embs array<array<float>>). ``neg_embs`` may be empty everywhere
    (pure in-batch negatives) but must have the SAME length within a batch
    (the reference's reshape constraint, collator.py:70-72 +
    trainer.py:224). Rows are ordered by rid inside the batch so the
    result is partition-order independent.
    """
    check_measure(measure)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rid", kind="mergesort")
        Q = np.stack(pdf["emb"].to_numpy())
        G = np.stack(pdf["gold_emb"].to_numpy())
        lens = {len(x) for x in pdf["neg_embs"]}
        if len(lens) > 1:
            raise ValueError(
                "hard negative count must be uniform within a batch "
                f"(got {sorted(lens)}) — reference reshape([bs, -1, hs]) contract"
            )
        h = lens.pop() if lens else 0
        N = (
            np.stack([np.stack(x) for x in pdf["neg_embs"]]) if h else None
        )
        loss, recall = inbatch_scoring_numpy(Q, G, N, measure, temperature)
        return pd.DataFrame(
            {
                "batch_id": [str(pdf[batch_col].iloc[0])],
                "loss": [loss],
                "recall": [recall],
                "n_mentions": [len(pdf)],
                "n_negatives": [h],
            }
        )

    return batches.groupBy(batch_col).applyInPandas(run, _OUT_SCHEMA)
