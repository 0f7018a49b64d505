"""In-batch scoring-matrix operator (J5/F4/A3) vs a hand-rolled numpy
oracle that mirrors the reference's torch code shape-for-shape."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mix_blink_spark.operators.training import (
    inbatch_score_matrix,
    inbatch_scoring_numpy,
)


def _oracle(Q, G, N, measure, temperature):
    """Literal transcription of trainer.py:221-237 in numpy."""
    B = len(Q)
    cand = np.repeat(G[None, :, :], B, axis=0)  # (B, B, d)
    if N is not None:
        cand = np.concatenate([cand, N], axis=1)  # (B, B+H, d)
    if measure == "ip":
        scores = np.einsum("bd,bkd->bk", Q, cand)
    elif measure == "cos":
        qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        cn = cand / np.linalg.norm(cand, axis=2, keepdims=True)
        scores = np.einsum("bd,bkd->bk", qn, cn)
    else:  # l2: torch.cdist = plain euclidean distance
        scores = np.linalg.norm(Q[:, None, :] - cand, axis=2)
    z = scores / temperature
    losses = []
    for i in range(B):
        m = z[i].max()
        losses.append(math.log(np.exp(z[i] - m).sum()) + m - z[i, i])
    recall = float((scores.argmax(axis=1) == np.arange(B)).mean())
    return float(np.mean(losses)), recall


@pytest.mark.parametrize("measure", ["ip", "cos", "l2"])
@pytest.mark.parametrize("with_negs", [True, False])
def test_kernel_matches_reference_transcription(measure, with_negs):
    rng = np.random.RandomState(3)
    B, H, d = 6, 3, 8
    Q = rng.standard_normal((B, d))
    G = rng.standard_normal((B, d))
    N = rng.standard_normal((B, H, d)) if with_negs else None
    got = inbatch_scoring_numpy(Q, G, N, measure, temperature=0.7)
    want = _oracle(Q, G, N, measure, 0.7)
    assert got[0] == pytest.approx(want[0], rel=1e-9)
    assert got[1] == pytest.approx(want[1])


def test_perfect_alignment_gives_recall_one_and_low_loss():
    """Queries identical to their golds, orthogonal to everything else:
    argmax must be the diagonal and CE loss near its floor."""
    d = 16
    Q = np.eye(4, d)
    G = np.eye(4, d)
    loss, recall = inbatch_scoring_numpy(Q, G, None, "cos", temperature=0.05)
    assert recall == 1.0
    assert loss < 0.01


def test_spark_operator_matches_kernel(spark):
    rng = np.random.RandomState(11)
    rows = []
    expected = {}
    for b in range(3):
        B, H, d = 5, 2, 8
        Q = rng.standard_normal((B, d))
        G = rng.standard_normal((B, d))
        N = rng.standard_normal((B, H, d))
        # rows inserted out of order — operator must sort by rid
        order = rng.permutation(B)
        for i in order:
            rows.append(
                (
                    f"b{b}",
                    f"m{i:02d}",
                    [float(x) for x in Q[i]],
                    [float(x) for x in G[i]],
                    [[float(x) for x in n] for n in N[i]],
                )
            )
        expected[f"b{b}"] = inbatch_scoring_numpy(Q, G, N, "ip", 1.0)
    df = spark.createDataFrame(
        rows,
        "batch_id string, rid string, emb array<float>, gold_emb array<float>, "
        "neg_embs array<array<float>>",
    )
    out = {r["batch_id"]: r for r in inbatch_score_matrix(df, "ip", 1.0).collect()}
    assert set(out) == set(expected)
    for b, (loss, recall) in expected.items():
        # float32 storage in the DataFrame vs float64 kernel input
        assert out[b]["loss"] == pytest.approx(loss, rel=1e-4)
        assert out[b]["recall"] == pytest.approx(recall)
        assert out[b]["n_mentions"] == 5 and out[b]["n_negatives"] == 2


def test_nonuniform_negatives_raise(spark):
    rows = [
        ("b0", "m0", [1.0, 0.0], [1.0, 0.0], [[0.0, 1.0]]),
        ("b0", "m1", [0.0, 1.0], [0.0, 1.0], []),
    ]
    df = spark.createDataFrame(
        rows,
        "batch_id string, rid string, emb array<float>, gold_emb array<float>, "
        "neg_embs array<array<float>>",
    )
    with pytest.raises(Exception, match="uniform within a batch"):
        inbatch_score_matrix(df).collect()
