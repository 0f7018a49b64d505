"""ANN: brute-force oracle vs LSH-bucketed approximate search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mix_blink_spark.operators.knn import brute_force_topk, embedding_neardup_pairs, lsh_topk


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((12, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a near-duplicate of each even vector
        if i % 2 == 0:
            rows.append((100 + i, [float(x) for x in v + 0.01 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()


def test_brute_force_topk_matches_numpy(spark, vecs):
    data = vecs.collect()
    ids = [str(r["vec_id"]) for r in data]
    m = np.array([r["embedding"] for r in data], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    hits = brute_force_topk(vecs, vecs, k=1).collect()
    top1 = {r["vec_id"]: r["hit_id"] for r in hits if r["rank"] == 1}
    for i, rid in enumerate(ids):
        order = np.argsort(-sims[i], kind="stable")
        best = sims[i, order[0]]
        best_ids = sorted(ids[j] for j in range(len(ids)) if sims[i, j] >= best - 1e-12)
        assert top1[rid] in best_ids


def test_neardup_pairs(vecs):
    pairs = {(r["a"], r["b"]) for r in embedding_neardup_pairs(vecs, threshold=0.95).collect()}
    assert ("0", "100") in pairs
    assert ("102", "2") in pairs or ("2", "102") in pairs


def test_ivf_topk_recall_vs_bruteforce(vecs):
    from mix_blink_spark.operators.knn import ivf_topk

    exact = {(r["vec_id"], r["hit_id"]) for r in brute_force_topk(vecs, vecs, k=1).collect() if r["rank"] == 1}
    approx = {(r["vec_id"], r["hit_id"]) for r in ivf_topk(vecs, k=1, n_centroids=4, n_probe=3).collect() if r["rank"] == 1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_deterministic(vecs):
    from mix_blink_spark.operators.knn import ivf_topk

    a = sorted(map(tuple, ivf_topk(vecs, k=2, n_centroids=4, n_probe=2).select("vec_id", "hit_id", "rank").collect()))
    b = sorted(map(tuple, ivf_topk(vecs, k=2, n_centroids=4, n_probe=2).select("vec_id", "hit_id", "rank").collect()))
    assert a == b


def test_lsh_topk_recall_vs_bruteforce(vecs):
    exact = {(r["vec_id"], r["hit_id"]) for r in brute_force_topk(vecs, vecs, k=1).collect() if r["rank"] == 1}
    approx = {(r["vec_id"], r["hit_id"]) for r in lsh_topk(vecs, k=1, bits=4, tables=8).collect() if r["rank"] == 1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_neardup_forced_large_path_parity(spark):
    """broadcast_limit=0 forces the LSH (never-collect) dispatch; its pair
    set must be a subset of the exact pairs (every emitted cosine is
    computed exactly → precision 1.0) with high recall on the fixture."""
    rng = np.random.RandomState(9)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i % 3 == 0:
            rows.append((1000 + i, [float(x) for x in v + 0.01 * rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()

    exact = {(r["a"], r["b"]) for r in embedding_neardup_pairs(df, threshold=0.95).collect()}
    approx = {
        (r["a"], r["b"])
        for r in embedding_neardup_pairs(df, threshold=0.95, broadcast_limit=0).collect()
    }
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.9, (len(approx), len(exact))
