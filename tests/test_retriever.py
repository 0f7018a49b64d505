"""Retrieval parity with the reference retriever
(/root/reference/mix_blink/retriever/dense.py, tests/test_retriever.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mix_blink_spark.functions.embed import encode_matrix
from mix_blink_spark.operators.scoring import check_measure, make_dense_score_udf
from mix_blink_spark.operators.topk import clamp_k, hard_negatives, knn_broadcast


def test_unsupported_measure_contract():
    """NotImplementedError('{measure} is not supported') — dense.py:41-42,
    asserted by reference tests/test_retriever.py:44-56."""
    with pytest.raises(NotImplementedError, match="dot is not supported"):
        check_measure("dot")
    with pytest.raises(NotImplementedError, match="cosine is not supported"):
        make_dense_score_udf("cosine")


def test_k_clamp_and_validation():
    """dense.py:86-91: k<=0 raises, k>dict clamps with warning
    (tests/test_retriever.py:131-136)."""
    with pytest.raises(ValueError):
        clamp_k(0, 10)
    with pytest.warns(UserWarning):
        assert clamp_k(100, 10) == 10
    assert clamp_k(5, 10) == 5


@pytest.fixture(scope="module")
def small_index(spark):
    names = ["Google", "Apple", "Meta", "Amazon", "Microsoft"]
    ids = [f"0000{11 + i}" for i in range(len(names))]
    mat = encode_matrix(names)
    queries = spark.createDataFrame(
        [(f"q{i}", list(map(float, encode_matrix([n])[0]))) for i, n in enumerate(["googel", "apple", "meta platforms"])],
        "rid string, emb array<float>",
    )
    return queries, mat, ids, names


def test_knn_measures_rank_differently(spark, small_index):
    """ip / cos / l2 orderings are all computed and valid
    (tests/test_retriever.py:150-167: measures give different distances)."""
    queries, mat, ids, _ = small_index
    results = {}
    for measure in ("ip", "cos", "l2"):
        hits = knn_broadcast(queries, mat, ids, k=5, measure=measure)
        rows = hits.filter(F.col("rid") == "q0").orderBy("rank").collect()
        results[measure] = [(r["hit_id"], r["score"]) for r in rows]
        # q0 = 'googel' typo: Google must be rank 1 under every measure
        assert rows[0]["hit_id"] == "000011", measure
    # scores differ across measures on the same pairs
    assert results["ip"] != results["l2"]
    # l2 is ascending: best hit has the smallest distance
    l2 = results["l2"]
    assert l2[0][1] == min(s for _, s in l2)


def test_knn_against_numpy_oracle(spark, small_index):
    queries, mat, ids, names = small_index
    hits = knn_broadcast(queries, mat, ids, k=3, measure="cos").collect()
    q = encode_matrix(["googel", "apple", "meta platforms"]).astype(np.float64)
    m = mat.astype(np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    scores = qn @ mn.T
    for r in hits:
        qi = int(r["rid"][1:])
        j = ids.index(r["hit_id"])
        assert r["score"] == pytest.approx(scores[qi, j], abs=1e-6)


def test_hard_negatives_never_contain_golds(spark, small_index):
    """Mined negatives exclude golds (dense.py:114-120,
    tests/test_retriever.py:185-190)."""
    queries, mat, ids, _ = small_index
    golds = spark.createDataFrame(
        [("q0", ["000011"]), ("q1", ["000012", "000015"]), ("q2", ["000013"])],
        "rid string, labels array<string>",
    )
    k = 3
    hits = knn_broadcast(queries, mat, ids, k=k + 2, measure="cos")
    negs = hard_negatives(hits, golds, k=k)
    joined = negs.join(golds, "rid").filter(F.array_contains("labels", F.col("hit_id")))
    assert joined.count() == 0
    counts = negs.groupBy("rid").count().collect()
    assert all(r["count"] <= k for r in counts)
    # re-ranked 1..k dense
    ranks = [r["rank"] for r in negs.filter(F.col("rid") == "q1").orderBy("rank").collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def test_fused_me_top1_distinguishes_nul_colliding_aliases(spark):
    """Regression: pandas' string hashtable (factorize / multi-key
    drop_duplicates / groupby) hashes C-strings and truncates at an
    embedded NUL — two aliases like 'boreali stechnologies' vs
    'borealis technologies', whose fused b+NUL+norm_b keys share every
    byte around the NUL position, silently collapsed to one candidate
    inside the fused scorer's local dedup. Both must be scored and the
    argmax must match the unfused window plan."""
    import numpy as np
    from pyspark.sql import functions as F

    from mix_blink_spark.functions.embed import encode_matrix
    from mix_blink_spark.functions.strsim import levenshtein_sim
    from mix_blink_spark.operators.scoring import (
        fused_me_top1,
        make_broadcast_dense_udf,
        score_pairs,
    )

    surf = "boreali stechnologies"  # the mention-side norm
    aliases = [
        # the colliding non-exact alias comes FIRST: a NUL-truncating
        # dedup keeps the first occurrence, so the exact alias (which
        # must win) is the one that would be dropped
        ("ENT::E1", "borealis technologies"),
        ("ENT::E1", "boreali stechnologies"),  # exact -> must win
        ("ENT::E2", "borealis technologies"),
    ]
    s_ids = {"NORM::s1": 0}
    s_mat = encode_matrix([surf]).astype(np.float32)
    a_ids = {f"{r}\x00{nm}": i for i, (r, nm) in enumerate(aliases)}
    a_mat = encode_matrix([nm for _, nm in aliases]).astype(np.float32)
    bc_s = spark.sparkContext.broadcast((s_ids, s_mat))
    bc_e = spark.sparkContext.broadcast((a_ids, a_mat))

    pairs = (
        spark.createDataFrame(
            [("NORM::s1", r, surf, nm) for r, nm in aliases],
            "a string, b string, norm_a string, norm_b string",
        )
        # ONE partition: the local dedup only sees rows that share a
        # partition, and a 3-row default-parallelism frame scatters them
        .coalesce(1)
        .withColumn("lev", levenshtein_sim(F.col("norm_a"), F.col("norm_b")))
    )

    fused = fused_me_top1(pairs, "cos", 0.5, 0.0, bc_s, bc_e).collect()

    dense_udf = make_broadcast_dense_udf("cos", bc_s, bc_e)
    scored = score_pairs(
        pairs.withColumn(
            "dense",
            dense_udf(F.col("a"), F.concat_ws("\x00", F.col("b"), F.col("norm_b"))),
        ),
        "cos",
        0.5,
        dense_col="dense",
    ).collect()
    best = max(scored, key=lambda r: (r["score"], [-ord(c) for c in r["b"]]))

    assert len(fused) == 1
    w = fused[0]
    assert (w["b"], w["score"]) == (best["b"], best["score"])
    # the exact alias scores jw=1.0; if the NUL-colliding dedup dropped it
    # the winner's jw would be < 1
    assert w["jw"] == 1.0


def test_fused_me_top1_mid_stream_drain_path(spark):
    """The size-capped intermediate drain (drain_rows) must not change the
    winners: run >2 chunks of candidates through one partition with
    drain_rows=1 (drain after every chunk) and with the default, and
    require identical output."""
    import numpy as np
    from pyspark.sql import functions as F

    from mix_blink_spark.functions.embed import encode_matrix
    from mix_blink_spark.functions.strsim import levenshtein_sim
    from mix_blink_spark.operators.scoring import fused_me_top1

    n_surf, n_ent = 400, 50
    surfs = [f"surf number {i}" for i in range(n_surf)]
    ents = [(f"ENT::E{j}", f"surf number {j * 8 % n_surf}") for j in range(n_ent)]
    s_ids = {f"NORM::s{i}": i for i in range(n_surf)}
    s_mat = encode_matrix(surfs).astype(np.float32)
    a_ids = {f"{r}\x00{nm}": i for i, (r, nm) in enumerate(ents)}
    a_mat = encode_matrix([nm for _, nm in ents]).astype(np.float32)
    bc_s = spark.sparkContext.broadcast((s_ids, s_mat))
    bc_e = spark.sparkContext.broadcast((a_ids, a_mat))

    # ~20k candidate rows -> 3 chunks of 8192 in one partition
    rows = [
        (f"NORM::s{i}", r, surfs[i], nm)
        for i in range(n_surf)
        for (r, nm) in ents
    ]
    pairs = (
        spark.createDataFrame(
            rows, "a string, b string, norm_a string, norm_b string"
        )
        .coalesce(1)
        .withColumn("lev", levenshtein_sim(F.col("norm_a"), F.col("norm_b")))
    )

    def run(drain):
        out = fused_me_top1(pairs, "cos", 0.5, 0.3, bc_s, bc_e, drain_rows=drain)
        return {(r["a"], r["b"]): (r["dense"], r["jw"], r["lev"], r["score"])
                for r in out.collect()}

    drained = run(1)
    default = run(200_000)
    assert drained == default and len(default) > 0


def test_fused_me_top1_rejects_nul_in_ids(spark):
    """NUL-free ids are a CONTRACT (round-6 ADVICE): pandas 2.2 string
    hashing truncates at embedded NUL, so an entity id containing one would
    silently collapse distinct entities in the fused kernel's local dedup
    (and make the b+NUL+norm_b broadcast key ambiguous). The kernel must
    refuse loudly, not collapse silently."""
    import pytest
    from pyspark.sql import functions as F

    from mix_blink_spark.functions.strsim import levenshtein_sim
    from mix_blink_spark.operators.scoring import fused_me_top1

    emb = [1.0, 0.0, 0.0, 0.0]
    rows = [
        ("s1", "E\x001", "acme corp", "acme corporation", emb, emb),
        ("s1", "E\x002", "acme corp", "acme corporation", emb, emb),
    ]
    pairs = spark.createDataFrame(
        rows,
        "a string, b string, norm_a string, norm_b string, "
        "emb_a array<double>, emb_b array<double>",
    ).withColumn("lev", levenshtein_sim(F.col("norm_a"), F.col("norm_b")))
    with pytest.raises(Exception, match="embedded NUL"):
        fused_me_top1(pairs, "cos", 0.5, 0.3).collect()
