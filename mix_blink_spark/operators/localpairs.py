"""Driver-local blocking + pair scoring for dimension-scale surface sets.

Same hybrid-physical-strategy rationale as ``operators.cc``'s union-find
path: the distributed pairs DAG is ~20 Spark stages (block histograms,
self-joins, windows, dedups, three scoring kernels, a top-1 window), and
on dimension-scale inputs (hundreds to tens of thousands of distinct
surfaces) every stage is pure scheduling + Python-worker round-trip
overhead — measured ~13 s of the 62 s local[4] bench leg at 625 surfaces,
a fixed cost that caps N→4N scaling efficiency. Below
``LinkConfig.driver_pairs_limit`` the SAME semantics run as plain
numpy/python on the driver in ~0.1 s; above it the distributed path
(which survives any vocabulary) takes over.

Semantics mirrored 1:1 from the distributed operators (gated by the
parity test in tests/test_pipeline_e2e.py, which compares both paths
pair-for-pair and bit-for-bit on scores):

  - keys: ``keyed_records``'s tk/st/minhash-band families
    (functions.text.blocking_key / sorted_token_key,
    operators.blocking._minhash_band_keys), array_union-deduped;
  - mm pairs: ``candidate_pairs`` — all pairs for blocks ≤ cap,
    sorted-neighborhood (order by norm, rid; ``w`` successors) above;
  - me pairs: ``cross_family_pairs`` — exact product for combined blocks
    ≤ cap, insertion-window over the norm-interleaved order above;
  - scores: float-identical composition (same float32 matrices through
    ``_dense_np``, ``jaro_winkler_np``, vectorized Levenshtein matching
    ``F.levenshtein``, same combine arithmetic);
  - me top-1 per surface: (score desc, b, norm_b) tie-break, tau_ent
    threshold after ranking.
"""

from __future__ import annotations

import numpy as np

from ..functions.strsim import jaro_winkler_np
from .blocking import DEFAULT_BANDS, DEFAULT_ROWS, DEFAULT_SHINGLE, _minhash_band_keys
from .scoring import _dense_np


def record_keys(norm: str, _memo: dict | None = None) -> list[str]:
    """Python mirror of ``keyed_records``'s key expression: distinct of
    [tk:<first token>, st:<sorted tokens>, mh<i>:<band sig>...].

    ``_memo``: optional per-call-site dict memoizing each distinct
    SHINGLE's (bands x rows) blake2b digests — the same memoization the
    distributed ``minhash_band_keys`` UDF applies (surface vocabularies
    share shingles heavily); identical keys, ~3x fewer digest calls at
    bench vocabulary (round 8)."""
    tk = "tk:" + norm.split(" ", 1)[0]
    st = "st:" + " ".join(sorted(norm.split(" ")))
    if not norm:
        return list(dict.fromkeys([tk, st]))
    if _memo is None:
        mh = _minhash_band_keys(norm, DEFAULT_BANDS, DEFAULT_ROWS, DEFAULT_SHINGLE)
        return list(dict.fromkeys([tk, st, *mh]))
    import numpy as np
    from hashlib import blake2b

    B, R, SH = DEFAULT_BANDS, DEFAULT_ROWS, DEFAULT_SHINGLE
    salts = _memo.setdefault(
        "__salts__", [b"%d:%d" % (b, r) for b in range(B) for r in range(R)]
    )
    padded = f" {norm} "
    grams = (
        {padded[i : i + SH] for i in range(len(padded) - SH + 1)}
        if len(padded) >= SH
        else {padded}
    )
    rows = []
    for g in grams:
        v = _memo.get(g)
        if v is None:
            enc = g.encode("utf-8")
            v = _memo[g] = np.array(
                [
                    int.from_bytes(blake2b(enc, digest_size=8, key=s).digest(), "big")
                    for s in salts
                ],
                dtype=np.uint64,
            )
        rows.append(v)
    mins = np.minimum.reduce(rows)
    mh = [
        f"mh{b}:" + "-".join(format(int(mins[b * R + r]), "x") for r in range(R))
        for b in range(B)
    ]
    return list(dict.fromkeys([tk, st, *mh]))


def levenshtein_np(sa: list[str], sb: list[str]) -> np.ndarray:
    """Vectorized Levenshtein distance (int), matching ``F.levenshtein``
    (plain edit distance over codepoints). Row-DP over character
    positions, vectorized across pairs.

    The DP costs max(len_a) x max(len_b) iterations for the WHOLE batch,
    so one long outlier norm forces every pair through its padded grid —
    round 8 buckets pairs by max length (sorted, chunked at power-of-two
    bounds) and runs the identical per-pair DP per bucket: exact same
    distances (each pair's DP is independent), ~3x less padded work at
    the bench vocabulary where this kernel was ~60% of the driver-local
    me-pair tail every leg pays."""
    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    ml_all = np.fromiter((max(len(a), len(b)) for a, b in zip(sa, sb)), np.int64, n)
    if n > 512 and int(ml_all.max()) > 8:
        out = np.empty(n, dtype=np.int64)
        order = np.argsort(ml_all, kind="stable")
        bound = 8
        start = 0
        while start < n:
            end = start
            while end < n and ml_all[order[end]] <= bound:
                end += 1
            if end > start:
                idx = order[start:end]
                out[idx] = _levenshtein_np_flat(
                    [sa[i] for i in idx], [sb[i] for i in idx]
                )
                start = end
            bound *= 2
        return out
    return _levenshtein_np_flat(sa, sb)


def _levenshtein_np_flat(sa: list[str], sb: list[str]) -> np.ndarray:
    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    l1 = np.fromiter((len(s) for s in sa), np.int64, n)
    l2 = np.fromiter((len(s) for s in sb), np.int64, n)
    L1, L2 = int(l1.max()), int(l2.max())
    out = np.where(l1 == 0, l2, l1)  # correct whenever the other side is 0
    if L1 == 0 or L2 == 0:
        return out
    A = np.zeros((n, L1), dtype=np.uint32)
    B = np.zeros((n, L2), dtype=np.uint32)
    for i, s in enumerate(sa):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(sb):
        if s:
            B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    prev = np.tile(np.arange(L2 + 1, dtype=np.int64), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, L1 + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, L2 + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost, out=cur[:, j])
        # record finished rows: DP cell (l1, l2) only depends on the
        # un-padded prefixes, so reading it at i == l1 is exact
        done = l1 == i
        if done.any():
            out[done] = cur[done, l2[done]]
        prev, cur = cur, prev
    return out


def _score(
    ia: np.ndarray,
    ib: np.ndarray,
    mat_a: np.ndarray,
    mat_b: np.ndarray,
    norms_a: list[str],
    norms_b: list[str],
    measure: str,
    dense_weight: float,
):
    """(dense, jw, lev_sim, score) arrays — float-identical to the
    distributed composition in operators.scoring.score_pairs."""
    dense = _dense_np(
        mat_a[ia].astype(np.float64), mat_b[ib].astype(np.float64), measure
    )
    dense_sim = (1.0 / (1.0 + dense)) if measure == "l2" else dense
    jw = jaro_winkler_np(norms_a, norms_b)
    lev = levenshtein_np(norms_a, norms_b)
    la = np.fromiter((len(s) for s in norms_a), np.int64, len(norms_a))
    lb = np.fromiter((len(s) for s in norms_b), np.int64, len(norms_b))
    ml = np.maximum(la, lb)
    lev_sim = np.where(ml == 0, 1.0, 1.0 - lev / np.maximum(ml, 1).astype(np.float64))
    lex = np.maximum(jw, lev_sim)
    score = dense_weight * dense_sim + (1.0 - dense_weight) * lex
    return dense, jw, lev_sim, score


def local_mm_pairs(
    surfs: list[tuple[str, str]],
    mat: np.ndarray,
    measure: str,
    dense_weight: float,
    max_block_size: int,
    neighborhood: int,
) -> list[tuple]:
    """``candidate_pairs`` + ``score_pairs`` on the driver.

    ``surfs``: [(rid, norm)] aligned with ``mat`` rows. Returns rows
    (a, b, dense, jw, lev, score) with a < b, deduped across keys."""
    by_key: dict[str, list[int]] = {}
    memo: dict = {}
    for i, (_rid, norm) in enumerate(surfs):
        if not norm:
            continue
        for k in record_keys(norm, memo):
            by_key.setdefault(k, []).append(i)

    pair_idx: dict[tuple[str, str], tuple[int, int]] = {}
    for members in by_key.values():
        if len(members) <= 1:
            continue
        if len(members) <= max_block_size:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    a, b = (i, j) if surfs[i][0] < surfs[j][0] else (j, i)
                    pair_idx.setdefault((surfs[a][0], surfs[b][0]), (a, b))
        else:
            ranked = sorted(members, key=lambda i: (surfs[i][1], surfs[i][0]))
            for x in range(len(ranked)):
                for y in range(x + 1, min(x + 1 + neighborhood, len(ranked))):
                    i, j = ranked[x], ranked[y]
                    a, b = (i, j) if surfs[i][0] < surfs[j][0] else (j, i)
                    pair_idx.setdefault((surfs[a][0], surfs[b][0]), (a, b))

    if not pair_idx:
        return []
    items = list(pair_idx.values())
    ia = np.fromiter((p[0] for p in items), np.int64, len(items))
    ib = np.fromiter((p[1] for p in items), np.int64, len(items))
    na = [surfs[i][1] for i in ia]
    nb = [surfs[i][1] for i in ib]
    dense, jw, lev_sim, score = _score(ia, ib, mat, mat, na, nb, measure, dense_weight)
    return [
        (surfs[ia[k]][0], surfs[ib[k]][0], float(dense[k]), float(jw[k]), float(lev_sim[k]), float(score[k]))
        for k in range(len(items))
    ]


def local_me_pairs(
    surfs: list[tuple[str, str]],
    s_mat: np.ndarray,
    aliases: list[tuple[str, str]],
    a_mat: np.ndarray,
    measure: str,
    dense_weight: float,
    tau_ent: float,
    max_block_size: int | None,
    neighborhood: int,
) -> list[tuple]:
    """``cross_family_pairs`` + scoring + top-1 anchor on the driver.

    ``aliases``: [(rid, norm)] aligned with ``a_mat`` rows. Returns rows
    (a, b, dense, jw, lev, score): each surface's best (score desc, b,
    norm_b) alias with score >= tau_ent."""
    left: dict[str, list[int]] = {}
    right: dict[str, list[int]] = {}
    memo: dict = {}
    for i, (_rid, norm) in enumerate(surfs):
        for k in record_keys(norm, memo):
            left.setdefault(k, []).append(i)
    for i, (_rid, norm) in enumerate(aliases):
        for k in record_keys(norm, memo):
            right.setdefault(k, []).append(i)

    cand: dict[tuple[str, str, str], tuple[int, int]] = {}
    for key, lmem in left.items():
        rmem = right.get(key)
        if not rmem:
            continue
        if max_block_size is None or len(lmem) + len(rmem) <= max_block_size:
            for i in lmem:
                if not surfs[i][1]:
                    continue
                for j in rmem:
                    if aliases[j][1]:
                        cand.setdefault((surfs[i][0], aliases[j][0], aliases[j][1]), (i, j))
        else:
            # insertion-window: interleave by (norm, side DESC — 'R'
            # before 'L' at equal norm — rid); rpos = count of R rows
            # at-or-before; pair each L with the R rows whose rank is in
            # (rpos - w, rpos + w] — cross_family_pairs' big-key branch
            combo = [(surfs[i][1], 1, surfs[i][0], i) for i in lmem if surfs[i][1]] + [
                (aliases[j][1], 0, aliases[j][0], j) for j in rmem if aliases[j][1]
            ]
            combo.sort()
            rcount = 0
            rlist: list[tuple[int, int]] = []  # (rank among R rows, alias idx)
            lrows: list[tuple[int, int]] = []  # (rpos at the L row, surface idx)
            for _norm, side_l, _rid, idx in combo:
                if side_l == 0:
                    rcount += 1
                    rlist.append((rcount, idx))
                else:
                    lrows.append((rcount, idx))
            for rpos, i in lrows:
                for rp, j in rlist:
                    if rpos - neighborhood < rp <= rpos + neighborhood:
                        cand.setdefault((surfs[i][0], aliases[j][0], aliases[j][1]), (i, j))

    if not cand:
        return []
    items = list(cand.values())
    ia = np.fromiter((p[0] for p in items), np.int64, len(items))
    ib = np.fromiter((p[1] for p in items), np.int64, len(items))
    na = [surfs[i][1] for i in ia]
    nb = [aliases[i][1] for i in ib]
    # Only each surface's top-1 candidate survives, so the Levenshtein DP
    # (the dominant cost of this tail at bench vocabulary — ~60% of the
    # kernel) only needs to run where a pair could still win. Exact
    # bounds: lev >= |la-lb| gives lev_sim <= 1 - |la-lb|/ml (ub), and
    # lev_sim >= 0 gives score >= dw*dense + (1-dw)*jw (lb). A pair whose
    # ub-score is below its surface's best lb-score is strictly worse
    # than the true winner (winner's exact score >= every lb), so
    # dropping it cannot change the argmax or its emitted values; ties at
    # equality are kept (>=). Winners' (dense, jw, lev, score) are
    # computed with the identical float64 expressions as _score, so the
    # output rows are bit-identical to the unpruned path (parity-gated in
    # tests/test_pipeline_e2e.py against the distributed operators).
    dense = _dense_np(
        s_mat[ia].astype(np.float64), a_mat[ib].astype(np.float64), measure
    )
    dense_sim = (1.0 / (1.0 + dense)) if measure == "l2" else dense
    jw = jaro_winkler_np(na, nb)
    la = np.fromiter((len(s) for s in na), np.int64, len(na))
    lb_ = np.fromiter((len(s) for s in nb), np.int64, len(nb))
    ml = np.maximum(la, lb_)
    lev_ub = np.where(
        ml == 0, 1.0, 1.0 - np.abs(la - lb_) / np.maximum(ml, 1).astype(np.float64)
    )
    w2 = 1.0 - dense_weight
    ub_score = dense_weight * dense_sim + w2 * np.maximum(jw, lev_ub)
    lb_score = dense_weight * dense_sim + w2 * jw
    best_lb = np.full(len(surfs), -np.inf)
    np.maximum.at(best_lb, ia, lb_score)
    keep = np.flatnonzero(ub_score >= best_lb[ia])
    lev = levenshtein_np([na[i] for i in keep], [nb[i] for i in keep])
    mlk = ml[keep]
    lev_sim_k = np.where(
        mlk == 0, 1.0, 1.0 - lev / np.maximum(mlk, 1).astype(np.float64)
    )
    lex_k = np.maximum(jw[keep], lev_sim_k)
    score_k = dense_weight * dense_sim[keep] + (1.0 - dense_weight) * lex_k

    best: dict[str, tuple] = {}
    for j, k in enumerate(keep):
        a = surfs[ia[k]][0]
        b = aliases[ib[k]][0]
        nb_k = aliases[ib[k]][1]
        # rank key mirrors Window.orderBy(score desc, b, norm_b)
        rank = (-score_k[j], b, nb_k)
        if a not in best or rank < best[a][0]:
            best[a] = (rank, (a, b, float(dense[k]), float(jw[k]), float(lev_sim_k[j]), float(score_k[j])))
    return [row for _rank, row in best.values() if row[5] >= tau_ent]
