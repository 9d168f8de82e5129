"""Raw-vector vs RESIDUAL PQ codes on the clustered corpus — the
measurement behind sim_topk_ivfpq_res's regime claim.

Replays the repo's closed-form clustered fixture (plans/ann_index.py
K_CLUST/LCG/md5 derivation — the same bytes both engines derive) in
IEEE doubles and compares the two code families at the SAME 8 × 16
code budget: candidates come from the query's own cluster cell
(CLUST_PROBE = 1, the clustered serving path), are pre-ranked by ADC
under (a) codes of the raw vectors, (b) codes of the residuals
x − centroid(cell(x)) with the coarse term <q, c> added back, then the
top-D survivors get exact-cosine rerank. recall@10 vs global
brute-force truth per depth D.

Usage: python tools/residual_pq_eval.py [n_vectors]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dist_mapreduce_spark.plans.ann_index import (  # noqa: E402
    CLUST_MUL,
    K_CLUST,
    _py_clust_centroid,
    _py_clust_vec,
)
from dist_mapreduce_spark.plans.similarity import (  # noqa: E402
    PQ_CAP,
    PQ_DSUB,
    PQ_K,
    PQ_M,
    PQ_MOD,
    PQ_REM,
    TOP_K,
    py_dot,
)

N_Q = 5


def _cos(a, b):
    import math

    return py_dot(a, b) / (math.sqrt(py_dot(a, a)) * math.sqrt(py_dot(b, b)))


def _encode(v, book):
    codes = []
    for m in range(PQ_M):
        sub = v[m * PQ_DSUB : (m + 1) * PQ_DSUB]
        best, bd = 0, None
        for c, cw in enumerate(book[m]):
            d = sum((x - y) * (x - y) for x, y in zip(sub, cw))
            if bd is None or d < bd:
                best, bd = c, d
        codes.append(best)
    return codes


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    vecs = {i: _py_clust_vec(i) for i in range(n)}
    cell = {i: (i * CLUST_MUL) % 4294967296 % K_CLUST for i in range(n)}
    cents = {g: _py_clust_centroid(g) for g in range(K_CLUST)}

    sample = [i for i in range(min(n, PQ_CAP)) if i % PQ_MOD == PQ_REM][:PQ_K]
    raw_book = [
        [vecs[s][m * PQ_DSUB : (m + 1) * PQ_DSUB] for s in sample]
        for m in range(PQ_M)
    ]
    res = {
        s: [x - y for x, y in zip(vecs[s], cents[cell[s]])] for s in sample
    }
    res_book = [
        [res[s][m * PQ_DSUB : (m + 1) * PQ_DSUB] for s in sample]
        for m in range(PQ_M)
    ]

    raw_codes = {i: _encode(vecs[i], raw_book) for i in range(n)}
    res_codes = {
        i: _encode(
            [x - y for x, y in zip(vecs[i], cents[cell[i]])], res_book
        )
        for i in range(n)
    }

    truth = {}
    for q in range(N_Q):
        scored = sorted(
            ((_cos(vecs[q], vecs[i]), -i) for i in range(n) if i != q),
            reverse=True,
        )
        truth[q] = {-neg for _, neg in scored[:TOP_K]}

    print(f"clustered corpus n={n}, k={K_CLUST}, probe=1, "
          f"codes {PQ_M}x{PQ_K}")
    print(f"{'depth':>6} {'raw_recall':>11} {'res_recall':>11}")
    for depth in (16, 32, 64, 128, 256):
        hits = {"raw": 0, "res": 0}
        for q in range(N_Q):
            cands = [i for i in range(n) if cell[i] == cell[q] and i != q]
            qlut_raw = [
                [py_dot(vecs[q][m * PQ_DSUB : (m + 1) * PQ_DSUB], cw)
                 for cw in raw_book[m]]
                for m in range(PQ_M)
            ]
            qlut_res = [
                [py_dot(vecs[q][m * PQ_DSUB : (m + 1) * PQ_DSUB], cw)
                 for cw in res_book[m]]
                for m in range(PQ_M)
            ]
            qc = py_dot(vecs[q], cents[cell[q]])
            for tag, codes, lut, base in (
                ("raw", raw_codes, qlut_raw, 0.0),
                ("res", res_codes, qlut_res, qc),
            ):
                adc = sorted(
                    (
                        (sum(lut[m][codes[i][m]] for m in range(PQ_M)) + base,
                         -i)
                        for i in cands
                    ),
                    reverse=True,
                )
                top = [-neg for _, neg in adc[:depth]]
                rer = sorted(
                    ((_cos(vecs[q], vecs[i]), -i) for i in top), reverse=True
                )
                got = {-neg for _, neg in rer[:TOP_K]}
                hits[tag] += len(got & truth[q])
        denom = N_Q * TOP_K
        print(f"{depth:>6} {hits['raw'] / denom:>11.3f} "
              f"{hits['res'] / denom:>11.3f}")


if __name__ == "__main__":
    main()
