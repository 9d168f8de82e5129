"""GEMM assignment path (round 11): the numpy/BLAS centroid
assignment must land every vector in the same cell as the
oracle-gated literal-expression path — on the real gate corpus, on
the dense chunk corpus, and on every degenerate row shape the literal
path tolerates (the contract gemm_assign_cells documents)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _cells_map(df):
    return {int(r["vec_id"]): int(r["cell"]) for r in df.collect()}


def test_gemm_matches_literal_on_gate_corpus(spark):
    """Argmax-cell set-equality on the sf0.001 embeddings table under
    the trained quantizer — the pin the round-10 verdict asks for."""
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )
    from dist_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cent_rows, _n = trained_quantizer(emb)
    assert cent_rows
    lit = _cells_map(
        assign_cells(spark, emb, cent_rows, mode="literal").select(
            "vec_id", "cell"
        )
    )
    gem = _cells_map(
        assign_cells(spark, emb, cent_rows, mode="gemm").select(
            "vec_id", "cell"
        )
    )
    assert lit == gem
    assert len(lit) == emb.count()


def test_gemm_matches_literal_on_dense_chunks(spark):
    """Same pin over the DERIVED corpus the dense index assigns — the
    stress-scale case the GEMM path exists for."""
    from dist_mapreduce_spark.plans.rag import _dense_chunk_vectors
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )

    cv = _dense_chunk_vectors(spark, SF_SMOKE).localCheckpoint()
    cent_rows, _n = trained_quantizer(cv.select("vec_id", "embedding"))
    assert cent_rows
    lit = _cells_map(
        assign_cells(spark, cv, cent_rows, mode="literal").select(
            "vec_id", "cell"
        )
    )
    gem = _cells_map(
        assign_cells(spark, cv, cent_rows, mode="gemm").select(
            "vec_id", "cell"
        )
    )
    assert lit == gem


def test_gemm_degenerate_rows_match_literal(spark):
    """NULL vector, ragged length, zero vector, NaN element: the
    literal path folds every score to NULL (or −0.0 ties) and the
    min-cent_id tiebreak wins — the GEMM path must replicate each."""
    from dist_mapreduce_spark.plans.similarity import assign_cells

    cents = [(3, [1.0, 0.0, 0.0]), (7, [0.0, 1.0, 0.0]), (9, [0.5, 0.5, 0.5])]
    rows = [
        (1, [0.9, 0.1, 0.0]),        # normal → cid 3
        (2, None),                   # NULL vector
        (3, [0.5]),                  # ragged
        (4, [0.0, 0.0, 0.0]),        # zero vector: all scores −0.0
        (5, [float("nan"), 1.0, 1.0]),  # NaN element
        (6, [0.0, 0.0, 1.0]),        # → cid 9
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit = _cells_map(
        assign_cells(spark, df, cents, mode="literal").select(
            "vec_id", "cell"
        )
    )
    gem = _cells_map(
        assign_cells(spark, df, cents, mode="gemm").select("vec_id", "cell")
    )
    assert lit == gem
    # The degenerate rows all land in the smallest cent_id.
    for vid in (2, 3, 4, 5):
        assert lit[vid] == 3
    assert lit[1] == 3 and lit[6] == 9


def test_gemm_inf_element_raises_literal_unchanged(spark):
    """Round-12 (verdict item #2): a ±inf embedding ELEMENT is the one
    degenerate shape where the literal path can rank a real winner
    while the old GEMM guard silently routed to min-cent_id — the GEMM
    path must now refuse LOUDLY, and the literal path's behavior must
    be unchanged (it still assigns a cell without raising)."""
    from dist_mapreduce_spark.plans.similarity import assign_cells

    cents = [(3, [1.0, 0.0, 0.0]), (7, [0.0, 1.0, 0.0])]
    rows = [(1, [0.9, 0.1, 0.0]), (2, [float("inf"), 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # Literal mode: no error; the inf row ranks a real winner (dot with
    # cid 3 = +inf beats cid 7's finite score).
    lit = _cells_map(
        assign_cells(spark, df, cents, mode="literal").select(
            "vec_id", "cell"
        )
    )
    assert lit[1] == 3 and lit[2] == 3
    # GEMM mode: the contract is enforced inline — loud failure, never
    # a silent misplacement.
    with pytest.raises(Exception, match="inf"):
        assign_cells(spark, df, cents, mode="gemm").collect()


def test_gemm_zero_norm_centroid_raises(spark):
    """The literal path aborts (ANSI DIVIDE_BY_ZERO) on a zero-norm
    centroid; the GEMM path must refuse up front, not invent a cell."""
    from dist_mapreduce_spark.plans.similarity import gemm_assign_cells

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero-norm"):
        gemm_assign_cells(df, [(0, [0.0, 0.0]), (1, [1.0, 0.0])])


def test_gemm_tiebreak_is_min_cent_id(spark):
    """Duplicate centroids score exactly equal under BOTH paths (the
    GEMM computes identical columns identically), so the tie must fall
    to the smaller cent_id in both."""
    from dist_mapreduce_spark.plans.similarity import assign_cells

    cents = [(2, [0.6, 0.8]), (5, [0.6, 0.8])]
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [-1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    lit = _cells_map(
        assign_cells(spark, df, cents, mode="literal").select(
            "vec_id", "cell"
        )
    )
    gem = _cells_map(
        assign_cells(spark, df, cents, mode="gemm").select("vec_id", "cell")
    )
    assert lit == gem == {1: 2, 2: 2}


def test_gemm_preserves_extra_columns(spark):
    """gemm_assign_cells must carry every input column through the
    Arrow stage — the dense build rides doc_id/chunk_id alongside."""
    from dist_mapreduce_spark.plans.similarity import gemm_assign_cells

    df = spark.createDataFrame(
        [(1, 10, [1.0, 0.0]), (2, 20, [0.0, 1.0])],
        "vec_id long, extra long, embedding array<double>",
    )
    out = gemm_assign_cells(df, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    got = {
        (int(r["vec_id"]), int(r["extra"]), int(r["cell"]))
        for r in out.collect()
    }
    assert got == {(1, 10, 0), (2, 20, 1)}


def test_kmeans_gemm_assignment_bit_identical(spark):
    """The trainer's int64 GEMM twin is BIT-IDENTICAL (not merely
    set-equal): exact integer arithmetic has no accumulation order to
    disagree about. Pin (a) per-row cluster equality of one assignment
    pass including degenerate rows, and (b) the trained centroids of a
    full 5-round run being list-equal under both modes."""
    import os

    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.iterative import (
        kmeans_assign,
        kmeans_assign_gemm,
        train_kmeans_centroids_df,
    )
    from dist_mapreduce_spark.plans.similarity import ASSIGN_MODE_ENV
    from dist_mapreduce_spark.sources.tables import load_table

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * (1 << 20)).cast("long"),
            ).alias("q"),
        )
    )
    cents = [
        [int(x) for x in r["q"]]
        for r in emb.orderBy("vec_id").limit(13).collect()
    ]
    lit = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign(emb, cents).collect()
    }
    gem = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign_gemm(emb, cents).collect()
    }
    assert lit == gem

    # Degenerate rows: NULL q, ragged, NULL element -> cluster 0 both.
    dg = spark.createDataFrame(
        [(1, None), (2, [1, 2]), (3, [None] + [0] * 63)],
        "vec_id long, q array<long>",
    )
    c2 = [[5] * 64, [0] * 64]
    lit2 = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign(dg, c2).collect()
    }
    gem2 = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign_gemm(dg, c2).collect()
    }
    assert lit2 == gem2 == {1: 0, 2: 0, 3: 0}

    # Full training run: centroids list-equal under both modes
    # (explicit env pins — the process default is gemm since r13).
    os.environ[ASSIGN_MODE_ENV] = "literal"
    try:
        want = train_kmeans_centroids_df(emb, 13)
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    os.environ[ASSIGN_MODE_ENV] = "gemm"
    try:
        got = train_kmeans_centroids_df(emb, 13)
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    assert got == want


def test_gemm_rank_cells_matches_literal_prefix(spark):
    """Round-12: the top-R residency ranking (the kNN build's
    assignment stage) must pick the same R cells in the same order as
    the literal ranked expression's prefix, on the real gate corpus."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.similarity import (
        gemm_rank_cells,
        ivf_cent_rows,
        ivf_ranked_cells_sql,
    )
    from dist_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cent_rows = ivf_cent_rows(emb)
    assert cent_rows
    ranked = ivf_ranked_cells_sql(cent_rows)
    lit = {
        int(r["vec_id"]): [int(c) for c in r["rcells"]]
        for r in emb.select(
            "vec_id",
            F.expr(f"transform(slice({ranked}, 1, 2), x -> x.c)").alias(
                "rcells"
            ),
        ).collect()
    }
    gem = {
        int(r["vec_id"]): [int(c) for c in r["rcells"]]
        for r in gemm_rank_cells(emb, cent_rows, 2)
        .select("vec_id", "rcells")
        .collect()
    }
    assert lit == gem


def test_gemm_rank_cells_degenerates_and_inf(spark):
    """Degenerate rows fold every literal score to NULL → ALL
    centroids tie → the R smallest cent_ids, in order; ±inf raises
    (the enforced contract, same as gemm_assign_cells)."""
    from dist_mapreduce_spark.plans.similarity import gemm_rank_cells

    cents = [(3, [1.0, 0.0]), (7, [0.0, 1.0]), (9, [0.5, 0.5])]
    rows = [
        (1, [1.0, 0.1]),              # normal: 3 then 9
        (2, None),
        (3, [0.5]),
        (4, [float("nan"), 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        int(r["vec_id"]): [int(c) for c in r["rcells"]]
        for r in gemm_rank_cells(df, cents, 2).collect()
    }
    assert got[2] == got[3] == got[4] == [3, 7]
    assert got[1][0] == 3
    bad = spark.createDataFrame(
        [(1, [float("-inf"), 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="inf"):
        gemm_rank_cells(bad, cents, 2).collect()


def test_gemm_rank_cells_near_tie_rescored(spark):
    """Round-13 (advice item): a GEMM score within _GEMM_RANK_EPS of
    the Rth-best must be finalized by the EXACT literal fold, not the
    BLAS number — pinned on a fixture whose top-2 scores differ by
    ~1e-10 (inside the band, so the rescore branch runs) and on an
    exact tie (scaled duplicate direction — dot/|c| is
    scale-invariant, so the min-cent_id order must win)."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.similarity import (
        gemm_rank_cells,
        ivf_ranked_cells_sql,
    )

    # cid 3 scores exactly 1.0; cid 7 scores 1/sqrt(1+1.96e-10)
    # ≈ 1 − 9.8e-11 — a gap 10× inside the 1e-9 band.
    cents = [(3, [1.0, 0.0]), (7, [1.0, 1.4e-5]), (9, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    ranked = ivf_ranked_cells_sql(cents)
    lit = [
        int(c)
        for c in df.select(
            F.expr(f"transform(slice({ranked}, 1, 2), x -> x.c)").alias("rc")
        ).collect()[0]["rc"]
    ]
    gem = [
        int(c)
        for c in gemm_rank_cells(df, cents, 2).collect()[0]["rcells"]
    ]
    assert lit == gem == [3, 7]

    # Exact tie: duplicate centroids compute the SAME doubles — the
    # prefix order must fall to cent_id ascending through the rescore.
    cents2 = [(2, [0.6, 0.8]), (5, [0.6, 0.8]), (8, [-1.0, 0.0])]
    df2 = spark.createDataFrame(
        [(1, [0.6, 0.8])], "vec_id long, embedding array<double>"
    )
    got = [
        int(c)
        for c in gemm_rank_cells(df2, cents2, 2).collect()[0]["rcells"]
    ]
    assert got == [2, 5]


def test_knn_graph_gemm_equals_literal(spark):
    """Round-12 verdict item #1's pin: the GEMM-accelerated kNN graph
    build (gemm residency ranking + blockwise BLAS candidate
    pre-selection + exact rescore) is BIT-IDENTICAL to the literal
    build — full (src, dst, score, rk) row equality, not just the
    edge set, because the surviving pairs are exact-rescored."""
    import os

    from dist_mapreduce_spark.plans.knn_graph import (
        q_knn_graph,
        q_knn_graph_collapsed,
    )
    from dist_mapreduce_spark.plans.similarity import ASSIGN_MODE_ENV

    os.environ[ASSIGN_MODE_ENV] = "literal"
    try:
        lit = sorted(
            tuple(r) for r in q_knn_graph(spark, SF_SMOKE).collect()
        )
        litc = sorted(
            tuple(r)
            for r in q_knn_graph_collapsed(spark, SF_SMOKE).collect()
        )
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    os.environ[ASSIGN_MODE_ENV] = "gemm"
    try:
        gem = sorted(
            tuple(r) for r in q_knn_graph(spark, SF_SMOKE).collect()
        )
        gemc = sorted(
            tuple(r)
            for r in q_knn_graph_collapsed(spark, SF_SMOKE).collect()
        )
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    assert lit and lit == gem
    assert litc and litc == gemc


def test_gemm_block_candidates_superset_with_degenerates(spark):
    """The GEMM pre-selection must keep every pair the exact build can
    rank into the top-K even when the block carries zero-norm, NaN,
    ragged and NULL-element vectors (non-finite scores keep ALL their
    pairs) — pinned by running the full build both ways on a
    hand-built degenerate corpus routed through a fake sf_dir."""
    import numpy as np

    from dist_mapreduce_spark.plans.knn_graph import pair_scores
    from dist_mapreduce_spark.plans.similarity import ASSIGN_MODE_ENV
    import os

    from pyspark.sql import functions as F

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 0.0, 0.0]),          # zero norm: NULL scores
        (3, [float("nan"), 1.0, 0.0]),  # NaN scores
        (4, [0.5, 0.5]),                # ragged
        (5, [None, 1.0, 1.0]),          # NULL element
        (6, [0.8, 0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # One block: every vector in the same (rcell, sub).
    res = df.select(
        "vec_id",
        "embedding",
        F.lit(0).cast("long").alias("rcell"),
        F.lit(0).cast("long").alias("sub"),
    )
    lit = sorted(
        (int(r["src_id"]), int(r["dst_id"]), r["score"])
        for r in pair_scores(res, df, mode="literal").collect()
    )
    os.environ[ASSIGN_MODE_ENV] = "gemm"
    try:
        gem = sorted(
            (int(r["src_id"]), int(r["dst_id"]), r["score"])
            for r in pair_scores(res, df).collect()
        )
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    # K=5, block of 7 → every pair survives pre-selection here, so the
    # scored sets must be IDENTICAL (NaN-safe compare).
    def norm(t):
        return [
            (s, d, "nan" if x is not None and np.isnan(x) else x)
            for s, d, x in t
        ]

    assert norm(lit) == norm(gem)


def test_gemm_small_finite_block_no_self_pairs(spark):
    """Round-13 (advice HIGH): a FULLY-FINITE block with c-1 <= KNN_K
    members drives the fast path's kth sentinel to -inf, where the
    masked diagonal (-inf) satisfies `-inf >= -inf - EPS` — the
    unmasked round-12 code emitted self-pairs (score 1.0, rank 1),
    displacing real neighbors. Pin: gemm == literal on a 5-member
    finite block, and the candidate set contains no src==dst pair.
    (The degenerate-corpus test above routes through the non-finite
    branch, which masks the diagonal correctly — this block must stay
    all-finite to hit the fast path.)"""
    import os

    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.knn_graph import (
        _gemm_block_candidates,
        pair_scores,
    )
    from dist_mapreduce_spark.plans.similarity import ASSIGN_MODE_ENV

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
        (4, [0.3, 0.3, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = df.select(
        "vec_id",
        "embedding",
        F.lit(0).cast("long").alias("rcell"),
        F.lit(0).cast("long").alias("sub"),
    )
    cand = {
        (int(r["src_id"]), int(r["dst_id"]))
        for r in _gemm_block_candidates(res).collect()
    }
    assert cand, "pre-selection must keep the finite pairs"
    assert not any(s == d for s, d in cand), "self-pairs leaked"
    lit = sorted(
        tuple(r) for r in pair_scores(res, df, mode="literal").collect()
    )
    os.environ[ASSIGN_MODE_ENV] = "gemm"
    try:
        gem = sorted(tuple(r) for r in pair_scores(res, df).collect())
    finally:
        os.environ.pop(ASSIGN_MODE_ENV, None)
    assert lit == gem
    assert not any(r[0] == r[1] for r in gem)


def test_probe_truth_gemm_equals_literal_and_adversarial(spark, tmp_path):
    """_probe_truth's GEMM pre-selection arm (the statistic behind
    knn_graph_recall and knn_graph_maintain) must be BIT-IDENTICAL to
    the literal oracle-shaped chain: (a) on the gate corpus, and
    (b) on an adversarial fixture with 20-way EXACT score ties at the
    K boundary (the guard band must keep every tie), a NULL
    embedding, a zero-norm vector (non-finite GEMM scores), a
    ragged-dim row, AND a probe with a NULL ELEMENT (vec_id < 50 —
    the float(None) driver-pull crash the review found: the kernel
    must classify it un-stackable and emit all its pairs for the
    exact rescore, exactly as the literal fold scores it NULL)."""
    from dist_mapreduce_spark.plans.knn_graph import _emb, _probe_truth
    from tests.conftest import SF_SMOKE

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    e = _emb(spark, SF_SMOKE)
    assert rows(_probe_truth(e, mode="literal")) == rows(
        _probe_truth(e, mode="gemm")
    )

    data = []
    for v in range(60):
        base = [((v % 7) * 13 + j) % 5 - 2.0 for j in range(8)]
        for r in range(20):
            data.append((v * 20 + r, [float(x) for x in base], 1))
    data.append((5000, None, 1))        # NULL embedding
    data.append((5001, [0.0] * 8, 1))   # zero norm -> non-finite
    data.append((5002, [1.0] * 4, 1))   # ragged dim
    data.append((7, [1.0, None] + [0.5] * 6, 1))  # NULL-element PROBE
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    lit = rows(_probe_truth(df, mode="literal"))
    gem = rows(_probe_truth(df, mode="gemm"))
    assert lit == gem and len(lit) > 0
