"""RAG-serving preparation operators: sliding-window document chunking
and MMR-diversified retrieval.

The reference has no retrieval surface (its one workload is word count,
worker.go:24-44); these extend the north-star LLM-pipeline family with
the two operators every retrieval-augmented stack runs between the raw
corpus and the prompt: chunk the documents into overlapping windows
(the unit that gets embedded and indexed), and diversify the final
top-k with Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
so near-duplicate passages don't crowd out coverage.

Parity rules as everywhere: token arrays use the repo-wide explicit
whitespace class (operators/text_analysis.WS_CHARS), counts are exact
integers, and every double is produced by the same single IEEE
operation sequence in both dialects (cosine via the shared fold twins;
MMR's lambda is 0.5 — a power of two, so lambda*x is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.functions.vectors import (
    cosine_duckdb_sql,
    cosine_spark_sql,
)
from dist_mapreduce_spark.operators import text_analysis as ta
from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

# ------------------------------------------------------------ chunking

#: Sliding-window geometry: 24-token chunks every 16 tokens (8-token
#: overlap) — the driver corpus averages ~54 whitespace tokens per
#: document, so a typical document yields 3-4 chunks. At 100 TB these
#: are tuning knobs; the plan shape below is invariant in them.
CHUNK_SIZE = 24
CHUNK_STRIDE = 16

_D_WS = f"[{ta.WS_CHARS}]"
_D_TOKS = f"list_filter(string_split_regex(text, '{_D_WS}+'), w -> w <> '')"


@query(
    "chunk_documents",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, {_D_TOKS} AS toks FROM documents
        ),
        st AS (
          SELECT doc_id, toks, CAST(s AS BIGINT) AS s
          FROM t, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)
        )
        SELECT doc_id,
               CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))])
                 AS BIGINT) AS n_tok,
               array_to_string(
                 toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))], ' ')
                 AS chunk_text
        FROM st
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document becomes ceil(n/stride)
    overlapping CHUNK_SIZE-token windows (the tail window may be
    shorter; a zero-token document yields no chunks in both engines —
    DuckDB's range(0,0) is empty, Spark's guarded sequence likewise).

    Scale shape: a PURE MAP + explode — zero shuffles, no window
    function, chunk boundaries depend only on the row itself, so the
    operator pipelines over the parquet scan at read throughput and
    partition counts carry over 1:1. This is the embedding-ingest
    front door: its output feeds the encoder fleet and then
    sim_index_build, so not shuffling here matters at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = ta.ws_tokens(F.col("text"))
    n = F.size(toks)
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.expr(
            f"transform(sequence(0, (size(filter(split(text,"
            f" '[{ta.WS_CHARS}]+'), w -> w != '')) - 1)"
            f" DIV {CHUNK_STRIDE}), i -> i * {CHUNK_STRIDE})"
        )
    )
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_SIZE)).alias(
                "chunk"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("long").alias("n_tok"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


# ------------------------------------------------------- MMR retrieval

#: MMR geometry: diversify the final 5 from the top-20 cosine
#: candidates per query, lambda = 0.5 (a power of two: 0.5*x is one
#: exact IEEE multiply in both engines).
MMR_CAND = 20
MMR_K = 5
MMR_QUERIES = 5  # vec_id < 5, the family's standard query batch


def _mmr_greedy_chain() -> tuple[list[str], str]:
    """The unrolled greedy selection as (CTE parts, final SELECT) —
    assumes `cand (query_id, vec_id, rel)` and `pair (query_id, a_id,
    b_id, s)` are already in scope. sel1 is the relevance argmax; each
    later step scores the remainder by 0.5*rel − 0.5*max(sim to the
    selected set) with a vec_id tiebreak. ONE definition shared by the
    brute-force, IVF-pruned, and dense-index MMR oracles (the Arrow
    twin is _mmr_greedy). MMR_K is small by definition (the final
    prompt budget), so unrolling is bounded."""
    parts = [
        f"sel1 AS (SELECT query_id, vec_id, rel,"
        f"  CAST(1 AS BIGINT) AS step, 0.5 * rel AS mmr FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id"
        f"   ORDER BY rel DESC, vec_id) AS rk FROM cand) WHERE rk = 1)",
    ]
    union = ["SELECT * FROM sel1"]
    for t in range(2, MMR_K + 1):
        prev_all = f"all{t - 1}"
        parts.append(
            f"{prev_all} AS MATERIALIZED ({' UNION ALL '.join(union)})"
        )
        parts.append(
            f"sel{t} AS (SELECT query_id, vec_id, rel,"
            f"  CAST({t} AS BIGINT) AS step, mmr FROM ("
            f"  SELECT r.query_id, r.vec_id, r.rel,"
            f"   0.5 * r.rel - 0.5 * max(p.s) AS mmr,"
            f"   row_number() OVER (PARTITION BY r.query_id"
            f"    ORDER BY 0.5 * r.rel - 0.5 * max(p.s) DESC, r.vec_id)"
            f"    AS rk"
            f"  FROM cand r"
            f"  JOIN {prev_all} d ON d.query_id = r.query_id"
            f"  JOIN pair p ON p.query_id = r.query_id"
            f"   AND p.a_id = r.vec_id AND p.b_id = d.vec_id"
            f"  WHERE r.vec_id NOT IN (SELECT vec_id FROM {prev_all} z"
            f"   WHERE z.query_id = r.query_id)"
            f"  GROUP BY r.query_id, r.vec_id, r.rel) WHERE rk = 1)"
        )
        union.append(f"SELECT * FROM sel{t}")
    final = (
        " SELECT query_id, step, vec_id, rel, mmr FROM ("
        + " UNION ALL ".join(union) + ") u"
    )
    return parts, final


def _mmr_oracle() -> str:
    """Brute-force MMR oracle: corpus-scan candidate pool + the shared
    greedy chain."""
    cos_qc = cosine_duckdb_sql("q.embedding", "c.embedding")
    cos_ab = cosine_duckdb_sql("ea.embedding", "eb.embedding")
    parts = [
        f"cand AS MATERIALIZED (SELECT query_id, vec_id, rel FROM ("
        f"  SELECT q.vec_id AS query_id, c.vec_id, {cos_qc} AS rel,"
        f"   row_number() OVER (PARTITION BY q.vec_id"
        f"    ORDER BY {cos_qc} DESC, c.vec_id) AS rk"
        f"  FROM embeddings q, embeddings c"
        f"  WHERE q.vec_id < {MMR_QUERIES} AND c.vec_id <> q.vec_id"
        f"   AND q.embedding IS NOT NULL AND c.embedding IS NOT NULL)"
        # rel IS NOT NULL: a zero-norm vector scores NULL (0/0) in both
        # dialects and must not enter the pool even when it is underfull
        # — NULLs rank after every non-NULL row under DESC NULLS LAST,
        # so the surviving top-MMR_CAND set is unchanged otherwise.
        f" WHERE rk <= {MMR_CAND} AND rel IS NOT NULL)",
        # Pairwise candidate-candidate sims inside each query's pool
        # (bounded: MMR_CAND^2 per query).
        f"pair AS MATERIALIZED (SELECT x.query_id, x.vec_id AS a_id, y.vec_id AS b_id,"
        f"  {cos_ab} AS s"
        f" FROM cand x JOIN cand y ON x.query_id = y.query_id"
        f"  AND x.vec_id <> y.vec_id"
        f" JOIN embeddings ea ON ea.vec_id = x.vec_id"
        f" JOIN embeddings eb ON eb.vec_id = y.vec_id)",
    ]
    chain, final = _mmr_greedy_chain()
    return "WITH " + ", ".join(parts + chain) + final


@query("sim_topk_mmr", oracle=_mmr_oracle())
def q_sim_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k (Carbonell & Goldstein, SIGIR'98): greedy
    argmax of 0.5·relevance − 0.5·max-similarity-to-already-selected
    over a bounded candidate pool (top-MMR_CAND by exact cosine per
    query). Step 1 is the plain relevance argmax; each later step
    penalizes redundancy against everything selected so far — the
    standard fix for ANN results that return five paraphrases of the
    same passage.

    Scale shape: the ONLY corpus-sized work is the candidate stage
    (one scan + per-query top-MMR_CAND window — the existing
    bruteforce/IVF serving shapes slot in unchanged); everything after
    operates on ≤ MMR_CAND rows per query inside ONE Arrow grouped-map
    stage (_mmr_greedy), so job count is constant in MMR_K and the
    pairwise sims (MMR_CAND² per query, bounded by the serving budget,
    never by N) are computed once per pool. Selection order is emitted
    as `step` so the diversification is auditable."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    qdf = emb.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("vec_id")
    )
    cand = (
        emb.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rel", F.expr(cosine_spark_sql("qv", "embedding")))
        # zero-norm vectors score NULL (try_divide ↔ DuckDB /0 = NULL)
        # and must not enter the pool — pre-filtering before the rank
        # window selects the same top-MMR_CAND (NULLs rank last).
        .filter(F.col("rel").isNotNull())
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= MMR_CAND)
        .select("query_id", "vec_id", "rel", "embedding")
    )
    return _mmr_greedy(cand)


def _dot_seq(a, b) -> float:
    """The shared sequential left-fold dot product (seed 0.0, add
    terms in index order) in Python doubles — the SAME IEEE operation
    sequence as cosine_spark_sql's aggregate(zip_with(...)) and the
    DuckDB unrolled chain, so a cosine computed here is bit-identical
    to one computed by either engine."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cos_seq(a, b) -> float:
    """Cosine with a zero-norm guard (round-10 advice): Python float
    0.0/0.0 raises where the engines never error (Spark try_divide and
    DuckDB `/` both yield NULL). Pools exclude NULL-rel (zero-norm)
    candidates in both dialects, so this guard is defense-in-depth —
    if a zero-norm vector ever reaches the Arrow stage, return NaN
    (mirroring ivf_py_probe_cells' zero-norm replay) rather than crash
    one Python task and with it the whole serving batch."""
    import math

    na = math.sqrt(_dot_seq(a, a))
    nb = math.sqrt(_dot_seq(b, b))
    if na == 0.0 or nb == 0.0:
        return float("nan")
    return _dot_seq(a, b) / (na * nb)


def _desc_first(v: float, best: float) -> bool:
    """True iff v ranks strictly before best under ORDER BY x DESC with
    both engines' NaN-is-greatest semantics (ties resolve to the
    earlier candidate because callers iterate vec_id-ascending)."""
    import math

    vn, bn = math.isnan(v), math.isnan(best)
    if vn != bn:
        return vn
    if vn:
        return False
    return v > best


def _mmr_greedy(cand: DataFrame) -> DataFrame:
    """The greedy selection over a (query_id, vec_id, rel, embedding)
    candidate pool — shared by the brute-force and the IVF-pruned MMR
    variants (ONE definition of the selection).

    Executed as a SINGLE Arrow grouped-map stage (applyInPandas over
    query_id): each query's pool is ≤ MMR_CAND rows, so all MMR_K
    greedy steps run inside one task with job count CONSTANT in K —
    the previous unrolled-DataFrame form issued K driver-coordinated
    jobs per serving batch, linear in the page depth. The corpus-sized
    candidate stage stays fully JVM-side upstream; only the bounded
    per-query pools cross the Arrow boundary. Float parity with the
    CTE oracle holds bit-for-bit: rel arrives already folded by Spark,
    pairwise cosines use the identical sequential double fold
    (_dot_seq), and mmr = 0.5*rel − 0.5*dmax is the same two exact
    power-of-two multiplies and one subtract in every dialect."""

    def greedy(pdf):
        import pandas as pd

        rows = sorted(
            (
                (int(r.vec_id), float(r.rel), [float(x) for x in r.embedding])
                for r in pdf.itertuples()
            ),
            key=lambda r: r[0],
        )
        qid = int(pdf["query_id"].iloc[0])
        # Pairwise sims inside the pool, computed once (MMR_CAND² max).
        sims = {}
        for i, (ai, _, ae) in enumerate(rows):
            for bj, (bi, _, be) in enumerate(rows):
                if i < bj:
                    s = _cos_seq(ae, be)
                    sims[(ai, bi)] = s
                    sims[(bi, ai)] = s
        out = []
        selected = []
        remaining = list(rows)
        for step in range(1, MMR_K + 1):
            if not remaining:
                break
            best = None
            best_mmr = None
            for vid, rel, _ in remaining:  # vec_id-ascending → tiebreak
                if step == 1:
                    mmr = 0.5 * rel
                else:
                    # NaN-is-greatest max (the engines' max() semantics
                    # — builtin max() over a NaN-containing sequence is
                    # order-dependent and diverges from both).
                    dmax = None
                    for s_id in selected:
                        v = sims[(vid, s_id)]
                        if dmax is None or _desc_first(v, dmax):
                            dmax = v
                    mmr = 0.5 * rel - 0.5 * dmax
                if best is None or _desc_first(mmr, best_mmr):
                    best, best_mmr = (vid, rel), mmr
            out.append((qid, step, best[0], best[1], best_mmr))
            selected.append(best[0])
            remaining = [r for r in remaining if r[0] != best[0]]
        return pd.DataFrame(
            out, columns=["query_id", "step", "vec_id", "rel", "mmr"]
        )

    return cand.groupBy("query_id").applyInPandas(
        greedy,
        "query_id long, step long, vec_id long, rel double, mmr double",
    )


# ------------------------------------------------ passage retrieval

PASSAGE_TOPK = 10


def _passage_oracle() -> str:
    """Chunk-level rational BM25 + per-document MaxP, composed from
    the chunking CTE above and text_index's exact-rational scoring."""
    from dist_mapreduce_spark.plans.text_index import (
        BM25_TERMS,
        _bm25_term_sql,
    )

    sl = f"toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))]"
    tfs = ", ".join(
        f"len(list_filter(ch, x -> x = '{w}')) AS tf{i}"
        for i, w in enumerate(BM25_TERMS)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    terms = [
        _bm25_term_sql(f"tf{i}", f"df{i}", "dl", "n", "l")
        for i in range(len(BM25_TERMS))
    ]
    score = f"(({terms[0]} + {terms[1]}) + {terms[2]})"
    return (
        f"WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents"
        f"  WHERE text IS NOT NULL),"
        f" ck AS (SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT)"
        f"   AS chunk_id, {sl} AS ch"
        f"  FROM t, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)),"
        f" pe AS (SELECT doc_id, chunk_id, len(ch) AS dl, {tfs} FROM ck),"
        f" st AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        f"  CAST(coalesce(sum(dl), 0) AS BIGINT) AS l, {dfs} FROM pe),"
        f" sc AS (SELECT doc_id, chunk_id, {score} AS score FROM pe, st),"
        f" best AS (SELECT doc_id, chunk_id, score FROM (SELECT *,"
        f"   row_number() OVER (PARTITION BY doc_id"
        f"    ORDER BY score DESC, chunk_id) AS crk FROM sc) WHERE crk = 1)"
        f" SELECT doc_id, chunk_id, score, rk FROM (SELECT *,"
        f"  row_number() OVER (ORDER BY score DESC, doc_id) AS rk"
        f"  FROM best) WHERE rk <= {PASSAGE_TOPK}"
    )


@query("search_passage_maxp", oracle=_passage_oracle())
def q_search_passage_maxp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level retrieval with MaxP aggregation (Dai & Callan,
    SIGIR 2019): score every CHUNK with the exact-rational BM25
    (text_index's scoring contract verbatim — chunk-level tf/dl and
    chunk-corpus stats), then each document is represented by its
    best passage and the top documents ranked by that passage score.
    This is the shape long-document retrieval actually ships: BM25
    over whole 100-page documents drowns the signal in length
    normalization; scoring fixed-size windows and max-pooling per doc
    is the standard fix — and it returns WHICH passage matched, the
    span a RAG prompt actually wants.

    Scale shape: chunking is the pure map above; per-chunk tf/dl ride
    the same scan; the stats row is ONE aggregate broadcast back;
    the per-doc max is a window on doc_id (combinable max, narrow
    rows); the final top-k is TakeOrderedAndProject. Two narrow
    shuffles total beyond the scan — same class as document-level
    BM25, with ~3-4× the scored rows (chunks per doc), which is the
    price of span granularity."""
    from dist_mapreduce_spark.plans.text_index import (
        BM25_TERMS,
        _bm25_term_sql,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = ta.ws_tokens(F.col("text"))
    n_t = F.size(toks)
    starts = F.when(n_t <= 0, F.array().cast("array<int>")).otherwise(
        F.expr(
            f"transform(sequence(0, (size(filter(split(text,"
            f" '[{ta.WS_CHARS}]+'), w -> w != '')) - 1)"
            f" DIV {CHUNK_STRIDE}), i -> i * {CHUNK_STRIDE})"
        )
    )
    ck = d.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("s")
    ).select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_SIZE)).alias("ch"),
    )
    pe = ck.select(
        "doc_id",
        "chunk_id",
        F.size("ch").alias("dl"),
        *[
            F.expr(f"size(filter(ch, x -> x = '{w}'))").alias(f"tf{i}")
            for i, w in enumerate(BM25_TERMS)
        ],
    )
    st = pe.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("l"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    terms = [
        _bm25_term_sql(f"tf{i}", f"df{i}", "dl", "n", "l")
        for i in range(len(BM25_TERMS))
    ]
    score = f"(({terms[0]} + {terms[1]}) + {terms[2]})"
    sc = pe.crossJoin(F.broadcast(st)).withColumn("score", F.expr(score))
    wdoc = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    best = (
        sc.withColumn("crk", F.row_number().over(wdoc))
        .filter(F.col("crk") == 1)
        .select("doc_id", "chunk_id", "score")
    )
    wall = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        best.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(PASSAGE_TOPK)
        .withColumn("rk", F.row_number().over(wall))
    )


def _mmr_ivf_oracle() -> str:
    """MMR over IVF-PRUNED candidates: the cand CTE becomes the probed-
    cells cosine top-MMR_CAND (sim_topk_ivf's serving shape, on the
    round-9 TRAINED default quantizer) instead of the brute-force
    scan; the greedy chain is shared verbatim."""
    from dist_mapreduce_spark.plans.similarity import (
        TRAINED_CELLS_CTE,
        TRAINED_NPROBE_CTES,
    )

    cos_pc = cosine_duckdb_sql("p.qv", "cl.embedding")
    cos_ab = cosine_duckdb_sql("ea.embedding", "eb.embedding")
    parts = [
        f"{TRAINED_CELLS_CTE}",
        f"{TRAINED_NPROBE_CTES}",
        f"probes AS (SELECT vec_id AS query_id, embedding AS qv,"
        f"  cent_id AS pcell FROM rkd"
        f" WHERE vec_id < {MMR_QUERIES} AND embedding IS NOT NULL"
        f"  AND crk <= (SELECT np FROM npr))",
        f"cand AS MATERIALIZED (SELECT query_id, vec_id, rel FROM ("
        f"  SELECT p.query_id, cl.vec_id, {cos_pc} AS rel,"
        f"   row_number() OVER (PARTITION BY p.query_id"
        f"    ORDER BY {cos_pc} DESC, cl.vec_id) AS rk"
        f"  FROM cells cl JOIN probes p ON cl.cell = p.pcell"
        f"   AND cl.vec_id <> p.query_id"
        f"  WHERE cl.embedding IS NOT NULL)"
        # zero-norm exclusion — see _mmr_oracle's cand.
        f" WHERE rk <= {MMR_CAND} AND rel IS NOT NULL)",
        f"pair AS MATERIALIZED (SELECT x.query_id, x.vec_id AS a_id,"
        f"  y.vec_id AS b_id, {cos_ab} AS s"
        f" FROM cand x JOIN cand y ON x.query_id = y.query_id"
        f"  AND x.vec_id <> y.vec_id"
        f" JOIN embeddings ea ON ea.vec_id = x.vec_id"
        f" JOIN embeddings eb ON eb.vec_id = y.vec_id)",
    ]
    chain, final = _mmr_greedy_chain()
    return "WITH " + ", ".join(parts + chain) + final


@query("sim_topk_mmr_pruned", oracle=_mmr_ivf_oracle())
def q_sim_topk_mmr_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification SERVED FROM THE ANN PATH: the candidate pool
    comes from the IVF probed-cells cosine top-MMR_CAND (sim_topk_ivf's
    exact serving shape — at 100 TB, the partition-pruned materialized
    index) instead of a full corpus scan; the greedy diversification is
    sim_topk_mmr's verbatim. This is the deployment composition: ANN
    narrows billions to tens, MMR re-orders the tens — proof the two
    stages compose without a full-scan anywhere.

    Scale shape: candidate stage reads only each query's N_PROBE cells
    (the pruned scan sim_topk_ivf_pruned pins); everything downstream
    is ≤ MMR_CAND rows per query exactly as in sim_topk_mmr."""
    from dist_mapreduce_spark.plans.similarity import (
        ivf_cells_df,
        ivf_probes_df,
        ivf_ranked_cells_sql,
        trained_n_probe,
        trained_quantizer,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows, n_corpus = trained_quantizer(emb)
    if not cent_rows:
        return spark.createDataFrame(
            [], "query_id bigint, step bigint, vec_id bigint,"
            " rel double, mmr double"
        )
    ranked = ivf_ranked_cells_sql(cent_rows)
    cells = ivf_cells_df(
        spark, emb.filter(F.col("embedding").isNotNull()), ranked,
        cent_rows,
    )
    probes = ivf_probes_df(
        emb.filter(F.col("embedding").isNotNull()),
        ranked,
        MMR_QUERIES,
        n_probe=trained_n_probe(len(cent_rows), n_corpus),
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = (
        cells.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("pcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("rel", F.expr(cosine_spark_sql("qv", "embedding")))
        .filter(F.col("rel").isNotNull())  # zero-norm exclusion
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= MMR_CAND)
        .select("query_id", "vec_id", "rel", "embedding")
    )
    return _mmr_greedy(cand)


# -------------------------------------- dense retrieval, end to end

#: Dense-retrieval geometry: DENSE_QUERIES query documents (their
#: first chunk is the query vector), top DENSE_TOPK documents per
#: query by max-pooled chunk cosine.
DENSE_QUERIES = 3
DENSE_TOPK = 10
DENSE_DIM = 64


def _dense_embed_duck(text_col: str) -> str:
    """The STUB ENCODER, DuckDB dialect: dim j of a chunk's vector is
    (md5_prefix_long(chunk_text || '_j') % 2048 − 1024) / 1024 — a
    deterministic hash feature in [−1, 1), exact in IEEE double
    (integer numerator, power-of-two divisor). This is explicitly a
    stand-in for a real text encoder (no model runtime ships in this
    container); it exercises the REAL pipeline plumbing — chunk
    geometry, vector schema, broadcast query batch, fold-twin cosine,
    MaxP — with bit-exact cross-engine values."""
    from dist_mapreduce_spark.functions.hashing import (
        md5_prefix_long_duckdb_sql,
    )

    h = md5_prefix_long_duckdb_sql(
        f"{text_col} || '_' || CAST(j AS VARCHAR)", 12
    )
    return (
        f"list_transform(range(0, {DENSE_DIM}),"
        f" j -> CAST(({h} % 2048) - 1024 AS DOUBLE) / 1024.0)"
    )


def _dense_embed_spark(text_col: str) -> str:
    from dist_mapreduce_spark.functions.hashing import (
        md5_prefix_long_spark_sql,
    )

    h = md5_prefix_long_spark_sql(
        f"concat({text_col}, '_', CAST(j AS STRING))", 12
    )
    return (
        f"transform(sequence(0, {DENSE_DIM - 1}),"
        f" j -> CAST(({h} % 2048) - 1024 AS DOUBLE) / 1024.0)"
    )


def _dense_maxp_oracle() -> str:
    ev = _dense_embed_duck("array_to_string(ch, ' ')")
    return (
        f"WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents"
        f"  WHERE text IS NOT NULL),"
        f" ck AS (SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT)"
        f"   AS chunk_id,"
        f"   toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))] AS ch"
        f"  FROM t, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)),"
        f" cv AS MATERIALIZED (SELECT doc_id, chunk_id, {ev} AS v"
        f"  FROM ck WHERE len(ch) >= 1),"
        f" qv AS (SELECT doc_id AS query_id, v AS q FROM cv"
        f"  WHERE doc_id < {DENSE_QUERIES} AND chunk_id = 0),"
        f" sc AS (SELECT q.query_id, c.doc_id, c.chunk_id,"
        f"   {cosine_duckdb_sql('q.q', 'c.v')} AS score"
        f"  FROM cv c JOIN qv q ON c.doc_id <> q.query_id),"
        f" best AS (SELECT query_id, doc_id, chunk_id, score FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id, doc_id"
        f"   ORDER BY score DESC, chunk_id) AS crk FROM sc)"
        f"  WHERE crk = 1)"
        f" SELECT query_id, doc_id, chunk_id, score, rk FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id"
        f"   ORDER BY score DESC, doc_id) AS rk FROM best)"
        f" WHERE rk <= {DENSE_TOPK}"
    )


def _dense_maxp_tail(ck: DataFrame) -> DataFrame:
    """The serving tail over an encoded chunk frame (doc_id, chunk_id,
    v): broadcast query batch (first chunk of each query document) →
    fold-twin cosine over every chunk → per-document MaxP → top-k.
    ONE definition shared by the expression-stub and the mapInPandas
    encoder variants — the encoder is the only thing that differs."""
    qv = ck.filter(
        (F.col("doc_id") < DENSE_QUERIES) & (F.col("chunk_id") == 0)
    ).select(F.col("doc_id").alias("query_id"), F.col("v").alias("q"))
    sc = (
        ck.join(F.broadcast(qv), F.col("doc_id") != F.col("query_id"))
        .withColumn("score", F.expr(cosine_spark_sql("q", "v")))
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wd = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    best = (
        sc.withColumn("crk", F.row_number().over(wd))
        .filter(F.col("crk") == 1)
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        best.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= DENSE_TOPK)
        .select("query_id", "doc_id", "chunk_id", "score", "rk")
    )


@query("search_dense_maxp", oracle=_dense_maxp_oracle())
def q_search_dense_maxp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE passage retrieval END TO END — the DPR-style complement
    of search_passage_maxp's lexical pipeline, and the composition a
    RAG ingest actually runs from raw documents: sliding-window
    chunking (chunk_documents' geometry) → per-chunk embedding → a
    broadcast query batch scored by the fold-twin cosine over every
    chunk → per-document MaxP (the best chunk represents the
    document, and is RETURNED — the span a prompt builder wants) →
    top-DENSE_TOPK documents per query.

    The encoder is a DETERMINISTIC HASH STUB (_dense_embed_*): no
    model runtime ships in this container, so dim j is a md5-derived
    feature in [−1, 1), exact in IEEE double on both engines. The
    integration point for a real encoder is exactly this column — at
    100 TB the embed stage is the GPU fleet's mapInPandas and the
    vectors land in sim_index_build's partitioned layout, after which
    the scoring stage here swaps its full scan for the probed-cell
    pruned scan (sim_topk_ivf_pruned's shape). Everything around the
    stub — chunk explode (pure map), one broadcast join, one
    (query, doc) max-pool, one top-k window — is the production plan.

    Self-retrieval sanity is excluded by construction (a query
    document never scores its own chunks); queries are the first
    DENSE_QUERIES documents' first chunks."""
    # Repartition before the CPU-bound stub encode (see
    # _dense_chunk_vectors — one source split must not serialize it).
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = ta.ws_tokens(F.col("text"))
    starts = F.when(
        F.size(F.col("toks")) <= 0, F.array().cast("array<int>")
    ).otherwise(
        F.expr(
            f"transform(sequence(0, (size(toks) - 1) DIV {CHUNK_STRIDE}),"
            f" i -> i * {CHUNK_STRIDE})"
        )
    )
    ck = (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_SIZE)).alias(
                "ch"
            ),
        )
        .filter(F.size("ch") >= 1)
        .withColumn("ctext", F.array_join("ch", " "))
        .select(
            "doc_id",
            "chunk_id",
            F.expr(_dense_embed_spark("ctext")).alias("v"),
        )
    )
    return _dense_maxp_tail(ck)


# ----------------- dense retrieval FROM THE MATERIALIZED INDEX (r10)

#: Scalar chunk id for the dense index: vec_id = doc_id * MOD +
#: chunk_id. MOD = 2^20 bounds documents at ~16M tokens (chunk_id <
#: 2^20) and doc_id at 2^43 before BIGINT overflow — both far beyond
#: any real corpus' per-document limits; identical closed form in both
#: dialects so the trainer's ORDER BY vec_id init is cross-engine
#: deterministic.
DENSE_VID_MOD = 1 << 20


def _dense_chunk_ctes() -> str:
    """The shared chunk-vector chain (t → ck → cemb): the stub-encoded
    chunk corpus as a (vec_id, embedding) table the trained-quantizer
    CTE machinery can run on unchanged. MATERIALIZED: the trainer
    references cemb 2 + 5·2 times."""
    ev = _dense_embed_duck("array_to_string(ch, ' ')")
    return (
        f"t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents"
        f"  WHERE text IS NOT NULL),"
        f" ck AS (SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT)"
        f"   AS chunk_id,"
        f"   toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))] AS ch"
        f"  FROM t, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)),"
        f" cemb AS MATERIALIZED (SELECT"
        f"   doc_id * {DENSE_VID_MOD} + chunk_id AS vec_id, {ev} AS embedding"
        f"  FROM ck WHERE len(ch) >= 1)"
    )


def _dense_trained_ctes() -> str:
    """The ENTIRE trained-quantizer chain (statistics → K rule → 5
    integer Lloyd's rounds → dequantized cent → sc/rkd/cells
    assignment → probe rule), re-sourced from the chunk-vector corpus:
    the similarity-module CTEs verbatim with their one table reference
    swapped to cemb — the same .replace surgery the lifecycle oracles
    use, so 'trained centroids' keeps its single cross-engine
    definition."""
    from dist_mapreduce_spark.plans.similarity import (
        TRAINED_CELLS_CTE,
        TRAINED_NPROBE_CTES,
    )

    src = TRAINED_CELLS_CTE + ", " + TRAINED_NPROBE_CTES
    out = src.replace("FROM embeddings", "FROM cemb")
    # Guard the surgery like _CELLS_CTE_AFTER_UPSERT (ann_index.py): a
    # rename upstream must fail loudly here, not produce an oracle that
    # silently trains on the wrong table; and no reference to the
    # embeddings TABLE may survive (the `embedding` COLUMN does).
    assert out != src, "trained-quantizer CTEs no longer scan embeddings"
    assert "FROM embeddings" not in out and " embeddings " not in out, (
        "a trained-quantizer CTE still references the embeddings table"
        " through a form the blanket replace does not cover"
    )
    return out


def _dense_pruned_tail(probes: str) -> str:
    """Scoring restricted to probed cells + per-doc MaxP + top-k —
    shared by the pruned serving oracle and the recall row's pruned
    arm. `probes` names the in-scope probes CTE."""
    return (
        f" dsc AS (SELECT p.query_id,"
        f"   cl.vec_id // {DENSE_VID_MOD} AS doc_id,"
        f"   cl.vec_id % {DENSE_VID_MOD} AS chunk_id,"
        f"   {cosine_duckdb_sql('p.qv', 'cl.embedding')} AS score"
        f"  FROM cells cl JOIN {probes} p ON cl.cell = p.pcell"
        f"   AND cl.vec_id // {DENSE_VID_MOD} <> p.query_id),"
        f" dbest AS (SELECT query_id, doc_id, chunk_id, score FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id, doc_id"
        f"   ORDER BY score DESC, chunk_id) AS brk FROM dsc)"
        f"  WHERE brk = 1),"
        f" dtop AS (SELECT query_id, doc_id, chunk_id, score, rk FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id"
        f"   ORDER BY score DESC, doc_id) AS rk FROM dbest)"
        f"  WHERE rk <= {DENSE_TOPK})"
    )


_DENSE_PROBES_CTE = (
    f"dprobes AS (SELECT vec_id // {DENSE_VID_MOD} AS query_id,"
    f"  embedding AS qv, cent_id AS pcell FROM rkd"
    f" WHERE vec_id < {DENSE_QUERIES * DENSE_VID_MOD}"
    f"  AND vec_id % {DENSE_VID_MOD} = 0"
    f"  AND crk <= (SELECT np FROM npr))"
)


def _dense_pruned_oracle() -> str:
    return (
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()},"
        f" {_DENSE_PROBES_CTE},"
        f"{_dense_pruned_tail('dprobes')}"
        f" SELECT query_id, doc_id, chunk_id, score, rk FROM dtop"
    )


#: Dense-index paths built by THIS process, keyed to the documents
#: source fingerprint (build_ivf_index's convention — a rewritten
#: corpus forces a rebuild instead of serving a stale index).
_DENSE_BUILT: dict[str, str] = {}


def _docs_fingerprint(sf_dir: str) -> str:
    import hashlib
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.md5()
    if os.path.isfile(src):
        st = os.stat(src)
        h.update(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.isdir(src):
        for droot, _, files in sorted(os.walk(src)):
            for f in sorted(files):
                p = os.path.join(droot, f)
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def _dense_chunk_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, doc_id, chunk_id, embedding): the stub-encoded chunk
    corpus — search_dense_maxp's ck frame plus the scalar vec_id the
    trainer orders on. Repartitioned BEFORE the encode: the md5 stub
    (like a real model forward) is CPU-bound per chunk, and the
    documents parquet arrives as few splits — without the spread, one
    task encodes the whole corpus (observed pinning a single core for
    minutes at the 20× stress; ivf_cells_df's discipline)."""
    return _dense_chunk_vectors_from_docs(
        spark, load_table(spark, sf_dir, "documents")
    )


def _dense_chunk_vectors_from_docs(
    spark: SparkSession, docs: DataFrame
) -> DataFrame:
    """The chunk-vector pipeline over an arbitrary (doc_id, text)
    frame — the round-11 lifecycle ops feed it edited/sliced document
    sets (upsert batches) while the full corpus keeps the one-arg
    entry point above."""
    d = (
        docs.filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = ta.ws_tokens(F.col("text"))
    starts = F.when(
        F.size(F.col("toks")) <= 0, F.array().cast("array<int>")
    ).otherwise(
        F.expr(
            f"transform(sequence(0, (size(toks) - 1) DIV {CHUNK_STRIDE}),"
            f" i -> i * {CHUNK_STRIDE})"
        )
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_SIZE)).alias(
                "ch"
            ),
        )
        .filter(F.size("ch") >= 1)
        .withColumn("ctext", F.array_join("ch", " "))
        .select(
            # Loud overflow guard on the vec_id packing: a document
            # with >= 2^20 chunks (~16M tokens) would otherwise alias
            # its chunk ids into other documents' id space — silently
            # corrupting training order, probes, and doc_id recovery.
            # The CASE keeps raise_error off the hot path (lazy branch)
            # and the guard inside the vec_id expression itself, where
            # column pruning can never drop it while vec_id is alive.
            F.expr(
                f"CASE WHEN chunk_id < {DENSE_VID_MOD}"
                f" THEN doc_id * {DENSE_VID_MOD} + chunk_id"
                f" ELSE raise_error(concat('dense vec_id packing"
                f" overflow: chunk_id ', CAST(chunk_id AS STRING),"
                f" ' >= 2^20 — document too long for DENSE_VID_MOD'))"
                f" END"
            ).alias("vec_id"),
            "doc_id",
            "chunk_id",
            F.expr(_dense_embed_spark("ctext")).alias("embedding"),
        )
    )


def build_dense_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list, int]:
    """Materialize the chunk-vector corpus as a hive-partitioned IVF
    index (one directory per trained cell — build_ivf_index's layout
    applied to the RAG ingest) and return (path, cent_rows,
    n_chunks). This is the docstring'd production swap for
    search_dense_maxp executed: at 100 TB the encoder fleet's output
    lands partitioned by cell at ingest, and dense serving becomes
    partition pruning instead of a corpus scan."""
    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.similarity import (
        ivf_ranked_cells_sql,
        trained_quantizer,
    )

    import os

    cv = _dense_chunk_vectors(spark, sf_dir)
    cent_rows, n_chunks = trained_quantizer(
        cv.select("vec_id", "embedding"), derived=True
    )
    path = _index_dir("dense_index", sf_dir)
    if not cent_rows:
        return path, cent_rows, n_chunks
    fp = _docs_fingerprint(sf_dir)
    if _DENSE_BUILT.get(path) == fp and os.path.isdir(path):
        return path, cent_rows, n_chunks
    from dist_mapreduce_spark.plans.similarity import assign_cells

    # Assignment dispatcher: literal expression by default, numpy GEMM
    # under SPARK_GRAFT_ASSIGN=gemm — at stress scale the full-corpus
    # assignment is THE dominant build cost (SCALE.md), and the GEMM
    # stage removes the O(N·k·dim) generated expression.
    (
        assign_cells(spark, cv, cent_rows)
        .select("vec_id", "doc_id", "chunk_id", "embedding", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    _DENSE_BUILT[path] = fp
    return path, cent_rows, n_chunks


@query("search_dense_maxp_pruned", oracle=_dense_pruned_oracle())
def q_search_dense_maxp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense passage retrieval SERVED FROM THE MATERIALIZED TRAINED
    INDEX — the production composition search_dense_maxp's docstring
    promises: chunk vectors live hive-partitioned by their trained
    IVF cell (build_dense_index, the ingest job), the query batch
    ranks the literal trained centroids in-plan and probes its np
    nearest cells, the union of probed cells lands as a literal
    ``cell IN (...)`` PARTITION FILTER on the index scan
    (sim_topk_ivf_pruned's exact serving shape), and per-document
    MaxP + top-k run over only the probed candidates. The oracle
    replays chunking, the stub encoder, the ENTIRE training run, and
    the probed-cell restriction — approximate retrieval, exactly
    specified.

    Scale shape: serving cost is ∝ probed-cell rows (np/k of the
    chunk corpus), independent of corpus size given the partition
    layout; job count constant in batch size; the only driver pulls
    are the trained centroids (≤ K_MAX×64 floats) and the ≤k distinct
    probed cell ids. search_dense_recall publishes what the pruning
    costs in recall against the full-scan truth."""
    path, cent_rows, n_chunks = build_dense_index(spark, sf_dir)
    return _serve_dense_pruned(spark, sf_dir, path, cent_rows, n_chunks)


def _serve_dense_pruned(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    cent_rows: list,
    n_chunks: int,
) -> DataFrame:
    """The pruned dense serving tail over ANY materialized dense-index
    layout (full build or incremental append) — probes ranked in-plan,
    the probed-cell union as a literal partition filter, MaxP + top-k.
    Shared so the appended-index serving row proves layout equivalence
    through the SAME code path and oracle."""
    empty = spark.createDataFrame(
        [],
        "query_id bigint, doc_id bigint, chunk_id bigint, score double,"
        " rk int",
    )
    if not cent_rows:
        return empty
    from dist_mapreduce_spark.plans.similarity import (
        ivf_ranked_cells_sql,
        trained_n_probe,
    )

    cv = _dense_chunk_vectors(spark, sf_dir)
    qv = cv.filter(
        (F.col("doc_id") < DENSE_QUERIES) & (F.col("chunk_id") == 0)
    ).select(F.col("doc_id").alias("query_id"), F.col("embedding").alias("qv"))
    ranked_q = ivf_ranked_cells_sql(cent_rows, col="qv")
    np = trained_n_probe(len(cent_rows), n_chunks)
    probes = qv.select(
        "query_id",
        "qv",
        F.explode(
            F.expr(f"transform(slice({ranked_q}, 1, {np}), x -> x.c)")
        ).alias("pcell"),
    )
    # Bounded driver pull: ≤ k cell ids, independent of batch size.
    union_cells = sorted(
        int(r["pcell"]) for r in probes.select("pcell").distinct().collect()
    )
    if not union_cells:
        return empty
    scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
    sc = (
        scan.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("pcell"))
            & (F.col("doc_id") != F.col("query_id")),
        )
        .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wd = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    best = (
        sc.withColumn("brk", F.row_number().over(wd))
        .filter(F.col("brk") == 1)
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        best.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= DENSE_TOPK)
        .select("query_id", "doc_id", "chunk_id", "score", "rk")
    )


# ------- dense-index incremental append (round 11, verdict item #3)

#: Deterministic "new documents" batch for the dense append demo: ~1%
#: of documents by doc_id. Engine-internal split (the oracle
#: constrains only the post-append index == a full rebuild of the
#: grown corpus); distinct constants from the embeddings-index
#: APPEND_MOD so the two demos never shadow each other.
DENSE_APPEND_MOD, DENSE_APPEND_REM = 83, 5

_DENSE_APPEND_PRED = f"(doc_id % {DENSE_APPEND_MOD}) = {DENSE_APPEND_REM}"

#: Mersenne fold for exact-int checksums (ann_index.CHECKSUM_MOD).
_DENSE_CHECKSUM_MOD = (1 << 61) - 1

_DENSE_BUILT_INCR: dict[str, str] = {}


def build_dense_index_incr(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list, int]:
    """The dense chunk index built INCREMENTALLY — sim_index_append's
    frozen-quantizer machinery applied to the RAG ingest (a RAG corpus
    is the one that churns daily; round-10 verdict: build_dense_index
    only full-builds). The base corpus (documents outside the batch
    predicate) lands first as the full partitioned layout; the new
    documents then run the same pipeline — chunk → stub encode →
    assignment under the SAME quantizer — and their chunk vectors
    APPEND into the existing cell directories. Base rows never move
    (frozen-quantizer append semantics), so the incremental cost is
    ∝ the new batch, not the corpus."""
    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )

    import os

    cv = _dense_chunk_vectors(spark, sf_dir)
    cent_rows, n_chunks = trained_quantizer(
        cv.select("vec_id", "embedding"), derived=True
    )
    path = _index_dir("dense_index_incr", sf_dir)
    if not cent_rows:
        return path, cent_rows, n_chunks
    fp = _docs_fingerprint(sf_dir)
    if _DENSE_BUILT_INCR.get(path) == fp and os.path.isdir(path):
        return path, cent_rows, n_chunks
    is_new = F.expr(_DENSE_APPEND_PRED)
    cols = ["vec_id", "doc_id", "chunk_id", "embedding", "cell"]
    from dist_mapreduce_spark.plans.index_commit import write_index_base

    # The base AND the incremental batch stage into the SAME
    # uncommitted generation (extra_writes runs before the manifest
    # flip), so base + append publish as one atomic unit — a reader
    # or crash between the two can never see a base-only index
    # presented as committed (round-13 advice). Idempotent
    # run-to-run: each call publishes a fresh generation.
    batch = assign_cells(spark, cv.filter(is_new), cent_rows).select(*cols)
    data = write_index_base(
        assign_cells(spark, cv.filter(~is_new), cent_rows).select(*cols),
        path,
        extra_writes=lambda gen_dir: batch.write.mode("append")
        .partitionBy("cell")
        .parquet(gen_dir),
    )
    _DENSE_BUILT_INCR[path] = fp
    return path, cent_rows, n_chunks


@query(
    "dense_index_append",
    oracle=(
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()}"
        f" SELECT CAST(cell AS BIGINT) AS cell,"
        f"  CAST(count(*) AS BIGINT) AS n_vecs,"
        f"  CAST(sum(CAST(vec_id AS HUGEINT)) % {_DENSE_CHECKSUM_MOD}"
        f"   AS BIGINT) AS id_sum,"
        f"  min(vec_id) AS min_id, max(vec_id) AS max_id,"
        f"  CAST(sum(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS dim_sum"
        f" FROM cells GROUP BY cell"
    ),
)
def q_dense_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-index lifecycle: INCREMENTAL APPEND — new documents
    chunked, encoded, assigned under the frozen quantizer, and
    appended into the existing cell directories (build_dense_index_incr).
    The audit reads the per-cell stats from the READ-BACK files; the
    oracle replays a FULL REBUILD of the grown corpus (chunking, stub
    encoder, the entire training chain, assignment), so a PASS proves
    append(base) + batch == rebuild(all) exactly — the lifecycle proof
    pattern sim_index_append established, now on the index that churns
    daily in a RAG deployment.

    Scale shape: the append job's cost is ∝ the new documents' chunks
    (chunk + encode + assign are pure map; one partitioned write);
    the base layout is untouched. The audit is one narrow aggregate."""
    path, cent_rows, _n = build_dense_index_incr(spark, sf_dir)
    if not cent_rows:
        return spark.createDataFrame(
            [],
            "cell bigint, n_vecs bigint, id_sum bigint, min_id bigint,"
            " max_id bigint, dim_sum bigint",
        )
    from dist_mapreduce_spark.plans.index_commit import index_data_dir

    back = spark.read.parquet(index_data_dir(path))
    return (
        back.groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr(
                f"CAST(sum(CAST(vec_id AS DECIMAL(38,0)))"
                f" % {_DENSE_CHECKSUM_MOD} AS BIGINT)"
            ).alias("id_sum"),
            F.min("vec_id").alias("min_id"),
            F.max("vec_id").alias("max_id"),
            F.sum(F.size("embedding").cast("long")).alias("dim_sum"),
        )
    )


@query(
    "dense_index_compact",
    oracle=(
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()}"
        f" SELECT CAST(cell AS BIGINT) AS cell,"
        f"  CAST(count(*) AS BIGINT) AS n_vecs,"
        f"  CAST(sum(CAST(vec_id AS HUGEINT)) % {_DENSE_CHECKSUM_MOD}"
        f"   AS BIGINT) AS id_sum,"
        f"  min(vec_id) AS min_id, max(vec_id) AS max_id,"
        f"  CAST(sum(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS dim_sum"
        f" FROM cells GROUP BY cell"
    ),
)
def q_dense_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-index lifecycle: COMPACTION — completes the dense index's
    build/append/serve set with the maintenance op an append-heavy RAG
    ingest needs (round-11; sim_index_compact's machinery applied to
    the chunk index). The incremental layout is naturally fragmented —
    the base write emits one file per (task, cell) and every append
    batch adds more — so this row compacts every cell directory above
    the fragment threshold to ONE file (staged write + per-directory
    swap, cool cells untouched) and audits the result from the
    READ-BACK files against the FULL-REBUILD oracle: compaction must
    change bytes-on-disk layout and nothing else.

    Scale shape: fragment census is an os.listdir sweep (no data
    read); the rewrite reads only hot-cell rows, hash-repartitioned on
    cell so each emits exactly one file; the audit is one narrow
    aggregate."""
    from dist_mapreduce_spark.plans.ann_index import compact_index_cells

    path, cent_rows, _n = build_dense_index_incr(spark, sf_dir)
    if not cent_rows:
        return spark.createDataFrame(
            [],
            "cell bigint, n_vecs bigint, id_sum bigint, min_id bigint,"
            " max_id bigint, dim_sum bigint",
        )
    from dist_mapreduce_spark.plans.index_commit import index_data_dir

    compact_index_cells(spark, path)
    back = spark.read.parquet(index_data_dir(path))
    return (
        back.groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr(
                f"CAST(sum(CAST(vec_id AS DECIMAL(38,0)))"
                f" % {_DENSE_CHECKSUM_MOD} AS BIGINT)"
            ).alias("id_sum"),
            F.min("vec_id").alias("min_id"),
            F.max("vec_id").alias("max_id"),
            F.sum(F.size("embedding").cast("long")).alias("dim_sum"),
        )
    )


@query("search_dense_maxp_appended", oracle=_dense_pruned_oracle())
def q_search_dense_maxp_appended(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """search_dense_maxp_pruned SERVED FROM THE APPENDED INDEX — the
    'serving row unchanged-green' proof the round-10 verdict asks for:
    the oracle is the pruned serving row's VERBATIM, the code path is
    the shared _serve_dense_pruned tail, only the index layout differs
    (incremental base+append directories instead of one full build).
    A PASS proves serving is indifferent to HOW the cells were
    materialized — appends never change what a query retrieves."""
    from dist_mapreduce_spark.plans.index_commit import index_data_dir

    path, cent_rows, n_chunks = build_dense_index_incr(spark, sf_dir)
    return _serve_dense_pruned(
        spark, sf_dir, index_data_dir(path), cent_rows, n_chunks
    )


# -------- dense-index delete (takedown) + upsert (edit) — round 11

#: Deterministic takedown batch: ~1.3% of documents by doc_id. A RAG
#: index is the artifact takedown/GDPR requests actually hit — every
#: chunk of a removed document must leave the cell directories.
DENSE_DELETE_MOD, DENSE_DELETE_REM = 79, 2

#: Deterministic edited batch (~1%): the document's text gains a
#: 5-token suffix, so its chunk COUNT can change — the upsert is a
#: cross-cardinality rewrite (delete n old chunks, insert m new ones),
#: not a 1:1 swap.
DENSE_UPSERT_MOD, DENSE_UPSERT_REM = 97, 11
DENSE_EDIT_SUFFIX = " edited edited edited edited edited"

_DENSE_DEL_DOC_PRED = f"(doc_id % {DENSE_DELETE_MOD}) = {DENSE_DELETE_REM}"
_DENSE_UPS_DOC_PRED = f"(doc_id % {DENSE_UPSERT_MOD}) = {DENSE_UPSERT_REM}"

#: The trained chain with ONLY the assignment source filtered to the
#: surviving chunks (the quantizer stays frozen on the full corpus —
#: standard delete semantics; _CELLS_CTE_AFTER_DELETE's surgery
#: applied to the cemb-sourced chain). doc_id recovers from the
#: vec_id packing.
def _dense_trained_ctes_after_delete() -> str:
    src = _dense_trained_ctes()
    out = src.replace(
        "FROM cemb e, cent c",
        f"FROM (SELECT * FROM cemb WHERE NOT"
        f" ((vec_id // {DENSE_VID_MOD}) % {DENSE_DELETE_MOD})"
        f" = {DENSE_DELETE_REM}) e, cent c",
    )
    assert out != src, "dense assignment CTE not found for delete swap"
    return out


def _dense_edited_chunk_ctes() -> str:
    """A SECOND chunk chain (t2/ck2/cemb2) over the EDITED documents —
    only the upsert batch, with the suffix applied — feeding the
    frozen-quantizer assignment of the new chunk vectors."""
    ev = _dense_embed_duck("array_to_string(ch, ' ')")
    return (
        f"t2 AS (SELECT doc_id,"
        f"  list_filter(string_split_regex(text || '{DENSE_EDIT_SUFFIX}',"
        f"   '{_D_WS}+'), w -> w <> '') AS toks"
        f" FROM documents WHERE text IS NOT NULL"
        f"  AND {_DENSE_UPS_DOC_PRED}),"
        f" ck2 AS (SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT)"
        f"   AS chunk_id,"
        f"   toks[(s + 1):least(s + {CHUNK_SIZE}, len(toks))] AS ch"
        f"  FROM t2, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)),"
        f" cemb2 AS MATERIALIZED (SELECT"
        f"   doc_id * {DENSE_VID_MOD} + chunk_id AS vec_id,"
        f"   {ev} AS embedding"
        f"  FROM ck2 WHERE len(ch) >= 1)"
    )


#: The post-upsert chunk corpus (untouched documents' chunks ∪ the
#: edited batch's re-encoded chunks) — shared by the upsert audit, the
#: staleness monitor, and the retrain rows. MATERIALIZED: the fresh
#: training chain references it 2 + 5·2 times.
_DENSE_CU_CTE = (
    f"cu AS MATERIALIZED (SELECT vec_id, embedding FROM cemb"
    f"  WHERE NOT ((vec_id // {DENSE_VID_MOD}) % {DENSE_UPSERT_MOD})"
    f"  = {DENSE_UPSERT_REM}"
    f" UNION ALL SELECT vec_id, embedding FROM cemb2)"
)


def _dense_ups_assign_ctes() -> str:
    """Frozen-quantizer assignment of the POST-UPSERT chunk corpus —
    _IVF_ASSIGN_CTES' exact shape under fresh CTE names so it can sit
    NEXT TO the training chain's own sc/rkd/cells."""
    from dist_mapreduce_spark.functions.vectors import _dot_duckdb

    return (
        _DENSE_CU_CTE + ","
        f" usc AS (SELECT e.vec_id, e.embedding, c.cent_id,"
        f"  ({_dot_duckdb('e.embedding', 'c.cvec')}"
        f"   / sqrt({_dot_duckdb('c.cvec', 'c.cvec')})) AS cscore"
        f"  FROM cu e, cent c),"
        f" urkd AS (SELECT *, row_number() OVER (PARTITION BY vec_id"
        f"  ORDER BY cscore DESC, cent_id) AS crk FROM usc),"
        f" ucells AS (SELECT vec_id, embedding, cent_id AS cell"
        f"  FROM urkd WHERE crk = 1)"
    )


def _dense_cell_stats_sql(cells: str) -> str:
    return (
        f" SELECT CAST(cell AS BIGINT) AS cell,"
        f"  CAST(count(*) AS BIGINT) AS n_vecs,"
        f"  CAST(sum(CAST(vec_id AS HUGEINT)) % {_DENSE_CHECKSUM_MOD}"
        f"   AS BIGINT) AS id_sum,"
        f"  min(vec_id) AS min_id, max(vec_id) AS max_id,"
        f"  CAST(sum(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS dim_sum"
        f" FROM {cells} GROUP BY cell"
    )


_DENSE_STATS_SCHEMA = (
    "cell bigint, n_vecs bigint, id_sum bigint, min_id bigint,"
    " max_id bigint, dim_sum bigint"
)


def _dense_cell_stats(back: DataFrame) -> DataFrame:
    return back.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr(
            f"CAST(sum(CAST(vec_id AS DECIMAL(38,0)))"
            f" % {_DENSE_CHECKSUM_MOD} AS BIGINT)"
        ).alias("id_sum"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
        F.sum(F.size("embedding").cast("long")).alias("dim_sum"),
    )


@query(
    "dense_index_delete",
    oracle=(
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes_after_delete()}"
        + _dense_cell_stats_sql("cells")
    ),
)
def q_dense_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-index lifecycle: TAKEDOWN DELETES — the request class a
    RAG index actually receives (GDPR/DMCA: remove document X and
    every span of it). The tombstone batch's chunks are assigned with
    the frozen quantizer (a pure map over ~1% of documents' chunks),
    ONLY the affected cell directories are rewritten (filter-out +
    per-directory swap — sim_index_delete's staged commit), and the
    read-back audit must equal a FULL REBUILD of the surviving corpus
    under the frozen quantizer (oracle: the trained chain with only
    the assignment source filtered). Rewrite cost ∝ rows in touched
    cells; untouched cells are never read."""
    import os
    import shutil

    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )

    cv = _dense_chunk_vectors(spark, sf_dir)
    cent_rows, _n = trained_quantizer(
        cv.select("vec_id", "embedding"), derived=True
    )
    if not cent_rows:
        return spark.createDataFrame([], _DENSE_STATS_SCHEMA)
    from dist_mapreduce_spark.plans.index_commit import (
        commit_cell_swap,
        index_data_dir,
        write_index_base,
    )

    path = _index_dir("dense_index_del", sf_dir)
    cols = ["vec_id", "doc_id", "chunk_id", "embedding", "cell"]
    # Fresh full build each run (the demo needs a pre-delete index).
    write_index_base(
        assign_cells(spark, cv, cent_rows).select(*cols), path
    )
    is_del = F.expr(_DENSE_DEL_DOC_PRED)
    del_cells = sorted(
        int(r["cell"])
        for r in assign_cells(spark, cv.filter(is_del), cent_rows)
        .select("cell")
        .distinct()
        .collect()
    )
    if del_cells:
        stage = _index_dir("dense_index_del_stage", sf_dir)
        shutil.rmtree(stage, ignore_errors=True)
        affected = spark.read.parquet(index_data_dir(path)).filter(
            F.col("cell").isin(del_cells)
        )
        survivors = affected.filter(~F.expr(_DENSE_DEL_DOC_PRED))
        survivors.write.mode("overwrite").partitionBy("cell").parquet(stage)
        # Atomic publish: ONE manifest flip (round-13) — a crash
        # between cell swaps leaves the pre-delete generation current.
        commit_cell_swap(path, stage, del_cells)
    return _dense_cell_stats(spark.read.parquet(index_data_dir(path)))


@query(
    "dense_index_upsert",
    oracle=(
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()},"
        f" {_dense_edited_chunk_ctes()},"
        f" {_dense_ups_assign_ctes()}"
        + _dense_cell_stats_sql("ucells")
    ),
)
def q_dense_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-index lifecycle: UPSERTS of EDITED DOCUMENTS — the other
    daily RAG mutation: a document's text changes, so its chunking
    changes, so its chunk COUNT can change (the edit suffix adds five
    tokens — a document sitting just under a stride boundary gains a
    chunk). The upsert is therefore delete-n-insert-m across cells:
    the old chunks' cells ∪ the re-encoded chunks' cells are rewritten
    (old rows filtered out, new rows unioned in, per-directory swap),
    everything else untouched — and the read-back audit must equal a
    FULL REBUILD of the post-edit corpus under the FROZEN quantizer
    (oracle: the original training chain + a second chunk chain over
    the edited batch + the frozen assignment of their union). This is
    the cross-cardinality case sim_index_upsert (1:1 vector swap)
    cannot exercise."""
    import os
    import shutil

    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )

    cv = _dense_chunk_vectors(spark, sf_dir)
    cent_rows, _n = trained_quantizer(
        cv.select("vec_id", "embedding"), derived=True
    )
    if not cent_rows:
        return spark.createDataFrame([], _DENSE_STATS_SCHEMA)
    from dist_mapreduce_spark.plans.index_commit import (
        commit_cell_swap,
        index_data_dir,
        write_index_base,
    )

    path = _index_dir("dense_index_ups", sf_dir)
    cols = ["vec_id", "doc_id", "chunk_id", "embedding", "cell"]
    # Fresh full build each run (pre-upsert state).
    write_index_base(
        assign_cells(spark, cv, cent_rows).select(*cols), path
    )
    is_ups = F.expr(_DENSE_UPS_DOC_PRED)
    # Re-chunk + re-encode ONLY the edited batch, from the edited text.
    edited_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(is_ups)
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(DENSE_EDIT_SUFFIX)).alias("text"),
        )
    )
    new_cv = _dense_chunk_vectors_from_docs(spark, edited_docs)
    new_assigned = assign_cells(spark, new_cv, cent_rows).select(*cols)
    old_cells = {
        int(r["cell"])
        for r in assign_cells(spark, cv.filter(is_ups), cent_rows)
        .select("cell")
        .distinct()
        .collect()
    }
    new_cells = {
        int(r["cell"])
        for r in new_assigned.select("cell").distinct().collect()
    }
    ups_cells = sorted(old_cells | new_cells)
    if ups_cells:
        stage = _index_dir("dense_index_ups_stage", sf_dir)
        shutil.rmtree(stage, ignore_errors=True)
        affected = spark.read.parquet(index_data_dir(path)).filter(
            F.col("cell").isin(ups_cells)
        )
        merged = affected.filter(~F.expr(_DENSE_UPS_DOC_PRED)).unionByName(
            new_assigned.filter(F.col("cell").isin(ups_cells)).select(
                *affected.columns
            )
        )
        merged.write.mode("overwrite").partitionBy("cell").parquet(stage)
        # Atomic publish: ONE manifest flip (round-13).
        commit_cell_swap(path, stage, ups_cells)
    return _dense_cell_stats(spark.read.parquet(index_data_dir(path)))


# ----- dense-index staleness monitor + retrain (round 12, item #3)


def _dense_fresh_rule_ctes() -> str:
    """nstat/krule/srule re-sourced from the post-upsert chunk corpus
    cu and f-prefixed, so the fresh chain derives K and the trainer
    sample stride from TODAY'S chunk count (an edit changes chunk
    cardinality — unlike the embeddings index's 1:1 upsert, count(cu)
    ≠ count(cemb) in general)."""
    from dist_mapreduce_spark.plans.similarity import _TRAINED_RULE_CTES

    out = (
        _TRAINED_RULE_CTES.replace("FROM embeddings", "FROM cu")
        .replace("nstat", "fnstat")
        .replace("krule", "fkrule")
        .replace("srule", "fsrule")
    )
    assert "FROM cu" in out and "FROM embeddings" not in out, (
        "fresh-rule surgery failed — the rule CTEs no longer scan"
        " their source the way this replace expects"
    )
    return out


def _dense_fresh_chain_ctes() -> str:
    """The ENTIRE fresh chain over the post-upsert chunk corpus:
    f-rules → f-prefixed Lloyd's training (sampled from fsrule, K from
    fkrule) → dequantized fcent → the fresh dot/|c| serving assignment
    of cu (fsc/frkd/fcells). Shared by the staleness oracle (the
    'what would a retrain buy' arm), the retrain oracle (retrained
    index == this chain's cells), and the retrained serving oracle."""
    from dist_mapreduce_spark.functions.vectors import _dot_duckdb
    from dist_mapreduce_spark.plans.iterative import (
        KMEANS_SCALE,
        N_ITER,
        kmeans_train_ctes,
    )
    from dist_mapreduce_spark.plans.similarity import (
        _train_sample_pred_duck,
    )

    fsample = _train_sample_pred_duck().replace("srule", "fsrule")
    assert fsample != _train_sample_pred_duck()
    fresh = ", ".join(
        kmeans_train_ctes(
            k_sql="(SELECT k FROM fkrule)",
            null_guard=True,
            prefix="f",
            source="cu",
            extra_where=fsample,
        )
    )
    return (
        f"{_dense_fresh_rule_ctes()},"
        f" {fresh},"
        f" fcent AS MATERIALIZED (SELECT cid AS cent_id,"
        f"  list_transform(cq, x -> CAST(x AS DOUBLE)"
        f"   / {float(KMEANS_SCALE)}) AS cvec FROM fc{N_ITER}),"
        f" fsc AS (SELECT e.vec_id, e.embedding, c.cent_id,"
        f"  ({_dot_duckdb('e.embedding', 'c.cvec')}"
        f"   / sqrt({_dot_duckdb('c.cvec', 'c.cvec')})) AS cscore"
        f"  FROM cu e, fcent c),"
        f" frkd AS (SELECT *, row_number() OVER (PARTITION BY vec_id"
        f"  ORDER BY cscore DESC, cent_id) AS crk FROM fsc),"
        f" fcells AS (SELECT vec_id, embedding, cent_id AS cell"
        f"  FROM frkd WHERE crk = 1)"
    )


def _dense_staleness_oracle() -> str:
    """sim_index_staleness's exact-integer statistic transplanted onto
    the dense chunk index: frozen chain (trained on cemb, assignment
    of cu via ucells) vs fresh chain (trained AND assigned on cu),
    compared over the fresh trainer's sample (fe) in int64 fixed
    point."""
    from dist_mapreduce_spark.plans.ann_index import RETRAIN_STALE_PPM
    from dist_mapreduce_spark.plans.iterative import (
        DIM as KDIM,
        N_ITER,
        kmeans_dist_duck,
    )

    d_frozen = kmeans_dist_duck("e.q", "c.cq")
    d_fresh = kmeans_dist_duck("e.q", "fc.cq")
    d_gv = kmeans_dist_duck("e.q", "gv2.g")
    return (
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()},"
        f" {_dense_edited_chunk_ctes()},"
        f" {_dense_ups_assign_ctes()},"
        f" {_dense_fresh_chain_ctes()},"
        f" gm2 AS (SELECT j, (s - (((s % n) + n) % n)) // n AS g FROM ("
        f"  SELECT j, CAST(sum(q[j]) AS BIGINT) AS s,"
        f"   CAST(count(q[j]) AS BIGINT) AS n"
        f"  FROM fe CROSS JOIN range(1, {KDIM} + 1) t3(j) GROUP BY j)),"
        f" gv2 AS (SELECT list(g ORDER BY j) AS g FROM gm2),"
        f" st2 AS (SELECT CAST(count(*) AS HUGEINT) AS n_vecs,"
        f"   CAST(sum(CAST({d_frozen} AS HUGEINT)) AS HUGEINT) AS wfro,"
        f"   CAST(sum(CAST({d_fresh} AS HUGEINT)) AS HUGEINT) AS wfre,"
        f"   CAST(sum(CAST({d_gv} AS HUGEINT)) AS HUGEINT) AS tss,"
        f"   CAST(sum(CASE WHEN {d_fresh} < {d_frozen} THEN 1 ELSE 0 END)"
        f"    AS HUGEINT) AS moved"
        f"  FROM fe e JOIN ucells ucl ON ucl.vec_id = e.vec_id"
        f"  JOIN c{N_ITER} c ON c.cid = ucl.cell"
        f"  JOIN fcells fcl ON fcl.vec_id = e.vec_id"
        f"  JOIN fc{N_ITER} fc ON fc.cid = fcl.cell CROSS JOIN gv2),"
        f" outp AS (SELECT CAST(n_vecs AS BIGINT) AS n_vecs,"
        f"   CAST(wfro // greatest(n_vecs, 1) AS BIGINT)"
        f"    AS wss_frozen_mean,"
        f"   CAST(wfre // greatest(n_vecs, 1) AS BIGINT) AS wss_fresh_mean,"
        f"   CAST(((wfro - wfre) * 1000000) // greatest(tss, 1) AS BIGINT)"
        f"    AS stale_ppm,"
        f"   CAST((moved * 1000000) // greatest(n_vecs, 1) AS BIGINT)"
        f"    AS moved_ppm"
        f"  FROM st2)"
        f" SELECT n_vecs, wss_frozen_mean, wss_fresh_mean, stale_ppm,"
        f"  moved_ppm,"
        f"  CASE WHEN stale_ppm >= {RETRAIN_STALE_PPM} THEN 'retrain'"
        f"  ELSE 'keep' END AS decision"
        f" FROM outp WHERE n_vecs > 0"
    )


def _dense_cu_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-upsert chunk corpus as a (vec_id, doc_id, chunk_id,
    embedding) frame — the Spark twin of the cu CTE: untouched
    documents' chunks ∪ the edited batch re-chunked + re-encoded from
    its post-edit text."""
    cv = _dense_chunk_vectors(spark, sf_dir)
    is_ups = F.expr(_DENSE_UPS_DOC_PRED)
    edited_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(is_ups & F.col("text").isNotNull())
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(DENSE_EDIT_SUFFIX)).alias("text"),
        )
    )
    return cv.filter(~is_ups).unionByName(
        _dense_chunk_vectors_from_docs(spark, edited_docs)
    )


_DENSE_STALE_SCHEMA = (
    "n_vecs bigint, wss_frozen_mean bigint, wss_fresh_mean bigint,"
    " stale_ppm bigint, moved_ppm bigint, decision string"
)


@query("dense_index_staleness", oracle=_dense_staleness_oracle())
def q_dense_index_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTIZER STALENESS of the dense chunk index after the upsert
    cycle — round-12 verdict item #3: the RAG corpus is the one that
    churns daily (the stated reason the dense lifecycle exists), so it
    is exactly the index whose frozen quantizer goes stale, yet round
    11 gave the monitor→retrain loop only to the embeddings index.
    Same exact-integer statistic (the shared staleness_decision_df —
    ONE definition of 'stale' across both index families): over the
    fresh trainer's sample of the post-upsert chunk corpus, wss_frozen
    sums each chunk vector's int64 squared-L2 to its frozen-ASSIGNED
    cell's integer centroid, wss_fresh the distance to the cell a
    FRESH training run on today's chunks would assign (both arms the
    serving dot/|c| argmax); stale_ppm is the variance a retrain
    would recover, decision fires at RETRAIN_STALE_PPM. A no-op churn
    (no documents in the upsert batch) gives fresh == frozen training
    and stale_ppm EXACTLY 0 (pytest-pinned); a corpus whose edit
    rewrites every chunk fires it (pytest-pinned).

    Scale shape: two training runs on the trainer's sample + one
    statistics scan + a 64-row mean pull — strictly cheaper than the
    rebuild it gates, which is the point of a monitor."""
    from dist_mapreduce_spark.plans.ann_index import staleness_decision_df
    from dist_mapreduce_spark.plans.similarity import (
        _frame_fingerprint,
        trained_quantizer,
    )

    cv = _dense_chunk_vectors(spark, sf_dir)
    cent_frozen, _n = trained_quantizer(
        cv.select("vec_id", "embedding"), derived=True
    )
    empty = spark.createDataFrame([], _DENSE_STALE_SCHEMA)
    if not cent_frozen:
        return empty
    # ONE derivation of the post-upsert chunk corpus (round 16): the
    # fresh trainer AND the statistic both consume the checkpointed
    # blocks (the statistic alone scans `cu` twice — frozen and fresh
    # assignment arms). The memo key is fingerprinted from the
    # UNDERIVED frame so build_dense_retrained_index's identically
    # constructed cu still shares the fresh training run.
    cu_raw = _dense_cu_frame(spark, sf_dir).select("vec_id", "embedding")
    cu_key = _frame_fingerprint(cu_raw)
    cu = cu_raw.localCheckpoint()
    cent_fresh, n2 = trained_quantizer(
        cu, key=cu_key, materialized=True, derived=True
    )
    if not cent_fresh:
        return empty
    return staleness_decision_df(spark, cu, cent_frozen, cent_fresh, n2)


_DENSE_RETRAINED_BUILT: dict[str, str] = {}


def build_dense_retrained_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list, int]:
    """Execute the retrain the dense staleness monitor recommends:
    train FRESH centroids on the post-upsert chunk corpus (K and the
    trainer sample re-derived from today's chunk count), reassign
    EVERY chunk vector, rewrite the cell directories wholesale.
    Memoized per documents fingerprint (build_dense_index's
    convention)."""
    import os

    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.similarity import (
        assign_cells,
        trained_quantizer,
    )

    cu = _dense_cu_frame(spark, sf_dir)
    cent_fresh, n2 = trained_quantizer(
        cu.select("vec_id", "embedding"), derived=True
    )
    path = _index_dir("dense_index_retrained", sf_dir)
    if not cent_fresh:
        return path, cent_fresh, n2
    fp = _docs_fingerprint(sf_dir)
    if _DENSE_RETRAINED_BUILT.get(path) == fp and os.path.isdir(path):
        return path, cent_fresh, n2
    from dist_mapreduce_spark.plans.index_commit import write_index_base

    # Atomic publish (round-13): the fresh assignment lands as a new
    # generation; a crash mid-retrain leaves the old index current.
    write_index_base(
        assign_cells(spark, cu, cent_fresh).select(
            "vec_id", "doc_id", "chunk_id", "embedding", "cell"
        ),
        path,
    )
    _DENSE_RETRAINED_BUILT[path] = fp
    return path, cent_fresh, n2


@query(
    "dense_index_retrain",
    oracle=(
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_edited_chunk_ctes()},"
        f" {_DENSE_CU_CTE},"
        f" {_dense_fresh_chain_ctes()}"
        + _dense_cell_stats_sql("fcells")
    ),
)
def q_dense_index_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-index lifecycle: RETRAIN — executes the staleness
    monitor's 'retrain' verdict on the chunk index (round-12 item #3,
    completing the monitor→retrain→serve symmetry sim_index_retrain
    gave the embeddings index). Fresh centroids trained on the
    post-upsert chunk corpus, every chunk reassigned, the cell layout
    rewritten wholesale, audited from the READ-BACK files. The oracle
    replays the ENTIRE fresh chain — chunking, the edit re-chunk, K
    and sample rules re-derived from today's chunk count, all Lloyd's
    rounds, fresh assignment — so a PASS proves the retrained index is
    bit-identical to a from-scratch build on today's corpus (the
    lifecycle proof pattern). Unlike append/delete/upsert this rewrite
    is intentionally FULL: fresh centroids can move any chunk.

    Scale shape: one training run (sampled), one corpus-linear
    assignment scan (the GEMM stage under SPARK_GRAFT_ASSIGN=gemm —
    a retrain is exactly the full-corpus assignment the GEMM exists
    for), one partitioned write, one narrow read-back aggregate."""
    from dist_mapreduce_spark.plans.index_commit import index_data_dir

    path, cent_fresh, _n2 = build_dense_retrained_index(spark, sf_dir)
    if not cent_fresh:
        return spark.createDataFrame([], _DENSE_STATS_SCHEMA)
    return _dense_cell_stats(spark.read.parquet(index_data_dir(path)))


def _dense_maintain_oracle() -> str:
    """The dense staleness oracle's CTE chain verbatim, final SELECT
    swapped for a decision CTE + two per-cell-stats arms guarded by the
    decision — sim_index_maintain's surgery applied to the chunk index
    (keep arm: the frozen post-upsert assignment ucells = the upsert
    audit; retrain arm: the fresh chain's fcells = the retrain
    audit)."""
    from dist_mapreduce_spark.plans.ann_index import RETRAIN_STALE_PPM

    base = _dense_staleness_oracle()
    marker = " SELECT n_vecs, wss_frozen_mean"
    idx = base.rindex(marker)
    ctes = base[:idx]
    assert ctes.rstrip().endswith(")"), "dense staleness surgery failed"
    stats = (
        "SELECT CAST(cell AS BIGINT) AS cell,"
        " CAST(count(*) AS BIGINT) AS n_vecs,"
        f" CAST(sum(CAST(vec_id AS HUGEINT)) % {_DENSE_CHECKSUM_MOD}"
        " AS BIGINT) AS id_sum,"
        " min(vec_id) AS min_id, max(vec_id) AS max_id,"
        " CAST(sum(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS dim_sum,"
        " {arm!r} AS decision"
        " FROM {src}"
        " WHERE (SELECT d FROM dec) = {arm!r} GROUP BY cell"
    )
    return (
        ctes
        + f", dec AS (SELECT CASE WHEN stale_ppm >= {RETRAIN_STALE_PPM}"
        f" THEN 'retrain' ELSE 'keep' END AS d FROM outp"
        f" WHERE n_vecs > 0) "
        + stats.format(arm="keep", src="ucells")
        + " UNION ALL "
        + stats.format(arm="retrain", src="fcells")
    )


@query("dense_index_maintain", oracle=_dense_maintain_oracle())
def q_dense_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense chunk index's MAINTENANCE POLICY, composed end-to-end
    (sim_index_maintain's twin — the two index families keep symmetric
    lifecycles): read the dense staleness verdict, then no-op
    (decision 'keep': the frozen post-upsert layout, audited by
    dense_index_upsert's read-back) or execute the retrain (decision
    'retrain': dense_index_retrain's wholesale rewrite, audited from
    ITS read-back). The oracle replays the statistic plus BOTH stats
    arms guarded by the same decision, so picking the wrong arm on
    either engine is a hash mismatch. Pytest walks both arms (no-churn
    fixture → keep; corpus-rewriting edit → retrain)."""
    dec_rows = q_dense_index_staleness(spark, sf_dir).collect()
    empty = spark.createDataFrame(
        [], _DENSE_STATS_SCHEMA + ", decision string"
    )
    if not dec_rows:
        return empty
    decision = dec_rows[0]["decision"]
    if decision == "retrain":
        acted = q_dense_index_retrain(spark, sf_dir)
    else:
        acted = q_dense_index_upsert(spark, sf_dir)
    return acted.withColumn("decision", F.lit(decision))


def _dense_retrained_serve_oracle() -> str:
    """The pruned dense serving oracle with the ENTIRE chain re-sourced
    from the post-upsert corpus: fresh probe rule (fkeff/fnpr), query
    rows from cu's frkd, the probed-cell tail over fcells."""
    from dist_mapreduce_spark.plans.similarity import (
        NPROBE_BUDGET,
        NPROBE_MIN,
    )
    from dist_mapreduce_spark.plans.iterative import N_ITER

    tail = _dense_pruned_tail("fprobes").replace(
        "FROM cells cl", "FROM fcells cl"
    )
    assert "FROM fcells cl" in tail, "pruned-tail surgery failed"
    return (
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_edited_chunk_ctes()},"
        f" {_DENSE_CU_CTE},"
        f" {_dense_fresh_chain_ctes()},"
        f" fkeff AS (SELECT CAST(count(*) AS BIGINT) AS ke"
        f"  FROM fc{N_ITER}),"
        f" fnpr AS (SELECT least(ke, greatest({NPROBE_MIN},"
        f"  ({NPROBE_BUDGET} * ke + greatest(n, 1) - 1)"
        f"   // greatest(n, 1))) AS np FROM fkeff, fnstat),"
        f" fprobes AS (SELECT vec_id // {DENSE_VID_MOD} AS query_id,"
        f"   embedding AS qv, cent_id AS pcell FROM frkd"
        f"  WHERE vec_id < {DENSE_QUERIES * DENSE_VID_MOD}"
        f"   AND vec_id % {DENSE_VID_MOD} = 0"
        f"   AND crk <= (SELECT np FROM fnpr)),"
        f"{tail}"
        f" SELECT query_id, doc_id, chunk_id, score, rk FROM dtop"
    )


@query("search_dense_maxp_retrained", oracle=_dense_retrained_serve_oracle())
def q_search_dense_maxp_retrained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pruned dense serving FROM THE RETRAINED CHUNK INDEX — the
    'serving transitions correctly' half of the dense retrain
    lifecycle (sim_serve_retrained's twin): the query batch probes the
    FRESH centroids at the fresh probe rule's depth and scans only its
    probed cell directories of the retrained layout; the oracle is the
    pruned serving oracle with the entire chain re-sourced from
    today's corpus, so a PASS proves monitor → retrain → serve ends in
    the answers a from-scratch build would give."""
    from dist_mapreduce_spark.plans.similarity import (
        ivf_ranked_cells_sql,
        trained_n_probe,
    )

    path, cent_fresh, n2 = build_dense_retrained_index(spark, sf_dir)
    empty = spark.createDataFrame(
        [],
        "query_id bigint, doc_id bigint, chunk_id bigint, score double,"
        " rk int",
    )
    if not cent_fresh:
        return empty
    cu = _dense_cu_frame(spark, sf_dir)
    qv = cu.filter(
        (F.col("doc_id") < DENSE_QUERIES) & (F.col("chunk_id") == 0)
    ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ranked_q = ivf_ranked_cells_sql(cent_fresh, col="qv")
    np = trained_n_probe(len(cent_fresh), n2)
    probes = qv.select(
        "query_id",
        "qv",
        F.explode(
            F.expr(f"transform(slice({ranked_q}, 1, {np}), x -> x.c)")
        ).alias("pcell"),
    )
    union_cells = sorted(
        int(r["pcell"]) for r in probes.select("pcell").distinct().collect()
    )
    if not union_cells:
        return empty
    from dist_mapreduce_spark.plans.index_commit import index_data_dir

    scan = spark.read.parquet(index_data_dir(path)).filter(
        F.col("cell").isin(union_cells)
    )
    sc = (
        scan.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("pcell"))
            & (F.col("doc_id") != F.col("query_id")),
        )
        .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wd = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    best = (
        sc.withColumn("brk", F.row_number().over(wd))
        .filter(F.col("brk") == 1)
        .select("query_id", "doc_id", "chunk_id", "score")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        best.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= DENSE_TOPK)
        .select("query_id", "doc_id", "chunk_id", "score", "rk")
    )


def _dense_recall_oracle() -> str:
    """Truth (full-scan MaxP) and pruned arms over ONE shared chunk +
    trained chain (MATERIALIZED CTE names are query-global in DuckDB,
    so the chain appears once), joined on retrieved documents."""
    cos_tq = cosine_duckdb_sql("q.qv", "c.embedding")
    return (
        f"WITH {_dense_chunk_ctes()},"
        f" {_dense_trained_ctes()},"
        f" {_DENSE_PROBES_CTE},"
        # truth arm: the SAME query rows scored against EVERY chunk.
        f" qrows AS (SELECT vec_id // {DENSE_VID_MOD} AS query_id,"
        f"   embedding AS qv FROM cemb"
        f"  WHERE vec_id < {DENSE_QUERIES * DENSE_VID_MOD}"
        f"   AND vec_id % {DENSE_VID_MOD} = 0),"
        f" tsc AS (SELECT q.query_id,"
        f"   c.vec_id // {DENSE_VID_MOD} AS doc_id, {cos_tq} AS score"
        f"  FROM cemb c JOIN qrows q"
        f"   ON c.vec_id // {DENSE_VID_MOD} <> q.query_id),"
        f" tbest AS (SELECT query_id, doc_id, max(score) AS score"
        f"  FROM tsc GROUP BY query_id, doc_id),"
        f" ttop AS MATERIALIZED (SELECT query_id, doc_id FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY query_id"
        f"   ORDER BY score DESC, doc_id) AS rk FROM tbest)"
        f"  WHERE rk <= {DENSE_TOPK}),"
        f"{_dense_pruned_tail('dprobes')},"
        f" nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ttop),"
        f" nh AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ttop t"
        f"  JOIN dtop p ON t.query_id = p.query_id"
        f"   AND t.doc_id = p.doc_id)"
        f" SELECT 'dense_ivf' AS method, nt.n AS n_truth, nh.n AS n_hit,"
        f"  CAST(nh.n AS DOUBLE) / CAST(nt.n AS DOUBLE) AS recall"
        f" FROM nt, nh"
    )


@query("search_dense_recall", oracle=_dense_recall_oracle())
def q_search_dense_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{DENSE_TOPK} of the index-served dense retrieval against
    the full-scan truth — the metric that prices the partition-pruned
    scan's approximation, published next to the serving row exactly as
    sim_recall prices the vector family. Truth and candidates reuse
    the two registered queries verbatim; the hit count joins on
    (query, document) — document identity is what a RAG prompt
    consumes.

    Scale shape: both arms are the registered plans; the compare is a
    DENSE_QUERIES·DENSE_TOPK-row join + one aggregate."""
    tru = q_search_dense_maxp(spark, sf_dir).select("query_id", "doc_id")
    pr = q_search_dense_maxp_pruned(spark, sf_dir).select(
        "query_id", "doc_id"
    )
    nt = tru.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nh = tru.join(pr, ["query_id", "doc_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return nt.crossJoin(nh).select(
        F.lit("dense_ivf").alias("method"),
        "n_truth",
        "n_hit",
        F.expr(
            "try_divide(CAST(n_hit AS DOUBLE), CAST(n_truth AS DOUBLE))"
        ).alias("recall"),
    )


# --------------- the encoder fleet integration point, executed (r10)


def _py_embed_text(text: str) -> list[float]:
    """The stub encoder replayed in plain Python — dim j is
    (md5_prefix_48bit(text || '_' || j) % 2048 − 1024) / 1024, the
    IDENTICAL integer-numerator / power-of-two-divisor construction as
    _dense_embed_spark/_dense_embed_duck, so a vector computed in an
    Arrow batch is bit-equal to one computed by either engine."""
    import hashlib

    out = []
    for j in range(DENSE_DIM):
        h = int(
            hashlib.md5(f"{text}_{j}".encode("utf-8")).hexdigest()[:12], 16
        )
        out.append(float((h % 2048) - 1024) / 1024.0)
    return out


def encode_chunks_mapinpandas(ck: DataFrame) -> DataFrame:
    """The GPU-fleet integration point as a real executed stage: an
    Arrow-batched ``mapInPandas`` over (doc_id, chunk_id, ctext) that
    returns (doc_id, chunk_id, v array<double>) — exactly the schema
    the downstream cosine/MaxP tail and sim_index_build's partitioned
    layout consume. A production deployment swaps the loop body for a
    batched model forward (tokenizer + ONNX/torch on the executor's
    GPU); everything the fleet needs from Spark — batch iteration,
    Arrow transfer, output schema, partition-preserving shape (no
    shuffle) — is what this stage already exercises, and the gate
    proves its values land bit-exactly where the expression stub's
    do."""

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[["doc_id", "chunk_id"]].copy()
            out["v"] = [_py_embed_text(t) for t in pdf["ctext"]]
            yield out

    return ck.mapInPandas(enc, "doc_id long, chunk_id long, v array<double>")


def _dense_chunk_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, ctext): the chunk frame BEFORE encoding —
    the exact frame a real encoder fleet reads. Repartitioned so the
    downstream Arrow encoder stage gets parallel batches regardless of
    how few splits the source parquet arrives as."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = ta.ws_tokens(F.col("text"))
    starts = F.when(
        F.size(F.col("toks")) <= 0, F.array().cast("array<int>")
    ).otherwise(
        F.expr(
            f"transform(sequence(0, (size(toks) - 1) DIV {CHUNK_STRIDE}),"
            f" i -> i * {CHUNK_STRIDE})"
        )
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_SIZE)).alias(
                "ch"
            ),
        )
        .filter(F.size("ch") >= 1)
        .select("doc_id", "chunk_id", F.array_join("ch", " ").alias("ctext"))
    )


@query("search_dense_maxp_encoded", oracle=_dense_maxp_oracle())
def q_search_dense_maxp_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_dense_maxp with the encoder RUN AS THE mapInPandas STAGE
    a real model needs (round-10 verdict item #4): chunking (pure map)
    → Arrow-batched Python encoder (encode_chunks_mapinpandas — the
    documented GPU-fleet integration point, executed) → the SHARED
    broadcast/cosine/MaxP/top-k tail. The oracle is search_dense_maxp's
    VERBATIM — the stub encoder is bit-replayable in Python, so this
    row value-proves that vectors crossing the Arrow boundary land
    exactly where the in-plan expression's do: schema, batching, and
    float identity of the fleet hand-off, all gate-checked.

    Scale shape: identical to search_dense_maxp except the encode
    stage is Python — partition-preserving (no shuffle added), Arrow-
    batched (spark.sql.execution.arrow.maxRecordsPerBatch rows per
    model call), and pipelined with the scan. This is the ONE place in
    the dense family where Python belongs: the model forward itself.

    localCheckpoint (round-11, from ADVICE): _dense_maxp_tail
    references the encoded frame twice (query branch + scoring
    branch), and the query branch's doc_id filter cannot push through
    the opaque MapInPandas stage — without the checkpoint the Python
    encoder runs over the FULL chunk corpus TWICE. Materializing once
    makes the encode cost single-pass, which is what 'identical scale
    shape to search_dense_maxp' requires (there, Catalyst pushes the
    query-branch filter into the expression chain instead)."""
    ck = encode_chunks_mapinpandas(
        _dense_chunk_texts(spark, sf_dir)
    ).localCheckpoint()
    return _dense_maxp_tail(ck)


# ------------- the full RAG serving stack: index → MaxP → MMR (r10)


def _dense_mmr_oracle() -> str:
    """Dense-index candidate chain (chunking → stub encode → trained
    quantizer → probed-cell scoring → per-doc MaxP) feeding the SHARED
    greedy-MMR chain: cand is the top-MMR_CAND documents per query by
    best-chunk score (vec_id := doc_id), pair the cosines BETWEEN THE
    BEST CHUNKS of each candidate pair — diversity over the spans a
    prompt would actually receive."""
    cos_ab = cosine_duckdb_sql("a.v", "b.v")
    parts = [
        _dense_chunk_ctes(),
        _dense_trained_ctes(),
        _DENSE_PROBES_CTE,
        # dsc with the chunk vector carried through to the pool.
        f"dscv AS (SELECT p.query_id,"
        f"  cl.vec_id // {DENSE_VID_MOD} AS doc_id,"
        f"  cl.vec_id % {DENSE_VID_MOD} AS chunk_id, cl.embedding AS v,"
        f"  {cosine_duckdb_sql('p.qv', 'cl.embedding')} AS score"
        f" FROM cells cl JOIN dprobes p ON cl.cell = p.pcell"
        f"  AND cl.vec_id // {DENSE_VID_MOD} <> p.query_id)",
        f"dbestv AS (SELECT query_id, doc_id, chunk_id, v, score FROM ("
        f" SELECT *, row_number() OVER (PARTITION BY query_id, doc_id"
        f"  ORDER BY score DESC, chunk_id) AS brk FROM dscv)"
        f" WHERE brk = 1)",
        f"cand AS MATERIALIZED (SELECT query_id, doc_id AS vec_id,"
        f"  score AS rel FROM ("
        f" SELECT *, row_number() OVER (PARTITION BY query_id"
        f"  ORDER BY score DESC, doc_id) AS rk FROM dbestv)"
        f" WHERE rk <= {MMR_CAND} AND score IS NOT NULL)",
        f"pair AS MATERIALIZED (SELECT a.query_id, a.doc_id AS a_id,"
        f"  b.doc_id AS b_id, {cos_ab} AS s"
        f" FROM dbestv a JOIN dbestv b ON a.query_id = b.query_id"
        f"  AND a.doc_id <> b.doc_id"
        f" JOIN cand ca ON ca.query_id = a.query_id"
        f"  AND ca.vec_id = a.doc_id"
        f" JOIN cand cb ON cb.query_id = b.query_id"
        f"  AND cb.vec_id = b.doc_id)",
    ]
    chain, final = _mmr_greedy_chain()
    sql = "WITH " + ", ".join(parts + chain) + final
    # Publish the pool id under its real name.
    return (
        f"SELECT query_id, step, vec_id AS doc_id, rel, mmr"
        f" FROM ({sql}) z"
    )


@query("search_dense_mmr_pruned", oracle=_dense_mmr_oracle())
def q_search_dense_mmr_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production RAG serving stack in one gated row:
    chunk → encode → trained partition-pruned index retrieval →
    per-document MaxP → MMR diversification of the final prompt set.
    Candidates are search_dense_maxp_pruned's top-MMR_CAND documents
    per query (each represented by its best chunk — the span the
    prompt receives); diversity is computed between those best-chunk
    vectors by the SHARED greedy (one Arrow grouped-map stage, job
    count constant in K). This is what a deployed retrieval service
    actually executes end to end; every stage's values are pinned by
    the composed oracle, which replays chunking, encoding, training,
    probed-cell restriction, MaxP, and all MMR_K greedy steps.

    Scale shape: the only corpus-sized work is the pruned index scan
    (np/k of the chunk corpus via PartitionFilters); MaxP and the
    document top-MMR_CAND are windows over probed candidates;
    everything after is ≤ MMR_CAND rows per query through one
    applyInPandas. No full scan anywhere."""
    path, cent_rows, n_chunks = build_dense_index(spark, sf_dir)
    empty = spark.createDataFrame(
        [],
        "query_id bigint, step bigint, doc_id bigint, rel double,"
        " mmr double",
    )
    if not cent_rows:
        return empty
    from dist_mapreduce_spark.plans.similarity import (
        ivf_ranked_cells_sql,
        trained_n_probe,
    )

    cv = _dense_chunk_vectors(spark, sf_dir)
    qv = cv.filter(
        (F.col("doc_id") < DENSE_QUERIES) & (F.col("chunk_id") == 0)
    ).select(F.col("doc_id").alias("query_id"), F.col("embedding").alias("qv"))
    ranked_q = ivf_ranked_cells_sql(cent_rows, col="qv")
    np = trained_n_probe(len(cent_rows), n_chunks)
    probes = qv.select(
        "query_id",
        "qv",
        F.explode(
            F.expr(f"transform(slice({ranked_q}, 1, {np}), x -> x.c)")
        ).alias("pcell"),
    )
    union_cells = sorted(
        int(r["pcell"]) for r in probes.select("pcell").distinct().collect()
    )
    if not union_cells:
        return empty
    scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
    sc = (
        scan.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("pcell"))
            & (F.col("doc_id") != F.col("query_id")),
        )
        .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
        .select("query_id", "doc_id", "chunk_id", "embedding", "score")
    )
    wd = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    best = (
        sc.withColumn("brk", F.row_number().over(wd))
        .filter(F.col("brk") == 1)
        .select("query_id", "doc_id", "embedding", "score")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    pool = (
        best.filter(F.col("score").isNotNull())
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= MMR_CAND)
        .select(
            "query_id",
            F.col("doc_id").alias("vec_id"),
            F.col("score").alias("rel"),
            "embedding",
        )
    )
    return _mmr_greedy(pool).select(
        "query_id", "step", F.col("vec_id").alias("doc_id"), "rel", "mmr"
    )
