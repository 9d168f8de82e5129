"""Text-index queries: the classic MapReduce jobs adjacent to word count.

The reference ships exactly one analytics job — word count
(/root/reference/internal/worker/worker.go:24-44). The canonical
"chapter 2" MapReduce workloads built on the same tokenize→shuffle→
group skeleton are the inverted index, secondary sort, and bigram/
collocation counting (they appear in the same Hadoop curriculum the
legacy/ directory is from — CS6240 hw01/hw02 word-count variants,
legacy/HadoopMapReduce/src/edu/neu/cs6240/). This module expresses each
Spark-first over the driver's `documents`/`orders` tables.

Scale posture (100 TB):
- All three are single-shuffle plans: map-side explode/array work in
  whole-stage codegen, then ONE hash-partitioned exchange on the group
  key with partial aggregation before it. No Python in the data path.
- `inverted_index` posting lists are the one construct that can exceed
  executor memory at corpus scale (a stopword's postings ≈ every
  doc_id). The production layout is the same plan with a document-
  frequency cap (`HAVING doc_freq <= k`) plus a bucketed-by-word sink
  so each posting list streams to its own file run; here the corpus is
  the driver's synthetic table, so the uncapped list is exact and the
  cap is demonstrated by `inverted_index`'s df column being available
  to filter on.
- `bigram_colloc` keeps bigram formation inside the token ARRAY
  (transform over sequence) instead of a per-token window, so there is
  no per-document sort shuffle — documents never leave their input
  partition until the (w1,w2) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.functions.vectors import (
    cosine_duckdb_sql,
    cosine_spark_sql,
)
from dist_mapreduce_spark.operators.wordcount import TOKEN_SEP
from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

# DuckDB-side token ARRAY per doc, matching operators.wordcount.TOKEN_SEP
# semantics (case-preserving, [^a-zA-Z]+ separators, empties dropped).
_D_TOK_ARR = "list_filter(string_split_regex(text, '[^a-zA-Z]+'), w -> w <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query(
    "inverted_index",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
        "             FROM documents)"
        " SELECT word, list_sort(list(DISTINCT doc_id)) AS postings,"
        "        count(DISTINCT doc_id) AS doc_freq"
        " FROM tok WHERE word <> '' GROUP BY word"
    ),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: word → sorted posting list of doc_ids + document
    frequency. The canonical MapReduce job one step past word count —
    same map phase as MapFunc (worker.go:24-38) but emitting
    (word, doc_id) instead of (word, 1), and a reduce that unions
    instead of counts.

    Plan shape: explode → distinct-by-(word,doc_id) folded into the
    aggregate (collect_set) → single exchange on word. sort_array pins
    the list order (collect order is nondeterministic in any
    distributed engine, so the sort is part of the contract).

    doc_freq is size(postings), not count_distinct — the collect_set
    already deduplicates, so a separate count_distinct would only add
    an Expand operator and a second exchange (audited: 2 shuffles → 1)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split("text", TOKEN_SEP)).alias("word")
    ).filter(F.col("word") != "")
    return toks.groupBy("word").agg(
        F.sort_array(F.collect_set("doc_id")).alias("postings"),
    ).select("word", "postings", F.size("postings").cast("long").alias("doc_freq"))


@query(
    "secondary_sort",
    oracle=(
        "SELECT o_custkey,"
        " list(o_orderkey ORDER BY o_orderdate, o_orderkey) AS orders_by_date,"
        " count(*) AS n_orders"
        " FROM orders GROUP BY o_custkey"
    ),
)
def q_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort: per customer, order keys in order-date order.

    The classic MapReduce pattern (composite shuffle key + grouping
    comparator so the reducer sees values pre-sorted) that the
    reference's sorted-reduce hints at but never generalizes — doReduce
    sorts KEYS only (worker.go:128-132); values arrive unordered. Spark
    needs no custom comparator: array_sort over collect_list(struct)
    sorts by (o_orderdate, o_orderkey) — a deterministic total order —
    entirely inside the aggregate, then transform projects the key.
    One exchange, no per-group window sort."""
    o = load_table(spark, sf_dir, "orders")
    sorted_structs = F.array_sort(
        F.collect_list(F.struct("o_orderdate", "o_orderkey"))
    )
    return o.groupBy("o_custkey").agg(
        F.transform(sorted_structs, lambda s: s["o_orderkey"]).alias("orders_by_date"),
        F.count("*").alias("n_orders"),
    )


@query(
    "bigram_colloc",
    oracle=(
        f"WITH tk AS (SELECT {_D_TOK_ARR} AS t FROM documents),"
        " idx AS (SELECT t, unnest(generate_series(1, len(t)-1)) AS i FROM tk),"
        " bg AS (SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS cnt_ab"
        "        FROM idx GROUP BY 1, 2),"
        " ug AS (SELECT word, count(*) AS c"
        "        FROM (SELECT unnest(t) AS word FROM tk) GROUP BY word),"
        " tot AS (SELECT sum(c) AS n FROM ug)"
        " SELECT w1, w2, cnt_ab, a.c AS cnt_a, b.c AS cnt_b,"
        # HUGEINT products on BOTH sides of the division: tot.n is a
        # HUGEINT sum already, but BIGINT*BIGINT (cnt_ab*n would be if
        # n were bigint; a.c*b.c is) raises Out of Range past 2^63 —
        # the Spark side computes the same values in DECIMAL(38,0).
        "  CAST(CAST(cnt_ab AS HUGEINT) * tot.n AS DOUBLE)"
        "   / CAST(CAST(a.c AS HUGEINT) * b.c AS DOUBLE) AS lift"
        " FROM bg JOIN ug a ON a.word = bg.w1 JOIN ug b ON b.word = bg.w2"
        " CROSS JOIN tot"
        " ORDER BY cnt_ab DESC, w1, w2 LIMIT 100"
    ),
)
def q_bigram_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram collocations with lift = P(ab) / (P(a)·P(b)).

    Bigrams are formed INSIDE the token array (transform over
    sequence(1, size-1)) so no per-document window sort — documents
    stay map-side until the (w1,w2) hash aggregate. Unigram counts are
    a second single-exchange aggregate; the two small aggregates join
    broadcast-style at sf and hash at 100 TB (vocab ≪ corpus either
    way). lift is exact-integer arithmetic with ONE IEEE division
    (counts < 2^53 are exactly representable), so Spark and DuckDB
    round identically — the oracle-parity rule for ratios.

    ORDER BY cnt_ab with (w1, w2) tiebreaks pins the LIMIT frontier to
    the same rows in both engines."""
    d = _docs(spark, sf_dir)
    tk = d.select(
        F.filter(F.split("text", TOKEN_SEP), lambda w: w != "").alias("t")
    )
    bg = (
        tk.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt_ab"))
    )
    ug = (
        tk.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    tot = ug.agg(F.sum("c").alias("n"))
    return (
        bg.join(F.broadcast(ug.withColumnRenamed("word", "w1").withColumnRenamed("c", "cnt_a")), "w1")
        .join(F.broadcast(ug.withColumnRenamed("word", "w2").withColumnRenamed("c", "cnt_b")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            # DECIMAL(38,0) intermediates: cnt_ab*n and cnt_a*cnt_b in
            # raw longs overflow past ~3e9-count corpora under ANSI
            # (the table_checksum class); the exact decimal product
            # rounds to double once — identical to the oracle's
            # HUGEINT→DOUBLE path.
            (
                (F.col("cnt_ab").cast("decimal(38,0)") * F.col("n")).cast("double")
                / (
                    F.col("cnt_a").cast("decimal(38,0)") * F.col("cnt_b")
                ).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("cnt_ab"), "w1", "w2")
        .limit(100)
    )


#: Skip-gram co-occurrence window (token distance 1..W) and result cap.
COOC_W = 2
COOC_TOPK = 100


@query(
    "cooccurrence_pmi",
    oracle=(
        f"WITH tk AS MATERIALIZED (SELECT {_D_TOK_ARR} AS t FROM documents),"
        " pairs AS MATERIALIZED ("
        "  SELECT t[i] AS a, t[i+j] AS b, count(*) AS cnt_ab"
        # distances derived from COOC_W, same as the Spark per_dist
        # generator — one constant drives both dialects.
        f"  FROM tk, (VALUES {', '.join(f'({j})' for j in range(1, COOC_W + 1))}) d(j),"
        "   unnest(generate_series(1, len(t)-j)) u(i)"
        "  GROUP BY 1, 2),"
        " ug AS MATERIALIZED (SELECT word, count(*) AS c"
        "  FROM (SELECT unnest(t) AS word FROM tk) GROUP BY word),"
        " tot AS (SELECT sum(c) AS n FROM ug)"
        " SELECT a, b, cnt_ab, ua.c AS cnt_a, ub.c AS cnt_b,"
        # HUGEINT on both numerator and denominator — BIGINT*BIGINT
        # raises Out of Range past 2^63 (the Spark side uses
        # DECIMAL(38,0) for the same reason).
        "  CAST(CAST(cnt_ab AS HUGEINT) * tot.n * 1000000"
        "   // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS lift_ppm"
        " FROM pairs JOIN ug ua ON ua.word = pairs.a"
        " JOIN ug ub ON ub.word = pairs.b CROSS JOIN tot"
        f" ORDER BY cnt_ab DESC, a, b LIMIT {COOC_TOPK}"
    ),
)
def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence counts with integer-exact association
    scores — the 'pairs' design pattern (Lin & Dyer ch.3, the same
    curriculum as the reference's legacy/ Hadoop homework): emit
    (a, b) for every ordered token pair at distance ≤ COOC_W, one
    shuffle to count. Differs from `bigram_colloc` in window (skip-gram
    ±2, not adjacency only) and in scoring: lift is reported in exact
    integer parts-per-million (floor division of exact counts — no
    float anywhere, so the engines agree bit-for-bit; PMI = log(lift)
    is monotone in it, so the ranking is the PMI ranking).

    Scale shape: pair generation stays inside the token array (flatten
    of per-distance transforms — no per-token window sort, documents
    never leave their input split before the (a, b) hash aggregate);
    unigram side is vocab-sized and broadcast. The integer product
    cnt_ab·N·10⁶ stays < 2⁶³ while N < ~3·10⁹ tokens; past that,
    rescale the ppm factor or split the corpus into counted shards.
    Top-{COOC_TOPK} by (cnt_ab, a, b) pins the frontier in both
    engines."""
    d = _docs(spark, sf_dir)
    tk = d.select(
        F.filter(F.split("text", TOKEN_SEP), lambda w: w != "").alias("t")
    )
    per_dist = ", ".join(
        f"slice(transform(sequence(1, greatest(size(t)-{j}, 1)),"
        f" i -> named_struct('a', try_element_at(t, i),"
        f"  'b', try_element_at(t, i+{j}))),"
        f" 1, greatest(size(t)-{j}, 0))"
        for j in range(1, COOC_W + 1)
    )
    pairs = (
        tk.select(F.explode(F.expr(f"concat({per_dist})")).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
    )
    ug = (
        tk.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = ug.agg(F.sum("c").alias("n"))
    return (
        pairs.join(
            F.broadcast(
                ug.withColumnRenamed("word", "a").withColumnRenamed("c", "cnt_a")
            ),
            "a",
        )
        .join(
            F.broadcast(
                ug.withColumnRenamed("word", "b").withColumnRenamed("c", "cnt_b")
            ),
            "b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            # Exact decimal numerator/denominator (longs overflow past
            # ~3e9-count corpora under ANSI); DIV on decimals yields
            # the exact integral quotient, which fits a long for any
            # ppm-scaled lift up to n ≈ 9e12 tokens.
            F.expr(
                "CAST((CAST(cnt_ab AS DECIMAL(38,0)) * n * 1000000)"
                " DIV (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("cnt_ab"), "a", "b")
        .limit(COOC_TOPK)
    )


# ---------------------------------------------------------- BM25 search

#: Fixed keyword query for the retrieval demo: two common terms plus
#: the one rare term in the synthetic vocabulary ('dup', df ≈ 5% of
#: docs) — the idf spread that makes ranking non-trivial.
BM25_TERMS = ("vector", "join", "dup")
BM25_TOPK = 20
# Okapi BM25 with k1 = 6/5, b = 3/4, kept EXACTLY cross-engine by
# rational arithmetic: the per-term saturation
#   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
# with avgdl = L/N multiplies through to
#   22·tf·L / (10·tf·L + 3·L + 9·dl·N)          (exact integers),
# and idf uses the exact odds ratio (N − df + ½)/(df + ½) =
# (2N − 2df + 1)/(2df + 1) instead of its logarithm — ln() is libm
# and NOT bit-portable across engines, while the odds ratio is one
# division of identical integers. Per-term scores multiply two such
# divisions; the 3 terms add in one fixed order. Every double on both
# engines is therefore the same bits. (The log in classic BM25 damps
# idf across terms; the odds-ratio variant keeps the same per-term
# monotonicity and is declared as THE scoring contract here.)


def _bm25_term_sql(tf: str, df: str, dl: str, n: str, l: str) -> str:
    """One term's score — dialect-neutral SQL over integer columns."""
    return (
        f"(CAST(2*{n} - 2*{df} + 1 AS DOUBLE) / CAST(2*{df} + 1 AS DOUBLE))"
        f" * (CAST(22*{tf}*{l} AS DOUBLE)"
        f" / CAST(greatest(10*{tf}*{l} + 3*{l} + 9*{dl}*{n}, 1) AS DOUBLE))"
    )


def _bm25_oracle() -> str:
    from dist_mapreduce_spark.plans.llm_pipeline import _D_TOKS

    tfs = ", ".join(
        f"len(list_filter(t, x -> x = '{w}')) AS tf{i}"
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
    tf_cols = ", ".join(f"tf{i}" for i in range(len(BM25_TERMS)))
    return (
        f"WITH tk AS (SELECT doc_id, {_D_TOKS} AS t FROM documents"
        f"  WHERE text IS NOT NULL),"
        f" pe AS (SELECT doc_id, len(t) AS dl, {tfs} FROM tk),"
        f" st AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        f"  CAST(coalesce(sum(dl), 0) AS BIGINT) AS l, {dfs} FROM pe),"
        f" sc AS (SELECT doc_id, dl, {tf_cols}, {score} AS score"
        f"  FROM pe, st)"
        f" SELECT doc_id, dl, {tf_cols}, score, rk FROM ("
        f"  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk"
        f"  FROM sc) WHERE rk <= {BM25_TOPK}"
    )


@query("text_search_bm25", oracle=_bm25_oracle())
def q_text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: BM25 (rational variant, see module constants)
    over the documents table for a fixed 3-term query — the lexical
    side of a hybrid search stack (the vector side is sim_topk_*; a
    production RAG pipeline fuses both). Per document: term
    frequencies and length from ONE token pass; corpus stats (N, total
    length, per-term document frequencies) from ONE aggregate,
    broadcast back as a single row; scores are pure map-side
    arithmetic; top-20 by (score DESC, doc_id).

    Scale shape: the only shuffles are the 1-row stats aggregate and
    the final top-k (TakeOrderedAndProject — no global sort). At
    100 TB the stats row is maintained incrementally (agg_incremental's
    merge contract) and scoring stays a streaming scan; the classic
    posting-list formulation (inverted_index) trades this scan for
    index lookups when queries vastly outnumber corpus passes."""
    from dist_mapreduce_spark.operators import text_analysis as ta

    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    tk = docs.select("doc_id", ta.ws_tokens(F.col("text")).alias("t"))
    pe = tk.select(
        "doc_id",
        F.size("t").alias("dl"),
        # NB: not a python lambda with a default arg — a 2-parameter
        # lambda makes pyspark pass the ELEMENT INDEX as the second
        # argument (the (x, i) filter variant).
        *[
            F.expr(f"size(filter(t, x -> x = '{w}'))").alias(f"tf{i}")
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
    tf_cols = [f"tf{i}" for i in range(len(BM25_TERMS))]
    sc = pe.crossJoin(F.broadcast(st)).withColumn("score", F.expr(score))
    top = (
        sc.select("doc_id", "dl", *tf_cols, "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w))


# ------------------------------------------------------- hybrid search

RRF_K = 60          # the standard reciprocal-rank-fusion constant
RRF_DEPTH = 20      # per-ranker candidate depth
RRF_TOPK = 10
HYBRID_QVEC = 0     # query embedding = vec 0 (vec_id aligns with doc_id
#                     in the driver fixture: one embedding per document)


def _hybrid_oracle() -> str:
    from dist_mapreduce_spark.functions.vectors import cosine_duckdb_sql

    lex = _bm25_oracle()
    rrf = (
        f"coalesce(CAST(1.0 AS DOUBLE) / CAST({RRF_K} + lex_rk AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE))"
        f" + coalesce(CAST(1.0 AS DOUBLE) / CAST({RRF_K} + vec_rk AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE))"
    )
    return (
        f"WITH lex AS (SELECT doc_id, rk AS lex_rk FROM ({lex})"
        f"  WHERE rk <= {RRF_DEPTH}),"
        f" vec AS (SELECT vec_id AS doc_id, rk AS vec_rk FROM ("
        f"  SELECT e.vec_id, row_number() OVER (ORDER BY"
        f"   {cosine_duckdb_sql('q.embedding', 'e.embedding')} DESC,"
        f"   e.vec_id) AS rk"
        f"  FROM embeddings e,"
        f"   (SELECT embedding FROM embeddings WHERE vec_id = {HYBRID_QVEC}) q"
        f"  WHERE e.vec_id <> {HYBRID_QVEC}) WHERE rk <= {RRF_DEPTH}),"
        f" fused AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,"
        f"  lex_rk, vec_rk, {rrf} AS rrf"
        f"  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)"
        f" SELECT doc_id, lex_rk, vec_rk, rrf, rk FROM ("
        f"  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk"
        f"  FROM fused) WHERE rk <= {RRF_TOPK}"
    )


@query("search_hybrid_rrf", oracle=_hybrid_oracle())
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR
    2009) of the lexical BM25 ranking (text_search_bm25, depth 20) and
    a dense cosine ranking (query = document 0's embedding — the
    driver fixture carries one embedding per document, so vec_id aligns
    with doc_id), fused as Σ 1/(60 + rank) and cut to the top 10 — the
    retrieval stack a production RAG pipeline runs, in one declarative
    plan. RRF needs no score calibration between rankers (ranks only),
    which is also what makes it hash-exact here: each term is one
    division of identical integers, summed lexical-then-dense.

    Scale shape: both rankers end in TakeOrderedAndProject at depth 20
    (orderBy().limit() FIRST; the rank window then runs over the ≤20
    surviving rows — round 5's dense side windowed the full corpus and
    relied on the InferWindowGroupLimit rewrite, which nothing pinned),
    so the fusion is a full-outer join of two ≤20-row frames — free at
    any corpus size; ranker cost is one scan each (the dense side swaps
    in sim_topk_ivf_pruned's partition-pruned probe unchanged when the
    corpus is indexed)."""
    from dist_mapreduce_spark.functions.vectors import cosine_spark_sql
    from dist_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import Window

    lex = (
        q_text_search_bm25(spark, sf_dir)
        .filter(F.col("rk") <= RRF_DEPTH)
        .select("doc_id", F.col("rk").alias("lex_rk"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == HYBRID_QVEC).select(
        F.col("embedding").alias("qv")
    )
    top_vec = (
        emb.filter(F.col("vec_id") != HYBRID_QVEC)
        .crossJoin(F.broadcast(q))
        .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
        .select("vec_id", "score")
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(RRF_DEPTH)
    )
    wv = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    vec = top_vec.withColumn("rk", F.row_number().over(wv)).select(
        F.col("vec_id").alias("doc_id"), F.col("rk").alias("vec_rk")
    )
    rrf = (
        f"coalesce(CAST(1.0 AS DOUBLE) / CAST({RRF_K} + lex_rk AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE))"
        f" + coalesce(CAST(1.0 AS DOUBLE) / CAST({RRF_K} + vec_rk AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE))"
    )
    fused = lex.join(vec, "doc_id", "full_outer").withColumn("rrf", F.expr(rrf))
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", "lex_rk", "vec_rk", "rrf", "rk"
    )


# ------------------------------------------------------ phrase search

#: Fixed phrase for the positional-retrieval demo. "table table" is
#: chosen deliberately: it occurs ~30 times at sf0.01 AND self-overlaps
#: ("table table table" = 2 matches at consecutive positions), so the
#: query exercises the overlap semantics a positional index must get
#: right and that a bag-of-words scorer (text_search_bm25) cannot see.
PHRASE = ("table", "table")
PHRASE_TOPK = 20


def _phrase_oracle() -> str:
    p = len(PHRASE)
    conds = " AND ".join(
        f"t[i + {j}] = '{w}'" for j, w in enumerate(PHRASE)
    )
    return (
        f"WITH tk AS (SELECT doc_id, {_D_TOK_ARR} AS t FROM documents"
        f"  WHERE text IS NOT NULL),"
        f" m AS (SELECT doc_id,"
        f"  list_filter(range(1, len(t) - {p} + 2), i -> {conds}) AS pos"
        f"  FROM tk),"
        f" hits AS (SELECT doc_id,"
        f"   CAST(len(pos) AS BIGINT) AS n_matches,"
        f"   CAST(pos[1] AS BIGINT) AS first_pos"
        f"  FROM m WHERE len(pos) > 0)"
        f" SELECT doc_id, n_matches, first_pos, rk FROM ("
        f"  SELECT *, row_number() OVER (ORDER BY n_matches DESC, doc_id)"
        f"   AS rk FROM hits) WHERE rk <= {PHRASE_TOPK}"
    )


@query("text_search_phrase", oracle=_phrase_oracle())
def q_text_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the `"exact phrase"` query of a text
    index: documents where PHRASE's tokens occur at CONSECUTIVE
    positions, with per-document match count and first occurrence.
    Top-PHRASE_TOPK by (n_matches DESC, doc_id).

    Plan: pure MAP over one corpus scan — the token array and the
    match-position list (filter over sequence, the bigram_colloc
    in-array technique generalized to length-P windows; overlapping
    matches counted, exactly as a positional posting list would) are
    computed per document with zero shuffles; the only exchange is the
    bounded top-k (orderBy().limit() → TakeOrderedAndProject). At
    100 TB this is the scan-side phrase evaluator; the posting-list
    formulation (inverted_index with positions) trades the scan for
    index lookups when queries vastly outnumber corpus passes — the
    same trade documented on text_search_bm25.

    Integer-only outputs (positions 1-based in both dialects), so the
    oracle match is bit-exact by construction. Spark's sequence() on
    size(t) < P yields a DESCENDING ramp rather than DuckDB range()'s
    empty list — the i >= 1 conjunct plus NULL out-of-bounds
    subscripts make those rows match-free in both engines."""
    from pyspark.sql import Window

    p = len(PHRASE)
    conds = " AND ".join(
        f"t[i - 1 + {j}] = '{w}'" for j, w in enumerate(PHRASE)
    )
    pos_expr = (
        f"filter(sequence(1, size(t) - {p} + 1), i -> i >= 1 AND {conds})"
    )
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    tk = d.select(
        "doc_id",
        F.filter(F.split("text", TOKEN_SEP), lambda w: w != "").alias("t"),
    )
    hits = (
        tk.select("doc_id", F.expr(pos_expr).alias("pos"))
        .filter(F.size("pos") > 0)
        .select(
            "doc_id",
            F.size("pos").cast("long").alias("n_matches"),
            F.col("pos")[0].cast("long").alias("first_pos"),
        )
    )
    top = hits.orderBy(F.desc("n_matches"), F.asc("doc_id")).limit(PHRASE_TOPK)
    w = Window.orderBy(F.desc("n_matches"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", "n_matches", "first_pos", "rk"
    )


# --------------------------------------------------- maxsim retrieval

#: ColBERT-style late interaction (Khattab & Zaharia, SIGIR'20):
#: score(q, d) = Σ_{t ∈ q} max_{w ∈ d} cos(E(t), E(w)) — every query
#: term matches its best document token, sums over terms. The token
#: "embeddings" here are deterministic md5-derived vectors (a stand-in
#: for a trained encoder, per the repo's multimodal convention: the
#: model is faked deterministically, the Spark-side plumbing — vocab
#: scoring, per-doc max-pool, fixed-order sum — is real and oracled).
MAXSIM_DIM = 16
MAXSIM_TERMS = BM25_TERMS       # same fixed query as the BM25 demo
MAXSIM_TOPK = 20


def _wvec_spark(word: str) -> str:
    return (
        f"transform(sequence(1, {MAXSIM_DIM}), j ->"
        f" CAST(CAST(conv(substr(md5(concat({word}, '_',"
        f" cast(j AS string))), 1, 8), 16, 10) AS BIGINT) % 2000"
        f" AS DOUBLE) / 1000.0 - 1.0)"
    )


def _wvec_duck(word: str) -> str:
    return (
        f"list_transform(range(1, {MAXSIM_DIM + 1}), j ->"
        f" CAST(CAST(('0x' || substr(md5({word} || '_' ||"
        f" CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 2000"
        f" AS DOUBLE) / 1000.0 - 1.0)"
    )


def _maxsim_oracle() -> str:
    terms_rows = ", ".join(
        f"({i}, '{w}')" for i, w in enumerate(MAXSIM_TERMS)
    )
    maxes = ", ".join(
        f"max(CASE WHEN term_id = {i} THEN s END) AS m{i}"
        for i in range(len(MAXSIM_TERMS))
    )
    msum = "(" + " + ".join(f"m{i}" for i in range(len(MAXSIM_TERMS))) + ")"
    mcols = ", ".join(f"m{i}" for i in range(len(MAXSIM_TERMS)))
    cos = cosine_duckdb_sql("t.qv", "w.wv", dim=MAXSIM_DIM)
    return (
        f"WITH dw AS (SELECT DISTINCT doc_id, word FROM ("
        f"  SELECT doc_id, unnest({_D_TOK_ARR}) AS word FROM documents"
        f"  WHERE text IS NOT NULL)),"
        f" vocab AS (SELECT DISTINCT word FROM dw),"
        f" wv AS MATERIALIZED (SELECT word, {_wvec_duck('word')} AS wv"
        f"  FROM vocab),"
        f" tv AS (SELECT term_id, {_wvec_duck('word')} AS qv FROM ("
        f"  VALUES {terms_rows}) t(term_id, word)),"
        f" ts AS MATERIALIZED (SELECT t.term_id, w.word, {cos} AS s"
        f"  FROM tv t, wv w),"
        f" dm AS (SELECT dw.doc_id, {maxes}"
        f"  FROM dw JOIN ts ON ts.word = dw.word GROUP BY dw.doc_id),"
        f" sc AS (SELECT doc_id, {mcols}, {msum} AS score FROM dm)"
        f" SELECT doc_id, {mcols}, score, rk FROM ("
        f"  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk"
        f"  FROM sc) WHERE rk <= {MAXSIM_TOPK}"
    )


@query("search_maxsim", oracle=_maxsim_oracle())
def q_search_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (the ColBERT scoring
    shape): each document is a SET of token vectors, each query term
    max-pools over them, and the per-term maxima add in one fixed
    order — the ranking family that beats single-vector retrieval on
    phrase/entity queries and that a lexical index cannot express.

    Plan (the scalable late-interaction trick): token vectors are
    NEVER materialized per document. The per-(term, word) cosine is
    computed once over the DISTINCT VOCABULARY (bounded — Heaps' law —
    vs corpus tokens), broadcast, and each document's max-pool becomes
    a plain grouped MAX over its distinct (doc_id, word) pairs — one
    narrow shuffle of word ids, no vectors ever leave the vocab frame.
    At 100 TB: vocab scoring is a map over ~10⁶ rows, the max-pool is
    the same aggregate shape as word count, and the top-k is bounded
    (TakeOrderedAndProject). This mirrors how production ColBERT
    serving pushes maxsim into the inverted index rather than scoring
    every (query-token, doc-token) pair.

    Per-dim values are md5-derived in [-1, 1) — identical literals in
    both dialects (documented deterministic stand-in for the trained
    encoder); the cosine is the house bit-parity fold at
    MAXSIM_DIM = 16."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    dw = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", TOKEN_SEP), lambda w: w != "")
            ).alias("word"),
        )
        .distinct()
    )
    vocab = dw.select("word").distinct()
    wv = vocab.withColumn("wv", F.expr(_wvec_spark("word")))
    tv = spark.createDataFrame(
        list(enumerate(MAXSIM_TERMS)), "term_id int, word string"
    ).select("term_id", F.expr(_wvec_spark("word")).alias("qv"))
    cos = cosine_spark_sql("qv", "wv")
    ts = tv.crossJoin(wv).select(
        "term_id", "word", F.expr(cos).alias("s")
    )
    maxes = [
        F.max(F.when(F.col("term_id") == i, F.col("s"))).alias(f"m{i}")
        for i in range(len(MAXSIM_TERMS))
    ]
    dm = (
        dw.join(F.broadcast(ts), "word")
        .groupBy("doc_id")
        .agg(*maxes)
    )
    msum = "(" + " + ".join(f"m{i}" for i in range(len(MAXSIM_TERMS))) + ")"
    sc = dm.withColumn("score", F.expr(msum))
    top = sc.orderBy(F.desc("score"), F.asc("doc_id")).limit(MAXSIM_TOPK)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    mnames = [f"m{i}" for i in range(len(MAXSIM_TERMS))]
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", *mnames, "score", "rk"
    )
