"""Degenerate-input robustness sweep: every document-centric query must
survive a corpus of pathological documents — empty text, whitespace-only,
single characters, no letters, NULL-ish strata — without throwing.

Spark runs ANSI mode, where the failure class is real: element_at past
an array end, divide-by-zero on an empty token list, sequence(1, 0)
descending instead of empty. The driver corpus never contains such
documents, so without this sweep the first blank document in a real
corpus is a runtime crash, not a wrong number. (The round-3 ADVICE
divide-by-zero in approx_distinct was exactly this class.)
"""

from __future__ import annotations

import os
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC), reason="driver testdata not present"
)

#: Queries that read `documents` (from the registry inventory). The
#: similarity/multimodal queries over embeddings are exercised by their
#: own fixtures; streaming/events queries don't touch documents.
DOC_QUERIES = [
    "text_stats",
    "lang_id",
    "quality_score",
    "quality_repetition",
    "token_count",
    "fingerprint",
    "fingerprint_winnow",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "domain_cap_sample",
    "bpe_train_merges",
    "bpe_encode",
    "cooccurrence_pmi",
    "bigram_colloc",
    "inverted_index",
    "vocab_topk",
    "text_tfidf",
    "contamination_ngram",
    "pack_sequences",
    "dedup_paragraph",
    "dedup_substring",
    "pii_scrub",
    "pipeline_pretrain",
    "text_search_bm25",
    "dedup_minhash_collapsed",
    "dedup_cluster_collapsed",
    "multimodal_cols",
    "multimodal_features",
    "multimodal_decode",
    "multimodal_audio",
    "multimodal_video",
    "multimodal_frames",
    "multimodal_resize",
    "quality_perplexity",
    "sample_reservoir",
    "mix_interleave",
    "dedup_image_phash",
    "dedup_image_near",
    "dedup_audio_fp",
    "graph_triangles",
    "graph_degree_hist",
    # round-8: chunking (empty/whitespace docs must yield NO chunks,
    # not a crash) and the perplexity-tercile audit.
    "chunk_documents",
    "quality_ccnet_bucket",
    "tokenizer_fertility",
    "search_passage_maxp",
    "data_mix_report",
    "quality_langid_confusion",
    "quality_dedup_report",
    # round-9: span excision must survive empty/whitespace docs (zero
    # tokens → nothing to excise, verbatim-empty rewrite), the span
    # pipeline likewise, and dense e2e retrieval must yield an EMPTY
    # result (no query chunks exist) rather than crash.
    "dedup_substring_rewrite",
    "pipeline_pretrain_spans",
    "search_dense_maxp",
    # round-10: the index-served/encoded dense family — NULL-text
    # documents must flow through chunking, the mapInPandas encoder,
    # the trained index build, and the recall compare.
    "search_dense_maxp_encoded",
    "search_dense_maxp_pruned",
    "search_dense_recall",
    "search_dense_mmr_pruned",
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """sf0.001 with documents replaced by pathological rows."""
    root = tmp_path_factory.mktemp("degenerate_sf")
    for name in os.listdir(SRC):
        if name != "documents.parquet":
            src = os.path.join(SRC, name)
            dst = os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    rows = [
        (0, "", "en", "src0", 0),                       # empty
        (1, "   ", "en", "src0", 3),                    # whitespace only
        (2, "\n\t \n", "de", "src1", 4),                # other whitespace
        (3, "a", "en", "src1", 1),                      # single char
        (4, "7", "es", "src2", 1),                      # single digit (no letters)
        (5, "!!! ??? ...", "fr", "src2", 11),           # punctuation only
        (6, "the", "en", "src3", 3),                    # one real token
        (7, "the the the the the", "en", "src3", 19),   # max repetition
        (8, "x " * 200, "en", "src4", 400),             # many 1-char tokens
        (9, "the quick brown fox jumps over the lazy dog", "en", "src4", 44),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return str(root)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_survives_degenerate_corpus(spark, degenerate_dir, name):
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    if name not in registry.QUERIES:
        pytest.skip(f"{name} not registered in this environment")
    rows = registry.QUERIES[name](spark, degenerate_dir).collect()
    # No exception is the contract; per-doc queries must also not drop
    # documents silently (pair/aggregate queries may legitimately
    # return few or zero rows).
    per_doc = {
        "text_stats",
        "lang_id",
        "quality_score",
        "token_count",
        "fingerprint",
        "fingerprint_winnow",
        "text_search_bm25",
    "multimodal_cols",
        "multimodal_features",
        "multimodal_decode",
        "multimodal_audio",
        "multimodal_video",
        "multimodal_frames",
        "multimodal_resize",
    }
    if name in per_doc:
        assert len(rows) == 10, f"{name} dropped degenerate documents"


#: Queries that read `events` — batch side (streaming twins read the
#: same files through read_events_stream and share these plans).
EVENT_QUERIES = [
    "agg_window_tumbling",
    "agg_window_sliding",
    "agg_window_session",
    "sessionize_gaps",
    "events_funnel",
    "events_retention",
    "ts_gapfill",
    "rolling_active_users",
    "ts_ohlc_bars",
    "approx_distinct",
    "agg_incremental",
    "cdc_apply",
    "events_outliers",
    "skew_hitters",
    "events_transitions",
    "events_pattern_match",
]


@pytest.fixture(scope="module")
def degenerate_events_dir(spark, tmp_path_factory):
    """sf0.001 with events replaced by pathological rows: NULL user_id
    (the approx_distinct divide-by-zero class from the round-3 ADVICE),
    NULL value, NULL props, empty event_type, a single-event user, and
    two events at the identical timestamp."""
    import datetime

    root = tmp_path_factory.mktemp("degenerate_events_sf")
    for name in os.listdir(SRC):
        if name != "events.parquet":
            src = os.path.join(SRC, name)
            dst = os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (0, t0, None, "view", 1.5, None),                      # NULL user
        (1, t0, None, "view", None, None),                     # NULL user+value
        (2, t0, 7, "", 0.0, "{}"),                             # empty type
        (3, t0, 7, "click", -3.25, '{"k":1}'),                 # same ts as 2
        (4, t0 + datetime.timedelta(hours=5), 7, "purchase", 10.0, None),
        (5, t0 + datetime.timedelta(days=2), 9, "view", 2.0, "x"),
        (None, t0, 7, "view", 0.5, None),                      # NULL event_id
        (6, None, 11, "view", 1.0, None),                      # NULL ts
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "events.parquet")
    )
    return str(root)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_survives_degenerate_events(spark, degenerate_events_dir, name):
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES[name](spark, degenerate_events_dir).collect()
    if name == "approx_distinct":
        # The NULL-user group must keep a total boolean (the round-3
        # ADVICE divide-by-zero guard) and count zero exact users.
        by_type = {r["event_type"]: r for r in rows}
        assert by_type["view"] is not None
        assert all(r["within_5pct"] is True for r in rows), rows


def test_null_text_documents_do_not_crash_new_pipeline_ops(spark, monkeypatch):
    """NULL text (distinct from empty string) through the round-4
    corpus operators: pii_scrub must treat it as '' in BOTH dialect
    semantics (Spark concat null-propagates, DuckDB concat skips NULLs
    — the coalesce guard is the regression under test) and the dedup /
    pipeline ops must drop the row, not throw."""
    import dist_mapreduce_spark.plans.llm_pipeline as lp
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    docs = spark.createDataFrame(
        [
            (0, None, "en", "src0", 0),
            (1, "the quick brown fox jumps over the lazy dog twelve words here",
             "en", "src0", 60),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(lp, "_docs", lambda s, d: docs)
    scrub = {r["doc_id"]: r for r in registry.QUERIES["pii_scrub"](spark, SRC).collect()}
    # NULL text scrubs as if empty: the planted PII is still found.
    assert (scrub[0]["n_email"], scrub[0]["n_phone"], scrub[0]["n_ip"]) == (1, 1, 1)
    assert scrub[0]["scrubbed"].startswith(" contact ")
    for name in ("dedup_paragraph", "dedup_substring", "pipeline_pretrain"):
        rows = registry.QUERIES[name](spark, SRC).collect()
        ids = {r["doc_id"] for r in rows if "doc_id" in r.asDict()}
        assert 0 not in ids, f"{name} emitted a row for the NULL-text doc"


def test_agg_incremental_null_event_id_counted_once(spark, monkeypatch):
    """A NULL event_id must land in exactly one side of the
    state/delta split (the coalesce(..., false) guard) so the merged
    result still equals the full recompute."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans import registry, relational

    registry.load_all()
    import datetime

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [
            (None, t0, 7, "view", 2.5, None),   # NULL event_id
            (4, t0, 7, "view", 1.0, None),      # batch side (4 % 5 == 4)
            (1, t0, 7, "view", 0.25, None),     # history side
            (2, t0, None, "view", 3.0, None),   # NULL user key
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(
        relational, "_t", lambda s, d, name: ev if name == "events" else None
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in registry.QUERIES["agg_incremental"](spark, SRC).collect()
    }
    assert got[7] == (3, 3.75)     # NULL id row merged exactly once
    assert got[None] == (1, 3.0)   # NULL user key is one group


@pytest.fixture(scope="module")
def null_text_dir(spark, tmp_path_factory):
    """sf0.001 with documents containing a NULL text row plus normal
    rows — NULL is a distinct failure class from empty string: NULL
    defeats AND short-circuits (NULL, not false) and splits into a
    NULL token array rather than an empty one."""
    root = tmp_path_factory.mktemp("null_text_sf")
    for name in os.listdir(SRC):
        if name != "documents.parquet":
            src = os.path.join(SRC, name)
            dst = os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    rows = [
        (0, None, "en", "src0", 0),
        (1, None, None, None, None),  # everything NULL
        (2, "the quick brown fox jumps over the lazy dog again and again",
         "en", "src1", 60),
        (3, "pack my box with five dozen liquor jugs for the long trip",
         "de", "src2", 58),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return str(root)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_survives_null_text(spark, null_text_dir, name):
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    if name not in registry.QUERIES:
        pytest.skip(f"{name} not registered in this environment")
    registry.QUERIES[name](spark, null_text_dir).collect()


#: Queries that read `embeddings`.
EMB_QUERIES = [
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_pq",
    "sim_recall",
    "dedup_embedding",
    "kmeans_embeddings",
    "embedding_audit",
    # round-5 index/serving/dedup surface: NULL vectors must neither
    # crash the driver-side centroid/query pulls nor surface as
    # neighbors or canonicals.
    "sim_index_build",
    "sim_index_append",
    "sim_topk_ivf_pruned",
    "sim_cand_stats",
    "sim_ivf_clustered",
    "dedup_semantic",
    "search_hybrid_rrf",
    # round-6 additions: batched serving + lifecycle + collapse.
    "sim_serve_batch",
    "sim_index_delete",
    "sim_index_upsert",
    "sim_topk_ivfpq",
    # round-7 additions: compaction, filtered/radius serving, and the
    # SQ8/binary quantizers (whose stats pulls must skip NULL rows).
    "sim_index_compact",
    "sim_topk_filtered",
    "sim_topk_filtered_ivf",
    "sim_range_search",
    "sim_topk_sq8",
    "sim_topk_binary",
    "knn_graph",
    "knn_graph_refine",
    "knn_graph_recall",
    "knn_graph_collapsed",
    "knn_graph_converged",
    "knn_clustered",
    # round-8: trained-quantizer family — NULL vectors train through
    # the kmeans chain but must never be indexed or served.
    "sim_index_build_trained",
    "sim_topk_ivf_trained",
    "sim_cand_stats_trained",
    "sim_topk_filtered_adaptive",
    "sim_filtered_adaptive_stats",
    # round-8: residual-encoded composition — NULL vectors must not
    # become residual codewords or ranked candidates — and MMR
    # serving, whose candidate pool must skip NULL vectors.
    "sim_topk_ivfpq_res",
    "sim_topk_ivfpq_res_pruned",
    "sim_index_build_res",
    "sim_topk_mmr",
    "sim_topk_mmr_pruned",
    "contamination_embedding",
    # round-10 (advice): the codebook statistic's driver pulls and the
    # auto-selected serving arm must both survive NULL vectors.
    "sim_codebook_stats",
    "sim_topk_ivfpq_auto",
    # round-10: the candidate-distribution audit shares the build's
    # res frame — NULL vectors must not enter it.
    "knn_cand_hist",
    # round-10: the staleness monitor's two training runs and three
    # distance scans must all skip NULL vectors.
    "sim_index_staleness",
]


@pytest.fixture(scope="module")
def null_emb_dir(spark, tmp_path_factory):
    """sf0.001 embeddings plus corrupt rows: NULL embedding, NULL
    label — the rows a real 100 TB ingest always contains a few of."""
    root = tmp_path_factory.mktemp("null_emb_sf")
    for name in os.listdir(SRC):
        if name != "embeddings.parquet":
            src = os.path.join(SRC, name)
            dst = os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")).limit(50)
    corrupt = spark.createDataFrame(
        # 9000/9001 hit no lifecycle batch predicate; 9034 hits the
        # delete tombstone predicate (%97==13) and 9085 the upsert
        # predicate (%89==7), so NULL vectors flow through the
        # affected-cell driver pulls too (round-6 advice).
        [(9000, None, 1), (9001, None, None), (9034, None, 1), (9085, None, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    extra_nolabel = base.limit(1).selectExpr(
        "9002 AS vec_id", "embedding", "CAST(NULL AS INT) AS label"
    )
    base.unionByName(corrupt).unionByName(extra_nolabel).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "embeddings.parquet"))
    return str(root)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_emb_query_survives_corrupt_vectors(spark, null_emb_dir, name):
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES[name](spark, null_emb_dir).collect()
    corrupt_ids = (9000, 9001, 9034, 9085)
    if name in ("sim_topk_mmr", "sim_topk_mmr_pruned"):
        # MMR emits (rel, mmr) instead of score; same NULL hygiene.
        assert all(r["vec_id"] not in corrupt_ids for r in rows), name
        assert all(r["rel"] is not None and r["mmr"] is not None for r in rows), name
    elif name.startswith("sim_topk"):
        # NULL embeddings must never appear among returned neighbors.
        assert all(r["vec_id"] not in corrupt_ids for r in rows), name
        assert all(r["score"] is not None for r in rows), name
    elif name.startswith("knn_graph") and name != "knn_graph_recall":
        # The graph family must never emit corrupt vec_ids as either
        # endpoint, nor NULL scores — a NULL vector that survives into
        # cell residency would do both (round-7 advice).
        for r in rows:
            assert r["src_id"] not in corrupt_ids, (name, r)
            assert r["dst_id"] not in corrupt_ids, (name, r)
            assert r["score"] is not None, (name, r)
    elif name in ("knn_graph_recall", "knn_clustered"):
        assert all(r["recall"] is not None for r in rows), name


def test_dq_expectations_total_on_empty_tables(spark, monkeypatch):
    """An empty table must yield (0, 0) — checked and violations — not
    NULL: count(CASE) semantics, matching the oracle's count(*) FILTER."""
    from dist_mapreduce_spark.plans import registry, relational

    registry.load_all()
    real_t = relational._t

    def patched(s, d, name):
        df = real_t(s, SRC, name)
        return df.limit(0) if name in ("documents", "lineitem") else df

    monkeypatch.setattr(relational, "_t", patched)
    rows = {r["check_name"]: r for r in registry.QUERIES["dq_expectations"](spark, SRC).collect()}
    assert len(rows) == 6  # every check always emits a row
    for name in ("documents_text_nonnull", "lineitem_quantity_range",
                 "lineitem_discount_range", "lineitem_orderkey_fk"):
        assert rows[name]["n_checked"] == 0
        assert rows[name]["n_violations"] == 0, name  # 0, never NULL
