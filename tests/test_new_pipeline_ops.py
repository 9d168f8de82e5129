"""Semantic unit tests for the round-4 second-wave operators, on
crafted inputs with hand-computed answers — the gate proves engine
parity; these prove the SEMANTICS are the intended ones (a query and
its oracle can agree on the wrong behavior; a hand-computed fixture
cannot).
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_SMOKE as SF

SRC = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC), reason="driver testdata not present"
)


def _clone_with(spark, tmp_path_factory, tag, table, rows, schema):
    """sf0.001 with one table replaced by crafted rows."""
    root = tmp_path_factory.mktemp(tag)
    fname = f"{table}.parquet"
    for name in os.listdir(SRC):
        if name != fname:
            src = os.path.join(SRC, name)
            dst = os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, fname))
    return str(root)


def test_cdc_apply_tombstone_and_latest_wins(spark, tmp_path_factory):
    """Keys: 1 = upserts then tombstone (must vanish), 2 = tombstone
    then later upsert (must resurface), 3 = same-ts tie broken by
    event_id (higher id wins)."""
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    rows = [
        (10, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (11, "2024-01-02 00:00:00", 1, "click", 2.0, "{}"),
        (12, "2024-01-03 00:00:00", 1, "error", 0.0, "{}"),   # tombstone
        (20, "2024-01-01 00:00:00", 2, "error", 0.0, "{}"),
        (21, "2024-01-02 00:00:00", 2, "purchase", 9.5, "{}"),
        (30, "2024-01-05 00:00:00", 3, "view", 1.0, "{}"),
        (31, "2024-01-05 00:00:00", 3, "signup", 7.0, "{}"),  # same ts
    ]
    schema = (
        "event_id long, ts string, user_id long,"
        " event_type string, value double, props string"
    )
    df = spark.createDataFrame(rows, schema).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    root = tmp_path_factory.mktemp("cdc_events")
    for name in os.listdir(SRC):
        if name != "events.parquet":
            src, dst = os.path.join(SRC, name), os.path.join(root, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "events.parquet")
    )
    out = {
        r["user_id"]: (r["last_type"], r["last_value"])
        for r in registry.QUERIES["cdc_apply"](spark, str(root)).collect()
    }
    assert 1 not in out                      # tombstoned
    assert out[2] == ("purchase", 9.5)       # later upsert beats tombstone
    assert out[3] == ("signup", 7.0)         # event_id tie-break


def test_quality_perplexity_hand_computed(spark, tmp_path_factory):
    """Corpus 'a a b' + 'b c': N=5, c(a)=2, c(b)=2, c(c)=1.
    inv_freq = N DIV c -> a:2, b:2, c:5; bits = floor(log2) -> 1,1,2."""
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    rows = [
        (1, "a a b", "en", "src0", 5),
        (2, "b c", "en", "src0", 3),
    ]
    root = _clone_with(
        spark, tmp_path_factory, "perp_docs", "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: r
        for r in registry.QUERIES["quality_perplexity"](spark, root).collect()
    }
    assert out[1]["n_tokens"] == 3
    assert out[1]["bits_total"] == 3          # 1 + 1 + 1
    assert out[1]["rarity_sum"] == 6          # 2 + 2 + 2
    assert out[1]["bits_per_token_milli"] == 1000
    assert out[2]["n_tokens"] == 2
    assert out[2]["bits_total"] == 3          # 1 + 2
    assert out[2]["rarity_sum"] == 7          # 2 + 5
    assert out[2]["bits_per_token_milli"] == 1500


def test_sample_reservoir_exact_k_per_stratum(spark):
    """Exactly min(|stratum|, K) docs per language, and the draw is
    stable across physical layout (hash-ranked, not partition-order)."""
    from dist_mapreduce_spark.plans import registry
    from dist_mapreduce_spark.plans.iterative import RESERVOIR_K
    from dist_mapreduce_spark.sources.tables import load_table

    registry.load_all()
    got = registry.QUERIES["sample_reservoir"](spark, SF).collect()
    sizes = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    per_lang: dict[str, int] = {}
    for r in got:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    for lang, n in per_lang.items():
        assert n == min(sizes[lang], RESERVOIR_K), (lang, n, sizes[lang])
    # Rerun → identical membership (deterministic, topology-free).
    again = registry.QUERIES["sample_reservoir"](spark, SF).collect()
    assert {(r["doc_id"], r["lang"]) for r in got} == {
        (r["doc_id"], r["lang"]) for r in again
    }


def test_join_bloom_matches_plain_semi_join(spark):
    """The bloom prefilter must be semantically invisible: result ==
    the plain exact semi-join, bucket collisions or not."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans import registry
    from dist_mapreduce_spark.sources.tables import load_table

    registry.load_all()
    got = {
        r["c_mktsegment"]: r["n_customers"]
        for r in registry.QUERIES["join_bloom"](spark, SF).collect()
    }
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    want = {
        r["c_mktsegment"]: r["n"]
        for r in cust.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_mix_interleave_stride_schedule(spark):
    """Every returned row's mix_pos is rank*1000 DIV weight, and the
    result is exactly the MIX_TAKE smallest (mix_pos, lang, doc_id)
    tuples of the full ranked frame."""
    import hashlib

    from dist_mapreduce_spark.plans import registry
    from dist_mapreduce_spark.plans.llm_pipeline import (
        MIX_DEFAULT_W,
        MIX_TAKE,
        MIX_WEIGHTS,
    )
    from dist_mapreduce_spark.sources.tables import load_table

    registry.load_all()
    got = [
        (r["mix_pos"], r["lang"], r["doc_id"], r["rank_in_lang"])
        for r in registry.QUERIES["mix_interleave"](spark, SF).collect()
    ]
    docs = load_table(spark, SF, "documents").select("doc_id", "lang").collect()
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    want = []
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        w = MIX_WEIGHTS.get(lang, MIX_DEFAULT_W)
        for rank, doc_id in enumerate(ids, start=1):
            want.append((rank * 1000 // w, lang, doc_id, rank))
    want.sort()
    assert sorted(got) == want[:MIX_TAKE]


def test_image_phash_collapses_visually_identical_bytes_differ(
    spark, tmp_path_factory
):
    """Two payloads differing only at an UNSAMPLED byte (col 3 of the
    16px BMP row — the 8x8 grid samples cols = 0,2,4,..,14, i.e. byte
    offsets 6c+k, never 3,4,5 mod 6) must land in the same perceptual
    group even though their byte hashes differ; a perceptually
    DIFFERENT image (its whole second row rewritten, flipping the
    bright half of the thumbnail) must not — while a one-char change
    at a sampled byte is exactly what an average-hash is built to
    absorb."""
    from dist_mapreduce_spark.plans import registry

    registry.load_all()
    base = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuv" * 2  # 96 B
    unsampled = base[:3] + "z" + base[4:]     # byte 3: col 1 ch 0 -> skipped
    sampled = base[:48] + "~" * 48            # second BMP row rewritten
    rows = [
        (1, base, "en", "src0", len(base)),
        (2, unsampled, "en", "src0", len(unsampled)),
        (3, sampled, "en", "src0", len(sampled)),
    ]
    root = _clone_with(
        spark, tmp_path_factory, "phash_docs", "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: r
        for r in registry.QUERIES["dedup_image_phash"](spark, root).collect()
    }
    assert (out[1]["ahash_hi"], out[1]["ahash_lo"]) == (
        out[2]["ahash_hi"], out[2]["ahash_lo"],
    )
    assert out[2]["is_dup"] and out[2]["canonical_id"] == 1
    assert (out[3]["ahash_hi"], out[3]["ahash_lo"]) != (
        out[1]["ahash_hi"], out[1]["ahash_lo"],
    )
