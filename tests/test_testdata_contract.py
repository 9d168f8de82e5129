"""Testdata-encoding contract: fail LOUDLY when the driver's generator
changes a physical encoding.

Round 2's worst bug was silent: events.parquet `ts` switched from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) between rounds and the
hardcoded stream schema double-converted micros — every stream_* query
ran "green" with 1970-epoch garbage. These tests pin the semantic
contract (not the physical encoding, which is allowed to change) so a
generator change surfaces as a named assertion failure, not silently
wrong windows.
"""

from __future__ import annotations

import datetime
import glob
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_events_ts_normalizes_to_plausible_instants(spark):
    """Whatever the physical encoding (nanos-as-long, micros NTZ, or
    plain timestamp), load_table must yield TIMESTAMP values in the
    generator's real range — a double conversion lands in 1970, a
    missed one in year ~56k; both trip this immediately."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2000, f"events.ts min {lo}: under-converted (1970 bug class)"
    assert hi.year <= 2100, f"events.ts max {hi}: over-converted"


def test_ts_normalization_covers_all_three_encodings(spark, tmp_path):
    """Synthesize one tiny events file per physical encoding the
    generator has ever shipped — TIMESTAMP(NANOS), TIMESTAMP(MICROS,
    naive/NTZ), and TIMESTAMP(MICROS, UTC-adjusted) — and assert
    normalize_events_ts lands every one on the identical instants. The
    UTC-adjusted branch was dead code through round 3 (no round's
    generator produced it); this pins all three before the generator
    gets the chance."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dist_mapreduce_spark.sources.tables import normalize_events_ts

    base = datetime.datetime(2024, 5, 1, 12, 34, 56, 789012)
    micros = [base + datetime.timedelta(seconds=i) for i in range(5)]
    variants = {
        # 345 extra nanos: the DIV-1000 truncation must drop them.
        "ns": pa.array(
            [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
             * 1000 + 345 for t in micros],
            pa.timestamp("ns"),
        ),
        "us_ntz": pa.array(micros, pa.timestamp("us")),
        "us_utc": pa.array(
            [t.replace(tzinfo=datetime.timezone.utc) for t in micros],
            pa.timestamp("us", tz="UTC"),
        ),
    }
    for name, arr in variants.items():
        path = str(tmp_path / f"events_{name}.parquet")
        pq.write_table(pa.table({"event_id": list(range(5)), "ts": arr}), path)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark, spark.read.parquet(path))
        assert dict(df.dtypes)["ts"] == "timestamp", name
        got = [r["ts"] for r in df.orderBy("event_id").collect()]
        assert got == micros, f"{name}: {got[:2]} != {micros[:2]}"


def test_stream_source_schema_matches_batch(spark):
    """The stream source must derive its schema from the batch read —
    the round-2 regression was a hardcoded stream schema drifting from
    the file. Equality here makes stream/batch parity structural."""
    from dist_mapreduce_spark.sources.tables import load_table
    from dist_mapreduce_spark.streaming.windows import read_events_stream

    batch = load_table(spark, SF_DIR, "events")
    stream = read_events_stream(spark, SF_DIR)
    assert stream.schema == batch.schema


def test_all_tables_load_with_expected_key_columns(spark):
    """Each driver table loads and exposes the columns the query
    registry depends on (a rename/drop in the generator should name
    the table, not surface as 150 cryptic AnalysisExceptions)."""
    from dist_mapreduce_spark.sources.tables import TABLES, load_table

    required = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_nationkey"},
        "part": {"p_partkey", "p_type"},
        "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"},
        "events": {"event_id", "ts", "user_id", "event_type", "value"},
        "documents": {"doc_id", "text", "lang"},
        "embeddings": {"vec_id", "embedding"},
    }
    for name in TABLES:
        cols = set(load_table(spark, SF_DIR, name).columns)
        missing = required[name] - cols
        assert not missing, f"{name} lost required columns: {sorted(missing)}"


def test_documents_text_is_pure_ascii(spark):
    """The multimodal oracle family (decode / resize / audio / video /
    image phash / audio fingerprint) re-derives payload BYTES from the
    text column with per-CHARACTER ascii(substr(...)) closed forms —
    valid only while characters == bytes. The generator has shipped
    pure-ASCII text for four rounds; if that ever changes, fail HERE
    with a named assertion instead of eight cryptic multimodal hash
    mismatches (the fix then: restate those oracles over
    encode(text) blob slices)."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    n_bad = docs.filter(
        F.length("text") != F.octet_length("text")
    ).count()
    assert n_bad == 0, f"{n_bad} non-ASCII documents break multimodal oracles"
