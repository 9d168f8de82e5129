"""Multimodal column support (SURVEY.md §2.12 `multimodal_cols`).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct beside them — the Spark-native shape for image/audio/
video at scale (same layout `spark.read.format("binaryFile")` yields:
content + metadata). Decode / feature-extraction runs as Arrow-batched
pandas over mapInPandas, so bytes move driver-free in columnar batches.

The container has no image/audio codecs, so the real decoders are
STUBBED behind NotImplementedError; ``fake_decode_features`` is the
deterministic stand-in that keeps every piece of Spark plumbing real —
schema, binary Arrow transfer, batch iteration, output typing — and is
what the tests and the oracle check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (per payload).
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, last_byte int, byte_sum_mod int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal layout: (doc_id, payload binary, meta
    struct<fmt,n_bytes>). The payload here is the utf-8 encoding of the
    text column (a deterministic fake "media blob"); for real corpora
    this column comes straight off binaryFile / parquet BYTE_ARRAY."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/utf-8").alias("fmt"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an imaging library not present in
    this container. Plumbing-complete stub per the build contract."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow) not "
        "installed in this environment; use fake_decode_features for "
        "pipeline testing"
    )


def decode_audio_frames(payload: bytes, rate: int = 16_000) -> "object":
    """Real audio frame extraction — same stub contract as decode_image."""
    raise NotImplementedError(
        "audio decode requires an audio library not installed in this "
        "environment; use fake_decode_features for pipeline testing"
    )


def fake_decode_features(payloads: DataFrame) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    mapInPandas: per payload emit (n_bytes, first/last byte, byte-sum
    mod 997). Stands in for decode→resize→embed; the Arrow binary
    batch path and output typing are exactly what a real extractor
    uses. Map-side only — pipelines over the scan, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    (
                        doc_id,
                        len(b),
                        b[0] if b else -1,
                        b[-1] if b else -1,
                        sum(b) % 997,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "first_byte", "last_byte", "byte_sum_mod"],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


#: Output schema of the frame sampler.
FRAME_SCHEMA = "doc_id long, n_frames long, n_sampled long, sampled_bytes long"


def frame_sample(
    payloads: DataFrame, frame_bytes: int = 1024, every: int = 4
) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas: split each
    payload into fixed-size frames (the byte-level stand-in for video
    frame extraction — a real codec changes only the slicing line) and
    keep every ``every``-th frame. Emits per-doc frame accounting;
    map-side only, no shuffle — at 100 TB the sampler runs inside the
    scan pipeline and the downstream sees a ``sampled`` fraction of
    the bytes."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = [
                    b[i : i + frame_bytes] for i in range(0, len(b), frame_bytes)
                ]
                sampled = frames[::every]
                rows.append(
                    (doc_id, len(frames), len(sampled), sum(map(len, sampled)))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_sampled", "sampled_bytes"],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )
