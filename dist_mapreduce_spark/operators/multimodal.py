"""Multimodal column support (SURVEY.md §2.12 `multimodal_cols`).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct beside them — the Spark-native shape for image/audio/
video at scale (same layout `spark.read.format("binaryFile")` yields:
content + metadata). Decode / feature-extraction runs as Arrow-batched
pandas over mapInPandas, so bytes move driver-free in columnar batches.

The container has no image/audio libraries, so the lossy codecs are
STUBBED behind NotImplementedError — but the IMAGE decode path is real:
``encode_bmp``/``decode_image`` implement the uncompressed 24-bit BMP
container (BITMAPFILEHEADER + BITMAPINFOHEADER, a public spec) in pure
Python, so decode runs end-to-end inside the Arrow batch with no
third-party dependency. ``fake_decode_features`` remains the
deterministic stand-in for the lossy formats.
"""

from __future__ import annotations

import struct
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


#: BMP packing geometry: 16 px wide at 24 bpp → 48-byte rows, already
#: 4-byte aligned, so stride == row and no padding arithmetic leaks
#: into the oracle's closed form.
BMP_WIDTH = 16
_BMP_HEADER_BYTES = 54  # 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER


def encode_bmp(payload: bytes) -> bytes:
    """Pack arbitrary bytes into a minimal uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up pixel array — the
    classic public on-disk format). The last row is zero-padded to the
    48-byte row boundary; an empty payload becomes one all-zero row so
    the image is always well-formed."""
    row = BMP_WIDTH * 3
    height = max(1, -(-len(payload) // row))
    pix = payload.ljust(height * row, b"\x00")
    # BMP stores the pixel array bottom-up: write logical rows reversed.
    rows = [pix[i * row : (i + 1) * row] for i in range(height)]
    data = b"".join(reversed(rows))
    file_header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_BYTES + len(data), 0, 0, _BMP_HEADER_BYTES
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, BMP_WIDTH, height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + data


def decode_image(payload: bytes) -> dict:
    """Real image decode for uncompressed 24-bit BMP: pure-Python
    struct parse of the public header layout — magic, file size, pixel
    offset, dimensions, bpp, compression — followed by stride-aware
    pixel-array extraction restored to logical top-down order. No
    third-party codec needed, so the decode path runs for real in this
    container. Compressed/other-bpp variants raise ValueError (a real
    pipeline routes those to a codec library with the same signature).
    Returns {width, height, file_size, pixels(bytes, top-down)}."""
    if len(payload) < _BMP_HEADER_BYTES or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    file_size, _res1, _res2, px_off = struct.unpack_from("<IHHI", payload, 2)
    hdr_sz, width, height, planes, bpp, comp, _img_sz = struct.unpack_from(
        "<IiiHHII", payload, 14
    )
    if hdr_sz != 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24bpp)")
    stride = ((width * 3 + 3) // 4) * 4
    n_rows = abs(height)
    rows = [
        payload[px_off + r * stride : px_off + r * stride + width * 3]
        for r in range(n_rows)
    ]
    if height > 0:  # positive height ⇒ bottom-up storage; restore top-down
        rows.reverse()
    return {
        "width": width,
        "height": n_rows,
        "file_size": file_size,
        "pixels": b"".join(rows),
    }


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


#: Output schema of the BMP decode feature extractor.
DECODE_SCHEMA = (
    "doc_id long, width int, height int, bmp_file_size long,"
    " n_pixel_bytes long, pixel_sum_mod int"
)


def decode_image_features(payloads: DataFrame) -> DataFrame:
    """End-to-end image decode over binary payloads via mapInPandas:
    each payload is containerized as an uncompressed BMP (encode_bmp)
    and then REALLY decoded (decode_image — header parse + stride-aware
    pixel extraction), with an in-batch round-trip assertion that the
    decoded pixel array reproduces the original bytes plus zero
    padding — a decoder bug throws and fails the gate rather than
    drifting silently. Emits per-image structural facts + a pixel
    checksum. Map-side only: at 100 TB this pipelines inside the scan,
    one Arrow batch at a time, no shuffle and no driver traffic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                img = decode_image(encode_bmp(raw))
                pix = img["pixels"]
                if pix[: len(raw)] != raw or any(pix[len(raw) :]):
                    raise ValueError(f"BMP round-trip mismatch for doc {doc_id}")
                rows.append(
                    (
                        doc_id,
                        img["width"],
                        img["height"],
                        img["file_size"],
                        len(pix),
                        sum(pix) % 997,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bmp_file_size",
                    "n_pixel_bytes", "pixel_sum_mod",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
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
