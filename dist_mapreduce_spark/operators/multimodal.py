"""Multimodal column support (SURVEY.md §2.12 `multimodal_cols`).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct beside them — the Spark-native shape for image/audio/
video at scale (same layout `spark.read.format("binaryFile")` yields:
content + metadata). Decode / feature-extraction runs as Arrow-batched
pandas over mapInPandas, so bytes move driver-free in columnar batches.

Both decode paths are REAL, with no third-party dependency:
``encode_bmp``/``decode_image`` implement the uncompressed 24-bit BMP
container and ``encode_wav``/``decode_audio_frames`` the RIFF/WAVE
PCM16 container (both public specs) in pure Python, so image and audio
decode run end-to-end inside the Arrow batch. Lossy formats (JPEG,
MP3, video codecs) raise ValueError from the same entry points — the
codec-routing signal a real pipeline uses to dispatch to a codec
library with the identical UDF signature. ``fake_decode_features``
remains the deterministic stand-in for those.
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
    this column comes straight off binaryFile / parquet BYTE_ARRAY.

    Rows with NULL text carry no blob and are dropped here — the
    production sources (binaryFile, BYTE_ARRAY columns with a
    NOT NULL contract) cannot produce a NULL payload, and letting one
    through would hand ``None`` to every Arrow-batch decoder
    downstream."""
    docs = docs.filter(F.col("text").isNotNull())
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


#: WAV packing geometry: canonical 44-byte RIFF/PCM header, mono,
#: 16-bit little-endian samples.
WAV_RATE = 16_000
_WAV_HEADER_BYTES = 44


def encode_wav(payload: bytes, rate: int = WAV_RATE) -> bytes:
    """Pack arbitrary bytes into a minimal RIFF/WAVE container as mono
    16-bit PCM (the public canonical 44-byte header). Odd-length
    payloads gain one zero pad byte so the sample array is whole."""
    data = payload if len(payload) % 2 == 0 else payload + b"\x00"
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16,
        1,            # audio_format = PCM
        1,            # channels = mono
        rate,
        rate * 2,     # byte_rate = rate * block_align
        2,            # block_align = channels * bits/8
        16,           # bits_per_sample
        b"data", len(data),
    )
    return hdr + data


def decode_audio_frames(payload: bytes) -> dict:
    """Real audio decode for RIFF/WAVE PCM16 mono: pure-Python struct
    parse of the public header (magic, fmt chunk, data chunk) plus
    sample extraction — no codec library needed, so the audio path runs
    for real in this container. Compressed/other-bpp WAVs raise
    ValueError (a real pipeline routes those to a codec with the same
    signature). Returns {sample_rate, n_samples, samples(list[int])}."""
    if len(payload) < _WAV_HEADER_BYTES or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (
        _riff, _riff_sz, _wave, _fmt, fmt_sz, audio_format, channels,
        rate, _byte_rate, block_align, bits, _data, data_sz,
    ) = struct.unpack_from("<4sI4s4sIHHIIHH4sI", payload, 0)
    if _fmt != b"fmt " or fmt_sz != 16 or _data != b"data":
        raise ValueError("unsupported WAV chunk layout (need canonical 44-byte header)")
    if audio_format != 1 or channels != 1 or bits != 16 or block_align != 2:
        raise ValueError("unsupported WAV variant (need PCM16 mono)")
    raw = payload[_WAV_HEADER_BYTES : _WAV_HEADER_BYTES + data_sz]
    n = len(raw) // 2
    samples = list(struct.unpack(f"<{n}h", raw[: n * 2]))
    return {"sample_rate": rate, "n_samples": n, "samples": samples}


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


#: Output schema of the resize feature extractor.
RESIZE_SCHEMA = (
    "doc_id long, src_height int, out_width int, out_height int,"
    " resized_sum_mod int"
)
#: Fixed thumbnail geometry (out_w divides BMP_WIDTH so column mapping
#: is exact integer stride).
RESIZE_W, RESIZE_H = 8, 8


def resize_image_features(payloads: DataFrame) -> DataFrame:
    """Image RESIZE over binary payloads via mapInPandas: encode to
    BMP, really decode (decode_image), then nearest-neighbor downsample
    to a RESIZE_W×RESIZE_H thumbnail with pure integer index math
    (src_row = r·H // out_h, src_col = c·W // out_w) — the
    deterministic core of a thumbnail/embedding-prep stage, bit-exact
    on every engine because nothing is float. Emits geometry + a mod-997
    checksum over the sampled thumbnail bytes. Map-side only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(encode_bmp(bytes(payload)))
                pix, h, w = img["pixels"], img["height"], img["width"]
                stride = w * 3
                total = 0
                for r in range(RESIZE_H):
                    src_r = r * h // RESIZE_H
                    for c in range(RESIZE_W):
                        src_c = c * w // RESIZE_W
                        base = src_r * stride + src_c * 3
                        total += pix[base] + pix[base + 1] + pix[base + 2]
                rows.append((doc_id, h, RESIZE_W, RESIZE_H, total % 997))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_height", "out_width", "out_height",
                    "resized_sum_mod",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


#: Output schema of the WAV decode feature extractor.
AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, duration_us long,"
    " amp_sum_mod int"
)


def decode_audio_features(payloads: DataFrame) -> DataFrame:
    """End-to-end audio decode over binary payloads via mapInPandas:
    each payload is containerized as PCM16-mono WAV (encode_wav) and
    REALLY decoded back (decode_audio_frames — RIFF header parse +
    int16 sample extraction), with an in-batch round-trip assertion
    that the samples reproduce the original byte pairs. Emits sample
    accounting + an integer amplitude checksum (mod 997) — integer
    arithmetic end-to-end so the DuckDB oracle can re-derive every
    column from the text bytes exactly. Map-side only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                wav = decode_audio_frames(encode_wav(raw))
                n = wav["n_samples"]
                padded = raw if len(raw) % 2 == 0 else raw + b"\x00"
                expect = struct.unpack(f"<{n}h", padded)
                if tuple(wav["samples"]) != expect:
                    raise ValueError(f"WAV round-trip mismatch for doc {doc_id}")
                rows.append(
                    (
                        doc_id,
                        wav["sample_rate"],
                        n,
                        n * 1_000_000 // wav["sample_rate"],
                        sum(wav["samples"]) % 997,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_us",
                    "amp_sum_mod",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_SCHEMA
    )


#: AVI packing geometry: 16×4 px 24-bpp DIB frames → 192 bytes/frame,
#: 48-byte rows (4-byte aligned, no stride padding).
AVI_W, AVI_H = 16, 4
_AVI_FRAME_BYTES = AVI_W * AVI_H * 3


def encode_avi(payload: bytes) -> bytes:
    """Pack arbitrary bytes into a minimal RIFF/AVI container of
    uncompressed 24-bit DIB frames (the public AVI 1.0 layout: LIST
    hdrl [avih + LIST strl [strh vids/DIB + strf BITMAPINFOHEADER]] +
    LIST movi ['00db' frames]). Rows inside each frame are stored
    bottom-up, as DIB mandates; the last frame is zero-padded. An empty
    payload becomes one all-zero frame."""
    row = AVI_W * 3
    n_frames = max(1, -(-len(payload) // _AVI_FRAME_BYTES))
    pix = payload.ljust(n_frames * _AVI_FRAME_BYTES, b"\x00")
    frames = []
    for fi in range(n_frames):
        body = pix[fi * _AVI_FRAME_BYTES : (fi + 1) * _AVI_FRAME_BYTES]
        rows = [body[r * row : (r + 1) * row] for r in range(AVI_H)]
        frames.append(b"00db" + struct.pack("<I", _AVI_FRAME_BYTES)
                      + b"".join(reversed(rows)))
    movi_body = b"movi" + b"".join(frames)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    avih = b"avih" + struct.pack(
        "<I14I", 56,
        33333, 0, 0, 0, n_frames, 0, 1, _AVI_FRAME_BYTES,
        AVI_W, AVI_H, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack(
        "<I4s4s10I4H", 56, b"vids", b"DIB ",
        0, 0, 0, 1, 30, 0, n_frames, _AVI_FRAME_BYTES, 0, 0,
        0, 0, AVI_W, AVI_H,
    )
    strf = b"strf" + struct.pack(
        "<I", 40
    ) + struct.pack("<IiiHHIIiiII", 40, AVI_W, AVI_H, 1, 24, 0,
                    _AVI_FRAME_BYTES, 0, 0, 0, 0)
    strl_body = b"strl" + strh + strf
    strl = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_video_frames(payload: bytes) -> dict:
    """Real video-container decode for uncompressed-DIB AVI: pure-Python
    RIFF chunk walk (LIST hdrl → avih for geometry; LIST movi → '00db'
    frame chunks), with per-frame bottom-up rows restored to logical
    top-down order. No codec library needed. Compressed streams (any
    '00dc' chunk, or a '00db' whose size ≠ geometry) raise ValueError —
    the codec-routing signal — as does a movi LIST arriving before the
    avih geometry. Returns {n_frames, width, height,
    frames(list[bytes], logical order)}."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = total = None
    frames: list[bytes] = []
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"LIST" and body[:4] == b"hdrl":
            if body[4:8] != b"avih":
                raise ValueError("hdrl missing avih")
            (_hsz, _us, _mb, _pad, _fl, total, _init, _streams, _buf,
             width, height) = struct.unpack_from("<I10I", body, 8)
        elif cid == b"LIST" and body[:4] == b"movi":
            if width is None:
                # movi before hdrl: the geometry checks below would
                # otherwise die on None arithmetic (TypeError, not the
                # documented ValueError).
                raise ValueError("missing avih header")
            fpos = 4
            while fpos + 8 <= len(body):
                fid = body[fpos : fpos + 4]
                (fsz,) = struct.unpack_from("<I", body, fpos + 4)
                if fid == b"00dc":
                    # '00dc' marks a compressed stream; this walker only
                    # handles raw DIB ('00db') — route to a codec, don't
                    # guess from the size.
                    raise ValueError("unsupported frame encoding (need raw DIB)")
                if fid == b"00db":
                    if fsz != width * height * 3:
                        raise ValueError("unsupported frame encoding (need raw DIB)")
                    data = body[fpos + 8 : fpos + 8 + fsz]
                    row = width * 3
                    rows = [data[r * row : (r + 1) * row] for r in range(height)]
                    frames.append(b"".join(reversed(rows)))
                fpos += 8 + fsz + (fsz & 1)
        pos += 8 + sz + (sz & 1)
    if width is None or total is None:
        raise ValueError("missing avih header")
    if total != len(frames):
        raise ValueError("avih frame count disagrees with movi chunks")
    return {"n_frames": len(frames), "width": width, "height": height,
            "frames": frames}


#: Output schema of the video frame extractor.
VIDEO_SCHEMA = (
    "doc_id long, n_frames long, width int, height int,"
    " frame0_first_byte int, n_sampled long, sampled_sum_mod int"
)


def video_frame_features(payloads: DataFrame) -> DataFrame:
    """End-to-end video decode + frame sampling via mapInPandas: each
    payload is containerized as an uncompressed-DIB AVI (encode_avi),
    REALLY parsed back (decode_video_frames — RIFF chunk walk + DIB row
    restore), round-trip-asserted against the original bytes, then
    every 2nd frame is kept (the video-frame-sampling shape over real
    container frames, superseding the byte-slicing stand-in of
    frame_sample). frame0_first_byte pins the row-unflip: a decoder
    that forgets the bottom-up restore reports the last row's byte.
    Map-side only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                vid = decode_video_frames(encode_avi(raw))
                joined = b"".join(vid["frames"])
                if joined[: len(raw)] != raw or any(joined[len(raw) :]):
                    raise ValueError(f"AVI round-trip mismatch for doc {doc_id}")
                sampled = vid["frames"][::2]
                rows.append(
                    (
                        doc_id,
                        vid["n_frames"],
                        vid["width"],
                        vid["height"],
                        vid["frames"][0][0] if raw else 0,
                        len(sampled),
                        sum(sum(f) for f in sampled) % 997,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "width", "height",
                    "frame0_first_byte", "n_sampled", "sampled_sum_mod",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_SCHEMA
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


#: Output schema of the image average-hash extractor.
AHASH_SCHEMA = "doc_id long, ahash_hi long, ahash_lo long"


def image_ahash(payloads: DataFrame) -> DataFrame:
    """Perceptual average-hash over binary image payloads via
    mapInPandas: REAL BMP decode (decode_image), the same 8×8
    nearest-neighbor sample as resize_image_features, per-pixel gray =
    r+g+b, then one bit per pixel — set iff gray·64 > Σgray (the
    mean-threshold test kept in integers: no division, no float, so
    the hash is bit-identical on every engine). The 64 bits pack into
    two bigints (lo = pixels 0–31, hi = 32–63). Two images with the
    same hash are near-identical at thumbnail scale — the standard
    cheap image near-dup key (pHash family, mean variant). Map-side
    only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(encode_bmp(bytes(payload)))
                pix, h, w = img["pixels"], img["height"], img["width"]
                stride = w * 3
                grays = []
                for r in range(RESIZE_H):
                    src_r = r * h // RESIZE_H
                    for c in range(RESIZE_W):
                        src_c = c * w // RESIZE_W
                        base = src_r * stride + src_c * 3
                        grays.append(
                            pix[base] + pix[base + 1] + pix[base + 2]
                        )
                tot = sum(grays)
                lo = sum(
                    1 << p for p in range(32) if grays[p] * 64 > tot
                )
                hi = sum(
                    1 << (p - 32)
                    for p in range(32, 64)
                    if grays[p] * 64 > tot
                )
                rows.append((doc_id, hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "ahash_hi", "ahash_lo"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=AHASH_SCHEMA
    )


#: Output schema of the audio fingerprint extractor.
AUDIO_FP_SCHEMA = "doc_id long, afp_hi long, afp_lo long"

#: Number of energy frames in the audio fingerprint (= hash bits).
AUDIO_FP_FRAMES = 64


def audio_fingerprint(payloads: DataFrame) -> DataFrame:
    """Acoustic fingerprint over binary audio payloads via mapInPandas:
    REAL WAV decode (decode_audio_frames), the signal cut into
    AUDIO_FP_FRAMES equal time frames, one bit per frame — set iff the
    frame's energy is above the clip's mean, tested in cross-multiplied
    integers (frame_sum·n > total·frame_len: no division, no float).
    The same mean-threshold construction as image_ahash, on the time
    axis — the cheap Shazam-family dedup key for audio. Bits pack into
    two bigints (lo = frames 0–31, hi = 32–63). Map-side only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = decode_audio_frames(encode_wav(bytes(payload)))
                samples, n = wav["samples"], wav["n_samples"]
                tot = sum(samples)
                bits = []
                for f in range(AUDIO_FP_FRAMES):
                    start = f * n // AUDIO_FP_FRAMES
                    end = (f + 1) * n // AUDIO_FP_FRAMES
                    fs = sum(samples[start:end])
                    bits.append(fs * n > tot * (end - start))
                lo = sum(1 << p for p in range(32) if bits[p])
                hi = sum(1 << (p - 32) for p in range(32, 64) if bits[p])
                rows.append((doc_id, hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "afp_hi", "afp_lo"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_FP_SCHEMA
    )
