"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2.12 north-star surface): per-document statistics, language
identification, quality scoring, token counting, fingerprinting.

All pure pyspark.sql.functions — whole-stage codegen, no Python in the
data path. Each has an exact DuckDB twin in plans/llm_pipeline.py; the
design rule for parity is: integer counts + single-expression double
arithmetic (same IEEE ops in the same order on both engines).

At 100 TB these are embarrassingly parallel map-side operators: no
shuffle at all (per-row outputs), so they pipeline directly over the
parquet scan and stay bounded by read throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/stopword heuristic
#: language-ID. Deliberately tiny: the operator's value is its plan
#: shape (set-membership counting over tokens), not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "de", "et", "est", "un"),
}

#: Explicit whitespace character set shared by EVERY parity-critical
#: regex in the repo, in both engines. Java's \s (Spark) includes
#: vertical tab \x0B but RE2's \s (DuckDB, pyarrow) does not, so a
#: bare \s silently diverges on that byte; spelling the class out makes
#: the pattern text mean the same thing under both engines. Raw string:
#: the escapes are interpreted by the regex engines, not Python.
WS_CHARS = r" \t\n\x0B\f\r"

#: BPE-ish pre-tokenization: letter runs | digit runs | single
#: non-alphanumeric-non-space symbols (the GPT-2 pre-tokenizer family
#: shape, without byte-level merges).
BPE_ISH_RE = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CHARS}]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    return F.filter(F.split(text, rf"[{WS_CHARS}]+"), lambda w: w != "")


def n_tokens(text: Column) -> Column:
    return F.size(ws_tokens(text))


def n_alpha_chars(text: Column) -> Column:
    """Characters that are letters."""
    return F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))


def n_punct_chars(text: Column) -> Column:
    """Characters that are neither alphanumeric nor whitespace."""
    return F.length(F.regexp_replace(text, rf"[a-zA-Z0-9{WS_CHARS}]", ""))


def punct_ratio(text: Column) -> Column:
    # try_divide: NULL for zero-length docs (ANSI mode would otherwise
    # abort the whole job on one empty document) — the same NULL DuckDB
    # produces for x/0, so degenerate docs stay engine-identical.
    return F.try_divide(
        n_punct_chars(text).cast("double"), F.length(text).cast("double")
    )


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many whitespace tokens are in the marker set (with
    multiplicity) — a set-membership count over the token array,
    evaluated as a codegen'd higher-order filter."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(ws_tokens(F.lower(text)), lambda w: F.array_contains(arr, w)))


def stopword_ratio(text: Column, markers: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    return F.try_divide(
        marker_hits(text, markers).cast("double"), n_tokens(text).cast("double")
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, ms) for lang, ms in LANG_MARKERS.items()}


def lang_pred(text: Column) -> Column:
    """argmax over marker-hit scores with a fixed priority order for
    ties (en > de > es > fr > und). Expressed as a CASE chain so the
    DuckDB oracle is the literally-identical expression."""
    s = lang_scores(text)
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length saturation + low punctuation +
    stopword presence. Single expression tree of IEEE double ops —
    bit-identical across engines."""
    length_term = F.least(F.lit(1.0), n_tokens(text).cast("double") / F.lit(100.0))
    punct_term = F.lit(1.0) - punct_ratio(text)
    stop_term = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(5.0))
    return length_term * F.lit(0.4) + punct_term * F.lit(0.3) + stop_term * F.lit(0.3)


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def normalized_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-collapsed lowercase text.
    md5 so the fingerprint is identical in any engine/language — the
    cross-system document identity key for dedup joins."""
    norm = F.regexp_replace(F.lower(F.trim(text)), rf"[{WS_CHARS}]+", " ")
    return F.md5(norm)


def simhash32(text: Column) -> Column:
    """32-bit SimHash over whitespace tokens (with multiplicity).

    Per token: a 48-bit md5-prefix integer; per bit j: weight +1 if set
    else -1, summed over tokens; simhash bit j = 1 iff the sum > 0.
    Near-duplicate docs differ in few bits (compare with
    bit_count(simhash_a ^ simhash_b)).

    Entirely higher-order functions — the per-token × per-bit expansion
    (32 × n_tokens terms) stays JVM-side; no shuffle, no Python.
    """
    hashes = F.transform(
        ws_tokens(text),
        lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("bigint"),
    )
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(32)])
    zeros = F.array(*[F.lit(0).cast("bigint") for _ in range(32)])
    # One fold over tokens; the accumulator is the 32-vector of bit-
    # weight sums (nested lambda captures the token hash h).
    sums = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)
        ),
    )
    # Pack sign bits: sum of masks where the weight sum is positive.
    return F.aggregate(
        F.zip_with(sums, masks, lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
