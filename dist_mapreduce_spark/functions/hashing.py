"""Deterministic cross-engine hashes.

The reference buckets map output with FNV-1a-32 masked to 31 bits
(``ihash``, /root/reference/internal/worker/worker.go:167-171) and
routes key → reduce task as ``ihash(key) % nReduce`` (worker.go:84-88).
Spark's own shuffle hash (Murmur3) fills that role in the engine, but to
make partition *routing* auditable by the DuckDB oracle we also provide
FNV-1a as a pure SQL expression — a left fold over character codes —
identical in both dialects, so bucket assignments match bit-for-bit.

All of this stays JVM-side in Spark (higher-order functions compile to
codegen'd expressions — no Python UDF).

Note on SQL dialect differences encoded here:
- Spark XOR is the ``^`` operator; DuckDB's ``^`` is POWER — DuckDB
  spells it ``xor(a, b)``.
- Spark ``aggregate(arr, init, merge)`` has an explicit init; DuckDB
  ``list_reduce`` seeds from the first element, so we list_prepend the
  init value.
"""

from __future__ import annotations

FNV_OFFSET = 2166136261  # FNV-1a 32-bit offset basis (worker.go:168)
FNV_PRIME = 16777619     # FNV-1a 32-bit prime (worker.go:169)
MASK31 = 0x7FFFFFFF      # ihash's sign mask (worker.go:170)
MOD32 = 4294967296


def fnv1a_spark_sql(col: str) -> str:
    """Spark SQL expression: FNV-1a-32 of an ASCII string column, masked
    to 31 bits exactly like ihash (worker.go:167-171).

    The empty string needs an explicit branch: Spark's sequence(1, 0)
    counts DOWN ([1, 0]) rather than producing an empty array, which
    would fold two spurious zero bytes. (The reference never hashes ''
    — FieldsFunc drops empty tokens — but the function is total.)"""
    return (
        f"(CASE WHEN length({col}) = 0 THEN {FNV_OFFSET & MASK31}"
        f" ELSE (aggregate("
        f"  transform(sequence(1, length({col})), i -> ascii(substring({col}, i, 1))),"
        f"  cast({FNV_OFFSET} as bigint),"
        f"  (h, b) -> ((h ^ b) * {FNV_PRIME}) % {MOD32}"
        f") & {MASK31}) END)"
    )


def fnv1a_duckdb_sql(col: str) -> str:
    """DuckDB equivalent of :func:`fnv1a_spark_sql` — same fold, same
    arithmetic, bit-identical output."""
    return (
        f"(list_reduce("
        f"  list_prepend(CAST({FNV_OFFSET} AS BIGINT),"
        f"    list_transform(range(1, length({col}) + 1), i -> ascii(substr({col}, i, 1)))),"
        f"  (h, b) -> (xor(h, b) * {FNV_PRIME}) % {MOD32}"
        f") & {MASK31})"
    )


def fnv1a_bucket_spark_sql(col: str, n_reduce: int) -> str:
    """ihash(key) % nReduce — the reference's shuffle routing
    (worker.go:86)."""
    return f"({fnv1a_spark_sql(col)} % {n_reduce})"


def fnv1a_bucket_duckdb_sql(col: str, n_reduce: int) -> str:
    return f"({fnv1a_duckdb_sql(col)} % {n_reduce})"


def md5_prefix_long_spark_sql(col: str, nibbles: int = 12) -> str:
    """First ``nibbles`` hex digits of md5 as a non-negative bigint —
    a cheap cross-engine content hash for dedup/minhash oracles
    (md5 is identical everywhere; 12 nibbles = 48 bits fits bigint)."""
    return f"cast(conv(substring(md5({col}), 1, {nibbles}), 16, 10) as bigint)"


def md5_prefix_long_duckdb_sql(col: str, nibbles: int = 12) -> str:
    return f"CAST(('0x' || substr(md5({col}), 1, {nibbles})) AS BIGINT)"
