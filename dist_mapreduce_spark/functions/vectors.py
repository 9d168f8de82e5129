"""Vector math over ``array<float>`` embedding columns — JVM-side.

Cosine similarity as Spark higher-order functions (zip_with + aggregate
→ codegen'd, no Python), with a DuckDB twin that performs the *same
left-fold in the same order* so double-precision results are
bit-identical between engine and oracle (both fold sequentially over
positions 1..d with a double accumulator).

The reference has no vector operations; this backs the north-star
similarity-search operators (SURVEY.md §2.12) over the driver's
``embeddings`` table (vec_id bigint, embedding array<float>, label int).
"""

from __future__ import annotations


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm2_spark(a: str) -> str:
    return _dot_spark(a, a)


def cosine_spark_sql(a: str, b: str) -> str:
    """Spark SQL expression for cosine(a, b) with double accumulation."""
    return f"({_dot_spark(a, b)} / (sqrt({_norm2_spark(a)}) * sqrt({_norm2_spark(b)})))"


def _dot_duckdb(a: str, b: str) -> str:
    # Same sequential left fold as Spark's aggregate(): prepend the 0.0
    # init (list_reduce seeds from element 1) then fold in index order.
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f"   i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (acc, v) -> acc + v)"
    )


def cosine_duckdb_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_spark_sql` — identical fold order."""
    return f"({_dot_duckdb(a, b)} / (sqrt({_dot_duckdb(a, a)}) * sqrt({_dot_duckdb(b, b)})))"


def l2sq_spark_sql(a: str, b: str) -> str:
    """Spark SQL squared-L2 distance with the same sequential double
    fold as :func:`cosine_spark_sql` (bit-identical to the DuckDB twin)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> (cast(x as double) - cast(y as double))"
        f"  * (cast(x as double) - cast(y as double))),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def l2sq_duckdb_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`l2sq_spark_sql` — identical fold order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f"   i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f"    * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
        f" (acc, v) -> acc + v)"
    )


def dot_duckdb_sql(a: str, b: str) -> str:
    """Public alias for the sequential-fold dot product (DuckDB)."""
    return _dot_duckdb(a, b)
