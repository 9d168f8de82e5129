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


def norm2_spark_sql(a: str) -> str:
    """Squared L2 norm of one vector — the same left fold
    cosine_spark_sql runs on each side. Public so high-volume scoring
    plans can evaluate it ONCE per row instead of once per pair
    (round 15, guide §1.2: at Q queries × N corpus rows the inline form
    folds each corpus norm Q times and each query norm N times; the
    precomputed-column form folds each exactly once, and the pair stage
    keeps only the dot product)."""
    return _norm2_spark(a)


def cosine_prenormed_spark_sql(a: str, b: str, a_norm2: str, b_norm2: str) -> str:
    """cosine(a, b) with the squared norms read from precomputed
    columns. IEEE-identical to cosine_spark_sql: the norm columns hold
    the value of the SAME fold over the SAME vector, so
    try_divide(dot, sqrt(n_a) * sqrt(n_b)) performs the identical
    operation sequence on identical doubles — only the evaluation
    count changes. Keep the column expressions = norm2_spark_sql(side)
    or the parity claim is void."""
    return (
        f"try_divide({_dot_spark(a, b)},"
        f" (sqrt({a_norm2}) * sqrt({b_norm2})))"
    )


def cosine_spark_sql(a: str, b: str) -> str:
    """Spark SQL expression for cosine(a, b) with double accumulation.

    try_divide, not `/` (round-10): a zero-norm vector (an empty
    document's embedding — real corpora contain them) makes the
    divisor 0.0, which under Spark 4's default ANSI mode ABORTS the
    whole query, while the DuckDB twin's `/` yields NULL. try_divide
    returns NULL on a zero divisor — bit-identical to `/` on every
    nonzero divisor — so both engines score a zero-norm pair as NULL,
    which sorts last under every DESC ranking window (NULLS LAST in
    both dialects) instead of crashing one engine and not the other."""
    return (
        f"try_divide({_dot_spark(a, b)},"
        f" (sqrt({_norm2_spark(a)}) * sqrt({_norm2_spark(b)})))"
    )


#: Embedding dimensionality of the driver's embeddings table — the
#: DuckDB twins unroll their folds to this many explicit terms.
DIM = 64


def _dot_duckdb_dynamic(a: str, b: str) -> str:
    # Arbitrary-dim fallback: the same sequential left fold (seed 0.0,
    # add terms in index order) via DuckDB list lambdas. Verified
    # bit-identical to the unrolled chain on random 64-dim vectors;
    # ~60x slower per row, so it only serves rows the unrolled fast
    # path cannot represent (len != the expected dim).
    #
    # Degenerate inputs mirror Spark's zip_with semantics exactly:
    # zip_with(NULL, b) is NULL, and ragged lengths NULL-pad so the
    # aggregate over x*y terms is NULL — whereas a naked
    # list_prepend(0.0, NULL) fold would yield 0.0 and range over
    # len(a) would compute a partial dot. The CASE guard is lazy in
    # DuckDB, so conforming rows pay nothing for it.
    fold = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (acc, v) -> acc + v)"
    )
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL OR len({a}) <> len({b})"
        f" THEN NULL ELSE {fold} END)"
    )


def _dot_duckdb(a: str, b: str, dim: int = DIM) -> str:
    # Same sequential left fold as Spark's aggregate(): seed 0.0, then
    # add term 1..dim in index order. UNROLLED to explicit terms — the
    # left-associative `0.0 + t1 + t2 + ...` chain is the identical
    # IEEE operation sequence as the old list_reduce(list_prepend(0.0,
    # list_transform(...))) form (verified 0 mismatches corpus-wide),
    # but ~60x faster: DuckDB's interpreted per-row lambda machinery
    # cost ~0.4 ms per 64-element fold, which made every
    # embedding-heavy oracle (sim_recall: 37 s at sf0.1) list-bound.
    # Guarded by a lazy CASE on the actual list lengths so a ragged or
    # differently-sized vector falls back to the dynamic fold instead
    # of silently NULLing (dim < 64) or truncating (dim > 64) — the
    # Spark twin always folds over the real array length.
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return (
        f"(CASE WHEN len({a}) = {dim} AND len({b}) = {dim}"
        f" THEN (CAST(0.0 AS DOUBLE) + {terms})"
        f" ELSE {_dot_duckdb_dynamic(a, b)} END)"
    )


def cosine_duckdb_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB twin of :func:`cosine_spark_sql` — identical fold order.

    NULLIF on the divisor (round-11): the Spark side's try_divide
    returns NULL on a 0.0 divisor, and DuckDB `/` matched that only
    under duckdb < 1.1 (1.1+ defaults to IEEE float division, where
    0.0/0.0 is NaN — which is NOT NULL and ranks FIRST under DESC,
    silently admitting zero-norm vectors into every top-k). NULLIF
    makes the zero-divisor → NULL contract explicit in the SQL itself,
    independent of the DuckDB version or its ieee_floating_point_ops
    setting; on every nonzero divisor NULLIF is the identity, so all
    existing oracle hashes are unchanged."""
    return (
        f"({_dot_duckdb(a, b, dim)} / NULLIF(sqrt({_dot_duckdb(a, a, dim)})"
        f" * sqrt({_dot_duckdb(b, b, dim)}), 0.0))"
    )


def l2sq_spark_sql(a: str, b: str) -> str:
    """Spark SQL squared-L2 distance with the same sequential double
    fold as :func:`cosine_spark_sql` (bit-identical to the DuckDB twin)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> (cast(x as double) - cast(y as double))"
        f"  * (cast(x as double) - cast(y as double))),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def l2sq_duckdb_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB twin of :func:`l2sq_spark_sql` — identical fold order
    (unrolled + len guard, see _dot_duckdb)."""
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1)
    )
    fold = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
        f" (acc, v) -> acc + v)"
    )
    # NULL / ragged inputs -> NULL, matching Spark's zip_with padding
    # (see _dot_duckdb_dynamic).
    dynamic = (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL OR len({a}) <> len({b})"
        f" THEN NULL ELSE {fold} END)"
    )
    return (
        f"(CASE WHEN len({a}) = {dim} AND len({b}) = {dim}"
        f" THEN (CAST(0.0 AS DOUBLE) + {terms})"
        f" ELSE {dynamic} END)"
    )


def dot_duckdb_sql(a: str, b: str, dim: int = DIM) -> str:
    """Public alias for the sequential-fold dot product (DuckDB)."""
    return _dot_duckdb(a, b, dim)


def sub_spark_sql(a: str, b: str) -> str:
    """Spark SQL element-wise vector subtraction (a − b) with double
    widening — the residual computation of residual-encoded IVF-PQ.
    zip_with NULL-pads ragged inputs and propagates NULL lists, so the
    downstream folds (which cast each element, a no-op on the already-
    double residual) inherit the same degenerate-input semantics as
    every other twin in this module."""
    return f"zip_with({a}, {b}, (x, y) -> cast(x as double) - cast(y as double))"


def sub_duckdb_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB twin of :func:`sub_spark_sql`: each element is the same
    single IEEE double subtraction, unrolled to ``dim`` list entries on
    the fast path with a lazy dynamic fallback mirroring zip_with
    (NULL list → NULL; ragged lengths → NULL, since a partial residual
    would silently score wrong)."""
    fast = "list_value(" + ", ".join(
        f"CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    ) + ")"
    dynamic = (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL OR len({a}) <> len({b})"
        f" THEN NULL ELSE list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) END)"
    )
    return (
        f"(CASE WHEN len({a}) = {dim} AND len({b}) = {dim}"
        f" THEN {fast} ELSE {dynamic} END)"
    )
