"""Query registry — the single source of truth for the engine's public
query surface.

Each registered query is a named logical plan: a callable
``(spark, sf_dir) -> DataFrame`` plus (when the semantics are
ANSI-SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. ``__spark_entry__.py`` exposes exactly this registry to the
driver; one entry per operator id from SURVEY.md §2.

The registry replaces the reference's job-submission surface: where the
reference accepts {files, nReduce} over REST and runs its single
compiled-in query (/root/reference/internal/api/server.go:33-73), here
every query is a first-class named plan and Spark's scheduler does the
rest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB ANSI SQL
    (omit for non-SQL-expressible ops → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so their @query decorators run."""
    import dist_mapreduce_spark.plans.reference_core  # noqa: F401
    import dist_mapreduce_spark.plans.relational  # noqa: F401
    import dist_mapreduce_spark.plans.advanced_joins  # noqa: F401
    import dist_mapreduce_spark.plans.scalar_functions  # noqa: F401
    import dist_mapreduce_spark.plans.events_windows  # noqa: F401
    import dist_mapreduce_spark.plans.llm_pipeline  # noqa: F401
    import dist_mapreduce_spark.plans.similarity  # noqa: F401
    import dist_mapreduce_spark.plans.ann_index  # noqa: F401
    import dist_mapreduce_spark.plans.formats  # noqa: F401
    import dist_mapreduce_spark.plans.bucketed  # noqa: F401
    import dist_mapreduce_spark.plans.iterative  # noqa: F401
    import dist_mapreduce_spark.plans.text_index  # noqa: F401
    import dist_mapreduce_spark.plans.tpch  # noqa: F401
    import dist_mapreduce_spark.plans.tpch_extended  # noqa: F401
    import dist_mapreduce_spark.plans.tpch_partsupp  # noqa: F401
    import dist_mapreduce_spark.plans.knn_graph  # noqa: F401
    import dist_mapreduce_spark.plans.trained_quantizer  # noqa: F401
    import dist_mapreduce_spark.plans.rag  # noqa: F401
    import dist_mapreduce_spark.plans.sketches  # noqa: F401
    import dist_mapreduce_spark.plans.codebook_select  # noqa: F401
