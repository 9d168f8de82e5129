"""Driver contract for the spark-graft builder (PySpark target).

Backed by the dist_mapreduce_spark package: the registry in
dist_mapreduce_spark.plans holds one named query per operator id from
SURVEY.md §2, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dist_mapreduce_spark.plans import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's word
    count (case-sensitive, [^a-zA-Z]+ tokenizer) over the documents
    corpus — SURVEY.md §7 step 1."""
    return _registry.QUERIES["tokenize"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for the
    non-SQL-expressible ops → driver does a rows-only check)."""
    return dict(_registry.ORACLES)
