"""dist_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query surface of the reference
``sagarneeli/dist-mapreduce`` MapReduce framework (master-worker word
count + legacy Hadoop variants) as idiomatic Spark DataFrame / SQL
plans, extended with the relational capabilities the MapReduce paradigm
implies (joins, windows, set ops) and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.

Design principles (SURVEY.md §1.5, §4):
- DataFrame-first: declare logical plans, let Catalyst/Tungsten/AQE
  choose physical strategy. No hand-rolled shuffle, scheduling, or
  partitioning machinery — Spark's built-ins replace the reference's
  coordinator/worker/shuffle-file plumbing wholesale.
- JVM-side expressions (pyspark.sql.functions) in every hot path;
  Arrow-batched pandas UDFs only where built-ins genuinely cannot
  express the semantics (the generic map_reduce compatibility wrapper,
  multimodal decode stubs).
- Every operator ships with a DuckDB-checkable oracle where the
  semantics are ANSI-SQL-expressible.
"""

__version__ = "0.1.0"

from dist_mapreduce_spark.session import get_spark  # noqa: F401
