"""Sources: parquet star-schema tables + text scans.

The reference's only source is whole-file text (one map task per file,
/root/reference/internal/coordinator/coordinator.go:60-68; read via
os.ReadFile, worker.go:77) plus the legacy line-at-a-time Hadoop input
(FileInputFormat, legacy/.../hw01/WordCount.java:82-84). Spark subsumes
both with FileSourceScanExec: splits + locality + column pruning +
predicate pushdown are automatic.

At 100 TB the scan path is the dominant cost; everything here keeps the
scan declarative so Catalyst can prune columns and push filters into the
parquet reader (check with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-provided star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize the events `ts` column to TIMESTAMP (µs, UTC) for every
    physical encoding the driver's generator has produced so far:

    - TIMESTAMP(NANOS)  → read as raw long under nanosAsLong; truncate
      to micros with integer DIV (double division loses ulps on
      19-digit nanos and shifts some timestamps by 1 µs).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ;
      cast to TIMESTAMP with the session tz pinned to UTC so the cast
      is an identity on the wall clock and matches DuckDB's naive
      reading of the same micros.
    - TIMESTAMP(MICROS, isAdjustedToUTC=true) → already TIMESTAMP;
      leave untouched.

    Side effect, deliberate and global: pins the SESSION timezone to
    UTC on every branch (not just NTZ). Rendering functions downstream
    (date_format / strftime twins) format instants in the session tz,
    so a foreign session carrying a non-UTC tz would diverge from the
    DuckDB oracle even on encodings whose *values* need no tz to
    decode. The conf is runtime-settable and the driver harness
    constructs its own session, so it must happen at load time.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dt == "timestamp_ntz":
        # The NTZ→TZ cast interprets the wall clock in the session tz
        # (pinned to UTC above), so the cast is an identity on the wall
        # clock and matches DuckDB's naive reading of the same micros.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one star-schema table.

    Parquet (not the reference's schema-less text / JSON-lines shuffle
    files, worker.go:90-101) so scans are vectorized, column-pruned and
    predicate-pushed — the properties that matter at 100 TB.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Tolerate a TIMESTAMP(NANOS) events file, which Spark's
        # vectorized reader otherwise rejects. Must work in ANY
        # session — including ones this repo didn't build (an external
        # harness constructs its own SparkSession) — so set the
        # runtime-settable SQL conf here, not only in session.py.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(spark, df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL dialect."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text_files(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Whole-file-identity text scan → (doc_id: string, text: string).

    Mirrors the reference's unit of work — one shard per input file
    (coordinator.go:60-68) — but lets Spark split large files into
    multiple partitions. Per-file identity is recovered declaratively
    with input_file_name(); rows of one file keep their file tag, so
    "one map task per whole file" semantics are preserved logically
    while execution parallelism is per-split (strictly better at scale:
    a 1 GB file becomes 8 tasks, not 1).
    """
    lines = spark.read.text(paths).withColumn("doc_id", F.input_file_name())
    # Reference semantics: the map function sees whole-file contents
    # (worker.go:77-81). Re-concatenate lines per file; tokenization
    # downstream splits on non-alpha, so the join separator "\n" is
    # itself a separator and the token stream is identical.
    return lines.groupBy("doc_id").agg(
        F.concat_ws("\n", F.collect_list("value")).alias("text")
    )


def read_text_lines(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Line-at-a-time text scan → (line: string), the legacy Hadoop record
    shape (Mapper<Object, Text, ...> over FileInputFormat,
    legacy/.../hw01/WordCount.java:36-50, 82-84). This is Spark's native
    text behavior: one row per line, splittable, streamed — never
    whole-file in memory.
    """
    return spark.read.text(paths).withColumnRenamed("value", "line")
