"""As-of join — an operator Spark lacks natively (SURVEY.md §2.3 notes
the paradigm implies joins the reference never exercises; as-of is the
canonical time-series one).

Implementation: the union-and-carry-forward pattern, which is the
shuffle-minimal distributed formulation — ONE shuffle on the join key,
then a single sorted window pass per key:

    left (probe) rows and right (reference) rows are unioned with a
    type tag; within each key, sorted by (ts, tag) so reference rows at
    equal timestamps precede probes; last(value, ignorenulls) carries
    the most recent reference value forward onto every probe row.

Compare: a naive approach joins on key then filters ts ranges —
quadratic per key; pd.merge_asof per group (applyInPandas) works but
moves data through Python. This stays entirely in JVM window exec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value columns of the latest right
    row with right.ts <= left.ts and matching key. Ties at equal ts
    resolve to the right row (inclusive as-of), and among simultaneous
    right rows to the greatest value_cols[0] ordering.
    """
    r = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_ref"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_ref"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.desc("__is_ref"), *[F.asc(c) for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__key",
        "__ts",
        "__is_ref",
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    return carried.filter(F.col("__is_ref") == 0).select(
        F.col("__key").alias(key),
        F.col("__ts").alias(left_ts),
        *left_cols,
        *[f"asof_{c}" for c in value_cols],
    )
