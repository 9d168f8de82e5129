"""Skew-mitigating salted join.

AQE's skew-join splitting (enabled in session.py) handles moderate
skew by subdividing oversized shuffle partitions at runtime. Salting is
the explicit, planner-independent form for pathological keys (one user
producing 1% of a 100 TB event stream): spread each hot key's rows over
``n_salts`` sub-keys on the large side, replicate the small side once
per salt, and join on (key, salt) — the hot key's work lands on
``n_salts`` tasks instead of one. Cost: small side × n_salts, so keep
the small side genuinely small (dimension-sized).

Result equivalence: every large-side row joins exactly the same small-
side rows as an unsalted join (the salt merely routes), proven by the
oracle on join_skew_salted and the equivalence test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT_L = "__salt_l"
_SALT_R = "__salt_r"


#: Join types whose results are invariant under small-side replication
#: (every result row is anchored to a large-side row, which carries
#: exactly one salt). right/full outer would emit unmatched small-side
#: rows once PER REPLICA — wrong — so they are rejected.
_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "semi",
             "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on the ``on`` condition with the
    large side salted across ``n_salts`` sub-keys. The per-row salt is
    monotonically_increasing_id mod n_salts — uniform within any hot
    key and computed without a shuffle. Only large-side-anchored join
    types are allowed (see _SAFE_HOW); for right/full outer, swap the
    inputs or salt the other side."""
    if how.lower() not in _SAFE_HOW:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side would duplicate its unmatched rows in right/full "
            "outer results"
        )
    l_salted = large.withColumn(
        _SALT_L, (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    r_salted = small.withColumn(
        _SALT_R, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        l_salted.join(
            r_salted, on & (F.col(_SALT_L) == F.col(_SALT_R)), how
        )
        .drop(_SALT_L, _SALT_R)
    )


def salted_sum_count(
    df: DataFrame, keys: list[str], value: Column, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) computes
    partial sums/counts, then groupBy(keys) combines them. Correct for
    any decomposable aggregate (sum/count/min/max); pass an exact type
    (decimal/int) for ``value`` so the two-phase regrouping cannot
    drift the way float partial sums would.

    Spark's hash aggregate already does partial+final combining per
    PARTITION; salting additionally splits one hot KEY's final-stage
    work across ``n_salts`` reducers — the explicit form of what AQE
    skew handling cannot do for aggregations (it only splits joins).
    Returns columns: keys + sum_value + n_rows.
    """
    salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("sum_value"), F.sum("__pcnt").alias("n_rows")
    )
