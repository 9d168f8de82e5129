"""Generic MapReduce compatibility wrapper.

The reference's UDF surface is a pair of compiled-in Go functions:
``mapF(filename, contents) -> []KeyValue`` (doMap parameter,
/root/reference/internal/worker/worker.go:75, concrete MapFunc
worker.go:24-38) and ``reduceF(key, []values) -> value`` (doReduce
parameter worker.go:105, concrete ReduceFunc worker.go:41-44).

Here the same shapes become real user-level Python callables executed
through Arrow-batched pandas exchanges:

- map step → ``mapInPandas`` (the true UDTF shape: one input record →
  N output records), batched, never whole-partition in memory;
- shuffle → Spark's sort-based shuffle (replaces the reference's JSON
  bucket files mr-{job}-{map}-{bucket}, worker.go:84-101);
- reduce step → ``applyInPandas`` grouped-map (key + all its rows →
  output), replacing doReduce's in-memory map[key][]string
  (worker.go:107-126) with a spillable grouped exchange.

This wrapper is the designated slow path (Python in the loop); the
DataFrame-native plans in plans/reference_core.py are the fast path.
It exists for API parity: any legacy (mapF, reduceF) pair ports
directly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

MapFn = Callable[..., Iterable[tuple[str, Any]]]
ReduceFn = Callable[[str, list], Any]


def map_reduce(
    df: DataFrame,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    value_type: str = "long",
    n_reduce: int | None = None,
) -> DataFrame:
    """Run a classic (map_fn, reduce_fn) job over any DataFrame.

    ``map_fn(*row) -> iterable[(key, value)]`` is called once per input
    row (the reference calls it once per whole file — same shape, finer
    granularity). ``reduce_fn(key, values) -> value`` sees every value
    for one key, exactly like doReduce after its grouping loop.

    ``n_reduce`` mirrors the REST API's nReduce knob (server.go:35):
    when set, the grouped stage runs with that many partitions;
    when None, AQE picks (strictly better — SURVEY.md §4.3).
    """
    in_cols = df.columns

    def run_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, Any]] = []
            for row in pdf[in_cols].itertuples(index=False):
                out.extend(map_fn(*row))
            if out:
                yield pd.DataFrame(out, columns=["key", "value"])

    kv = df.mapInPandas(run_map, schema=f"key string, value {value_type}")
    if n_reduce:
        kv = kv.repartition(n_reduce, "key")

    def run_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        return pd.DataFrame(
            [(key, reduce_fn(key, list(pdf["value"])))], columns=["key", "value"]
        )

    return kv.groupBy("key").applyInPandas(
        run_reduce, schema=f"key string, value {value_type}"
    )
