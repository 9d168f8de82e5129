"""Custom stateful streaming operator (SURVEY.md §2.9's Spark mapping:
``applyInPandasWithState`` for operators the built-in windows can't
express).

Operator: per-user running activity counter with inactivity expiry —
for each user, maintain (n_events, total_value) across micro-batches
and emit an updated row per batch in which the user appears; state for
idle users can be dropped via processing-time timeout. This is the
canonical shape for enrichment/accumulator state at 100 TB ingest:
state is partitioned by key in the state store, updates are
Arrow-batched per key group, and expiry bounds the store.

Timeout note: with ``ProcessingTimeTimeout`` the engine schedules
extra micro-batches to evaluate expiry, so ``processAllAvailable`` on
a finite file source never quiesces. Production (continuous Kafka
ingest) wants the timeout; the bounded local harness runs with
``NoTimeout`` — hence the ``idle_timeout_ms`` knob.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
# State carries integer CENTS — the schema must say long: a Python int
# stored into a double-typed state field is silently nulled by the JVM
# round-trip, and the SECOND micro-batch then crashes on None + int
# (the single-file local source delivers everything in one batch, so
# only a multi-batch run — production, or the multi-file test — ever
# reads state back; pinned by test_stateful_survives_multiple_batches).
STATE_SCHEMA = "n_events long, total_cents long"

#: 1 h idle expiry for production streams.
DEFAULT_IDLE_TIMEOUT_MS = 60 * 60 * 1000


def _sum_cents(pdf: pd.DataFrame) -> int:
    """Exact integer cents of a 2-decimal money column batch. ONE
    definition — this expression is engine-parity-critical (it must
    agree with the oracle's DECIMAL(18,2) accumulation), so both
    stateful operators share it."""
    return int(pdf["value"].mul(100).round().astype("int64").sum())


def _make_update_user(idle_timeout_ms: int):
    def _update_user(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        # State holds integer cents (value is 2-decimal money): exact
        # and order-independent, so the final per-user totals are
        # micro-batch-invariant — which is what makes this custom
        # stateful operator fully oracle-checkable instead of
        # rows-only. Emitted total_value = cents/100.0 is the
        # correctly-rounded double, identical to DuckDB's
        # CAST(DECIMAL sum AS DOUBLE).
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += _sum_cents(pdf)
        state.update((n, cents))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    return _update_user


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int = 0
) -> DataFrame:
    """events stream → per-user running (n_events, total_value).
    ``idle_timeout_ms > 0`` (e.g. ``DEFAULT_IDLE_TIMEOUT_MS``) enables
    processing-time state expiry for unbounded sources; 0 disables it
    so bounded runs quiesce. Update output mode: one row per user per
    micro-batch touched."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------
# transformWithState (Spark 4 StatefulProcessor API)

def running_user_cents(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_cents) via the Spark 4
    ``transformWithStateInPandas`` StatefulProcessor API — the successor
    to applyInPandasWithState: typed state handles (ValueState here;
    ListState/MapState/timers available), explicit init/close lifecycle,
    and Arrow-batched row groups per key.

    Totals are integer cents (value is 2-decimal money), so state
    updates are exact and order-independent → the finals are
    micro-batch-invariant and fully oracle-checkable, unlike a float
    accumulator."""
    from pyspark.sql.streaming import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (  # noqa: PLC0415
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class RunningCents(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += _sum_cents(pdf)
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCents(),
        outputStructType="user_id long, n_events long, total_cents long",
        outputMode="Update",
        timeMode="None",
    )
