"""Event-time windowed aggregations over the ``events`` table
(SURVEY.md §2.9): tumbling, sliding, and session windows in batch mode
(DuckDB-checkable) plus the same tumbling plan under Structured
Streaming (rows-only check — the driver contract's escape hatch for
non-SQL-expressible ops).

Window timestamps are emitted as formatted strings so the comparison is
timezone-unambiguous (session TZ is pinned to UTC either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

#: Exact money-style aggregation of the 2-decimal `value` column.
_VAL_SUM_DUCK = "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _val_sum() -> F.Column:
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


#: OHLC bar width in microseconds (5 minutes).
_BAR_US = 300_000_000
#: Deterministic intra-bucket ordering scalar: micros-from-bucket-start
#: (< 3·10^8) folded with event_id — unique per event, fits int64
#: (3·10^8 · 10^10 ≈ 2^61.4), so arg_min/arg_max have no tie to break
#: nondeterministically on either engine.
_BAR_KEY_MULT = 10_000_000_000


@query(
    "ts_ohlc_bars",
    oracle=(
        f"WITH b AS (SELECT event_type, value,"
        f"  (epoch_us(ts) // {_BAR_US}) * {_BAR_US} AS bus,"
        f"  (epoch_us(ts) - (epoch_us(ts) // {_BAR_US}) * {_BAR_US})"
        f"   * {_BAR_KEY_MULT} + event_id AS k"
        f" FROM events)"
        f" SELECT strftime(make_timestamp(bus), '{_TS_FMT_DUCK}') AS bar,"
        f"  event_type, count(*) AS n_events,"
        f"  arg_min(value, k) AS open, max(value) AS high,"
        f"  min(value) AS low, arg_max(value, k) AS close,"
        f"  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume"
        f" FROM b GROUP BY bus, event_type"
    ),
)
def q_ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling — the canonical timeseries downsample
    (financial bars, metrics rollups): 5-minute epoch-aligned buckets
    per event type with open/high/low/close/volume. Open and close are
    arg_min/arg_max over a deterministic intra-bucket ordering scalar
    (micros offset folded with event_id — unique, so no
    nondeterministic ties in any distributed merge order), volume is
    exact-decimal then double. One hash aggregate over the derived
    bucket — single shuffle, partial agg map-side; at 100 TB this is
    the shape that turns raw event streams into queryable bars."""
    e = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    bus = (us - (us % _BAR_US)).alias("bus")  # epoch-aligned bucket start
    key = (us % _BAR_US) * F.lit(_BAR_KEY_MULT) + F.col("event_id")
    b = e.select(
        "event_type", "value", bus, key.alias("k")
    )
    return (
        b.groupBy("bus", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # Conditional key: Spark min_by/max_by return the value at
            # the extreme key even when that value is NULL, while
            # DuckDB arg_min/arg_max skip NULL-value rows. NULLing the
            # key for NULL values makes Spark skip them too (aggregates
            # ignore NULL keys) — engine parity if value is ever NULL.
            F.min_by("value", F.when(F.col("value").isNotNull(), F.col("k")))
            .alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.when(F.col("value").isNotNull(), F.col("k")))
            .alias("close"),
            _val_sum().alias("volume"),
        )
        .select(
            F.date_format(F.timestamp_micros(F.col("bus")), _TS_FMT_SPARK).alias(
                "bar"
            ),
            "event_type",
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


@query(
    "agg_window_tumbling",
    oracle=(
        f"SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')"
        f"  AS window_start, event_type, count(*) AS n_events,"
        f" {_VAL_SUM_DUCK} AS total_value"
        f" FROM events GROUP BY 1, 2"
    ),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type. Spark's window() and
    DuckDB's time_bucket both align to the epoch, so bucket boundaries
    agree. Executes as a plain hash aggregate on the derived window
    column — one shuffle, partial agg map-side."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), _val_sum().alias("total_value"))
        .select(
            F.date_format("window.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "agg_window_sliding",
    oracle=(
        f"SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start, event_type,"
        f" count(*) AS n_events, {_VAL_SUM_DUCK} AS total_value FROM ("
        f"  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value"
        f"   FROM events"
        f"  UNION ALL"
        f"  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',"
        f"   event_type, value FROM events"
        f" ) GROUP BY 1, 2"
    ),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in two
    windows. The oracle expresses the same assignment as a UNION ALL of
    the two candidate buckets — the standard SQL unrolling of a slide
    (each 30-min bucket b contributes to windows starting at b and
    b-30min)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), _val_sum().alias("total_value"))
        .select(
            F.date_format("window.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "agg_window_session",
    oracle=(
        f"SELECT user_id,"
        f" strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,"
        f" strftime(max(ts) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS session_end,"
        f" count(*) AS n_events, {_VAL_SUM_DUCK} AS total_value"
        f" FROM ("
        f"  SELECT *, sum(is_new) OVER"
        f"   (PARTITION BY user_id ORDER BY ts, event_id"
        f"    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id"
        f"  FROM ("
        f"   SELECT user_id, event_id, ts, value,"
        f"    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER"
        f"     (PARTITION BY user_id ORDER BY ts, event_id) >= {_SESSION_GAP_US}"
        f"     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
        f"    THEN 1 ELSE 0 END AS is_new FROM events))"
        f" GROUP BY user_id, session_id"
    ),
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user, via Spark's
    native session_window — merge-on-overlap semantics: an event within
    the gap of the previous event extends the session; session end =
    last event + gap. The oracle derives identical boundaries with the
    gaps-and-islands idiom (lag + running sum of session starts).

    At scale: session_window aggregates shuffle once on user_id, then
    merge sorted runs per key — no state blowup; for streaming use the
    same expression under a watermark (see streaming.windows)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), _val_sum().alias("total_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", _TS_FMT_SPARK).alias("session_start"),
            F.date_format("session_window.end", _TS_FMT_SPARK).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_stateful",
    oracle=(
        "SELECT user_id, count(*) AS n_events,"
        " CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value"
        " FROM events GROUP BY user_id"
    ),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals with idle-state expiry — the operator class
    the reference cannot express at all (streaming.stateful). State
    accumulates integer cents, so the per-user finals are exact and
    micro-batch-invariant — giving this custom operator a FULL DuckDB
    oracle (update-mode emits one row per user per touched micro-batch;
    the last emission per user is the final state)."""
    from dist_mapreduce_spark.streaming.stateful import running_user_totals
    from dist_mapreduce_spark.streaming.windows import (
        last_emission_per_key,
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    out = running_user_totals(events)
    tbl = run_stream_to_table(out, "stream_stateful_out", mode="update")
    # Update mode may emit multiple rows per user across micro-batches;
    # the last (max n_events — monotone) per user is the final state.
    return last_emission_per_key(tbl, "user_id", "n_events").select(
        "user_id", "n_events", "total_value"
    )


@query(
    "stream_session",
    oracle=(
        f"SELECT user_id,"
        f" strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,"
        f" count(*) AS n_events"
        f" FROM ("
        f"  SELECT *, sum(is_new) OVER"
        f"   (PARTITION BY user_id ORDER BY ts, event_id"
        f"    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id"
        f"  FROM ("
        f"   SELECT user_id, event_id, ts,"
        f"    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER"
        f"     (PARTITION BY user_id ORDER BY ts, event_id) >= {_SESSION_GAP_US}"
        f"     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
        f"    THEN 1 ELSE 0 END AS is_new FROM events))"
        f" GROUP BY user_id, session_id"
    ),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under Structured Streaming with a watermark —
    the same session_window expression as the DuckDB-certified batch
    query agg_window_session, executed through the streaming state
    store (merge-on-overlap session state). The final complete-mode
    session set is micro-batch-invariant → same oracle family as the
    batch query (start + count; counts are exact)."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_table(agg, "stream_session_out")
    return out.select(
        "user_id",
        F.date_format("session_window.start", _TS_FMT_SPARK).alias("session_start"),
        "n_events",
    )


@query(
    "stream_tumbling",
    oracle=(
        f"SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')"
        f"  AS window_start, event_type, count(*) AS n_events,"
        f" {_VAL_SUM_DUCK} AS total_value"
        f" FROM events GROUP BY 1, 2"
    ),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregate executed through Structured Streaming
    (readStream → watermark → window agg → memory sink, driven to
    completion). Same logical plan as agg_window_tumbling; the final
    complete-mode result is micro-batch-invariant (counts exact,
    money summed in DECIMAL), so the streaming query takes the same
    DuckDB oracle as the batch one — a full value-hash gate on the
    streaming path."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
        tumbling_counts_stream,
    )

    events = read_events_stream(spark, sf_dir)
    agg = tumbling_counts_stream(events)
    out = run_stream_to_table(agg, "stream_tumbling_out")
    return out.select(
        F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "stream_dedup",
    oracle=(
        "SELECT event_type, count(*) AS n_events FROM"
        " (SELECT DISTINCT event_id, event_type FROM events)"
        " GROUP BY event_type"
    ),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicates on event_id keyed state
    ahead of a windowless aggregate — the ingest-dedup stage of a
    streaming pipeline (at-least-once sources emit duplicates; state
    holds one key per seen id, bounded by the watermark in
    production's dropDuplicatesWithinWatermark). The final complete-
    mode counts are micro-batch-invariant, so this streaming query IS
    oracle-checkable — stronger than the rows-only streaming checks."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    agg = (
        events.select("event_id", "event_type")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return run_stream_to_table(agg, "stream_dedup_out")


from dist_mapreduce_spark.plans.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "stream_ohlc",
    # The batch oracle VERBATIM (ts_ohlc_bars registers earlier in this
    # module): the streaming result is micro-batch-invariant by
    # construction, and sharing the registered string makes the
    # batch/stream-parity contract structural — a future fix to the
    # batch oracle cannot leave the stream twin stale.
    oracle=_ORACLES["ts_ohlc_bars"],
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars computed through Structured Streaming — the live twin
    of `ts_ohlc_bars` (same 5-minute epoch-aligned buckets, same
    deterministic open/close selection), the batch/stream-parity case
    that matters in production: bars served live must equal bars
    recomputed from the lake. min_by/max_by over the unique
    intra-bucket ordering scalar and a DECIMAL volume sum are all
    merge-order-invariant aggregates, so the complete-mode result is
    identical for ANY micro-batch partitioning of the input — which is
    why this streaming query can take the batch query's DuckDB oracle
    verbatim (a full value-hash gate on the streaming path).
    State: one row per (bar, event_type) in the store; with the 2-hour
    watermark in append-mode production deployment, bars older than
    the watermark are emitted and evicted, bounding state."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    key = (us % _BAR_US) * F.lit(_BAR_KEY_MULT) + F.col("event_id")
    agg = (
        events.select("ts", "event_type", "value", key.alias("k"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # Same NULL-skip conditional keys as the batch twin — the
            # shared oracle's arg_min/arg_max skip NULL-value rows.
            F.min_by("value", F.when(F.col("value").isNotNull(), F.col("k")))
            .alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.when(F.col("value").isNotNull(), F.col("k")))
            .alias("close"),
            _val_sum().alias("volume"),
        )
    )
    out = run_stream_to_table(agg, "stream_ohlc_out")
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT_SPARK).alias("bar"),
        "event_type",
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@query(
    "stream_stream_join",
    oracle=(
        "SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id"
        " FROM (SELECT event_id, user_id, ts FROM events"
        "       WHERE event_type = 'view') v"
        " JOIN (SELECT event_id, user_id, ts FROM events"
        "       WHERE event_type = 'click') c"
        " ON v.user_id = c.user_id"
        " AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'"
    ),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: views ⋈ clicks of the same user
    within 10 minutes, both sides watermarked — the streaming state
    store buffers each side only as long as the interval + watermark
    requires (bounded state; the non-negotiable condition for a
    fact⋈fact join over unbounded input). The 10-min interval sits
    well inside the 2-h watermark, so no in-range match is dropped and
    the append-mode output equals the batch interval join — hence a
    full DuckDB oracle, not a rows-only check."""
    from dist_mapreduce_spark.streaming.windows import read_events_stream

    events = read_events_stream(spark, sf_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    from dist_mapreduce_spark.streaming.windows import run_stream_to_table

    tbl = run_stream_to_table(joined, "stream_stream_join_out", mode="append")
    return tbl.select("view_id", "click_id", F.col("v_user").alias("user_id"))


@query(
    "stream_sliding",
    oracle=(
        f"SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start, event_type,"
        f" count(*) AS n_events, {_VAL_SUM_DUCK} AS total_value FROM ("
        f"  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value"
        f"   FROM events"
        f"  UNION ALL"
        f"  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',"
        f"   event_type, value FROM events"
        f" ) GROUP BY 1, 2"
    ),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h / 30 min) under Structured Streaming with a
    watermark — each event updates two window states. Complete-mode
    finals with DECIMAL money are micro-batch-invariant → same oracle
    as the batch sliding query."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
    )
    out = run_stream_to_table(agg, "stream_sliding_out")
    return out.select(
        F.date_format("window.start", _TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "stream_dedup_watermark",
    oracle=(
        "SELECT event_type, count(*) AS n_events FROM"
        " (SELECT DISTINCT event_id, event_type FROM events)"
        " GROUP BY event_type"
    ),
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup: the stream is unioned with
    itself (every event arrives twice — the at-least-once delivery
    profile), then dropDuplicatesWithinWatermark(event_id) removes the
    duplicates while holding per-key state only WITHIN the watermark
    horizon — the production-safe form of stream_dedup whose state is
    bounded instead of growing forever. Without the dedup the counts
    would be exactly doubled, so the oracle genuinely certifies the
    operator. Complete-mode finals are micro-batch-invariant → full
    DuckDB oracle."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "ts"
    )
    doubled = events.union(events)
    agg = (
        doubled.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return run_stream_to_table(agg, "stream_dedup_wm_out")


@query(
    "sessionize_gaps",
    oracle=(
        f"WITH g AS (SELECT user_id, ts, event_id,"
        # >= (not >): a gap of exactly 30 minutes starts a NEW session,
        # matching session_window / agg_window_session semantics so the
        # manual and built-in forms agree on boundary data.
        f"  CASE WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes'"
        f"       OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess"
        f"  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        # CAST AS BIGINT: DuckDB's window sum widens to HUGEINT which
        # exports as float (same drift class as agg_bool/pack_sequences).
        f" s AS (SELECT user_id, ts,"
        f"  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        f"   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g)"
        f" SELECT user_id, session_id, count(*) AS n_events,"
        f"  strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,"
        f"  strftime(max(ts), '{_TS_FMT_DUCK}') AS session_end"
        f" FROM s GROUP BY user_id, session_id"
    ),
)
def q_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization — the manual form of
    session_window (30-minute inactivity gap): flag session starts with
    lag(), running-sum the flags into session ids, aggregate. One
    shuffle on user_id serves both window passes AND the final
    aggregate (same partitioning reused across stages); total order
    (ts, event_id) pins tie handling. This is the pattern when session
    logic needs custom rules (per-user gap, campaign boundaries) that
    session_window can't express."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Microsecond-exact gap test (a seconds-granularity cast would
    # truncate and disagree with the oracle's interval comparison at
    # the 30-minute boundary). >= so a gap of exactly the threshold
    # starts a new session — session_window's boundary rule.
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) >= 1800 * 1_000_000),
        1,
    ).otherwise(0)
    s = e.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
    )


@query(
    "events_funnel",
    oracle=(
        f"WITH v AS (SELECT user_id, min(ts) AS tv FROM events"
        f"  WHERE event_type = 'view' GROUP BY user_id),"
        f" c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e"
        f"  JOIN v ON e.user_id = v.user_id"
        f"  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),"
        f" p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e"
        f"  JOIN c ON e.user_id = c.user_id"
        f"  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)"
        f" SELECT v.user_id,"
        f"  strftime(v.tv, '{_TS_FMT_DUCK}') AS first_view,"
        f"  strftime(c.tc, '{_TS_FMT_DUCK}') AS first_click_after,"
        f"  strftime(p.tp, '{_TS_FMT_DUCK}') AS first_purchase_after"
        f" FROM v JOIN c ON v.user_id = c.user_id"
        f" JOIN p ON v.user_id = p.user_id"
    ),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: earliest view
    per user, earliest click AFTER that view, earliest purchase AFTER
    that click; only fully-converted users survive. Three stage
    aggregates, each joined to the previous stage's (small, per-user)
    output — the stage tables shrink monotonically, so at 100 TB each
    later stage probes a broadcastable survivors table instead of
    re-scanning the full log."""
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(c, "user_id")
        .join(p, "user_id")
        .select(
            "user_id",
            F.date_format("tv", _TS_FMT_SPARK).alias("first_view"),
            F.date_format("tc", _TS_FMT_SPARK).alias("first_click_after"),
            F.date_format("tp", _TS_FMT_SPARK).alias("first_purchase_after"),
        )
    )


def _transform_with_state_available() -> bool:
    """transformWithStateInPandas drives a separate StreamingPythonRunner
    that imports protobuf; gate registration on it so the registry never
    exposes a query the runtime cannot execute (this container ships a
    broken google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def _def_stream_transform_state():
    return query(
        "stream_transform_state",
        oracle=(
            "SELECT user_id, count(*) AS n_events,"
            " CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))"
            "  AS BIGINT) AS total_cents"
            " FROM events GROUP BY user_id"
        ),
    )(q_stream_transform_state)


def q_stream_transform_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithStateInPandas (StatefulProcessor) — typed
    ValueState per user accumulating (count, integer cents). Exact
    integer state makes the finals micro-batch-invariant, so this
    custom stateful operator gets a FULL DuckDB oracle, same as the
    applyInPandasWithState form of the operator. Update mode
    emits a row per touched user per batch; the last emission per user
    (max n_events — monotone) is the final state."""
    from dist_mapreduce_spark.streaming.stateful import running_user_cents
    from dist_mapreduce_spark.streaming.windows import (
        last_emission_per_key,
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    out = running_user_cents(events)
    tbl = run_stream_to_table(out, "stream_tws_out", mode="update")
    return last_emission_per_key(tbl, "user_id", "n_events").select(
        "user_id", "n_events", "total_cents"
    )


if _transform_with_state_available():
    _def_stream_transform_state()


@query(
    "events_retention",
    oracle=(
        "WITH cohort AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d"
        "                FROM events GROUP BY user_id),"
        " act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)"
        " SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,"
        "        date_diff('day', cohort_d, day) AS offset_days,"
        "        count(DISTINCT act.user_id) AS n_users"
        " FROM act JOIN cohort USING (user_id)"
        " GROUP BY cohort_d, offset_days"
    ),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each later active day as a day offset. The standard
    product-analytics rollup a pipeline engine must express; all-integer
    outputs so the oracle is exact.

    Plan: ONE big shuffle — the distinct on (user_id, day) — then the
    cohort day is a window-min over that already-small frame (repartition
    by user_id of |users×days| rows, not a join back to raw events), and
    because each (user, day) appears exactly once after the distinct,
    n_users is a plain count(*) — no count_distinct Expand. Audited:
    5 shuffles + broadcast join → 3 small exchanges. cohort_day is
    emitted as a yyyy-MM-dd string (module convention: date/window keys
    cross the oracle as strings)."""
    ev = _events(spark, sf_dir)
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    act = act.withColumn(
        "cohort_d", F.min("day").over(Window.partitionBy("user_id"))
    )
    return (
        act.groupBy("cohort_d", F.datediff("day", "cohort_d").alias("offset_days"))
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_users",
        )
    )


@query(
    "ts_gapfill",
    oracle=(
        "WITH agg AS ("
        "  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS bucket,"
        f"        count(*) AS n, {_VAL_SUM_DUCK} AS v"
        "  FROM events GROUP BY 1, 2),"
        " spine AS ("
        "  SELECT t.event_type, g.ts AS bucket"
        "  FROM (SELECT DISTINCT event_type FROM events) t"
        "  CROSS JOIN (SELECT unnest(generate_series("
        "     (SELECT time_bucket(INTERVAL '1 day', min(ts)) FROM events),"
        "     (SELECT time_bucket(INTERVAL '1 day', max(ts)) FROM events),"
        "     INTERVAL '1 day')) AS ts) g)"
        f" SELECT strftime(s.bucket, '{_TS_FMT_DUCK}') AS bucket, s.event_type,"
        "        coalesce(a.n, 0) AS n_events,"
        "        last_value(a.v IGNORE NULLS) OVER ("
        "          PARTITION BY s.event_type ORDER BY s.bucket"
        "          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value"
        " FROM spine s LEFT JOIN agg a"
        "   ON a.event_type = s.event_type AND a.bucket = s.bucket"
    ),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup with gap fill: a dense daily
    spine per event type (generated, not scanned), zero-filled counts,
    and last-observation-carried-forward sums for missing buckets.

    The spine is sequence(min_day, max_day) exploded from a 1-row
    bounds aggregate cross-joined with the distinct type dimension —
    both broadcast (a spine is calendar-sized, never data-sized, so at
    100 TB it is still a few thousand rows against a pre-aggregated
    frame, NOT a join against raw events). LOCF is last(ignorenulls)
    over an unbounded-preceding frame; the filled values are copied
    decimal-exact doubles, so the oracle stays bit-exact."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"), _val_sum().alias("v"))
    bounds = ev.agg(
        F.date_trunc("DAY", F.min("ts")).alias("lo"),
        F.date_trunc("DAY", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("bucket")
    )
    spine = ev.select("event_type").distinct().crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        )
        .select(
            F.date_format("bucket", _TS_FMT_SPARK).alias("bucket"),
            "event_type",
            "n_events",
            "filled_value",
        )
    )


@query(
    "rolling_active_users",
    oracle=(
        "WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),"
        " days AS (SELECT DISTINCT day FROM ud)"
        " SELECT strftime(d.day, '%Y-%m-%d') AS day,"
        "        count(DISTINCT u.user_id) AS active_7d"
        " FROM days d JOIN ud u"
        "   ON u.day BETWEEN d.day - INTERVAL '6 days' AND d.day"
        " GROUP BY d.day"
    ),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the sliding
    DISTINCT aggregate, which no engine's window frames do exactly.
    Exact formulation: collapse events to distinct (user, day) rows
    first (the ONE data-sized shuffle), then a range join against the
    broadcast calendar dimension fans each activity row into at most 7
    windows, and a count_distinct per window finishes it. Work scales
    with |users × active days| × 7, not with raw events. The
    approximate 100 TB alternative is per-day HLL sketches merged over
    the window (approx_count_distinct partials) — same plan shape,
    sketch instead of fan-out."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("uday")).distinct()
    days = ud.select(F.col("uday").alias("day")).distinct()
    joined = ud.join(
        F.broadcast(days),
        (F.col("uday") <= F.col("day"))
        & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
    )
    return (
        joined.groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "active_7d")
    )


@query(
    "stream_enrich",
    oracle=(
        "SELECT c.c_mktsegment, e.event_type, count(*) AS n_events,"
        " CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value"
        " FROM events e JOIN customer c ON e.user_id = c.c_custkey"
        " GROUP BY 1, 2"
    ),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment executed through Structured
    Streaming: readStream events joined per micro-batch to the
    BROADCAST static customer dimension, rolled up by market segment ×
    event type (complete mode, memory sink, driven to completion).
    This is the production streaming-join shape `stream_stream_join`
    deliberately does not cover: a static side keeps NOTHING in the
    state store and needs no watermark — the stream never shuffles for
    the join at all. Counts are exact and money sums in DECIMAL, so
    the final complete-mode table is micro-batch-invariant and takes
    the plain batch join+aggregate as its full DuckDB value oracle."""
    from dist_mapreduce_spark.streaming.windows import (
        enrich_counts_stream,
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    agg = enrich_counts_stream(events, dim)
    out = run_stream_to_table(agg, "stream_enrich_out")
    return out.select(
        "c_mktsegment",
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "events_outliers",
    oracle=(
        "WITH vc AS (SELECT user_id,"
        "   CAST(round(value * 100) AS BIGINT) AS c"
        "  FROM events WHERE value IS NOT NULL),"
        " med AS (SELECT user_id, quantile_cont(c, 0.5) AS med_c"
        "  FROM vc GROUP BY user_id)"
        " SELECT vc.user_id, CAST(count(*) AS BIGINT) AS n_events,"
        "  CAST(count(CASE WHEN vc.c > 3 * med.med_c THEN 1 END) AS BIGINT)"
        "   AS n_outliers,"
        "  med.med_c AS median_cents"
        " FROM vc JOIN med ON vc.user_id IS NOT DISTINCT FROM med.user_id"
        " GROUP BY vc.user_id, med.med_c"
    ),
)
def q_events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly audit: events whose value exceeds 3× the
    user's own median — the robust-statistics outlier flag (median,
    not mean, so one whale event cannot mask the others). Values work
    in integer CENTS so the exact-percentile interpolation is integer
    halves on both engines (a + (b−a)·0.5 ≡ (a+b)/2 exactly for
    magnitudes < 2^52 — no FP-order hazard); NULL values are excluded
    up front and the NULL user key survives via a null-safe join, so
    the audit is total over every user that produced a value.

    Scale shape: one shuffle for the per-user median (exact percentile
    per group — at 100 TB swap for approx_percentile with the same
    plan), then a key-equi join of events back to the 1-row-per-user
    median frame and the per-user rollup reusing the same
    partitioning. Nothing pairwise, no window over raw events."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    med = ev.groupBy("user_id").agg(
        F.percentile("c", 0.5).alias("med_c")
    )
    joined = ev.alias("v").join(
        med.alias("m"),
        F.col("v.user_id").eqNullSafe(F.col("m.user_id")),
    )
    return joined.groupBy(F.col("v.user_id").alias("user_id"), "med_c").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("c") > 3 * F.col("med_c"), 1)).alias(
            "n_outliers"
        ),
    ).select(
        "user_id",
        "n_events",
        "n_outliers",
        F.col("med_c").alias("median_cents"),
    )


# ----------------------------------------------------------- CDC apply

@query(
    "cdc_apply",
    oracle=(
        "WITH ranked AS ("
        " SELECT user_id, event_type, value, ts, event_id,"
        "  row_number() OVER (PARTITION BY user_id"
        "   ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST)"
        "   AS rn"
        " FROM events)"
        " SELECT user_id, event_type AS last_type, value AS last_value,"
        "  ts AS last_ts"
        " FROM ranked WHERE rn = 1 AND event_type <> 'error'"
    ),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse a change log into its final
    snapshot — latest change per key wins, tombstones delete the key.
    The events stream doubles as the log (user_id = primary key,
    (ts, event_id) = the total change order, event_type = 'error' = the
    tombstone marker). This is the Delta/Hudi/Iceberg `MERGE`-from-log
    pattern every warehouse ingest runs, and it differs from
    merge_upsert (two static tables) in that ordering lives INSIDE one
    log: later changes must beat earlier ones without a join.

    Exactly one shuffle: a window rank on the key with an explicit
    NULLS LAST total order (Spark and DuckDB default NULL placement
    differs on ASC — pinning it keeps NULL-ts degenerate logs
    hash-identical), then a filter. At 100 TB the log is
    ingest-partitioned by key already, so AQE coalesces this into a
    near-local sort; tombstoned keys leave the pipeline here and cost
    nothing downstream."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    return (
        ev.select(
            "user_id", "event_type", "value", "ts", "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@query(
    "stream_cdc",
    # cdc_apply's oracle VERBATIM (registered above): the streaming
    # materialization is merge-order-invariant, so the stream twin
    # takes the batch contract structurally — same as stream_ohlc.
    oracle=_ORACLES["cdc_apply"],
)
def q_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained CDC snapshot — the streaming twin of
    `cdc_apply`, which is how the pattern actually ships: the change
    log is a stream and the snapshot a live table. The batch form's
    row_number-over-(ts, event_id) picks the lexicographic max of the
    change order per key; here that is ONE merge-order-invariant
    aggregate — max(struct(ts, event_id, type, value)) — so any
    micro-batch partitioning of the log yields the identical snapshot
    (max is associative+commutative; a NULL ts field sorts below every
    instant, matching the batch DESC NULLS LAST), which is why this
    query can take the batch DuckDB oracle verbatim. Tombstones are
    filtered AFTER the max, so a delete beats every earlier upsert but
    loses to a later re-insert, exactly as in batch.
    State: one struct row per live key — the minimum any CDC
    materialization holds; no watermark needed because keys, unlike
    time windows, never expire."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("last")
    )
    out = run_stream_to_table(agg, "stream_cdc_out")
    return out.filter(F.col("last.event_type") != "error").select(
        "user_id",
        F.col("last.event_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
        F.col("last.ts").alias("last_ts"),
    )


@query(
    "stream_hitters",
    # skew_hitters' oracle VERBATIM (plans/relational.py): the
    # streaming count is a merge-order-free aggregate, so the top-K
    # frontier computed on the materialized counts is identical for
    # any micro-batch partitioning — the same shared-oracle contract
    # as stream_ohlc / stream_cdc.
    oracle=_ORACLES["skew_hitters"],
)
def q_stream_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter skew audit over a LIVE stream — the streaming twin
    of skew_hitters, which is the form the audit actually runs in
    production (you want the salting decision BEFORE the nightly batch
    lands). The stream maintains one count per key (merge-order-free);
    the K-row frontier, exact-ppm shares, and running sum are computed
    on the materialized counts, where they are a K-row problem. State:
    one long per live key, the same floor as stream_cdc."""
    from dist_mapreduce_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    events = read_events_stream(spark, sf_dir)
    counts = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    out = run_stream_to_table(counts, "stream_hitters_out")
    from dist_mapreduce_spark.plans.relational import SKEW_TOPK

    tot = out.agg(F.sum("cnt").alias("n"))
    top = (
        out.crossJoin(F.broadcast(tot))
        .select(
            "user_id", "cnt", F.expr("cnt * 1000000 DIV n").alias("ppm")
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc_nulls_last())
        .limit(SKEW_TOPK)
    )
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        "user_id", "cnt", "ppm", F.sum("cnt").over(w).alias("cum_cnt")
    )


@query(
    "events_transitions",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, ts, event_id,"
        "  lag(event_type) OVER (PARTITION BY user_id"
        "   ORDER BY ts NULLS LAST, event_id NULLS LAST) AS prev_type"
        " FROM events),"
        " t AS (SELECT prev_type, event_type AS next_type,"
        "  CAST(count(*) AS BIGINT) AS n"
        "  FROM seq WHERE prev_type IS NOT NULL"
        "   AND event_type IS NOT NULL GROUP BY 1, 2)"
        " SELECT prev_type, next_type, n,"
        "  CAST(n * 1000000"
        "   // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm"
        " FROM t"
    ),
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered in-session pair (previous event type → next event type),
    the transition count and the conditional probability in exact
    integer ppm (n·10⁶ DIV row-total — no float, engines agree
    bit-for-bit). This is the path-analysis complement of
    events_funnel: the funnel checks ONE prescribed sequence, this
    surfaces the empirical transition structure (where users actually
    go next), the input to Sankey diagrams and next-event models.

    One window shuffle on the user key (lag over the pinned
    (ts, event_id) NULLS LAST total order — same ordering contract as
    cdc_apply), one hash aggregate on the (prev, next) pair — a
    5×5-ish result regardless of corpus size — and the row totals as
    a window over that tiny aggregate (a join branch would recompute
    the whole pair pipeline; the window costs one type-keyed exchange
    of ~25 rows). NULL-type rows drop from pair formation in both
    engines."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    t = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000000").cast("long").alias("scaled"),
        F.sum("n").over(wr).alias("row_n"),
    ).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("scaled DIV row_n").alias("p_ppm"),
    )


# -------------------------------------- sequential pattern match (M_R)

#: Maximum span (seconds) from the pattern's first to last event —
#: 7 days: the driver's per-user event cadence is ~1/day, so an
#: hour-scale span would make the pattern vacuously empty; production
#: tunes this to the product's session scale.
PATTERN_SPAN_S = 7 * 86400


@query(
    "events_pattern_match",
    oracle=(
        f"WITH seq AS (SELECT user_id, ts, event_id, event_type,"
        f"  lead(event_type, 1) OVER w AS e2,"
        f"  lead(event_type, 2) OVER w AS e3,"
        f"  lead(ts, 2) OVER w AS t3"
        f" FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL"
        f" WINDOW w AS (PARTITION BY user_id"
        f"  ORDER BY ts, event_id NULLS FIRST)),"
        f" m AS (SELECT user_id, ts FROM seq"
        f"  WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'"
        f"   AND t3 <= ts + INTERVAL {PATTERN_SPAN_S} SECOND)"
        f" SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,"
        f"  strftime(min(ts), '{_TS_FMT_DUCK}') AS first_match"
        f" FROM m GROUP BY user_id"
    ),
)
def q_events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-2016 MATCH_RECOGNIZE's core case as a window plan: per user,
    STRICTLY CONSECUTIVE view → click → purchase sequences completing
    within the span — the row-pattern class (fraud step-sequences,
    conversion micro-funnels) that differs from events_funnel's
    anywhere-after semantics by requiring contiguity. Spark has no
    MATCH_RECOGNIZE; the fixed-length pattern compiles to k−1 lead()
    columns over one (user, time) window and a row predicate — the
    standard rewrite, and for fixed k the PLAN-OPTIMAL one: one
    exchange on user_id, one intra-partition sort, zero joins.

    Ordering is total ((ts, event_id) with NULLS FIRST pinned — Spark
    and DuckDB default NULL placement differs, so it is spelled);
    NULL-user and NULL-ts rows are excluded as in every events window.

    Scale shape: one shuffle regardless of pattern length; state is
    the window frame's k-row lookahead, not a regex NFA — at 100 TB
    per-user logs sort within their partition and stream through."""
    e = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc_nulls_first()
    )
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("t3"),
    )
    m = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("e2") == "click")
        & (F.col("e3") == "purchase")
        & (F.col("t3") <= F.expr(f"ts + INTERVAL {PATTERN_SPAN_S} SECONDS"))
    )
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("first_match"),
    )
