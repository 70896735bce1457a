"""Streaming operators over the events table.

Design for scale: the file source discovers new files incrementally (the
100 TB deployment points it at a growing partitioned directory or swaps in
Kafka with the same downstream plan); windowed aggregations carry state
only for open windows because the watermark bounds lateness, so state size
is O(active keys × open windows), independent of history length.

Each operator has a batch twin registered in ``onetable_spark.queries``
(`window_agg`, `hopping_window`, `sessionize`) whose results the driver's
DuckDB oracle verifies — streaming correctness is therefore anchored to
ANSI-SQL semantics, not just self-consistency.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    The testdata file carries TIMESTAMP(NANOS). Reading it under an
    explicit LongType schema yields epoch MICROS in current PySpark
    (the reader converts nanos→micros before honoring the long cast),
    while a schema-inferred read under ``nanosAsLong`` yields raw NANOS
    — and which one arrives has historically depended on the Spark
    version, not on any session conf. Normalize by magnitude so the
    stream is correct under any session: epoch-nanos for 2024-era data
    is ~1.7e18, epoch-micros ~1.7e15; the 4e17 threshold separates them
    for any date between 1983 and year 14000.
    """
    nanos_schema = T.StructType(
        [f if f.name != "ts" else T.StructField("ts", T.LongType()) for f in EVENT_SCHEMA.fields]
    )
    # the file source requires a directory; glob-filter selects the events
    # table out of the shared sf dir
    raw = (
        spark.readStream.schema(nanos_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (with zone); session tz is UTC, so the
    # instant matches the batch reader's timestamp_ntz values exactly
    return raw.withColumn("ts", F.timestamp_micros(_epoch_micros(F.col("ts"))))


def _epoch_micros(ts_long):
    """Normalize an ambiguous epoch long (nanos or micros) to micros.

    Integer arithmetic only: epoch-nanos ~1.7e18 exceeds double's 2^53
    exact-integer range, so float division (``ts / 1000``) can land ~1µs
    off near window boundaries. Exact decimal division + floor keeps the
    value bit-identical to the DuckDB oracle's integer semantics."""
    as_micros = F.floor(ts_long.cast("decimal(38,0)") / 1000).cast("long")
    return (
        F.when(ts_long > F.lit(400_000_000_000_000_000), as_micros)
        .otherwise(ts_long)
        .cast("long")
    )


def tumbling_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    Batch twin: ``queries.q_window_agg`` (oracle: DuckDB ``time_bucket``).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value")
    )


def hopping_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked hopping(sliding)-window counts — each event lands in
    window/slide overlapping windows. Batch twin: ``queries.q_hopping_window``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session-window aggregation: per user, dynamic-gap sessions.

    ``F.session_window`` is Spark's native stateful session operator — the
    window extends while events arrive within ``gap`` of the last one and
    closes when the watermark passes last_ts + gap. Batch twin:
    ``queries.q_sessionize`` computes identical session boundaries with a
    lag/running-sum window (verified equal in tests).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "session_value",
        )
    )


def windowed_approx_reach(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Windowed unique-user reach via the HLL++ sketch in STREAMING
    execution: exact distinct aggregation is unsupported (and unscalable)
    over unbounded streams, so approx_count_distinct's fixed-size
    mergeable sketch is the production pattern — per-window state is a
    few KB regardless of user cardinality. The batch twin in
    ``queries.q_streaming_approx_reach`` audits every emitted window
    against the exact batch count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .select(F.col("w.start").alias("w_start"), "event_type", "approx_users")
    )


def user_running_totals(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, emitted on every update.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (per-key state machines, custom timeouts);
    state is a single (count, total) row per user — O(active users), and
    the GroupState API handles checkpointing/recovery like any built-in
    stateful operator.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"
    out_cols = ["user_id", "n_events", "total_value"]

    def fn(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # Series.sum() skips NaN (identical to fillna(0).sum(), and 0.0
            # on an all-NaN or empty batch) at ~1/3 the per-key cost —
            # this function runs once per key per micro-batch (guide §4)
            total += float(pdf["value"].sum())
        state.update((n, total))  # keep state unrounded; round only at emit
        # from_records is the cheapest stable-dtype 1-row constructor
        # (measured 137 us vs 221 us for the dict form; × keys × batches)
        yield pd.DataFrame.from_records(
            [(key[0], n, round(total, 2))], columns=out_cols
        )

    return (
        # §4.1: only the columns the function touches cross the Python
        # boundary — event_id/event_type/props would otherwise be shipped
        # (and shuffled) for every row just to be dropped in Python
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str | None = None,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion over the data available now
    and return the final result as a batch DataFrame (memory sink).

    ``Trigger.AvailableNow`` processes the backlog in bounded batches then
    stops — the streaming equivalent of the reference's "sync all commits
    up to now" pull loop (`ExtractFromSource.java:34-51`).

    ``shuffle_partitions`` sizes the stateful operators' state-store
    partition count, which Structured Streaming FIXES at the first
    checkpoint — the one sizing decision that must match stream volume up
    front. Every state partition pays per-micro-batch store open/commit
    overhead, so an oversized count dominates wall-clock on modest
    streams (measured 4×: a stream-stream join at the session default 32
    vs 8 partitions ran 9.2 s vs 2.2 s on identical data/results); an
    undersized count caps parallelism at scale. The session conf is
    restored after the query terminates.
    """
    spark = stream_df.sparkSession
    name = query_name or f"avail_now_{uuid.uuid4().hex[:8]}"
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        with tempfile.TemporaryDirectory(prefix="otb_stream_ckpt_") as ckpt:
            q = (
                stream_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.table(name)


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the streaming face of ``exact_dedup``:
    state-backed ``dropDuplicates`` on the key columns, with the watermark
    bounding how long per-key state lives (late duplicates beyond the
    watermark age out of state; Structured Streaming's documented
    deduplication pattern). Emits each key's first-arriving row once;
    only the key columns are projected so the result is deterministic
    under any file/partition arrival order.

    The key+ts projection sits BEFORE the dedup (r16, guide §2.3/§5):
    dropDuplicates state stores the whole row, so un-projected event
    payloads (props, value, event_id) were shuffled and held in the state
    store only to be dropped at emit. Result-identical — the output is
    the key columns either way."""
    return (
        events.select(*keys, "ts")
        .withWatermark("ts", watermark)
        .dropDuplicates(list(keys))
        .select(*keys)
    )


def attribution_join_stream(
    events: DataFrame, attribution_window: str = "4 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval self-join: each purchase matched to the
    clicks by the same user in the preceding attribution window.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH ends — the two requirements that let Structured Streaming
    expire buffered join state instead of holding both streams forever
    (the documented stream-stream inner-join pattern). Append output."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {attribution_window}"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id")
