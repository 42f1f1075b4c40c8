"""Structured Streaming surface over the events table (SURVEY §2.14, §7.8).

The reference is pure batch MPP; streaming is the driver-mandated extension.
Design: the SAME column expressions as the batch workload
(workload/events.py) applied to readStream, so batch results are the oracle
for streaming output (batch-equivalent replay — SURVEY §7 risk register).

Operators covered:
* tumbling / sliding window aggregation with watermark late-data policy
* session windows (F.session_window)
* streaming dedup (dropDuplicates + watermark)
* custom stateful op via applyInPandasWithState (running per-user counter)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based event stream: each parquet dropped into source_dir is a
    micro-batch (the canonical replay harness for the events table)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window aggregate with late-data watermark; identical
    expressions to batch q37_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user; batch oracle is q39_user_sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a stream into an in-memory sink until all available data is
    processed (test/replay harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def user_running_totals(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful operator: per-user cumulative event count + value via
    applyInPandasWithState (the flatMapGroupsWithState equivalent).

    This is the pattern for operators Spark's built-ins can't express —
    state is an explicit (count, total) tuple per user.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_stream_conversion_join(
    signups: DataFrame,
    purchases: DataFrame,
    within: str = "2 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: every (signup, purchase) pair for the
    same user where the purchase lands in ``(signup_ts, signup_ts + within]``.

    Both inputs are streaming frames of the event schema.  This is the
    Structured Streaming join class with BOUNDED state: the watermark plus
    the two-sided time-range condition lets Spark evict a buffered signup
    once ``signup_ts + within`` falls behind the watermark and a buffered
    purchase once it can no longer match any future signup — state size is
    O(events inside the interval horizon), not O(stream history).

    Scale shape: state is hash-partitioned on ``user_id`` (the equi-join
    key), so a 1000-executor cluster holds each user's open interval on
    exactly one task; the range predicate is evaluated residually within
    the partition.  Without the time bound Spark would have to buffer both
    streams forever — the interval IS the scalability contract.
    """
    s = (
        signups.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_event_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {within}"))
    )
    return s.join(p, cond, "inner").select(
        "user_id",
        "signup_ts",
        "purchase_ts",
        "purchase_value",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")
        ).alias("seconds_to_convert"),
    )
