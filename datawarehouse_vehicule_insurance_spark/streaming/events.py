"""Structured Streaming over the events table shape
(event_id, ts, user_id, event_type, value, props).

The same transformations run in batch (see ``queries.q_events_hourly``)
and streaming — one logical plan, two execution modes. Watermarks bound
state for late data; sessionization uses the built-in session window
(gap-based), keeping state management inside Spark's state store rather
than custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source event stream. In production the source would be Kafka
    (``spark.readStream.format("kafka")``) — the downstream plan is
    identical, which is the point of keeping transformations source-
    agnostic."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def hourly_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with late-data handling.
    State is bounded by the watermark: windows older than max(ts) −
    watermark are finalized and evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type", "n_events", "total_value", "approx_users",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user: a session closes after ``gap``
    of inactivity. Uses the native session_window — state store managed,
    no applyInPandasWithState needed for this shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("session"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events", "session_value",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_path: str,
):
    """Durable ingestion: event stream → parquet files with exactly-once
    semantics via the checkpoint (file-source offsets + sink commit log).
    Restarting with the same checkpoint resumes from the last committed
    batch — already-processed input files are not re-emitted."""
    stream = read_event_stream(spark, src_path)
    return (
        stream.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )


def run_hourly_to_partitioned(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_path: str,
    watermark: str = "0 seconds",
):
    """Production rollup sink: append-mode windowed aggregation into a
    date/hour-partitioned parquet table. Append mode emits each window
    exactly once — when the watermark passes its end — so the sink is an
    immutable, partition-pruned fact table; no upsert machinery needed.
    Late data within the watermark updates state BEFORE emission; data
    later than that is dropped (the documented trade)."""
    stream = read_event_stream(spark, src_path)
    rollup = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type", "n_events", "total_value",
            F.to_date(F.col("win.start")).alias("date"),
            F.hour(F.col("win.start")).alias("hour"),
        )
    )
    return (
        rollup.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("date", "hour")
        .outputMode("append")
        .start()
    )


def run_upsert_rollup(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_path: str,
):
    """Update-mode upsert sink via ``foreachBatch``: the hourly rollup
    emits *changed* (window × event_type) groups each trigger, and the
    batch function merges them into a keyed parquet table.

    Plain parquet has no MERGE, so the upsert is done with group-grain
    dynamic partition overwrite: the table is partitioned by
    (date, hour, event_type) — exactly the aggregate key — so rewriting
    the partitions present in a micro-batch replaces each group's old row
    with its new one and touches nothing else. This also makes replays
    idempotent (exactly-once per group): re-running a batch rewrites the
    same partitions with the same content. On Delta/Iceberg the body of
    ``_merge`` becomes a single ``MERGE INTO`` and no partition-per-group
    layout is needed.
    """
    stream = read_event_stream(spark, src_path)
    rollup = (
        stream.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type", "n_events", "total_value",
            F.to_date(F.col("win.start")).alias("date"),
            F.hour(F.col("win.start")).alias("hour"),
        )
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date", "hour", "event_type")
            .parquet(dst_path)
        )

    return (
        rollup.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )


def run_stream_to_memory(
    spark: SparkSession, src_path: str, table_name: str = "hourly_rollup"
):
    """Test/demo runner: stream → in-memory sink, returns the query
    handle (callers ``processAllAvailable()`` then read the table).

    Complete mode: append mode only emits a window once the watermark
    passes it, so the trailing windows of a finite file-source replay
    would be withheld; complete re-emits the full aggregate each trigger,
    which is what a verification sink wants. Production sinks (kafka/
    delta) use append + downstream watermark-aware consumers."""
    stream = read_event_stream(spark, src_path)
    rollup = hourly_rollup(stream)
    return (
        rollup.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )


def run_incremental_batch(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_path: str,
    transform=None,
):
    """Incremental batch ingestion (auto-loader pattern): a file-source
    stream with ``availableNow`` processes exactly the files that arrived
    since the last run, then STOPS — a scheduled batch job with streaming
    bookkeeping instead of hand-rolled "which files are new" state. Each
    invocation is one incremental run; the checkpoint carries the file
    ledger across runs, so re-listing or re-running never duplicates.
    ``transform`` (optional) maps the streaming DataFrame — the same
    lazy plan batch code uses, e.g. a silver rule list.

    This is the 100-TB answer to the reference's full-rebuild loads
    (load_bronze.py:88-101 re-reads every CSV every run): per-run work is
    proportional to NEW data, not table size.
    """
    stream = read_event_stream(spark, src_path)
    if transform is not None:
        stream = transform(stream)
    return (
        stream.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: purchases matched to the
    same user's clicks from the preceding ``window_minutes``. Both sides
    are watermarked and the join condition time-bounds the match, so
    Spark can evict join state for rows older than watermark + bound —
    the state-bounding requirement of production stream-stream joins.
    The same function joins two batch DataFrames identically (tested:
    stream ≡ batch)."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    bound = F.expr(f"click_ts >= purchase_ts - INTERVAL {window_minutes} MINUTES")
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & bound
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    (the kimball lookup shape). Stateless — each micro-batch joins
    against the CURRENT dim snapshot, so a small dim broadcasts per
    batch and no streaming state accumulates; re-reading the dim picks
    up dimension updates between batches for free."""
    return stream.join(F.broadcast(dim), on, "left")


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once event deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so the dedup state store holds a sliding
    window of keys instead of every key ever seen (the unbounded-state
    failure mode of plain ``dropDuplicates`` on a stream). The contract
    matches at-least-once sources (Kafka redeliveries, file-source
    replays): duplicates arriving within the watermark interval are
    dropped; a duplicate arriving later than the watermark would be a
    source-contract violation.

    Batch equivalence: on finite replayed input this equals batch
    ``dropDuplicates(keys)`` keeping one row per key (tested)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )
