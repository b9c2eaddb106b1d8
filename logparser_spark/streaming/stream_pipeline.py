"""Structured Streaming variant of the pipeline head.

The reference is strictly batch (SURVEY.md §2.8 — its only 'stream' is
an in-process pipe), so this module is an extension, not parity: the
same parse -> enrich -> route lineage runs over ``readStream``, giving
continuous ingestion with exactly-once file-sink semantics and
checkpoint-based resume — the streaming analog of the batch manifest.

Composition is unchanged (the point of declaring stages as
DataFrame -> DataFrame functions): ``with_parsed`` (Arrow-batched UDF),
``enrich`` (broadcast joins) and ``category_expr`` are applied to a
streaming frame verbatim. Watermarked windowed counts stand in for the
post-load aggregate stage.

Scale notes: ``maxFilesPerTrigger`` bounds micro-batch size; the
partitioned file sink fans out (category, day) exactly like the batch
writer; state for the windowed aggregate is bounded by the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logparser_spark.plans.pipeline import build_routed
from logparser_spark.sources.sequences import RAW_SCHEMA
from logparser_spark.sources.sinks import day_expr


def read_sequence_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger is not None:
        # an explicit 0 must fail loudly, not silently ingest every
        # available file in one unbounded micro-batch (the exact OOM
        # this throttle exists to prevent)
        if max_files_per_trigger < 1:
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def build_routed_stream(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """THE batch routing plan applied to a stream — literally the same
    function (``plans.pipeline.build_routed`` is streaming-safe: pure
    projections + a broadcast dim join), so batch/stream routing cannot
    diverge."""
    return build_routed(spark, raw)


def start_routed_sink(
    routed: DataFrame, out_root: str, trigger_available_now: bool = True
):
    """Continuous multi-sink writer: partitioned append file sink with
    its own checkpoint (exactly-once per file via the sink log)."""
    writer = (
        routed.withColumn("day", day_expr("time"))
        .writeStream.format("parquet")
        .option("path", os.path.join(out_root, "data"))
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint"))
        .partitionBy("category", "day")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_counts(
    routed: DataFrame,
    out_root: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
):
    """Watermarked tumbling-window per-category counts — the streaming
    analog of the hourly histogram; late rows beyond the watermark are
    dropped deterministically and state is bounded."""
    counts = (
        routed.withWatermark("time", watermark)
        .groupBy(F.window("time", window).alias("w"), "category")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("response_size_bytes").alias("bytes_total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "category",
            "row_count",
            "bytes_total",
        )
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", os.path.join(out_root, "counts"))
        .option("checkpointLocation", os.path.join(out_root, "_counts_checkpoint"))
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
