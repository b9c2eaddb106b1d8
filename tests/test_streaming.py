"""Structured Streaming pipeline: availableNow drain of the fixture
directory must route exactly the same row set as the batch pipeline,
and the windowed aggregate must match a batch groupBy over the same
input (all rows in-watermark with availableNow)."""

import pytest
from pyspark.sql import functions as F

from logparser_spark.plans.pipeline import build_routed
from logparser_spark.sources.sequences import read_raw_sequences
from logparser_spark.streaming.stream_pipeline import (
    build_routed_stream,
    read_sequence_stream,
    start_routed_sink,
    start_windowed_counts,
)


@pytest.fixture(scope="module")
def stream_out(spark, tiny_input, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream"))
    raw = read_sequence_stream(spark, tiny_input, max_files_per_trigger=3)
    routed = build_routed_stream(spark, raw)
    q1 = start_routed_sink(routed, out)
    q1.awaitTermination(300)
    q2 = start_windowed_counts(build_routed_stream(spark, read_sequence_stream(spark, tiny_input)), out)
    q2.awaitTermination(300)
    return out


def test_stream_routes_same_rows_as_batch(spark, tiny_input, stream_out):
    got = {
        (r.doc_id, r.category)
        for r in spark.read.parquet(f"{stream_out}/data")
        .select("doc_id", "category")
        .collect()
    }
    want = {
        (r.doc_id, r.category)
        for r in build_routed(spark, read_raw_sequences(spark, tiny_input))
        .select("doc_id", "category")
        .collect()
    }
    assert got == want


def test_stream_restart_is_idempotent(spark, tiny_input, stream_out):
    """Restarting the drained availableNow query adds no rows (sink log
    + checkpoint dedupe)."""
    n_before = spark.read.parquet(f"{stream_out}/data").count()
    raw = read_sequence_stream(spark, tiny_input, max_files_per_trigger=3)
    q = start_routed_sink(build_routed_stream(spark, raw), stream_out)
    q.awaitTermination(300)
    assert spark.read.parquet(f"{stream_out}/data").count() == n_before


def test_windowed_counts_match_batch(spark, tiny_input, stream_out):
    import datetime as dt

    got = (
        spark.read.parquet(f"{stream_out}/counts")
        .orderBy("window_start", "category")
        .collect()
    )
    batch = build_routed(spark, read_raw_sequences(spark, tiny_input))
    max_t = batch.agg(F.max("time")).collect()[0][0]
    # append mode emits a window only once the watermark passes its end:
    # windows ending within the final 2h watermark stay in state and are
    # (correctly) not emitted by the availableNow drain
    emit_cutoff = max_t - dt.timedelta(hours=2)
    want = (
        batch.groupBy(F.window("time", "1 hour").alias("w"), "category")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("response_size_bytes").alias("bytes_total"),
        )
        .filter(F.col("w.end") <= F.lit(emit_cutoff))
        .select(F.col("w.start").alias("window_start"), "category", "row_count", "bytes_total")
        .orderBy("window_start", "category")
        .collect()
    )
    # quarantine rows have null time -> excluded from windowed agg in both
    assert len(got) > 0
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_zero_files_per_trigger_rejected(spark, tiny_input):
    """0 must fail loudly — silently dropping the option would ingest
    every available file in one unbounded micro-batch, the exact OOM
    the throttle exists to prevent."""
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        read_sequence_stream(spark, tiny_input, max_files_per_trigger=0)
