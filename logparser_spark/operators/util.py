"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure a CPU-heavy map stage isn't starved by input file count.

    A table written as one (or few) small parquet files arrives as one
    scan partition — `spark.sql.files.maxPartitionBytes` only splits
    LARGE files — so every downstream batch kernel runs on one core.
    Repartition up to the default parallelism when (and only when) the
    scan is under-split; at real scale inputs have thousands of splits
    and this is a no-op (no shuffle added).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
