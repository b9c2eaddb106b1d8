"""Shared operator utilities."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Persisted intermediates registered by operators that must cache a
# frame feeding two consumers (dup-span positions, shard ranks, packing
# offsets). A long-lived session running many such queries — the
# 49-query bench sweep, the driver's correctness sweep — would otherwise
# accumulate cached blocks forever: disk-spilled blocks are NOT
# reclaimed by memory-pressure eviction, only by an explicit unpersist
# or session end. Operators register via ``track_persist``; harness
# layers call ``release_persisted`` between queries (after the previous
# query's action has materialized its result).
_TRACKED: list[DataFrame] = []
# Broadcast variables registered by operators that ship a stats vector
# to executors (dsir weight vectors above the closure-size cutoff):
# same lifecycle problem as persisted frames — executor-resident blocks
# survive until an explicit unpersist.
_TRACKED_BC: list = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register the handle for a later bulk release."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def track_broadcast(bc) -> None:
    """Register a Broadcast for release by ``release_persisted`` (same
    consumer-materialized contract: unpersisting while a plan that
    references the broadcast can still re-execute forces a re-fetch
    from the driver — correct but slow — so harness layers release
    between queries, like the persisted frames)."""
    _TRACKED_BC.append(bc)


def release_persisted() -> int:
    """Unpersist every tracked intermediate (non-blocking); returns the
    count released.

    CONTRACT: call only after every consumer of the previous query's
    result has fully materialized (collected / written). It is NOT
    safe at arbitrary times: two tracked kernels
    (``packing._with_global_offsets``, ``sampling.shard_assign``) pin a
    ``repartitionByRange`` whose boundary sample is re-drawn on every
    physical execution — their driver-collected pid->base maps are only
    valid for the partitioning the persist pinned. Releasing while such
    a result DataFrame can still be (re-)executed recomputes the range
    partitioning with fresh boundaries and yields silently wrong
    offsets/ranks. The driver-sweep wrapper in ``__spark_entry__``
    satisfies the contract by releasing at the START of the next query,
    after the harness has materialized the previous one."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    while _TRACKED_BC:
        bc = _TRACKED_BC.pop()
        try:
            bc.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    return n


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
