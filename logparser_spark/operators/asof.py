"""Point-in-time (as-of) join — match every left row to the LATEST
right-side row with the same key and time <= the left row's time.

The canonical use in a training-data/telemetry pipeline: enrich events
with the dimension snapshot that was in force when the event happened
(price/config/model-version tables that change over time), where an
equi-join on time never matches and a range join explodes.

Spark has no native ASOF JOIN; the distributed formulation here is the
union + ordered carry-forward pattern:

1. tag both sides and union the NARROW projections (left keeps only
   key+time+row id; right keys+time+payload) — no pairwise candidates
   are ever generated, unlike a range-join rewrite whose intermediate
   is |left| x |matching right window|;
2. one window per key ordered by (time, side) — right rows sort before
   left rows at equal times, so a snapshot taken at the event's own
   timestamp matches (<= semantics);
3. ``last(payload, ignorenulls=True)`` carries each snapshot forward to
   every following left row in the same key.

Scale: the single shuffle is the window's hash partition on the key;
parallelism = key cardinality (fine for real dimension keys: users,
entities, symbols). For a KEYLESS as-of, range-partition on time and
carry partition-boundary snapshots via a second tiny pass instead —
not implemented here because every reference-shaped use is keyed.
Reference parity: none (the reference has only equi-joins,
DatabaseManager.java joins); §2-extension op. Oracle: DuckDB's native
ASOF LEFT JOIN reproduces the semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns plus, for each value col, the
    right side's value at the latest right.time <= left.time with equal
    keys (NULL when no prior snapshot exists).

    Ties: a right row at exactly left.time matches. Multiple right rows
    at the SAME (key, time) are ambiguous by definition — the caller
    must dedup snapshots first (keep_latest) if the source allows them.
    """
    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        *key_cols, F.col(time_col), *value_cols
    ).withColumn("__side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
) -> DataFrame:
    """Point-in-interval range join: every (left, right) pair with
    right.lo <= left.t <= right.hi — events inside incident/maintenance
    windows, points inside validity intervals.

    Spark plans a raw non-equi join as BroadcastNestedLoopJoin (O(n*m)
    comparisons, broadcast-sized right). This is the bucketized
    rewrite: each interval explodes to the width-``bucket`` buckets it
    covers, each point keys by its own bucket, and an EQUI-join on the
    bucket produces candidates that one exact BETWEEN filter confirms.
    A matching pair meets in exactly ONE bucket (the point's), so the
    output needs no dedup. Shuffle is |left| + sum(interval_span)/bucket
    rows; pick ``bucket`` near the median interval length so intervals
    explode to O(1) buckets while bucket-candidate lists stay short.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    lb = left.withColumn(
        "__b", F.floor(F.col(t_col) / bucket).cast("long")
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket).cast("long"),
                F.floor(F.col(hi_col) / bucket).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "__b")
        .where(F.col(t_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__b")
    )
