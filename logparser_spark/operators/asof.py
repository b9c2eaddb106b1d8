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

    SQL-faithful edges: the WHOLE matched snapshot is carried as one
    struct, so a NULL field in the latest snapshot stays NULL (an older
    snapshot's value is never resurrected, and multi-column results
    never mix two snapshots); right rows with a NULL key or NULL time
    are dropped up front (NULL comparisons match nothing in SQL), and a
    left row with NULL time sorts before every snapshot, yielding NULLs.
    """
    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    for internal in ("__side", "__snap"):
        if internal in left.columns or internal in right.columns:
            raise ValueError(f"reserved column name in input: {internal}")
    l_tag = left.withColumn("__side", F.lit(1))
    r_not_null = right
    for c in [*key_cols, time_col]:
        r_not_null = r_not_null.where(F.col(c).isNotNull())
    # snapshot payload as ONE nullable struct: NULL on left rows (so
    # ignorenulls skips them), a struct — even of NULL fields — on
    # right rows (so the latest snapshot wins wholesale)
    r_tag = r_not_null.select(
        *key_cols,
        F.col(time_col),
        F.lit(0).alias("__side"),
        F.struct(*value_cols).alias("__snap"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__snap", F.last("__snap", ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col("__snap")[v])
    return out.drop("__side", "__snap")


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
    Inverted intervals (hi < lo) match nothing, exactly like SQL
    BETWEEN — filtered before the explode, where sequence() would
    otherwise count DOWN and blow up on a corrupt row.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    if "__b" in left.columns or "__b" in right.columns:
        raise ValueError("reserved column name in input: __b")
    right = right.where(F.col(lo_col) <= F.col(hi_col))
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
