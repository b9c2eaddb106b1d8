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

Scale: with ``time_bucket=None`` the single shuffle is the window's
hash partition on the key; parallelism = key cardinality (fine for
real dimension keys: users, entities, symbols). One HOT key (a
null-ish default user, a dominant source) would serialize that key's
whole event stream through a single task — pass ``time_bucket`` to
switch to the skew-safe two-phase plan: phase 1 windows within
(key, time div bucket) so a hot key spreads across its time range;
phase 2 carries bucket-boundary snapshots (ONE row per (key, bucket))
forward per key — the same two-phase shape as
``sampling.shard_assign``/``packing._with_global_offsets``. A keyless
as-of is the same mechanism with an empty key list's worth of
bucketing (not exposed; every reference-shaped use is keyed).
Reference parity: none (the reference has only equi-joins,
DatabaseManager.java joins); §2-extension op. Oracle: DuckDB's native
ASOF LEFT JOIN reproduces the semantics exactly (identical for both
plans — the bucketed path is a pure re-partitioning of the same
computation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pick_time_bucket(
    left: DataFrame,
    key_cols: list[str],
    time_col: str,
    rows_per_task: int,
) -> int | None:
    """Key-skew probe for ``time_bucket="auto"``: one small aggregate
    job over the LEFT side (shuffle bounded by key cardinality thanks
    to map-side partial aggregation) measuring the hottest key's row
    count and the time range. Below ``rows_per_task`` the single-window
    plan is safe (no key funnels more than a task's worth of rows
    through one reducer) and cheaper — one window, no join-back; above
    it, pick the bucket width that splits the hottest key into
    ~rows-per-task slices assuming its rows spread over the observed
    range (a heuristic: a key whose rows cluster into one bucket still
    degrades to the single-window behaviour FOR THAT BUCKET only).
    Plan choice never affects results — both plans are oracle-identical.
    """
    probe = (
        left.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.col(time_col).cast("bigint")).alias("mn"),
            F.max(F.col(time_col).cast("bigint")).alias("mx"),
        )
        .agg(
            F.max("c").alias("hot"),
            F.min("mn").alias("t_lo"),
            F.max("mx").alias("t_hi"),
        )
        .first()
    )
    if probe is None or probe["hot"] is None or probe["hot"] <= rows_per_task:
        return None
    if probe["t_hi"] is None or probe["t_lo"] is None:
        # a hot key whose time values are all NULL carries no windowing
        # cost (NULL-time rows order degenerately) — single-window plan
        return None
    span = max(1, int(probe["t_hi"]) - int(probe["t_lo"]) + 1)
    return max(1, span * rows_per_task // int(probe["hot"]))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
    time_bucket: int | None | str = None,
    auto_rows_per_task: int = 2_000_000,
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

    ``time_bucket`` (positive int; integral time domains) enables the
    hot-key-safe two-phase plan — identical results, but no single task
    ever holds more than one (key, time-bucket) slice. Pick the bucket
    so a hot key's densest bucket fits a task (e.g. an hour of events).
    ``time_bucket="auto"`` runs a cheap key-skew probe first
    (``_pick_time_bucket``): single-window when the hottest left key
    holds <= ``auto_rows_per_task`` rows, else the bucketed plan with a
    derived bucket width — so callers get the cheap plan on balanced
    keys and the skew-safe one on hot keys without hand-tuning.
    """
    if time_bucket == "auto":
        time_bucket = _pick_time_bucket(
            left, key_cols, time_col, auto_rows_per_task
        )
    elif isinstance(time_bucket, str):
        raise ValueError(f"time_bucket must be int, None or 'auto', got {time_bucket!r}")
    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    for internal in ("__side", "__snap", "__tb", "__carry"):
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
    order = [F.col(time_col).asc(), F.col("__side").asc()]
    if time_bucket is None:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("__snap", F.last("__snap", ignorenulls=True).over(w))
    else:
        time_bucket = int(time_bucket)
        if time_bucket <= 0:
            raise ValueError("time_bucket must be a positive integer")
        # integer div (not float floor) so bucketing stays exact past
        # 2^53 — same reasoning as range_join below
        tb = F.expr(f"CAST(`{time_col}` AS BIGINT) div {time_bucket}")
        u = u.withColumn("__tb", tb)
        # phase 1: carry WITHIN each (key, bucket) slice — a hot key's
        # stream splits across its time buckets instead of one reducer
        w1 = (
            Window.partitionBy(*key_cols, "__tb")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        partial = F.last("__snap", ignorenulls=True).over(w1)
        # phase 2 (tiny): ONE groupBy over every (key, bucket) present
        # on EITHER side yields the bucket's LAST snapshot — max_by
        # skips NULL ordering keys, so left rows (NULL right-time)
        # contribute the group but never a snapshot, and left-only
        # buckets land with a NULL boundary; ties at equal right time
        # are the documented duplicate-snapshot ambiguity. Then the
        # boundary is carried forward per key over one-row-per-bucket
        # data — that window is bounded by the bucket count, never the
        # row count.
        rt = F.when(F.col("__side") == 0, F.col(time_col))
        grid = (
            u.where(F.col("__tb").isNotNull())
            .groupBy(*key_cols, "__tb")
            .agg(F.max_by("__snap", rt).alias("__bsnap"))
        )
        w2 = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = grid.select(
            *key_cols,
            "__tb",
            F.last("__bsnap", ignorenulls=True).over(w2).alias("__carry"),
        )
        # NULL-time left rows have a NULL bucket: the equi-join misses
        # (carry NULL) and their (key, NULL) window slice holds no
        # snapshots — exactly the single-window semantics.
        u = u.withColumn("__snap", partial).join(
            carry, [*key_cols, "__tb"], "left"
        )
        u = u.withColumn("__snap", F.coalesce("__snap", "__carry")).drop(
            "__tb", "__carry"
        )
    out = u.where(F.col("__side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col("__snap")[v])
    # explicit projection: the bucketed path's equi-join moved its join
    # keys to the front; both plans must present the same schema
    return out.select(*left.columns, *value_cols)


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

    Bucket ids use integer ``div``, never float division: Spark's ``/``
    promotes to double, so int64 time domains past 2^53 (nanosecond
    epochs ~1.7e18) would round the point side and the interval side
    independently and silently drop matching pairs. ``div`` truncates
    toward zero — monotonic non-decreasing, so the one-bucket-meeting
    invariant (point's bucket ∈ [lo bucket, hi bucket]) still holds for
    any sign.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    if "__b" in left.columns or "__b" in right.columns:
        raise ValueError("reserved column name in input: __b")
    bucket = int(bucket)
    if bucket <= 0:
        raise ValueError("bucket must be a positive integer")

    def _div(col: str):
        return F.expr(f"CAST(`{col}` AS BIGINT) div {bucket}")

    right = right.where(F.col(lo_col) <= F.col(hi_col))
    lb = left.withColumn("__b", _div(t_col))
    rb = right.withColumn(
        "__b",
        F.explode(F.sequence(_div(lo_col), _div(hi_col))),
    )
    return (
        lb.join(rb, "__b")
        .where(F.col(t_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__b")
    )
