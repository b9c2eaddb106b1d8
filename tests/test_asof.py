"""As-of (point-in-time) join: union + ordered carry-forward."""

import random

import pytest
from pyspark.sql import functions as F

from logparser_spark.operators.asof import asof_join


def test_asof_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 5),   # before any snapshot -> NULL
            (2, "a", 10),  # exactly at snapshot t=10 -> 100
            (3, "a", 14),  # between 10 and 20 -> 100
            (4, "a", 25),  # after 20 -> 200
            (5, "b", 50),  # other key, after its only snapshot -> 900
            (6, "c", 7),   # key with no snapshots at all -> NULL
        ],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 20, 200), ("b", 1, 900)],
        "k string, t long, snap long",
    )
    out = {r["event_id"]: r["snap"] for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()}
    assert out == {1: None, 2: 100, 3: 100, 4: 200, 5: 900, 6: None}


def test_asof_matches_naive_model(spark):
    rng = random.Random(23)
    left_rows = [(i, rng.randrange(4), rng.randrange(1000)) for i in range(400)]
    # distinct (k, t) snapshots with value derived from (k, t)
    snap_kt = {(rng.randrange(4), rng.randrange(1000)) for _ in range(60)}
    right_rows = [(k, t, 1000 * k + t) for k, t in snap_kt]
    left = spark.createDataFrame(left_rows, "event_id long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, t long, snap long")
    got = {
        r["event_id"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()
    }
    for i, k, t in left_rows:
        cand = [(rt, v) for rk, rt, v in right_rows if rk == k and rt <= t]
        exp = max(cand)[1] if cand else None
        assert got[i] == exp, (i, k, t)


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, 1, 1)], "event_id long, k long, snap long")
    with pytest.raises(ValueError):
        asof_join(df, df, ["k"], "snap", ["snap"])


def test_asof_preserves_left_rows_and_schema(spark):
    left = spark.createDataFrame(
        [(i, i % 2, i, f"x{i}") for i in range(100)],
        "event_id long, k long, t long, payload string",
    )
    right = spark.createDataFrame([(0, 10, 7)], "k long, t long, snap long")
    out = asof_join(left, right, ["k"], "t", ["snap"])
    assert out.count() == 100
    assert out.columns == ["event_id", "k", "t", "payload", "snap"]
    # left payload untouched
    assert out.where("payload = 'x3'").count() == 1


def test_asof_bucketed_equals_single_window(spark):
    """Skew-safe two-phase plan is a pure re-partitioning: identical
    results at every bucket width, including widths smaller than snapshot
    gaps (carry-in crosses many empty buckets) and a 90%-hot key."""
    rng = random.Random(41)
    # key 7 is hot: 90% of events
    left_rows = [
        (i, 7 if rng.random() < 0.9 else rng.randrange(4), rng.randrange(1000))
        for i in range(500)
    ]
    snap_kt = {(rng.randrange(8), rng.randrange(1000)) for _ in range(50)}
    right_rows = [(k, t, 1000 * k + t) for k, t in snap_kt]
    left = spark.createDataFrame(left_rows, "event_id long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, t long, snap long")
    base = {
        r["event_id"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()
    }
    for bucket in (7, 100, 5000):
        got = {
            r["event_id"]: r["snap"]
            for r in asof_join(
                left, right, ["k"], "t", ["snap"], time_bucket=bucket
            ).collect()
        }
        assert got == base, bucket


def test_asof_bucketed_null_edges(spark):
    left = spark.createDataFrame(
        [(1, None, 50), (2, 1, None), (3, 1, 50), (4, 1, 5)],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(None, 10, 111), (1, None, 222), (1, 40, 333)],
        "k long, t long, snap long",
    )
    out = {
        r["event_id"]: r["snap"]
        for r in asof_join(
            left, right, ["k"], "t", ["snap"], time_bucket=8
        ).collect()
    }
    assert out == {1: None, 2: None, 3: 333, 4: None}


def test_asof_bucketed_no_single_key_funnel(spark):
    """The data-sized window must partition by (key, bucket), never by
    key alone — that's the whole point of the skew-safe plan."""
    left = spark.createDataFrame([(1, 1, 25)], "event_id long, k long, t long")
    right = spark.createDataFrame([(1, 10, 100)], "k long, t long, snap long")
    out = asof_join(left, right, ["k"], "t", ["snap"], time_bucket=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window that runs over the unioned DATA (orders by the time
    # column) must include __tb in its partition spec; the only window
    # partitioned by the key alone is phase 2's, which orders by __tb
    # and carries one row per (key, bucket)
    windows = re.findall(r"Window \[.*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert windows, plan
    saw_data_window = False
    for part, order in windows:
        if "t#" in order:
            saw_data_window = True
            assert "__tb#" in part, plan
        else:
            assert "__tb#" in order, plan  # phase-2 carry window
    assert saw_data_window, plan


def test_asof_bucketed_schema_matches_default(spark):
    left = spark.createDataFrame(
        [(1, 1, 25, "p")], "event_id long, k long, t long, payload string"
    )
    right = spark.createDataFrame([(1, 10, 100)], "k long, t long, snap long")
    a = asof_join(left, right, ["k"], "t", ["snap"])
    b = asof_join(left, right, ["k"], "t", ["snap"], time_bucket=3600)
    assert a.columns == b.columns == ["event_id", "k", "t", "payload", "snap"]


# ------------------------------------------------------------ range join


def test_range_join_matches_naive(spark):
    import random

    from logparser_spark.operators.asof import range_join

    rng = random.Random(31)
    pts = [(i, rng.randrange(10_000)) for i in range(300)]
    ivs = []
    for j in range(40):
        lo = rng.randrange(10_000)
        ivs.append((1000 + j, lo, lo + rng.randrange(0, 900)))
    left = spark.createDataFrame(pts, "event_id long, t long")
    right = spark.createDataFrame(ivs, "iv long, lo long, hi long")
    for bucket in (64, 250, 5000):
        got = sorted(
            (r["event_id"], r["iv"])
            for r in range_join(left, right, "t", "lo", "hi", bucket).collect()
        )
        exp = sorted(
            (i, j)
            for i, t in pts
            for j, lo, hi in ivs
            if lo <= t <= hi
        )
        assert got == exp, bucket  # exact and duplicate-free at any width


def test_range_join_plan_is_equi_join(spark):
    from logparser_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 5)], "event_id long, t long")
    right = spark.createDataFrame([(2, 0, 10)], "iv long, lo long, hi long")
    plan = (
        range_join(left, right, "t", "lo", "hi", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_rejects_collision(spark):
    from logparser_spark.operators.asof import range_join

    df = spark.createDataFrame([(1, 2, 3)], "t long, lo long, hi long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(df, df, "t", "lo", "hi", 10)


def test_asof_carries_whole_snapshot_not_per_column(spark):
    # the latest snapshot wins WHOLESALE: its NULL field stays NULL
    # (never resurrect an older snapshot's value), and multi-column
    # output never mixes two snapshots
    left = spark.createDataFrame([(1, 1, 25)], "event_id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 100, 5), (1, 20, None, 7)],
        "k long, t long, price long, qty long",
    )
    r = asof_join(left, right, ["k"], "t", ["price", "qty"]).collect()[0]
    assert r["price"] is None and r["qty"] == 7


def test_asof_null_keys_and_times_match_nothing(spark):
    left = spark.createDataFrame(
        [(1, None, 50), (2, 1, None), (3, 1, 50)],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(None, 10, 111), (1, None, 222), (1, 40, 333)],
        "k long, t long, snap long",
    )
    out = {r["event_id"]: r["snap"] for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()}
    # NULL-key left row and NULL-time left row match nothing; the
    # NULL-key / NULL-time snapshots are dropped entirely
    assert out == {1: None, 2: None, 3: 333}


def test_range_join_exact_past_2p53_nanosecond_epochs(spark):
    """int64 time domains beyond 2^53 (nanosecond epochs ~1.7e18):
    bucket ids must come from integer div — float division rounds the
    point and interval sides independently at bucket edges and silently
    drops matching pairs (e.g. t=1699999199999999999 true-buckets to
    472221 but float-buckets to 472222). Pin exactness against a plain
    BETWEEN model on edge-straddling values."""
    from logparser_spark.operators.asof import range_join

    b = 3600 * 1_000_000_000  # 1h of nanos
    edge = (1_700_000_000_000_000_000 // b) * b
    pts = []
    for e in (edge - b, edge, edge + b):
        pts += [e - 2, e - 1, e, e + 1, e + 2]
    pts = [(i, t) for i, t in enumerate(pts)]
    ivs = [
        (100, edge - b, edge - 1),          # exactly one bucket
        (101, edge - 2, edge + 1),          # straddles the edge
        (102, edge + 1, edge + 1),          # degenerate single-nano
        (103, edge - b - 1, edge + b + 1),  # three buckets
    ]
    left = spark.createDataFrame(pts, "event_id long, t long")
    right = spark.createDataFrame(ivs, "iv long, lo long, hi long")
    got = sorted(
        (r["event_id"], r["iv"])
        for r in range_join(left, right, "t", "lo", "hi", b).collect()
    )
    exp = sorted(
        (i, j) for i, t in pts for j, lo, hi in ivs if lo <= t <= hi
    )
    assert got == exp


def test_asof_bucketed_exact_past_2p53(spark):
    """Same exactness pin for the bucketed as-of: nanosecond-epoch
    times, bucket edges straddled; result equals the single-window
    plan (which never buckets)."""
    b = 3600 * 1_000_000_000
    edge = (1_700_000_000_000_000_000 // b) * b
    left_rows = [
        (i, 1, t)
        for i, t in enumerate(
            [edge - b - 1, edge - 2, edge - 1, edge, edge + 1, edge + b]
        )
    ]
    right_rows = [(1, edge - 1, 10), (1, edge, 20), (1, edge + b, 30)]
    left = spark.createDataFrame(left_rows, "event_id long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, t long, snap long")
    base = {
        r["event_id"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()
    }
    got = {
        r["event_id"]: r["snap"]
        for r in asof_join(
            left, right, ["k"], "t", ["snap"], time_bucket=b
        ).collect()
    }
    assert got == base == {0: None, 1: None, 2: 10, 3: 20, 4: 20, 5: 30}


def test_range_join_inverted_interval_matches_nothing(spark):
    from logparser_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 5)], "event_id long, t long")
    right = spark.createDataFrame(
        [(9, 1_700_000_000, 0), (8, 0, 10)], "iv long, lo long, hi long"
    )
    rows = range_join(left, right, "t", "lo", "hi", 3600).collect()
    assert [(r["event_id"], r["iv"]) for r in rows] == [(1, 8)]


def test_asof_auto_plan_select(spark):
    """time_bucket='auto' must (a) return oracle-identical results in
    both regimes and (b) actually switch plans at the threshold: a tiny
    auto_rows_per_task forces the bucketed two-phase plan (visible as
    the phase-2 equi-join in the physical plan), a huge one keeps the
    single window."""
    rng = random.Random(77)
    left_rows = [(i, rng.randrange(3), rng.randrange(500)) for i in range(300)]
    snap_kt = {(rng.randrange(3), rng.randrange(500)) for _ in range(40)}
    right_rows = [(k, t, 1000 * k + t) for k, t in snap_kt]
    left = spark.createDataFrame(left_rows, "event_id long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, t long, snap long")
    base = {
        r["event_id"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t", ["snap"]).collect()
    }
    forced = asof_join(
        left, right, ["k"], "t", ["snap"],
        time_bucket="auto", auto_rows_per_task=10,
    )
    relaxed = asof_join(
        left, right, ["k"], "t", ["snap"],
        time_bucket="auto", auto_rows_per_task=10_000_000,
    )
    assert {r["event_id"]: r["snap"] for r in forced.collect()} == base
    assert {r["event_id"]: r["snap"] for r in relaxed.collect()} == base
    # plan witness: the bucketed path joins the carry grid back in
    assert "__carry" in forced._jdf.queryExecution().analyzed().toString()
    assert "__carry" not in relaxed._jdf.queryExecution().analyzed().toString()


def test_asof_auto_rejects_bad_string(spark):
    df = spark.createDataFrame([(1, 1, 1)], "event_id long, k long, t long")
    right = spark.createDataFrame([(1, 1, 5)], "k long, t long, snap long")
    with pytest.raises(ValueError, match="auto"):
        asof_join(df, right, ["k"], "t", ["snap"], time_bucket="daily")


def test_asof_auto_null_times_degrade_to_single_window(spark):
    """A hot key whose time values are all NULL must pick the
    single-window plan, not crash on int(None) in the skew probe."""
    left = spark.createDataFrame(
        [(i, 1, None) for i in range(20)], "event_id long, k long, t long"
    )
    right = spark.createDataFrame([(1, 5, 99)], "k long, t long, snap long")
    base = asof_join(left, right, ["k"], "t", ["snap"]).collect()
    auto = asof_join(
        left, right, ["k"], "t", ["snap"],
        time_bucket="auto", auto_rows_per_task=2,
    ).collect()
    key = lambda rows: sorted((r["event_id"], r["snap"]) for r in rows)  # noqa: E731
    assert key(auto) == key(base)
