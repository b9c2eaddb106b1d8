"""Token-payload operators: rolling window hash kernel, corpus dup-span
stats, within-doc repetition, histogram-exact quantiles."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators import tokenstats
from logparser_spark.operators.tokenstats import (
    _B,
    _MASK,
    _window_hash_batch,
    doc_repetition,
    dup_span_stats,
    hist_quantiles,
)


def naive_window_hash(tokens, k):
    out = []
    for i in range(max(len(tokens) - k + 1, 0)):
        h = 0
        for j in range(k):
            h = (h + tokens[i + j] * pow(_B, j, 1 << 64)) & _MASK
        out.append(h - (1 << 64) if h >= 1 << 63 else h)
    return out


def test_kernel_matches_naive_polynomial():
    rng = np.random.default_rng(7)
    rows = [
        rng.integers(0, 1 << 20, size=n).astype(np.int32)
        for n in [0, 1, 3, 4, 5, 17, 100]
    ]
    rows.append(None)
    got = _window_hash_batch(pd.Series(rows, dtype=object), k=4)
    for r, g in zip(rows, got):
        exp = naive_window_hash([] if r is None else [int(x) for x in r], 4)
        assert list(g) == exp


def test_kernel_equal_windows_equal_hashes():
    # identical windows at different positions and in different rows
    # must collide; differing windows must not (on this data)
    a = [5, 6, 7, 8, 1, 5, 6, 7, 8]
    b = [9, 9, 5, 6, 7, 8]
    ha, hb = _window_hash_batch(pd.Series([a, b]), k=4)
    assert ha[0] == ha[5] == hb[2]
    assert len(set(list(ha) + list(hb))) == len(ha) + len(hb) - 2


def test_dup_span_stats_tiny(spark):
    # doc 1 shares its only 3-window with doc 2's first window; doc 3 is
    # unique; doc 4 too short for any window
    df = spark.createDataFrame(
        [
            (1, [1, 2, 3]),
            (2, [1, 2, 3, 4]),
            (3, [7, 8, 9]),
            (4, [1]),
        ],
        "doc_id long, tokens array<int>",
    )
    rows = {
        r["doc_id"]: r.asDict() for r in dup_span_stats(df, k=3).collect()
    }
    assert rows[1] == {
        "doc_id": 1, "n_windows": 1, "dup_windows": 1, "dup_frac_x1000": 1000,
    }
    assert rows[2]["n_windows"] == 2 and rows[2]["dup_windows"] == 1
    assert rows[2]["dup_frac_x1000"] == 500
    assert rows[3]["dup_windows"] == 0
    assert rows[4] == {
        "doc_id": 4, "n_windows": 0, "dup_windows": 0, "dup_frac_x1000": 0,
    }


def test_doc_repetition_row_local_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 1, 2, 1, 2]), (2, [1, 2, 3, 4]), (3, [])],
        "doc_id long, tokens array<int>",
    )
    out = doc_repetition(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    # [1,2],[2,1],[1,2],[2,1],[1,2] -> 5 windows, 2 distinct
    assert rows[1]["n_windows"] == 5 and rows[1]["dup_excess"] == 3
    assert rows[1]["rep_frac_x1000"] == 600
    assert rows[2]["dup_excess"] == 0
    assert rows[3] == {
        "doc_id": 3, "n_windows": 0, "dup_excess": 0, "rep_frac_x1000": 0,
    }


def test_dup_span_kernel_materialized_once(spark):
    # the exploded (doc_id, h) positions feed two consumers; the
    # operator must persist them so the tokenize+hash kernel is not
    # re-executed per consumer (exchange reuse does not fire across a
    # nondeterministic UDF — verified: without persist the plan holds
    # two ArrowEvalPython subtrees with distinct expr ids)
    df = spark.createDataFrame(
        [(i, [i % 3, (i + 1) % 3, 2, 2, 2]) for i in range(20)],
        "doc_id long, tokens array<int>",
    )
    # (order matters: once the materialized variant registers its
    # cache, the CacheManager substitutes the cached subtree into ANY
    # later matching plan, including the materialize=False one)
    nomat = dup_span_stats(df, k=3, materialize=False)
    assert "InMemoryTableScan" not in (
        nomat._jdf.queryExecution().executedPlan().toString()
    )
    out = dup_span_stats(df, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan


def exact_quantile_x1000(values, q_num):
    vs = sorted(values)
    t = q_num * (len(vs) - 1)
    lo, rem = divmod(t, 1000)
    v_hi = vs[lo + 1] if rem else vs[lo]
    return 1000 * vs[lo] + rem * (v_hi - vs[lo])


@pytest.mark.parametrize("seed", [0, 1])
def test_hist_quantiles_matches_sorted_definition(spark, seed):
    rng = np.random.default_rng(seed)
    rows = [
        ("a", int(v)) for v in rng.integers(10, 300, size=257)
    ] + [("b", int(v)) for v in rng.integers(0, 5, size=64)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        (r["g"], r["q_num"]): r["q_x1000"]
        for r in hist_quantiles(df, "v", ["g"]).collect()
    }
    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        for qn in (500, 900, 990):
            assert got[(g, qn)] == exact_quantile_x1000(vals, qn)
            # and the integer formula IS quantile_cont (linear interp)
            frac_q = Fraction(qn, 1000)
            pos = frac_q * (len(vals) - 1)
            svals = sorted(vals)
            lo = int(pos)
            interp = svals[lo] + (pos - lo) * (
                svals[min(lo + 1, len(svals) - 1)] - svals[lo]
            )
            assert got[(g, qn)] == int(interp * 1000)


def test_hist_quantiles_single_value_group(spark):
    df = spark.createDataFrame([("a", 42)], "g string, v int")
    out = hist_quantiles(df, "v", ["g"]).collect()
    assert {r["q_x1000"] for r in out} == {42000}


def test_window_hash_udf_marked_nondeterministic():
    # the UDF must be nondeterministic so Catalyst never duplicates
    # the kernel below an exchange (see functions/parse.py)
    assert tokenstats.window_hash_udf(4).deterministic is False


def test_dup_span_report_equals_separate_operators(spark):
    """The shared-DAG report must equal dup_span_stats ⋈ dup_span_removal
    column for column (it exists purely to run the detection pass once)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.randrange(5) for _ in range(rng.randrange(0, 12))])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    rep = {r["doc_id"]: r.asDict() for r in tokenstats.dup_span_report(df, k=3).collect()}
    st = {r["doc_id"]: r.asDict() for r in dup_span_stats(df, k=3).collect()}
    rem = {r["doc_id"]: r.asDict() for r in tokenstats.dup_span_removal(df, k=3).collect()}
    assert set(rep) == set(st) == set(rem)
    for i in rep:
        for c in ("n_windows", "dup_windows", "dup_frac_x1000"):
            assert rep[i][c] == st[i][c], (i, c)
        for c in ("n_tok", "n_removed", "n_kept"):
            assert rep[i][c] == rem[i][c], (i, c)


def test_dup_span_removal_interval_union(spark):
    # doc 1: [5,6,7,8,5,6,7,8] k=3 -> windows at 0..5; (5,6,7) dups at
    # 0,4; (6,7,8) dups at 1,5 -> dup starts {0,1,4,5}, union
    # [0,4)+[4,8) = 8 tokens removed (the WHOLE doc: overlapping spans
    # merge, no double count)
    # doc 2: shares window (5,6,7) once at start 2 -> 3 removed
    # doc 3: unique content -> 0 removed; doc 4: too short -> 0 windows
    df = spark.createDataFrame(
        [
            (1, [5, 6, 7, 8, 5, 6, 7, 8]),
            (2, [1, 2, 5, 6, 7, 9]),
            (3, [30, 31, 32, 33]),
            (4, [5]),
        ],
        "doc_id long, tokens array<int>",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in tokenstats.dup_span_removal(df, k=3).collect()
    }
    assert rows[1] == {"doc_id": 1, "n_tok": 8, "n_removed": 8, "n_kept": 0}
    assert rows[2] == {"doc_id": 2, "n_tok": 6, "n_removed": 3, "n_kept": 3}
    assert rows[3]["n_removed"] == 0 and rows[3]["n_kept"] == 4
    assert rows[4] == {"doc_id": 4, "n_tok": 1, "n_removed": 0, "n_kept": 1}


def test_dup_span_removal_consistent_with_stats(spark):
    import random

    rng = random.Random(19)
    rows = [
        (i, [rng.randrange(4) for _ in range(rng.randrange(0, 30))])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    rem = {r["doc_id"]: r for r in tokenstats.dup_span_removal(df, k=4).collect()}
    st = {r["doc_id"]: r for r in dup_span_stats(df, k=4).collect()}
    for i, toks in rows:
        assert 0 <= rem[i]["n_removed"] <= rem[i]["n_tok"] == len(toks)
        # removal covers at least one position per dup window and never
        # exceeds k per dup window
        if st[i]["dup_windows"] == 0:
            assert rem[i]["n_removed"] == 0
        else:
            assert st[i]["dup_windows"] <= rem[i]["n_removed"] <= 4 * st[i]["dup_windows"] + 3


def test_hist_quantiles_domain_guard(spark):
    """A continuous-ish value column must fail fast (never OOM the
    collect_list); a bounded domain passes; None skips the probe."""
    import pytest as _pytest

    from logparser_spark.operators.tokenstats import (
        DomainTooLargeError,
        hist_quantiles,
    )

    df = spark.range(500).selectExpr("id % 3 AS g", "id AS v")
    with _pytest.raises(DomainTooLargeError):
        hist_quantiles(df, "v", ["g"], max_domain=100).collect()
    ok = hist_quantiles(df, "v", ["g"], max_domain=1000)
    assert ok.count() == 9  # 3 groups x 3 quantiles
    ok2 = hist_quantiles(df, "v", ["g"], max_domain=None)
    assert sorted(map(tuple, ok2.collect())) == sorted(map(tuple, ok.collect()))


def test_approx_quantiles_rank_bound_and_shape(spark):
    """The sketch companion honors its contract: same output shape as
    hist_quantiles, every returned value is a MEMBER of the input whose
    rank is within the GK bound (q/1000 +- 1/accuracy, +-1 index slack
    for boundary ties) of the target — this is what lets a caller swap
    it in for a DomainTooLargeError domain at 10^12 rows."""
    from logparser_spark.operators.tokenstats import approx_quantiles

    rng = np.random.default_rng(7)
    rows = [("a", int(v)) for v in rng.integers(0, 10**9, size=2000)] + [
        ("b", int(v)) for v in rng.integers(-50, 50, size=333)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    accuracy = 10_000
    out = approx_quantiles(df, "v", ["g"], accuracy=accuracy).collect()
    assert set(out[0].asDict().keys()) == {"g", "q_num", "q_x1000"}
    assert sorted(r["q_num"] for r in out if r["g"] == "a") == [500, 900, 990]
    by_group = {"a": sorted(v for g, v in rows if g == "a"),
                "b": sorted(v for g, v in rows if g == "b")}
    import bisect

    for r in out:
        vs = by_group[r["g"]]
        n = len(vs)
        assert r["q_x1000"] % 1000 == 0  # member * 1000, no interpolation
        v = r["q_x1000"] // 1000
        lo_rank = bisect.bisect_left(vs, v)
        hi_rank = bisect.bisect_right(vs, v) - 1
        assert lo_rank <= hi_rank, "returned value must be an input member"
        target = r["q_num"] / 1000 * (n - 1)
        slack = n / accuracy + 1
        assert lo_rank - slack <= target <= hi_rank + slack, (
            r, target, lo_rank, hi_rank)


def test_null_tokens_treated_as_empty(spark):
    """A NULL tokens array must behave exactly like an empty one
    (n_tok/n_kept 0, never NULL) so the operator family agrees on the
    same row — token_histogram and rarity_score already do this."""
    df = spark.createDataFrame(
        [(1, None), (2, [7, 7, 7, 7])], "doc_id long, tokens array<int>"
    )
    rem = {r["doc_id"]: r for r in tokenstats.dup_span_removal(df, k=2).collect()}
    assert (rem[1]["n_tok"], rem[1]["n_removed"], rem[1]["n_kept"]) == (0, 0, 0)
    assert rem[2]["n_tok"] == 4
    rep = {r["doc_id"]: r for r in tokenstats.dup_span_report(df, k=2).collect()}
    assert (rep[1]["n_tok"], rep[1]["n_removed"], rep[1]["n_kept"]) == (0, 0, 0)
    assert rep[1]["n_windows"] == 0


def _naive_rewrite(toks, k, corpus_windows):
    """Python model: drop every position covered by a window whose
    k-tuple occurs >1 time in the whole corpus."""
    n = len(toks)
    covered = [False] * n
    for s in range(n - k + 1):
        if corpus_windows[tuple(toks[s : s + k])] > 1:
            for p in range(s, s + k):
                covered[p] = True
    return [t for t, c in zip(toks, covered) if not c]


def test_dup_span_rewrite_matches_python_model(spark):
    import random
    from collections import Counter

    rng = random.Random(23)
    k = 3
    rows = [
        (i, [rng.randrange(4) for _ in range(rng.randrange(0, 16))])
        for i in range(80)
    ]
    wins = Counter()
    for _, toks in rows:
        for s in range(len(toks) - k + 1):
            wins[tuple(toks[s : s + k])] += 1
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {
        r["doc_id"]: r.asDict()
        for r in tokenstats.dup_span_rewrite(df, k=k).collect()
    }
    assert set(got) == {i for i, _ in rows}
    for i, toks in rows:
        want = _naive_rewrite(toks, k, wins)
        assert got[i]["tokens_clean"] == want, i
        assert got[i]["n_tok"] == len(toks)
        assert got[i]["n_kept"] == len(want)


def test_dup_span_rewrite_consistent_with_removal_accounting(spark):
    """n_kept from the materialized rewrite must equal the interval-
    union accounting's n_kept on every doc (two independent plans)."""
    import random

    rng = random.Random(31)
    rows = [
        (i, [rng.randrange(5) for _ in range(rng.randrange(0, 25))])
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    rw = {r["doc_id"]: r for r in tokenstats.dup_span_rewrite(df, k=4).collect()}
    rem = {r["doc_id"]: r for r in tokenstats.dup_span_removal(df, k=4).collect()}
    for i, _ in rows:
        assert rw[i]["n_kept"] == rem[i]["n_kept"], i
        assert rw[i]["n_tok"] == rem[i]["n_tok"], i


def test_dup_span_rewrite_edges(spark):
    """No-dup docs pass through unchanged; a fully-duplicated doc
    empties; short/NULL docs survive untouched."""
    df = spark.createDataFrame(
        [
            (1, [5, 6, 7, 8, 5, 6, 7, 8]),   # fully covered at k=3
            (2, [30, 31, 32, 33]),           # unique -> unchanged
            (3, [9]),                        # shorter than k -> unchanged
            (4, None),                       # NULL -> empty, not NULL
        ],
        "doc_id long, tokens array<int>",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in tokenstats.dup_span_rewrite(df, k=3).collect()
    }
    assert got[1]["tokens_clean"] == [] and got[1]["n_kept"] == 0
    assert got[2]["tokens_clean"] == [30, 31, 32, 33]
    assert got[3]["tokens_clean"] == [9]
    assert got[4]["tokens_clean"] == [] and got[4]["n_tok"] == 0


def test_report_rewrite_witness_agrees_with_materialization(spark):
    """kept_sum / kept_hash in the report must equal the same values
    computed from the materialized cleaned arrays."""
    import hashlib
    import random

    rng = random.Random(47)
    rows = [
        (i, [rng.randrange(4) for _ in range(rng.randrange(0, 20))])
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    rep = {
        r["doc_id"]: r.asDict()
        for r in tokenstats.dup_span_report(df, k=3, rewrite_witness=True).collect()
    }
    rw = {
        r["doc_id"]: r.asDict()
        for r in tokenstats.dup_span_rewrite(df, k=3).collect()
    }
    for i, _ in rows:
        clean = rw[i]["tokens_clean"]
        assert rep[i]["kept_sum"] == sum(clean), i
        want_hash = hashlib.md5(
            ",".join(map(str, clean)).encode()
        ).hexdigest()
        assert rep[i]["kept_hash"] == want_hash, i
        assert rep[i]["n_kept"] == len(clean), i


# ---------------------------------------------------------------------
# collocations (PMI)
# ---------------------------------------------------------------------


def _py_collocations(token_lists, min_count, k, scale=10**6):
    from collections import Counter

    cab = Counter()
    for toks in token_lists:
        if toks is None:
            continue
        for x, y in zip(toks, toks[1:]):
            cab[(x, y)] += 1
    n = sum(cab.values())
    ca = Counter()
    cb = Counter()
    for (x, y), c in cab.items():
        ca[x] += c
        cb[y] += c
    rows = [
        (x, y, c, ca[x], cb[y], (scale * n * c) // (ca[x] * cb[y]))
        for (x, y), c in cab.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


def test_collocations_match_python_model(spark):
    import random

    rng = random.Random(7)
    data = []
    for i in range(200):
        toks = [rng.randrange(20) for _ in range(rng.randrange(0, 30))]
        # plant a strong collocation: 13 is almost always followed by 17
        out = []
        for t in toks:
            out.append(t)
            if t == 13 and rng.random() < 0.9:
                out.append(17)
        data.append((i, out))
    data.append((998, None))
    data.append((999, []))
    df = spark.createDataFrame(data, "doc_id long, tokens array<int>")

    from logparser_spark.operators.tokenstats import collocations

    got = [tuple(r) for r in collocations(df, min_count=3, k=25).collect()]
    want = _py_collocations([t for _, t in data], min_count=3, k=25)
    assert got == want
    # the planted pair ranks above its unplanted shadow pairs
    planted = [r for r in got if (r[0], r[1]) == (13, 17)]
    assert planted, "planted collocation must clear min_count and top-k"


def test_collocations_min_count_and_overflow(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 1, 2, 1, 2, 3])], "doc_id long, tokens array<int>"
    )
    from logparser_spark.operators.tokenstats import collocations

    rows = collocations(df, min_count=3, k=10).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, 2)]
    with pytest.raises(ValueError, match="overflow"):
        collocations(df, min_count=1, k=10, scale=2**61)
    with pytest.raises(ValueError):
        collocations(df, min_count=0)


# ---------------------------------------------------------------------
# novelty curve
# ---------------------------------------------------------------------


def _py_novelty(rows, k, n_shards):
    max_id = max(i for i, _ in rows)
    shard_of = lambda i: min(n_shards - 1, i * n_shards // (max_id + 1))  # noqa: E731
    pos = {}  # shard -> positions
    first = {}  # window -> first shard (windows processed in shard order)
    for i, toks in sorted(rows):
        s = shard_of(i)
        for j in range(max(len(toks) - k + 1, 0)):
            w = tuple(toks[j : j + k])
            pos[s] = pos.get(s, 0) + 1
            if w not in first or first[w] > s:
                first[w] = min(first.get(w, s), s)
    new = {}
    for w, s in first.items():
        new[s] = new.get(s, 0) + 1
    out, cum = [], 0
    for s in sorted(pos):
        cum += new.get(s, 0)
        out.append((s, pos[s], new.get(s, 0), cum))
    return out


def test_novelty_curve_matches_python_model(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.randrange(6) for _ in range(rng.randrange(0, 15))])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    from logparser_spark.operators.tokenstats import novelty_curve

    got = [tuple(r) for r in novelty_curve(df, k=3, n_shards=5).collect()]
    assert got == _py_novelty(rows, k=3, n_shards=5)
    # novelty diminishes on a closed vocab: last shard adds fewer new
    # windows than the first
    assert got[-1][2] < got[0][2]


def test_novelty_curve_guards(spark):
    from logparser_spark.operators.tokenstats import novelty_curve

    empty = spark.createDataFrame([], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError, match="empty"):
        novelty_curve(empty, k=3)
    df = spark.createDataFrame([(0, [1, 2])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        novelty_curve(df, k=0)
