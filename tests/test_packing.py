"""Sequence packing (concat-and-chunk via distributed prefix sum) and
sliding-window chunking."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators import packing
from logparser_spark.operators.packing import (
    _sliding_chunk_batch,
    chunk_sliding,
    pack_assignments,
    pack_chunk_stats,
)


def naive_pack_stats(docs, seq_len):
    """docs: {doc_id: n_tok}; returns {chunk_id: (n_docs, n_tokens, first_doc)}."""
    out = {}
    start = 0
    for doc_id in sorted(docs):
        n = docs[doc_id]
        if n <= 0:
            continue
        for c in range(start // seq_len, (start + n - 1) // seq_len + 1):
            lo = max(start, c * seq_len)
            hi = min(start + n - 1, (c + 1) * seq_len - 1)
            nd, nt, fd = out.get(c, (0, 0, None))
            out[c] = (nd + 1, nt + hi - lo + 1, doc_id if fd is None else min(fd, doc_id))
        start += n
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_pack_chunk_stats_matches_naive(spark, n_parts):
    rng = np.random.default_rng(11)
    docs = {int(i): int(rng.integers(0, 40)) for i in range(200)}
    df = spark.createDataFrame(
        [(i, n) for i, n in docs.items()], "doc_id long, n long"
    ).repartition(5)
    got = {
        r["chunk_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"])
        for r in pack_chunk_stats(
            df, seq_len=64, len_col="n", n_parts=n_parts
        ).collect()
    }
    assert got == naive_pack_stats(docs, 64)


def test_pack_total_tokens_conserved(spark):
    rng = np.random.default_rng(3)
    docs = [(int(i), int(rng.integers(1, 500))) for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, n long")
    stats = pack_chunk_stats(df, seq_len=128, len_col="n", n_parts=4).collect()
    assert sum(r["n_tokens"] for r in stats) == sum(n for _, n in docs)
    # every chunk except the last is exactly full
    by_id = sorted(stats, key=lambda r: r["chunk_id"])
    assert all(r["n_tokens"] == 128 for r in by_id[:-1])
    assert [r["chunk_id"] for r in by_id] == list(range(len(by_id)))


def test_pack_assignments_from_token_arrays(spark):
    df = spark.createDataFrame(
        [(1, [7] * 5), (2, [9] * 10), (3, []), (4, [1])],
        "doc_id long, tokens array<int>",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"]) for r in pack_assignments(df, 8).collect()
    )
    # offsets: d1 [0,5) -> chunk 0; d2 [5,15) -> chunks 0,1; d3 empty; d4 [15,16) -> 1
    assert rows == [(1, 0), (2, 0), (2, 1), (4, 1)]


@pytest.mark.parametrize("n_parts", [1, 4])
def test_pack_materialize_matches_naive_concat(spark, n_parts):
    rng = np.random.default_rng(5)
    docs = {
        int(i): [int(t) for t in rng.integers(0, 1000, rng.integers(0, 30))]
        for i in range(150)
    }
    flat = [t for i in sorted(docs) for t in docs[i]]
    L = 64
    exp = {
        c: flat[c * L : (c + 1) * L]
        for c in range((len(flat) + L - 1) // L)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, tokens array<int>"
    ).repartition(7)
    got = {
        r["chunk_id"]: list(r["tokens"])
        for r in packing.pack_materialize(df, L, n_parts=n_parts).collect()
    }
    assert got == exp
    out = packing.pack_materialize(df, L, n_parts=n_parts)
    assert all(
        r["n_tokens"] == len(exp[r["chunk_id"]]) for r in out.collect()
    )


def naive_sliding(tokens, max_len, stride):
    m = len(tokens)
    if m == 0:
        return []
    out = []
    i = 0
    while True:
        off = i * stride
        ln = min(max_len, m - off)
        out.append((i, off, ln, sum(tokens[off : off + ln])))
        if off + max_len >= m:
            break
        i += 1
    return out


def test_sliding_kernel_matches_naive():
    rng = np.random.default_rng(5)
    rows = [list(map(int, rng.integers(0, 100, size=n))) for n in [0, 1, 7, 8, 9, 40]]
    rows.append(None)
    offs, lens, sums = _sliding_chunk_batch(pd.Series(rows, dtype=object), 8, 5)
    for r, o, l, s in zip(rows, offs, lens, sums):
        exp = naive_sliding(r or [], 8, 5)
        assert [tuple(t) for t in zip(o, l, s)] == [
            (off, ln, sm) for _, off, ln, sm in exp
        ]


def test_chunk_sliding_end_to_end_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, list(range(10))), (2, [5, 5]), (3, [])],
        "doc_id long, tokens array<int>",
    )
    out = chunk_sliding(df, max_len=4, overlap=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["off"], r["n_tokens"], r["tok_sum"])
        for r in out.collect()
    )
    # doc1 len 10, stride 3: offs 0,3,6 cover to 9 (6+4>=10) -> 3 chunks
    assert rows == [
        (1, 0, 0, 4, 0 + 1 + 2 + 3),
        (1, 1, 3, 4, 3 + 4 + 5 + 6),
        (1, 2, 6, 4, 6 + 7 + 8 + 9),
        (2, 0, 0, 2, 10),
    ]


def test_chunk_sliding_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, [1])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        chunk_sliding(df, max_len=4, overlap=4)


def test_sliding_udf_marked_nondeterministic():
    assert packing.sliding_chunk_udf(4, 3).deterministic is False


def test_pack_assignments_persist_false_deterministic(spark):
    """persist=False routes through the re-execution-safe plan (pid is
    a pure function of doc_id, prefix sum per bucket window) — must
    equal the persisted range-partition path exactly, including on a
    sparse/skewed doc_id space and an empty input."""
    rng = np.random.default_rng(7)
    docs = {int(i * 97 + 5): int(rng.integers(0, 40)) for i in range(200)}
    df = spark.createDataFrame(
        [(i, n) for i, n in docs.items()], "doc_id long, n long"
    ).repartition(5)
    a = pack_assignments(df, 64, len_col="n", n_parts=7, persist=True)
    b = pack_assignments(df, 64, len_col="n", n_parts=7, persist=False)
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    one = spark.createDataFrame([(42, 10)], "doc_id long, n long")
    got = pack_assignments(one, 4, len_col="n", persist=False).collect()
    assert sorted(r["chunk_id"] for r in got) == [0, 1, 2]

    empty = spark.createDataFrame([], "doc_id long, n long")
    out = pack_assignments(empty, 64, len_col="n", n_parts=3, persist=False)
    assert out.count() == 0 and out.columns == a.columns
