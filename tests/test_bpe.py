"""Distributed BPE training (operators/bpe.py) vs an independent
pure-python reference trainer."""

from __future__ import annotations

import numpy as np
import pytest

from logparser_spark.operators import bpe


# -- independent reference ---------------------------------------------


def _py_merge(seq, left, right, new_id):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _py_train(rows, n_merges, new_id_start, min_count=2):
    rows = {i: list(t) for i, t in rows}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[int, int], int] = {}
        for t in rows.values():
            for p in zip(t, t[1:]):
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        # max count, ties toward smallest packed code = smallest (l, r)
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], (kv[0][0] << 32) | kv[0][1])
        )
        if c < min_count:
            break
        new_id = new_id_start + step
        merges.append((left, right, new_id, c))
        rows = {i: _py_merge(t, left, right, new_id) for i, t in rows.items()}
    return merges, rows


CORPUS = [
    (0, [1, 2, 1, 2, 1, 2, 3]),
    (1, [1, 2, 3, 1, 2, 3]),
    (2, [3, 3, 3, 3, 3]),      # overlap case: (3,3) merges greedily
    (3, [2, 1, 2, 1]),
    (4, [7]),                  # too short for any pair
    (5, [1, 2, 1, 2]),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, tokens array<int>")


def test_merge_pair_batch_overlap_semantics():
    a = np.array([3, 3, 3, 3, 3], dtype=np.int64)
    assert bpe.merge_pair_batch(a, 3, 3, 9).tolist() == [9, 9, 3]
    b = np.array([1, 2, 1, 2], dtype=np.int64)
    assert bpe.merge_pair_batch(b, 1, 2, 9).tolist() == [9, 9]
    assert bpe.merge_pair_batch(np.array([5], dtype=np.int64), 1, 2, 9).tolist() == [5]


def test_train_matches_python_reference(spark, corpus_df):
    merges, merged = bpe.bpe_train(corpus_df, n_merges=4, new_id_start=100)
    py_merges, py_rows = _py_train(CORPUS, 4, 100)
    assert merges == py_merges
    got = {r["doc_id"]: list(r["tokens"]) for r in merged.collect()}
    assert got == py_rows


def test_apply_reproduces_training_output(spark, corpus_df):
    merges, merged = bpe.bpe_train(corpus_df, n_merges=3, new_id_start=100)
    reapplied = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe.bpe_apply(corpus_df, merges).collect()
    }
    trained = {r["doc_id"]: list(r["tokens"]) for r in merged.collect()}
    assert reapplied == trained


def test_repartition_invariance(spark, corpus_df):
    m1, _ = bpe.bpe_train(corpus_df, n_merges=3, new_id_start=100)
    m2, _ = bpe.bpe_train(corpus_df.repartition(5), n_merges=3, new_id_start=100)
    assert m1 == m2


def test_min_count_early_stop(spark, corpus_df):
    # with a high floor only the dominant pairs merge
    merges, _ = bpe.bpe_train(corpus_df, n_merges=10, new_id_start=100, min_count=4)
    py_merges, _ = _py_train(CORPUS, 10, 100, min_count=4)
    assert merges == py_merges
    assert len(merges) < 10


def test_default_new_id_start(spark, corpus_df):
    merges, _ = bpe.bpe_train(corpus_df, n_merges=1)
    assert merges and merges[0][2] == 8  # max token 7 -> ids start at 8
