"""Bigram LM scoring (operators/lmscore.py): differential checks vs an
independent pure-python model, kernel-vs-join plan equality, and the
perplexity/fixed-point relationship."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logparser_spark.operators import lmscore

SCALE = 10**9


def _py_model(train_rows):
    """Independent reference: dict-based add-one bigram model."""
    tb: dict[tuple[int, int], int] = {}
    tu: dict[int, int] = {}
    vocab = set()
    for toks in train_rows:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            tb[(a, b)] = tb.get((a, b), 0) + 1
            tu[a] = tu.get(a, 0) + 1
    return tb, tu, len(vocab)


def _py_score(toks, tb, tu, v, scale=SCALE):
    if len(toks) < 2:
        return 0, 0, 0
    ws = [
        (scale * (tb.get((a, b), 0) + 1)) // (tu.get(a, 0) + v)
        for a, b in zip(toks, toks[1:])
    ]
    s = sum(ws)
    return len(ws), s, s // len(ws)


def _py_ppl(toks, tb, tu, v):
    if len(toks) < 2:
        return None
    nll = [
        -math.log((tb.get((a, b), 0) + 1) / (tu.get(a, 0) + v))
        for a, b in zip(toks, toks[1:])
    ]
    return math.exp(sum(nll) / len(nll))


CORPUS = [
    (0, [1, 2, 3, 1, 2, 3, 1, 2]),
    (1, [1, 2, 1, 2, 1, 2]),
    (2, [3, 3, 3, 3]),
    (3, [9, 8, 7]),          # tokens/bigrams unseen in train
    (4, [5]),                # too short: n_big = 0
    (5, [2, 3, 1, 2, 9, 1]),
    (6, [1, 1, 1, 2, 2, 2]),
]
TRAIN_IDS = {0, 1, 2, 6}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, tokens array<int>")


@pytest.fixture(scope="module")
def train_df(corpus_df):
    return corpus_df.where(F.col("doc_id").isin(list(TRAIN_IDS)))


def test_lm_score_matches_python_model(spark, corpus_df, train_df):
    tb, tu, v = _py_model([t for i, t in CORPUS if i in TRAIN_IDS])
    got = {
        r["doc_id"]: (r["n_big"], r["lm_sum"], r["lm_mean"])
        for r in lmscore.lm_score(corpus_df, train_df).collect()
    }
    assert set(got) == {i for i, _ in CORPUS}
    for i, toks in CORPUS:
        assert got[i] == _py_score(toks, tb, tu, v), f"doc {i}"


def test_join_plan_value_equal(spark, corpus_df, train_df):
    a = sorted(map(tuple, lmscore.lm_score(corpus_df, train_df).collect()))
    b = sorted(map(tuple, lmscore.lm_score_join(corpus_df, train_df).collect()))
    assert a == b


def test_perplexity_matches_python_model(spark, corpus_df, train_df):
    tb, tu, v = _py_model([t for i, t in CORPUS if i in TRAIN_IDS])
    got = {
        r["doc_id"]: r["ppl"]
        for r in lmscore.lm_perplexity(corpus_df, train_df).collect()
    }
    for i, toks in CORPUS:
        want = _py_ppl(toks, tb, tu, v)
        if want is None:
            assert got[i] is None or math.isnan(got[i])
        else:
            assert got[i] == pytest.approx(want, rel=1e-12), f"doc {i}"


def test_in_model_text_scores_higher(spark, corpus_df, train_df):
    """The point of the gate: a doc made of trained transitions beats a
    doc of unseen ones — in fixed-point (higher) and perplexity
    (lower) consistently."""
    fp = {r["doc_id"]: r["lm_mean"] for r in lmscore.lm_score(corpus_df, train_df).collect()}
    ppl = {r["doc_id"]: r["ppl"] for r in lmscore.lm_perplexity(corpus_df, train_df).collect()}
    assert fp[1] > fp[3]  # trained 1->2 loop vs unseen 9->8->7
    assert ppl[1] < ppl[3]


def test_lm_filter_keeps_fluent(spark, corpus_df, train_df):
    fp = {r["doc_id"]: r["lm_mean"] for r in lmscore.lm_score(corpus_df, train_df).collect()}
    thr = fp[3] + 1  # above the unseen-transition doc
    kept = {r["doc_id"] for r in lmscore.lm_filter(corpus_df, train_df, min_mean=thr).collect()}
    assert 1 in kept and 3 not in kept
    assert kept == {i for i, v in fp.items() if v >= thr}


def test_row_order_invariance(spark, corpus_df, train_df):
    base = sorted(map(tuple, lmscore.lm_score(corpus_df, train_df).collect()))
    shuffled = sorted(
        map(tuple, lmscore.lm_score(corpus_df.repartition(7), train_df).collect())
    )
    assert base == shuffled


def test_empty_train_raises(spark, corpus_df):
    with pytest.raises(ValueError):
        lmscore.bigram_model(corpus_df.where(F.lit(False)))


def test_overflow_guard(spark, corpus_df, train_df):
    model = lmscore.bigram_model(train_df)
    with pytest.raises(ValueError):
        lmscore.lm_score(corpus_df, model=model, scale=2**62)


def test_join_plan_overflow_guard(spark, corpus_df, train_df):
    with pytest.raises(ValueError, match="overflow"):
        lmscore.lm_score_join(corpus_df, train_df, scale=2**62).collect()
