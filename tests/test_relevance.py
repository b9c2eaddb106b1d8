"""BM25 relevance scoring (operators/relevance.py): differential
tests against an independent pure-python model, the integer
fixed-point twin's exact equality, and the zero-shuffle plan claim."""

import math

import pytest

from logparser_spark.operators import relevance

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat cat"),
    (3, ""),  # splits to [''] -> dl=1, no query terms
    (4, None),  # NULL text -> dl=0
    (5, "mat mat dog the the the the a b c d e f g h"),
    (6, "completely unrelated words here"),
]
TERMS = ["cat", "mat", "zzz_absent", "the"]


def _py_model(corpus, terms):
    """Independent reference: plain-python BM25 over the same
    tokenization (split on single space; None -> no tokens)."""
    toks = {i: ([] if t is None else t.split(" ")) for i, t in corpus}
    n = len(toks)
    dls = {i: len(w) for i, w in toks.items()}
    sum_dl = sum(dls.values())
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    tf = {(i, t): w.count(t) for i, w in toks.items() for t in terms}
    return toks, n, dls, sum_dl, df, tf


def _py_float(corpus, terms, k1=1.2, b=0.75):
    toks, n, dls, sum_dl, df, tf = _py_model(corpus, terms)
    out = {}
    for i in toks:
        s = 0.0
        for t in terms:
            if df[t] == 0 or tf[i, t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            denom = tf[i, t] + k1 * (1 - b + b * dls[i] * n / sum_dl)
            s += idf * tf[i, t] * (k1 + 1) / denom
        out[i] = (dls[i], sum(tf[i, t] for t in terms), s)
    return out


def _py_fp(corpus, terms, scale_idf=10**4, scale_dl=10**4):
    toks, n, dls, sum_dl, df, tf = _py_model(corpus, terms)
    out = {}
    for i in toks:
        s = 0
        for t in terms:
            if df[t] == 0:
                continue
            idf_fp = (scale_idf * (2 * (n - df[t]) + 1)) // (2 * df[t] + 1)
            ndl = (scale_dl * dls[i] * n) // sum_dl
            s += (idf_fp * 44 * scale_dl * tf[i, t]) // (
                20 * scale_dl * tf[i, t] + 6 * scale_dl + 18 * ndl
            )
        out[i] = (dls[i], sum(tf[i, t] for t in terms), s)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_float_matches_python_model(docs):
    got = {
        r["doc_id"]: (r["dl"], r["tf_sum"], r["score"])
        for r in relevance.bm25_score(docs, TERMS).collect()
    }
    want = _py_float(CORPUS, TERMS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"dl mismatch doc {i}"
        assert got[i][1] == want[i][1], f"tf_sum mismatch doc {i}"
        assert got[i][2] == pytest.approx(want[i][2], abs=1e-9), f"doc {i}"


def test_bm25_fp_matches_python_model_exactly(docs):
    got = {
        r["doc_id"]: (r["dl"], r["tf_sum"], r["score_fp"])
        for r in relevance.bm25_score_fp(docs, TERMS).collect()
    }
    assert got == _py_fp(CORPUS, TERMS)


def test_fp_ranks_like_float_on_single_term(docs):
    """Per single term the fp score is a monotone transform of the
    float score's rational core — ranking by it ranks identically
    (modulo fixed-point resolution, generous here)."""
    fl = {r["doc_id"]: r["score"] for r in relevance.bm25_score(docs, ["cat"]).collect()}
    fp = {r["doc_id"]: r["score_fp"] for r in relevance.bm25_score_fp(docs, ["cat"]).collect()}
    order_fl = sorted(fl, key=lambda i: (-fl[i], i))
    order_fp = sorted(fp, key=lambda i: (-fp[i], i))
    assert order_fl == order_fp


def test_empty_query_rejected(docs):
    with pytest.raises(ValueError):
        relevance.bm25_score(docs, [])
    with pytest.raises(ValueError):
        relevance.bm25_score_fp(docs, [])


def test_all_absent_terms_score_zero(docs):
    rows = relevance.bm25_score_fp(docs, ["zzz", "yyy"]).collect()
    assert all(r["score_fp"] == 0 and r["tf_sum"] == 0 for r in rows)
    rows = relevance.bm25_score(docs, ["zzz"]).collect()
    assert all(r["score"] == 0.0 for r in rows)


def test_topk_is_float_head(docs):
    all_scores = relevance.bm25_score(docs, TERMS).collect()
    want = [
        r["doc_id"]
        for r in sorted(all_scores, key=lambda r: (-r["score"], r["doc_id"]))
    ][:3]
    got = [r["doc_id"] for r in relevance.bm25_topk(docs, TERMS, k=3).collect()]
    assert got == want


def test_scoring_plan_is_zero_shuffle(docs):
    """The returned frame must be a pure projection over the scan —
    the stats job already ran at build time; scoring itself has no
    Exchange, no Join, and TakeOrdered (not a full Sort+Exchange) for
    the top-k variant."""
    plan = relevance.bm25_score_fp(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan
    plan_f = relevance.bm25_score(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_f and "Join" not in plan_f, plan_f
    plan_k = relevance.bm25_topk(docs, TERMS, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_k, plan_k


def _py_keywords(corpus, k, scale=10**4, min_df=1, max_df_ratio=1.0):
    toks = {i: ([] if t is None else t.split(" ")) for i, t in corpus}
    n = len(toks)
    df = {}
    for w in toks.values():
        for t in set(w):
            df[t] = df.get(t, 0) + 1
    keep = {t for t, d in df.items() if min_df <= d <= int(max_df_ratio * n)}
    out = []
    for i, w in toks.items():
        tf = {}
        for t in w:
            if t in keep:
                tf[t] = tf.get(t, 0) + 1
        scored = [
            (
                t,
                c,
                c * ((scale * (2 * (n - df[t]) + 1)) // (2 * df[t] + 1)),
            )
            for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (t, c, s) in enumerate(scored[:k], 1):
            out.append((i, rank, t, c, s))
    return sorted(out)


def test_keywords_match_python_model(docs):
    got = sorted(
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["score_fp"])
        for r in relevance.tfidf_keywords(docs, k=3).collect()
    )
    assert got == _py_keywords(CORPUS, k=3)


def test_keywords_max_df_drops_stopwords(docs):
    # 'the' appears in 3/7 docs; max_df_ratio=0.3 -> max_df=2 drops it
    rows = relevance.tfidf_keywords(docs, k=10, max_df_ratio=0.3).collect()
    assert all(r["term"] != "the" for r in rows)
    assert sorted(
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["score_fp"])
        for r in rows
    ) == _py_keywords(CORPUS, k=10, max_df_ratio=0.3)


def test_keywords_rank_is_dense_from_one(docs):
    rows = relevance.tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_keywords_bad_args(docs):
    with pytest.raises(ValueError):
        relevance.tfidf_keywords(docs, k=0)
    with pytest.raises(ValueError):
        relevance.tfidf_keywords(docs, k=3, min_df=0)
    with pytest.raises(ValueError):
        relevance.tfidf_keywords(docs, k=3, max_df_ratio=1.5)
    with pytest.raises(ValueError, match="overflow"):
        relevance.tfidf_keywords(docs, k=3, scale=2**60)


def _py_index(corpus, shard_size, min_df=1, max_df_ratio=1.0):
    toks = {i: ([] if t is None else t.split(" ")) for i, t in corpus}
    n = len(toks)
    post = {}
    for i, w in toks.items():
        for t in set(w):
            post.setdefault(t, []).append(i)
    out = {}
    for t, ids in post.items():
        df = len(ids)
        if df < min_df or df > int(max_df_ratio * n):
            continue
        k = -(-df // shard_size)
        for i in ids:
            out.setdefault((t, i % k, k, df), []).append(i)
    return {key: sorted(v) for key, v in out.items()}


def test_inverted_index_matches_python_model(docs):
    got = {
        (r["term"], r["shard"], r["n_shards"], r["df"]): r["postings"]
        for r in relevance.inverted_index(docs, shard_size=2).collect()
    }
    assert got == _py_index(CORPUS, shard_size=2)


def test_inverted_index_shards_bound_hot_terms(spark):
    # a stopword in every doc: no shard's posting list may exceed the
    # dense-id balance bound ceil(df / n_shards)
    rows = [(i, "stop word" + (" rare" if i == 7 else "")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = relevance.inverted_index(df, shard_size=8).collect()
    for r in out:
        bound = -(-r["df"] // r["n_shards"])
        assert len(r["postings"]) <= bound, (r["term"], r["shard"])
    stop = sorted(
        i for r in out if r["term"] == "stop" for i in r["postings"]
    )
    assert stop == list(range(100))  # disjoint shards, full coverage
    assert {r["n_shards"] for r in out if r["term"] == "stop"} == {13}


def test_inverted_index_df_filters(docs):
    out = relevance.inverted_index(
        docs, shard_size=100, min_df=2, max_df_ratio=0.3
    ).collect()
    want = _py_index(CORPUS, shard_size=100, min_df=2, max_df_ratio=0.3)
    got = {
        (r["term"], r["shard"], r["n_shards"], r["df"]): r["postings"]
        for r in out
    }
    assert got == want
    assert all(2 <= key[3] <= 2 for key in got)  # 0.3*7 -> max_df 2


def test_inverted_index_bad_args(docs):
    with pytest.raises(ValueError):
        relevance.inverted_index(docs, shard_size=0)
    with pytest.raises(ValueError):
        relevance.inverted_index(docs, min_df=0)


def test_df_join_broadcasts_the_vocab_side_not_the_corpus(spark):
    """Regression pin for the corpus-broadcast mispick: Catalyst's size
    estimate flows through the explode and once chose to broadcast the
    (doc, term) PAIRS side of the tf x df join — a driver-side build of
    the corpus (measured 0.31 scaling efficiency; BENCH.md). The
    BroadcastExchange subtree must contain the df aggregate, and the
    explode must NOT sit under the broadcast."""
    rows = [(i, "a b c d e f g h") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for frame in (
        relevance.inverted_index(df, shard_size=4),
        relevance.tfidf_keywords(df, k=2),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan, plan
        # the broadcast subtree is everything indented under the
        # BroadcastExchange node up to the next sibling at its depth
        lines = plan.splitlines()
        start = next(
            i for i, ln in enumerate(lines) if "BroadcastExchange" in ln
        )
        depth = lines[start].index("BroadcastExchange")
        sub = []
        for ln in lines[start + 1 :]:
            body = ln[:depth + 1]
            if any(c not in " :|+-" for c in body):
                break
            sub.append(ln)
        subtree = "\n".join(sub).lower()
        # the broadcast side must be the AGGREGATED vocab-bounded df
        # frame: an aggregate must appear, and it must sit ABOVE the
        # explode that feeds it (raw exploded pairs under the broadcast
        # = the bug)
        assert "hashaggregate" in subtree, subtree
        if "explode" in subtree:
            assert subtree.index("hashaggregate") < subtree.index("explode"), subtree


def test_fp_overflow_contract(spark):
    big = spark.createDataFrame([(0, "x " * 10)], "doc_id long, text string")
    with pytest.raises(ValueError, match="overflow"):
        relevance.bm25_score_fp(big, ["x"], scale_idf=2**40, scale_dl=2**20)
