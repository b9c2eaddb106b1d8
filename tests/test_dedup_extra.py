"""SimHash banded near-dup (pigeonhole recall = 1) and IVF ANN recall
vs the exact baseline."""

import numpy as np
import pytest

from logparser_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_simhash_banding_equals_bruteforce(spark, docs):
    """Pigeonhole banding must find EXACTLY the brute-force hamming<=k
    pair set (recall 1 by construction, verify filters false pos)."""
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= 3:
                want.add((a, b, h))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert got == want


def test_ngram_jaccard_guard_refuses_large_input(spark, docs):
    """The O(n²) all-pairs baseline must refuse data-scale inputs and
    point at the LSH scale path; guard off/raised -> runs normally."""
    with pytest.raises(dedup.QuadraticPlanRefused, match="minhash_lsh_pairs"):
        dedup.ngram_jaccard_pairs(docs, guard_rows=10)
    n = dedup.ngram_jaccard_pairs(docs, guard_rows=None).count()
    assert n == dedup.ngram_jaccard_pairs(docs).count()  # default guard passes here


def test_ivf_topk_recall_vs_brute(spark, emb):
    brute = sim_rows = similarity.brute_topk(emb, query_ids=list(range(10)), k=5).collect()
    ivf = similarity.ivf_topk(emb, query_ids=list(range(10)), k=5).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    # IVF probes 10/16 lists (these synthetic embeddings are weakly
    # clustered; real embedding spaces prune much harder per probe)
    assert len(iset & bset) / len(bset) >= 0.9
    # and deterministic
    again = {(r["query_id"], r["neighbor_id"]) for r in similarity.ivf_topk(emb, query_ids=list(range(10)), k=5).collect()}
    assert iset == again


def test_dedup_handles_short_and_empty_docs(spark):
    """Docs with fewer than NGRAM words must yield empty shingle sets,
    not crash (Spark sequence() DESCENDS when start > stop, which used
    to feed slice() an invalid index)."""
    docs = spark.createDataFrame(
        [
            (0, "hello world"),  # 2 words < NGRAM=3
            (1, "x"),
            (2, ""),
            (3, "one two three four five six seven eight"),
            (4, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(3, 4)}
    brute = dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in brute} == {(3, 4)}
    # simhash over short docs also fine
    assert dedup.simhash(docs).count() == 5


def test_corrupt_code_points_quarantine_not_crash(spark, tmp_path):
    """Out-of-range int32 tokens (negative / > 0x10FFFF) must decode
    permissively (U+FFFD) and quarantine the row, not kill the stage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logparser_spark.plans.pipeline import run_pipeline
    from logparser_spark.sources.sinks import read_sink

    ok = [ord(c) for c in "1709251200.000 5 10.0.0.1 TCP_MISS/200 9 GET http://a.b/c user1 DIRECT/- -"]
    rows = [("good", ok), ("neg", [-5, 32] + ok), ("huge", [0x7FFFFFFF] + ok)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array(["s"] * 3),
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(tbl, str(src / "p.parquet"))
    run_pipeline(spark, str(src), str(tmp_path / "out"))
    got = {
        r.doc_id: (r.category, list(r.tokens) == dict(rows)[r.doc_id])
        for r in read_sink(spark, str(tmp_path / "out")).collect()
    }
    assert got["good"] == ("success", True)
    assert got["neg"][0] == "quarantine" and got["neg"][1]
    assert got["huge"][0] == "quarantine" and got["huge"][1]


def test_resume_rejects_changed_input_set(spark, tmp_path):
    from logparser_spark.fixtures import write_raw_sequences
    from logparser_spark.plans.pipeline import run_pipeline

    src = write_raw_sequences(str(tmp_path), 2000, files=4)
    out = str(tmp_path / "out")
    run_pipeline(spark, src, out, n_chunks=2)
    with pytest.raises(RuntimeError, match="resume mismatch"):
        run_pipeline(spark, src, out, n_chunks=4)  # different chunking


def test_ivf_exact_when_probing_all_lists(spark, emb):
    brute = similarity.brute_topk(emb, query_ids=[0, 1, 2], k=5).collect()
    ivf = similarity.ivf_topk(
        emb, query_ids=[0, 1, 2], k=5, n_lists=8, n_probe=8
    ).collect()
    assert [tuple(r) for r in brute] == [tuple(r) for r in ivf]


def test_sessionize_gap_boundary(spark):
    """An event exactly at last + gap starts a NEW session; strictly
    inside the gap extends. Pins the semantics the SQL oracle mirrors
    (diff >= gap, not >)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from logparser_spark.operators.sessionize import sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    gap = dt.timedelta(minutes=30)
    rows = [
        ("u1", base),
        ("u1", base + gap - dt.timedelta(microseconds=1)),  # same session
        ("u1", base + 2 * gap - dt.timedelta(microseconds=1)),  # still chained
        ("u1", base + 3 * gap),  # exactly gap after last -> NEW session
        ("u2", base),
    ]
    df = spark.createDataFrame(rows, "username string, time timestamp")
    got = sorted(
        (r.username, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    )
    assert got == [("u1", 1), ("u1", 3), ("u2", 1)]


def test_near_dup_clusters_match_union_find(spark, docs):
    """Distributed min-label propagation must equal a driver-side
    union-find over the same verified pair set (independent algorithm)."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        r.doc_id: min(
            (find(r.doc_id) if r.doc_id in parent else r.doc_id,), default=r.doc_id
        )
        for r in docs.select("doc_id").collect()
    }
    got = {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in dedup.near_dup_clusters(docs, threshold=0.8).collect()
    }
    assert len(got) == len(want)
    assert sum(1 for _ in pairs) > 0  # the fixture must exercise chains
    for doc, cl in want.items():
        assert got[doc] == (cl, cl == doc), doc


def test_minhash_kernel_block_paths_agree(spark):
    """The memory-bounded block paths (multi-segment grouping AND the
    single-oversized-row running-min path) must produce bit-identical
    signatures to the unblocked kernel."""
    import pyspark.sql.functions as F

    texts = [
        (0, "one two three four five six"),
        (1, " ".join(f"w{i % 7}" for i in range(500))),  # >> tiny block
        (2, "alpha beta gamma"),
        (3, " ".join(f"t{i}" for i in range(50))),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    hashed = df.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias("hs"),
    )
    big = {
        r.doc_id: list(r.sig)
        for r in hashed.select(
            "doc_id", dedup._minhash_sig_udf(32)("hs").alias("sig")
        ).collect()
    }
    tiny = {
        r.doc_id: list(r.sig)
        for r in hashed.select(
            "doc_id", dedup._minhash_sig_udf(32, block=8)("hs").alias("sig")
        ).collect()
    }
    assert big == tiny


def test_star_clusters_equal_label_prop(spark, docs):
    """algorithm='star' must produce exactly the label_prop clusters on
    the real near-dup fixture (two independent components algorithms)."""
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    lp = {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in dedup.near_dup_clusters(
            docs, pairs=pairs, algorithm="label_prop"
        ).collect()
    }
    st = {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in dedup.near_dup_clusters(
            docs, pairs=pairs, algorithm="star"
        ).collect()
    }
    assert st == lp


def test_star_converges_on_deep_chain(spark):
    """A 60-deep dup chain: label_prop needs O(diameter) rounds and
    raises at max_iters=10; star (the default since r5) converges in
    O(log n) rounds on the SAME budget — the documented deep-chain
    scale path."""
    n = 60
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="algorithm='star'"):
        dedup.near_dup_clusters(
            docs, pairs=chain, max_iters=10, algorithm="label_prop"
        )
    # the default path IS the deep-chain-safe one
    out = dedup.near_dup_clusters(docs, pairs=chain, max_iters=10).collect()
    assert {r.cluster_id for r in out} == {0}
    assert sum(r.is_keeper for r in out) == 1


def test_star_matches_union_find_random_graph(spark):
    """Seeded random graph (multi-component, dup edges, self-loops,
    reversed orientation): star clusters must equal a driver-side
    union-find."""
    import random

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.near_dup_clusters(
            docs, pairs=pairs, algorithm="star"
        ).collect()
    }
    assert got == want


def test_near_dup_clusters_rejects_unknown_algorithm(spark, docs):
    with pytest.raises(ValueError, match="label_prop"):
        dedup.near_dup_clusters(docs, algorithm="bfs")


def test_near_dup_clusters_raises_when_unconverged(spark):
    """A chain longer than max_iters must raise, never return a split
    component silently."""
    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.near_dup_clusters(docs, pairs=chain, max_iters=2)
    out = dedup.near_dup_clusters(docs, pairs=chain, max_iters=10).collect()
    assert {r.cluster_id for r in out} == {0}


def test_soft_dedup_weights_match_python_model(spark):
    from logparser_spark.operators import dedup as dedup_mod

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c"), (6, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_count"], r["weight_fp"])
        for r in dedup_mod.soft_dedup_weights(df).collect()
    }
    from collections import Counter

    c = Counter(t for _, t in rows)
    want = {i: (c[t], 1_000_000 // c[t]) for i, t in rows}
    assert got == want


def test_soft_dedup_weights_null_text_group(spark):
    """NULL texts are one group, down-weighted — never dropped (the
    join back onto md5(text) must be null-safe; a plain equi-join
    silently loses every NULL-text doc)."""
    from logparser_spark.operators import dedup as dedup_mod

    rows = [(1, None), (2, None), (3, None), (4, "a"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_hash"], r["dup_count"], r["weight_fp"])
        for r in dedup_mod.soft_dedup_weights(df).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    for i in (1, 2, 3, 5):
        assert got[i] == (None, 4, 1_000_000 // 4)
    assert got[4][1:] == (1, 1_000_000)


# --- near_dedup_incremental ------------------------------------------------


def _py_shingles(t, n=3):
    w = t.split(" ")
    return set(" ".join(w[k : k + n]) for k in range(len(w) - n + 1)) if len(w) >= n else set()


def test_near_dedup_incremental_matches_brute_force(spark):
    """Cross-corpus fuzzy dedup vs an exhaustive python model, with
    OVERLAPPING id spaces (each dump numbers its own docs) and short
    (<n-gram) docs that can never match."""
    from logparser_spark.operators.dedup import near_dedup_incremental

    rows_c, rows_n = [], []
    for i in range(40):
        words = [f"w{(i * 13 + j) % 200}" for j in range(30)]
        rows_c.append((i, " ".join(words)))
        if i < 15:  # near-dup of corpus doc i, same doc_id on purpose
            rows_n.append((i, " ".join(words[:-1] + ["zz"])))
    for i in range(15, 40):
        rows_n.append((i, " ".join(f"u{(i * 31 + j) % 500}" for j in range(30))))
    rows_n.append((99, "too short"))  # < 3 words: no shingles, always kept
    corpus = spark.createDataFrame(rows_c, "doc_id long, text string")
    new = spark.createDataFrame(rows_n, "doc_id long, text string")
    got = sorted(
        r.doc_id for r in near_dedup_incremental(new, corpus, threshold=0.5).collect()
    )
    cs = [_py_shingles(t) for _, t in rows_c]
    want = sorted(
        i
        for i, t in rows_n
        if not any(
            (s := _py_shingles(t)) and c and len(s & c) / len(s | c) >= 0.5
            for c in cs
        )
    )
    assert got == want
    assert 99 in got and 0 not in got


def test_near_dedup_incremental_disjoint_corpora_all_survive(spark):
    from logparser_spark.operators.dedup import near_dedup_incremental

    corpus = spark.createDataFrame(
        [(i, " ".join(f"a{i}b{j}" for j in range(20))) for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, " ".join(f"x{i}y{j}" for j in range(20))) for i in range(20)],
        "doc_id long, text string",
    )
    assert near_dedup_incremental(new, corpus).count() == 20


# ---------------------------------------------------------------------
# containment (one-sided near-dup)
# ---------------------------------------------------------------------


def _py_containment(corpus, threshold, n=3):
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    s = {i: sh(t) for i, t in corpus}
    out = []
    for i, a in s.items():
        for j, b in s.items():
            if i >= j or not a or not b:
                continue
            inter = len(a & b)
            ca, cb = inter / len(a), inter / len(b)
            if ca >= threshold or cb >= threshold:
                out.append(
                    (
                        i,
                        j,
                        inter,
                        len(a),
                        len(b),
                        int(1000 * inter // len(a)),
                        int(1000 * inter // len(b)),
                    )
                )
    return sorted(out)


def test_containment_matches_python_model(spark):
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}" for i in range(200))
    corpus = [
        (0, quote),
        (1, filler + " " + quote + " " + filler),  # quote embedded
        (2, filler),
        (3, "completely different text entirely here now"),
        (4, quote),  # exact dup of 0
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    from logparser_spark.operators.dedup import containment_pairs

    got = sorted(tuple(r) for r in containment_pairs(df, threshold=0.7).collect())
    want = _py_containment(corpus, 0.7)
    assert got == want
    # the embedded quote is found (0 in 1) even though jaccard is tiny
    assert any(r[0] == 0 and r[1] == 1 for r in got)
    ab = {(r[0], r[1]): r for r in got}
    assert ab[(0, 1)][5] == 1000  # quote fully contained in the page
    assert ab[(0, 1)][6] < 700    # but the page is NOT contained in the quote
    from logparser_spark.operators.dedup import ngram_jaccard_pairs

    j = ngram_jaccard_pairs(df, threshold=0.7).collect()
    assert not any(
        {r["doc_a"], r["doc_b"]} == {0, 1} for r in j
    ), "jaccard at 0.7 must miss the asymmetric pair containment catches"


def test_containment_guard_refuses_quadratic(spark):
    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(30)], "doc_id long, text string"
    )
    from logparser_spark.operators.dedup import QuadraticPlanRefused, containment_pairs

    with pytest.raises(QuadraticPlanRefused):
        containment_pairs(df, guard_rows=10)
    # cand-restricted path is candidate-sized, not quadratic: it runs
    # under the same guard and evaluates only the listed pair
    cand = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    rows = containment_pairs(
        df, threshold=0.5, guard_rows=10, cand=cand
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(0, 1)]
    assert rows[0]["cont_a_in_b_x1000"] == 1000  # identical texts
