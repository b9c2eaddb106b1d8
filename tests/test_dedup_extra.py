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


def test_ivf_exact_when_probing_all_lists(spark, emb):
    brute = similarity.brute_topk(emb, query_ids=[0, 1, 2], k=5).collect()
    ivf = similarity.ivf_topk(
        emb, query_ids=[0, 1, 2], k=5, n_lists=8, n_probe=8
    ).collect()
    assert [tuple(r) for r in brute] == [tuple(r) for r in ivf]
