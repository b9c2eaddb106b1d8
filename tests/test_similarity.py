"""Similarity-search and embedding near-dup operators: exact baseline
vs LSH recall, deterministic reproducibility, and a controlled
near-duplicate fixture where LSH must reach recall 1."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_topk_matches_numpy(spark, emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    got = sim.brute_topk(emb, query_ids=[0, 1], k=3).collect()
    for qid in (0, 1):
        qi = int(np.nonzero(ids == qid)[0][0])
        s = sims[qi].copy()
        s[qi] = -2  # exclude self
        order = np.lexsort((ids, -s))[:3]
        want = [int(ids[j]) for j in order]
        have = [r["neighbor_id"] for r in got if r["query_id"] == qid]
        assert have == want


def test_near_dup_exact_pairs_symmetric_oriented(emb):
    pairs = sim.cosine_near_dup_pairs(emb, threshold=0.35).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["vec_a"] < r["vec_b"]
        assert r["cosine_x10000"] >= 3500


def test_near_dup_blocked_equals_exact(emb):
    """The distributed block-pair path must emit exactly the baseline's
    pairs — every pair lands in exactly one block-pair group, so there
    is no dedup step to hide double-emission bugs behind."""
    exact = sorted(
        tuple(r) for r in sim.cosine_near_dup_pairs(emb, threshold=0.35).collect()
    )
    for n_blocks in (1, 3, 8):
        blocked = sorted(
            tuple(r)
            for r in sim.cosine_near_dup_blocked(
                emb, threshold=0.35, n_blocks=n_blocks
            ).collect()
        )
        assert blocked == exact, f"n_blocks={n_blocks}"


def test_near_dup_lsh_recall_vs_exact(emb):
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in sim.cosine_near_dup_lsh(
            emb, threshold=0.35, n_tables=32, n_bits=4
        ).collect()
    }
    assert lsh <= exact  # exact verify: no false positives
    assert len(lsh) / len(exact) >= 0.95


def test_near_dup_lsh_perfect_recall_on_true_dups(spark):
    """Planted near-duplicates (cos ~0.999): the production-threshold
    configuration (16 tables x 8 bits) must find every pair."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 64)).astype(np.float32)
    dup = base + rng.standard_normal((50, 64)).astype(np.float32) * 0.01
    vecs = np.concatenate([base, dup])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in sim.cosine_near_dup_lsh(df, threshold=0.99).collect()
    }
    want = {(i, i + 50) for i in range(50)}
    assert want <= got


def test_lsh_topk_deterministic(emb):
    a = sim.lsh_topk(emb, query_ids=[0, 1, 2], k=3).collect()
    b = sim.lsh_topk(emb, query_ids=[0, 1, 2], k=3).collect()
    assert a == b


def test_semantic_dedup_groups_and_keepers(spark):
    # three orthogonal directions, each with three scaled copies
    # (cosine 1.0 within the direction — identical after normalize, so
    # they co-cluster under ANY centroid set); plus one antipodal
    # vector (cosine -1: same cluster or not, never a duplicate)
    rows, expected = [], {}
    vid = 0
    for d in range(3):
        ids = []
        for s in (1.0, 2.0, 0.5):
            v = [0.0] * 8
            v[d] = s
            rows.append((vid, v))
            ids.append(vid)
            vid += 1
        for i in ids:
            expected[i] = min(ids)
    anti = [0.0] * 8
    anti[0] = -1.0
    rows.append((vid, anti))
    expected[vid] = vid
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in sim.semantic_dedup(
            df, threshold=0.99, n_lists=4, train_sample=100
        ).collect()
    }
    assert len(out) == len(rows)
    for i, k in expected.items():
        assert out[i]["keeper_id"] == k, i
        assert out[i]["is_keeper"] == (i == k)
    # exactly 4 keepers survive: one per direction + the antipode
    assert sum(r["is_keeper"] for r in out.values()) == 4


def test_semantic_dedup_partitioning_invariant(spark):
    rng = np.random.default_rng(9)
    rows = [(int(i), rng.normal(size=8).tolist()) for i in range(200)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = a.repartition(13)
    ra = sorted(map(tuple, sim.semantic_dedup(a, 0.8, n_lists=5).collect()))
    rb = sorted(map(tuple, sim.semantic_dedup(b, 0.8, n_lists=5).collect()))
    assert ra == rb


def test_semantic_dedup_skewed_cluster_bounded_tiles(spark):
    """Pathological skew: every vector points the same way, so k-means
    collapses ALL rows into one cell. With pair_block_rows far below the
    cluster size the pairwise pass runs in (tile x c) slices — the
    result must match the untiled plan exactly (one component, min-id
    keeper), proving the memory bound costs no correctness."""
    rng = np.random.default_rng(17)
    base = rng.normal(size=8)
    rows = [
        (int(i), (base * float(1.0 + 0.001 * (i % 7))).tolist())
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tiled = sorted(
        map(
            tuple,
            sim.semantic_dedup(
                df, 0.99, n_lists=4, train_sample=100, pair_block_rows=7
            ).collect(),
        )
    )
    untiled = sorted(
        map(
            tuple,
            sim.semantic_dedup(
                df, 0.99, n_lists=4, train_sample=100, pair_block_rows=10**9
            ).collect(),
        )
    )
    assert tiled == untiled
    # all scaled copies of one direction: a single component, keeper 0
    assert all(t[2] == 0 for t in tiled)  # keeper_id column
    assert sum(t[3] for t in tiled) == 1  # exactly one keeper


def test_semantic_dedup_mixed_clusters_tile_invariant(spark):
    """Random data: tiling must not change components for any tile size
    (edges are identical; only the union order differs, and min-root
    union is order-independent for connected components)."""
    rng = np.random.default_rng(23)
    rows = [(int(i), rng.normal(size=8).tolist()) for i in range(180)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    outs = [
        sorted(
            map(
                tuple,
                sim.semantic_dedup(
                    df, 0.8, n_lists=5, pair_block_rows=b
                ).collect(),
            )
        )
        for b in (3, 64, 10**9)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_zero_vector_scores_zero_not_divide_by_zero(spark):
    """A zero-magnitude embedding must rank with cosine 0 (matching
    _unit_rows in the numpy kernels), not abort the job with ANSI
    DIVIDE_BY_ZERO from the JVM cosine expression."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    out = sim.brute_topk(df, [1], k=2).collect()
    by_n = {r["neighbor_id"]: r["cosine_x10000"] for r in out}
    assert by_n[0] == 0 and by_n[2] > 9000


def test_lsh_ops_tolerate_empty_and_null_first_row(spark):
    """dim inference must not crash on an empty frame or a NULL first
    vector (first()[0] used to raise an opaque NoneType subscript)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sim.cosine_near_dup_lsh(empty).count() == 0
    withnull = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.01])],
        "vec_id long, embedding array<float>",
    )
    pairs = sim.cosine_near_dup_lsh(
        withnull.where(F.col("embedding").isNotNull()), threshold=0.9
    )
    assert pairs.count() == 1
