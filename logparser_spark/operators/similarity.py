"""Similarity search over an embedding column (array<float>).

- ``brute_topk``: exact cosine top-k — broadcast the (small) query set
  against all candidates; dot products via zip_with/aggregate folds
  (JVM-side, codegen'd — no Python). This is the correctness baseline
  and is also the right plan whenever |queries| is broadcastable: one
  pass over the candidate table, no shuffle of the big side, top-k via
  per-query window (or TakeOrdered for single queries).
- ``lsh_topk``: random-hyperplane (sign) LSH bucketing — candidates
  share >= 1 of ``n_tables`` hash-table buckets; exact cosine re-rank
  inside the candidate set. At 10^12-row scale the bucket join replaces
  the full cross product; recall is tunable via (n_tables, n_bits) and
  is measured against ``brute_topk`` in tests (rows-only driver check —
  approximate by design).

Hyperplanes are derived deterministically (seeded RNG) so runs are
reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from logparser_spark.operators.util import spread


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalize in place, mapping zero vectors to zero (cosine 0
    with everything) instead of NaN — a NaN row would otherwise poison
    argmax/centroid math downstream (one NaN centroid collapses every
    assignment into a single cluster)."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    m /= np.where(n == 0.0, 1.0, n)
    return m


def _infer_dim(emb: DataFrame, vec_col: str) -> int:
    """Embedding width from the first non-NULL vector. 1 for an
    empty/all-NULL frame — any hyperplanes then work, since there is
    nothing to bucket and the result is empty either way (first()[0]
    would instead die with an opaque NoneType subscript)."""
    r = emb.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    return len(r[0]) if r is not None else 1


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Cosine of two array columns; a zero-magnitude vector scores 0.0
    against everything — matching ``_unit_rows`` in the numpy kernels —
    instead of dividing by zero (which under Spark 4's default ANSI
    mode is a job-killing SparkArithmeticException, not a NULL)."""
    av, bv = _as_double(F.col(a)), _as_double(F.col(b))
    denom = _norm(av) * _norm(bv)
    return df.withColumn(
        out,
        F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(av, bv) / denom),
    )


def brute_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k for each query id (excluding self)."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    x = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    x = with_cosine(x, "qv", "nv")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        x.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cosine") * 10000).alias("cosine_x10000"),
        )
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b).

    Block matrix multiply: the (normalized) full matrix is broadcast to
    executors once; each Arrow batch computes ``B @ M.T`` with BLAS and
    emits only the above-threshold pairs (row-expanding mapInPandas).
    This is the correctness baseline — O(N^2/cores) compares but zero
    shuffle; viable while N x dim x 4B fits an executor (~10^6 vectors).
    Beyond that use ``cosine_near_dup_lsh`` (bucketed candidates + this
    same exact re-check on candidates only).
    """
    import pandas as pd  # noqa: F811  (module alias for closures)

    spark = emb.sparkSession
    base = emb.select(id_col, vec_col).toPandas()
    ids_all = base[id_col].to_numpy(dtype=np.int64)
    m = np.stack(base[vec_col].to_numpy()).astype(np.float64)
    _unit_rows(m)
    bc = spark.sparkContext.broadcast((ids_all, m))

    out_schema = "vec_a long, vec_b long, cosine_x10000 long"

    def gen(batches):
        ids_b, mat = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            _unit_rows(q)
            sims = q @ mat.T  # (batch, N)
            ii, jj = np.nonzero(sims >= threshold)
            a, b = q_ids[ii], ids_b[jj]
            keep = a < b  # dedupe orientation + drop self
            yield pd.DataFrame(
                {
                    "vec_a": a[keep],
                    "vec_b": b[keep],
                    "cosine_x10000": np.floor(sims[ii, jj][keep] * 10000).astype(
                        np.int64
                    ),
                }
            )

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(gen, schema=out_schema)
        .orderBy("vec_a", "vec_b")
    )


def cosine_near_dup_blocked(
    emb: DataFrame,
    threshold: float = 0.35,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-duplicate pairs, fully distributed.

    Block-pair decomposition: each vector lands in block ``id % B`` and
    is shuffled to every block-pair group (min(b,c), max(b,c)) — B
    copies per vector, B(B+1)/2 groups. Each group BLAS-multiplies its
    two sub-matrices and emits only above-threshold pairs; a pair
    (x, y) belongs to exactly one group (blk(x), blk(y)), so no
    dedup/distinct pass is needed. Unlike the driver-collect baseline
    (``cosine_near_dup_pairs``) nothing ever leaves the executors:
    shuffle is N*B rows and per-group memory is ~2N/B * dim doubles —
    pick B ~ sqrt(2 * parallelism) (and it also bounds group memory)
    so this survives arbitrary N. Compute is the same O(N^2) dot
    products as the baseline, spread across B(B+1)/2 tasks; for true
    near-dup thresholds (>= 0.9) prefer ``cosine_near_dup_lsh`` which
    prunes candidates instead of spreading them.
    """
    if n_blocks is None:
        # B(B+1)/2 groups ~ parallelism keeps every core busy without
        # over-replicating (each vector ships B copies); B also divides
        # per-group memory (~2N/B * dim), so bigger clusters handle
        # bigger N automatically.
        import math

        par = emb.sparkSession.sparkContext.defaultParallelism
        n_blocks = max(2, math.isqrt(2 * par))
    out_schema = "vec_a long, vec_b long, cosine_x10000 long"

    def pair_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        _unit_rows(m)
        lo, hi = int(pdf["_blo"].iat[0]), int(pdf["_bhi"].iat[0])
        if lo == hi:
            sims = m @ m.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b = ids[ii], ids[jj]
        else:
            left = ids % n_blocks == lo
            la, lb = ids[left], ids[~left]
            sims = m[left] @ m[~left].T
            ii, jj = np.nonzero(sims >= threshold)
            a, b = la[ii], lb[jj]
        cos = sims[ii, jj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cosine_x10000": np.floor(cos * 10000).astype(np.int64),
            }
        )

    blk = F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int")
    rep = emb.select(id_col, vec_col, blk.alias("_b")).crossJoin(
        F.broadcast(
            emb.sparkSession.range(n_blocks).select(F.col("id").cast("int").alias("_c"))
        )
    )
    # c sweeps 0..B-1, so (least, greatest) yields each of the B
    # unordered block-pairs containing _b exactly once — no dedup needed.
    rep = rep.select(
        id_col,
        vec_col,
        F.least("_b", "_c").alias("_blo"),
        F.greatest("_b", "_c").alias("_bhi"),
    )
    return (
        rep.groupBy("_blo", "_bhi")
        .applyInPandas(pair_block, schema=out_schema)
        .orderBy("vec_a", "vec_b")
    )


def cosine_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.35,
    n_tables: int = 16,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Scale path for near-dup: sign-LSH bucket join generates candidate
    pairs (shuffle ~ bucket sizes, not N^2), exact cosine verifies each.
    Recall vs the exact baseline is probabilistic (measured in tests);
    tighten (n_tables, n_bits) to trade cost for recall.
    """
    emb = spread(emb)
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    bucket_udf = _bucket_udf(_hyperplanes(dim, n_tables, n_bits, seed))
    b = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(bucket_udf(F.col(vec_col))).alias("table_id", "bucket"),
    )
    cand = (
        b.alias("a")
        .join(b.alias("c"), ["table_id", "bucket"])
        .filter(F.col("a._id") < F.col("c._id"))
        .select(
            F.col("a._id").alias("vec_a"),
            F.col("a._v").alias("qv"),
            F.col("c._id").alias("vec_b"),
            F.col("c._v").alias("nv"),
        )
        .distinct()
    )
    x = with_cosine(cand, "qv", "nv")
    return (
        x.filter(F.col("cosine") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.floor(F.col("cosine") * 10000).alias("cosine_x10000"),
        )
        .orderBy("vec_a", "vec_b")
    )


def _train_centroids(
    emb: DataFrame,
    n_lists: int,
    vec_col: str,
    seed: int,
    sample: int,
    iters: int,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic spherical k-means on a seeded sample (driver-side
    numpy — at 10^12 scale you sample anyway; centroids are tiny).

    The sample is the ``sample`` smallest values of xxhash64(id, seed) —
    a uniform pseudo-random subset that is deterministic across
    partition scheduling (a bare ``limit`` would take whichever
    partitions answered first), and TakeOrdered keeps only k rows per
    partition in flight."""
    pdf = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample)
        .select(vec_col)
        .toPandas()
    )
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    _unit_rows(x)
    rng = np.random.default_rng(seed)
    # k-means++-style init (deterministic): seed one random point, then
    # greedily add the point farthest (in cosine) from its nearest
    # chosen centroid — spreads lists across the sphere far better than
    # uniform choice when k is small, which directly bounds how often a
    # true neighbor hides in an unprobed cell.
    k = min(n_lists, len(x))
    first = int(rng.integers(len(x)))
    chosen = [first]
    best = x @ x[first]
    for _ in range(1, k):
        nxt = int(np.argmin(best))
        if best[nxt] >= 1.0 - 1e-12:
            # every remaining point duplicates a chosen centroid —
            # stop instead of appending repeats (k shrinks honestly)
            break
        chosen.append(nxt)
        best = np.maximum(best, x @ x[nxt])
    c = x[chosen].copy()
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                v = members.sum(axis=0)
                c[j] = v / (np.linalg.norm(v) or 1.0)
    return c


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 12,  # these synthetic embeddings cluster weakly; real
    # embedding spaces hold recall at far lower probe fractions
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 10_000,
    train_iters: int = 5,
) -> DataFrame:
    """IVF-flat approximate top-k: vectors partitioned into n_lists
    Voronoi cells (spherical k-means centroids), queries probe their
    ``n_probe`` nearest cells, exact cosine re-rank inside.

    Scale shape: assignment is one numpy argmax-matmul per Arrow batch;
    the probe join is an equi-join on list_id (shuffle ~ probed cells,
    ~n_probe/n_lists of the data per query batch, not the full table).
    Complements sign-LSH: IVF adapts to the data distribution, LSH is
    data-independent.
    """
    cents = _train_centroids(
        emb, n_lists, vec_col, seed, train_sample, train_iters, id_col=id_col
    )

    @pandas_udf("int")
    def assign_udf(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        _unit_rows(m)
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probe_udf(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        _unit_rows(m)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    data = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        assign_udf(F.col(vec_col)).alias("list_id"),
    )
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_udf(F.col(vec_col))).alias("list_id"),
    )
    cand = data.join(F.broadcast(queries), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    x = with_cosine(cand, "qv", "nv")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        x.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cosine") * 10000).alias("cosine_x10000"),
        )
        .orderBy("query_id", "rank")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 10_000,
    train_iters: int = 5,
    pair_block_rows: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate removal (Abbas et al.
    2023, arXiv:2303.09540): spherical k-means clusters the embedding
    space, exact pairwise cosine WITHIN each cluster finds duplicate
    groups, one keeper survives per group. Cross-cluster pairs are
    never compared — that is the sanctioned approximation that turns
    O(N^2) into sum of per-cluster squares.

    Output: one row per vector — (vec_id, cluster_id, keeper_id,
    is_keeper) where keeper_id is the smallest vec_id in the vector's
    within-cluster duplicate component (connected components of the
    cos >= threshold graph, resolved locally per cluster) and
    singletons keep themselves. Filter is_keeper for the deduped set.

    Scale plan: centroids train on a seeded hash-ordered sample
    (driver-side, tiny), assignment is one argmax-matmul per Arrow
    batch (pure map), and the only shuffle is the groupBy(cluster) of
    (id, vector) rows. Per-cluster memory is the cluster's OWN matrix
    (c x dim doubles) plus one ``pair_block_rows x c`` similarity tile:
    the pairwise pass is row-block-tiled (never the full c x c matrix)
    and union-find folds each tile's edges immediately, so a SKEWED
    cluster — embeddings collapsing into one cell — degrades to more
    tiles, not an OOM. Size n_lists so a cluster's matrix fits an
    executor (SemDeDup used 50k clusters for LAION-scale). Deterministic
    end to end (seeded sample, seeded init, fixed iteration count), so
    the result is golden-pinnable and independent of pair_block_rows;
    no SQL oracle (float centroids are not SQL-reproducible).
    """
    if pair_block_rows <= 0:
        raise ValueError("pair_block_rows must be positive")
    cents = _train_centroids(
        emb, n_lists, vec_col, seed, train_sample, train_iters, id_col=id_col
    )

    @pandas_udf("int")
    def assign_udf(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        _unit_rows(m)
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int32))

    id_t = emb.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, cluster_id int, keeper_id {id_t}, is_keeper boolean"
    )

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        _unit_rows(m)
        parent = np.arange(len(ids))

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union_edges(ii, jj):
            for a, b in zip(ii, jj):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    # union by smaller index == smaller id (sorted asc)
                    parent[max(ra, rb)] = min(ra, rb)

        # tile the pairwise pass: peak extra memory is one
        # (pair_block_rows x c) tile, never the c x c matrix — a skewed
        # cluster costs more tiles, not an OOM. Edges fold into the
        # union-find per tile, so nothing pair-shaped accumulates.
        for lo in range(0, len(ids), pair_block_rows):
            hi = min(lo + pair_block_rows, len(ids))
            sims = m[lo:hi] @ m.T  # (tile, c)
            hit = sims >= threshold
            # keep only row < col (upper triangle of the full matrix)
            ii, jj = np.nonzero(hit)
            keep = (ii + lo) < jj
            union_edges(ii[keep] + lo, jj[keep])
        roots = np.fromiter((find(int(i)) for i in range(len(ids))), dtype=np.int64)
        keeper = ids[roots]  # root index is the component's min id
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": np.full(len(ids), int(pdf["_list"].iat[0]), dtype=np.int32),
                "keeper_id": keeper,
                "is_keeper": keeper == ids,
            }
        )

    assigned = emb.select(
        F.col(id_col), F.col(vec_col), assign_udf(F.col(vec_col)).alias("_list")
    )
    return assigned.groupBy("_list").applyInPandas(dedup_cluster, schema=out_schema)


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_udf(planes: np.ndarray):
    """Vectorized sign-LSH bucketizer: one Arrow batch -> one numpy
    matmul (batch, dim) @ (dim, tables*bits), sign bits packed per
    table. This replaces a literal-expression formulation (tables x
    bits x dim literals) whose plan size exploded codegen time; the
    matmul is also the right shape at scale — O(1) Python calls per
    batch, BLAS inside.
    """
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    weights = 2 ** np.arange(n_bits, dtype=np.int64)  # bit packing

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        signs = (m.astype(np.float64) @ flat) >= 0  # (batch, T*B)
        bits = signs.reshape(len(m), n_tables, n_bits).astype(np.int64)
        packed = bits @ weights  # (batch, T)
        return pd.Series(list(packed))

    return buckets


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: union of per-table bucket matches,
    exact re-rank of candidates."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    bucket_udf = _bucket_udf(planes)

    def bucketize(df, idc, vc):
        return df.select(
            F.col(idc).alias("_id"),
            F.col(vc).alias("_v"),
            F.posexplode(bucket_udf(F.col(vc))).alias("table_id", "bucket"),
        )

    qb = bucketize(emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col)
    cb = bucketize(emb, id_col, vec_col)
    cand = (
        cb.join(
            F.broadcast(
                qb.select(
                    F.col("_id").alias("query_id"),
                    F.col("_v").alias("qv"),
                    "table_id",
                    "bucket",
                )
            ),
            ["table_id", "bucket"],
        )
        .filter(F.col("_id") != F.col("query_id"))
        .select(F.col("query_id"), F.col("qv"), F.col("_id").alias("neighbor_id"), F.col("_v").alias("nv"))
        .distinct()
    )
    x = with_cosine(cand, "qv", "nv")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        x.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cosine") * 10000).alias("cosine_x10000"),
        )
        .orderBy("query_id", "rank")
    )
