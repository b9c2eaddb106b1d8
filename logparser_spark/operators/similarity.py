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


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    av, bv = _as_double(F.col(a)), _as_double(F.col(b))
    return df.withColumn(out, _dot(av, bv) / (_norm(av) * _norm(bv)))


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
        dim = len(emb.select(vec_col).first()[0])
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
