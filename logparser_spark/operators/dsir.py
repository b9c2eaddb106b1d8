"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over token sequences.

Select raw-corpus documents that look like a small TARGET corpus by
importance weights computed on hashed n-gram features:

1. featurize every sequence into B hash buckets (unigrams + bigrams of
   the token ids, one vectorized kernel pass — no per-row Python),
2. fit bag-of-buckets unigram distributions p (target) and q (raw)
   with add-alpha smoothing,
3. per-document importance weight  log w(x) = sum_b c_b(x) * (log p_b
   - log q_b),
4. Gumbel-top-k resampling: rank by log w + Gumbel noise derived
   DETERMINISTICALLY from (doc_id, seed) so the selection is stable
   under retries, repartitioning, and speculative execution (same
   property as ``hash_mix_sample``); ``gumbel_scale=0`` degrades to
   plain top-k by weight.

Scale plan (the two-pass broadcast-statistics pattern, same shape as
``rarity_score``): each histogram pass shuffles at most B rows per
task (B ~ 10k buckets, bounded by the FEATURE DOMAIN, never the corpus
size); the two B-vectors are collected and broadcast like dimension
tables; scoring is a PURE MAP stage (np.bincount + dot product per
Arrow batch); selection is a TakeOrdered top-k, no global sort.
Nothing data-sized ever shuffles.

Reference parity: none (the reference has no sampling/selection at
all); §2-extension op per the brief — data selection is the step
between raw-crawl dedup and mixture weighting in an LLM data pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 10_000  # paper's default hash-feature dimensionality

# odd multipliers for the 64-bit mixing hash (fixed, engine-portable;
# same construction as tokenstats' rolling window hash)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bucket_ids(t: np.ndarray, buckets: int) -> np.ndarray:
    """Hashed unigram + bigram bucket ids of one token array.

    splitmix-style avalanche on each token id, plus a combined hash of
    each adjacent pair — both folded into [0, buckets). Vectorized; the
    caller batches rows, this runs per row on an int64 view.
    """
    x = t.astype(np.uint64)
    h1 = x * _MIX1
    h1 ^= h1 >> np.uint64(29)
    h1 *= _MIX2
    h1 ^= h1 >> np.uint64(32)
    ids = h1 % np.uint64(buckets)
    if len(x) >= 2:
        hb = (x[:-1] * _MIX1) ^ (x[1:] * _MIX2)
        hb ^= hb >> np.uint64(29)
        hb *= _MIX1
        hb ^= hb >> np.uint64(32)
        ids = np.concatenate([ids, hb % np.uint64(buckets)])
    return ids.astype(np.int64)


def hashed_ngram_hist(
    df: DataFrame, tokens_col: str = "tokens", buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Corpus-level hashed n-gram bucket histogram: (bucket, count).

    mapInPandas kernel folds each Arrow batch into ONE np.bincount of
    length ``buckets`` and emits only the nonzero rows, so the final
    groupBy shuffles <= buckets rows per task — bounded by the feature
    domain, never the corpus (the explode->groupBy alternative moves
    one row per token position).
    """

    def fold(batches):
        for pdf in batches:
            acc = np.zeros(buckets, dtype=np.int64)
            for x in pdf[tokens_col]:
                if x is None or len(x) == 0:
                    continue
                ids = _bucket_ids(np.asarray(x, dtype=np.int64), buckets)
                acc += np.bincount(ids, minlength=buckets)
            nz = np.nonzero(acc)[0]
            if len(nz):
                yield pd.DataFrame({"bucket": nz, "count": acc[nz]})

    return (
        df.select(tokens_col)
        .mapInPandas(fold, "bucket int, count long")
        .groupBy("bucket")
        .agg(F.sum("count").alias("count"))
    )


def dsir_log_ratio(
    target_hist: pd.DataFrame,
    raw_hist: pd.DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
) -> np.ndarray:
    """Per-bucket log importance ratio  log p_b - log q_b  from the two
    collected histograms, with add-alpha smoothing so unseen buckets
    are finite. Driver-side numpy on two B-vectors (B ~ 10k)."""

    def dense(h: pd.DataFrame) -> np.ndarray:
        v = np.zeros(buckets, dtype=np.float64)
        if len(h):
            v[h["bucket"].to_numpy()] = h["count"].to_numpy()
        return v

    p = dense(target_hist) + alpha
    q = dense(raw_hist) + alpha
    return np.log(p / p.sum()) - np.log(q / q.sum())


def dsir_score(
    df: DataFrame,
    log_ratio: np.ndarray,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-document importance weight: ``(doc_id, n_feat, dsir_logw)``
    for a float ``log_ratio`` vector; an INTEGER vector (the
    fixed-point cross-engine-exact mode the driver oracle uses) yields
    a long column named ``dsir_w`` instead — the name change keeps a
    float plan from silently consuming integer weights or vice versa.

    ``log_ratio`` (a B-vector) ships to executors inside the task
    closure — at the default B=10k that is 80 KB per task binary, far
    below the point where a broadcast pays for itself, and unlike a
    broadcast it leaves no executor-resident block behind (repeated
    scoring calls in a long-lived session used to accumulate
    never-unpersisted broadcasts). Above ``_BROADCAST_MIN_BYTES`` a
    broadcast IS used and registered with ``operators.util`` so the
    session's next ``release_persisted()`` unpersists it. Scoring is
    one np.bincount + dot product per row inside a mapInPandas kernel —
    a pure map stage, zero shuffle. Empty/NULL token arrays score 0
    with n_feat 0 (no features, weight ratio 1).
    """
    out_t = "double" if np.issubdtype(log_ratio.dtype, np.floating) else "long"
    out_col = "dsir_logw" if out_t == "double" else "dsir_w"
    return _score_with(df, log_ratio, id_col, tokens_col, out_col, out_t)


# below this, ship the ratio vector as a broadcast (per-executor, not
# per-task); 2 MB of closure per task is where the copy cost shows
_BROADCAST_MIN_BYTES = 2 << 20


def _score_with(
    df: DataFrame,
    lam_vec: np.ndarray,
    id_col: str,
    tokens_col: str,
    out_col: str,
    out_type: str,
) -> DataFrame:
    buckets = len(lam_vec)
    acc_dtype = np.float64 if out_type == "double" else np.int64
    if lam_vec.nbytes >= _BROADCAST_MIN_BYTES:
        from logparser_spark.operators.util import track_broadcast

        bc = df.sparkSession.sparkContext.broadcast(lam_vec)
        track_broadcast(bc)
        get_lam = lambda: bc.value  # noqa: E731 — late-bound executor fetch
    else:
        get_lam = lambda: lam_vec  # noqa: E731 — plain closure capture

    # int mode: the per-bucket guard in dsir_ratio_int bounds one
    # weight, not a document's SUM of weights — int64 would wrap
    # silently on a long doc hitting heavy buckets, mis-ranking it
    # with no error. Bound the worst case per doc in the kernel.
    lam_max = int(lam_vec.max(initial=0)) if acc_dtype is np.int64 else 0

    def score(batches):
        lam = get_lam()
        for pdf in batches:
            n = len(pdf)
            w = np.zeros(n, dtype=acc_dtype)
            n_feat = np.zeros(n, dtype=np.int64)
            for i, x in enumerate(pdf[tokens_col]):
                if x is None or len(x) == 0:
                    continue
                ids = _bucket_ids(np.asarray(x, dtype=np.int64), buckets)
                n_feat[i] = len(ids)
                if acc_dtype is np.int64 and len(ids) * lam_max >= (1 << 63):
                    raise ValueError(
                        f"dsir int score overflow risk: {len(ids)} features "
                        f"x lam_max {lam_max} >= 2^63; lower the ratio scale"
                    )
                w[i] = lam[ids].sum()
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_feat": n_feat, out_col: w}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, tokens_col).mapInPandas(
        score, f"{id_col} {id_t}, n_feat long, {out_col} {out_type}"
    )


DSIR_RATIO_SCALE = 1 << 20  # fixed-point scale of the integer ratio mode


def dsir_ratio_int(
    target_hist: pd.DataFrame,
    raw_hist: pd.DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
    scale: int = DSIR_RATIO_SCALE,
) -> np.ndarray:
    """Integer-exact per-bucket importance weight — the engine-portable
    twin of ``dsir_log_ratio`` used by the driver-contract query:

        lam_q[b] = floor(scale * (p_b + alpha) * Q / ((q_b + alpha) * P))

    with P = sum_b (p_b + alpha), Q = sum_b (q_b + alpha). Computed in
    exact arbitrary-precision python ints (never float64), so a DuckDB
    HUGEINT oracle reproduces every value bit-for-bit — the log-domain
    weights (``dsir_log_ratio``) are the paper-faithful default but
    their floats are not cross-engine hashable; selection quality is
    equivalent for the smooth-histogram regime both operate in (the
    per-bucket ratio is the same quantity, summed instead of
    log-summed). Fits int64: lam_q <= scale * (Ptot+alpha) * Q / P;
    callers keep scale modest (2^20) so doc scores (n_feat * lam_max)
    stay far below 2^63 — asserted here, not assumed.
    """

    def dense(h: pd.DataFrame) -> np.ndarray:
        v = np.zeros(buckets, dtype=np.int64)
        if len(h):
            v[h["bucket"].to_numpy()] = h["count"].to_numpy()
        return v

    p = dense(target_hist)
    q = dense(raw_hist)
    P = int(p.sum()) + alpha * buckets
    Q = int(q.sum()) + alpha * buckets
    lam = np.empty(buckets, dtype=np.int64)
    for b in range(buckets):
        v = (scale * (int(p[b]) + alpha) * Q) // ((int(q[b]) + alpha) * P)
        if v >= (1 << 62):
            raise ValueError(
                f"ratio weight overflow risk at bucket {b}: {v} >= 2^62; "
                "lower scale or alpha-smooth harder"
            )
        lam[b] = v
    return lam


def dsir_select_int(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
    scale: int = DSIR_RATIO_SCALE,
) -> DataFrame:
    """DSIR selection in the integer-ratio mode: deterministic top-k by
    summed fixed-point bucket ratios, ties broken by ``id_col``. The
    distributed plan is IDENTICAL to ``dsir_select`` (two
    feature-domain-bounded histogram shuffles, one tiny weight vector
    shipped to a pure-map scoring kernel, TakeOrdered(k)) — only the
    driver-side weight arithmetic differs (exact ints vs log floats),
    which is what makes this variant DuckDB-oracle-checkable
    end to end. Output: (doc_id, n_feat, dsir_w).
    """
    t_hist = hashed_ngram_hist(target, tokens_col, buckets).toPandas()
    r_hist = hashed_ngram_hist(raw, tokens_col, buckets).toPandas()
    lam = dsir_ratio_int(t_hist, r_hist, buckets, alpha, scale)
    scored = dsir_score(raw, lam, id_col, tokens_col)
    return scored.orderBy(F.desc("dsir_w"), F.col(id_col)).limit(k)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    seed: int = 42,
    gumbel_scale: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR: pick the ``k`` raw documents whose hashed
    n-gram profile most resembles ``target``, by Gumbel-top-k over the
    importance weights (= sampling without replacement proportional to
    w^(1/gumbel_scale); gumbel_scale=0 -> deterministic argmax-k).

    Output: (doc_id, n_feat, dsir_logw, sel_key) of the selected rows.
    The Gumbel noise is a pure function of (doc_id, seed): u =
    xxhash64(doc_id, seed) mapped into (0,1), g = -log(-log(u)) — so
    the selected SET is reproducible on any cluster layout. Ties on
    sel_key break by doc_id (pinned order).

    Scale: two bounded histogram shuffles + one broadcast + one pure
    map + TakeOrdered(k); the raw corpus is scanned twice (histogram,
    scoring) and never shuffled.
    """
    t_hist = hashed_ngram_hist(target, tokens_col, buckets).toPandas()
    r_hist = hashed_ngram_hist(raw, tokens_col, buckets).toPandas()
    lam = dsir_log_ratio(t_hist, r_hist, buckets, alpha)
    scored = dsir_score(raw, lam, id_col, tokens_col)

    if gumbel_scale:
        # 53-bit mantissa-exact uniform in (0,1): (h53 + 1) / (2^53 + 2)
        # — never 0 or 1, so the double log is finite
        h53 = F.shiftrightunsigned(
            F.xxhash64(F.col(id_col), F.lit(seed)), 11
        )
        u = (h53.cast("double") + F.lit(1.0)) / F.lit(float((1 << 53) + 2))
        key = F.col("dsir_logw") + F.lit(float(gumbel_scale)) * -F.log(-F.log(u))
    else:
        key = F.col("dsir_logw")
    return (
        scored.withColumn("sel_key", key)
        .orderBy(F.desc("sel_key"), F.col(id_col))
        .limit(k)
    )
