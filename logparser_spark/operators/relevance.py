"""BM25 / tf-idf relevance scoring for corpus curation
(Okapi BM25 — Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond", Found. Trends IR 3(4)).

Training-data pipelines use query-relevance scoring to pull topical
slices out of a web corpus (e.g. "rank every document against a
seed-term set describing the target domain, keep the head"). This is
BM25 over a fixed, small query-term set — which at corpus scale has a
much better plan than the search-engine formulation (inverted index):

- pass 1 (stats): ONE aggregate job over the corpus computes N,
  sum(dl), max(dl) and the per-term document frequencies — the output
  is one row bounded by |query terms|, never by corpus size (the
  broadcast-dims pattern of ``rarity_score``/``lmscore``).
- pass 2 (score): a ZERO-SHUFFLE Catalyst projection. Per-term tf is
  ``size(filter(tokens, t -> t = term))`` — a whole-stage-codegen
  higher-order function, no explode, no Python — and the per-term idf
  weights ride along as literals folded from pass 1. Nothing
  data-sized ever shuffles; the scored frame fuses into the scan.

Two scorers (the ``lmscore`` convention):

- ``bm25_score`` — true Okapi BM25 in doubles (Lucene's positive idf
  variant ``ln(1 + (N - df + .5)/(df + .5))``), the production
  ranking statistic. Floats are not cross-engine hashable, so this
  path is differential-pytest-pinned, not oracled.
- ``bm25_score_fp`` — integer fixed-point twin with the rational idf
  ``(2(N - df) + 1)/(2df + 1)`` (the same ratio without the log, a
  monotone transform of it) and k1 = 6/5, b = 3/4 kept as exact
  rationals, so every contribution is a pure integer floor division —
  bit-identical across engines and DuckDB-oracle-checkable.

Overflow contract (checked loudly at plan build, the ``lm_score``
convention): the fixed-point numerator ``idf_fp * 44 * tf * scale_dl``
must fit int64 given the observed N and max(dl); at web scale lower
``scale_idf``/``scale_dl`` — resolution needs only scale >> 1. The
float path has no such bound and is the one that runs at 100 TB.

Reference analog: the reference has no relevance scoring; this extends
the corpus-curation family (sampling.curation_funnel, dsir.dsir_select)
with the classic lexical-relevance selector.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# k1 = 6/5, b = 3/4 as exact rationals. Multiplying BM25's per-term
# denominator  tf + k1*(1 - b + b*dl/avgdl)  by 20*scale_dl gives
#   20*scale_dl*tf + 6*scale_dl + 18*ndl_fp   (ndl_fp = scale_dl*dl/avgdl)
# and the numerator tf*(k1+1) becomes 44*scale_dl*tf — all integers.
K1 = 1.2
B = 0.75

DEFAULT_SCALE_IDF = 10**4
DEFAULT_SCALE_DL = 10**4


def _tokens_col(text_col: str):
    """Whitespace tokens, NULL-text-safe (NULL -> empty array so dl=0
    and every tf=0, matching COALESCE(string_split(..), []) in SQL)."""
    return F.coalesce(
        F.split(F.col(text_col), " "), F.array().cast("array<string>")
    )


def _tf(tokens, term: str):
    """Per-doc term frequency as a zero-shuffle HOF — no explode."""
    return F.size(F.filter(tokens, lambda x: x == F.lit(term))).cast("long")


def _corpus_stats(
    docs: DataFrame, terms: list[str], text_col: str
) -> tuple[int, int, int, list[int]]:
    """Pass 1: one aggregate job -> (N, sum_dl, max_dl, df per term).
    Output is one row of 3 + |terms| values — bounded metadata, the
    broadcast-dims pattern; collecting it is not a driver-side loop."""
    toks = _tokens_col(text_col)
    aggs = [
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).alias("sum_dl"),
        F.coalesce(F.max(F.size(toks)), F.lit(0)).alias("max_dl"),
    ]
    for i, t in enumerate(terms):
        aggs.append(F.sum((_tf(toks, t) > 0).cast("long")).alias(f"df_{i}"))
    row = docs.agg(*aggs).first()
    return (
        int(row["n_docs"]),
        int(row["sum_dl"]),
        int(row["max_dl"]),
        [int(row[f"df_{i}"]) for i in range(len(terms))],
    )


def _check_terms(query_terms) -> list[str]:
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    if not terms:
        raise ValueError("bm25: query_terms must be non-empty")
    if len(terms) > 1024:
        raise ValueError(
            "bm25: query_terms is a fixed small seed set (<= 1024); for "
            "document-vs-document similarity use the dedup/ANN operators"
        )
    return terms


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Okapi BM25 (doubles) of every document against a fixed query.

    Output (id, dl, tf_sum, score): dl = whitespace token count,
    tf_sum = total query-term occurrences, score = sum over terms of
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with Lucene's
    positive idf ``ln(1 + (N - df + .5)/(df + .5))``. Terms absent
    from the corpus (df = 0) contribute 0 by definition (tf = 0
    everywhere) and are skipped. Empty corpus -> empty result.

    Plan: one bounded stats aggregate, then a zero-shuffle projection
    (see module doc). The scored frame is lazy; the stats job runs at
    plan-build time (it is the model-fit step, like ``bigram_model``).
    """
    terms = _check_terms(query_terms)
    n, sum_dl, _, dfs = _corpus_stats(docs, terms, text_col)
    toks = _tokens_col(text_col)
    dl = F.size(toks).cast("long")

    contribs = []
    tfs = []
    for t, df_t in zip(terms, dfs):
        tf = _tf(toks, t)
        tfs.append(tf)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        # avgdl = sum_dl / n (n > 0 because df_t >= 1)
        denom = tf.cast("double") + F.lit(
            float(k1) * (1.0 - float(b))
        ) + F.lit(float(k1) * float(b) * n / sum_dl) * dl.cast("double")
        contribs.append(
            F.lit(idf) * tf.cast("double") * F.lit(1.0 + float(k1)) / denom
        )
    score = sum(contribs[1:], contribs[0]) if contribs else F.lit(0.0)
    tf_sum = sum(tfs[1:], tfs[0])
    return docs.select(
        F.col(id_col),
        dl.alias("dl"),
        tf_sum.alias("tf_sum"),
        score.cast("double").alias("score"),
    )


def bm25_score_fp(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    scale_idf: int = DEFAULT_SCALE_IDF,
    scale_dl: int = DEFAULT_SCALE_DL,
) -> DataFrame:
    """Integer fixed-point BM25 twin — every value a pure integer
    floor division, bit-identical in DuckDB (the oracle surface).

    Per corpus-present term (df >= 1):
        idf_fp  = (scale_idf * (2*(N - df) + 1)) div (2*df + 1)
        ndl_fp  = (scale_dl * dl * N) div sum_dl
        contrib = (idf_fp * 44 * tf * scale_dl)
                  div (20*tf*scale_dl + 6*scale_dl + 18*ndl_fp)
    Output (id, dl, tf_sum, score_fp) with score_fp = sum of
    contributions (scale_idf-scaled). Monotone per term in the float
    score's rational core, so thresholding/ranking it ranks by the
    same lexical signal; the log-idf production path is
    ``bm25_score``. All operands non-negative, so Spark's
    truncate-toward-zero ``div`` and DuckDB's floor ``//`` agree.
    """
    terms = _check_terms(query_terms)
    if scale_idf <= 0 or scale_dl <= 0:
        raise ValueError("bm25_score_fp: scales must be positive")
    n, sum_dl, max_dl, dfs = _corpus_stats(docs, terms, text_col)

    # loud int64 contract (see module doc): largest numerator is
    # idf_fp_max * 44 * max_dl * scale_dl; largest ndl numerator is
    # scale_dl * max_dl * N.
    idf_fp_max = max(
        (
            (scale_idf * (2 * (n - d) + 1)) // (2 * d + 1)
            for d in dfs
            if d > 0
        ),
        default=0,
    )
    if idf_fp_max * 44 * max(max_dl, 1) * scale_dl >= 2**63 or (
        scale_dl * max(max_dl, 1) * max(n, 1) >= 2**63
    ):
        raise ValueError(
            "bm25_score_fp: fixed-point domain overflows int64 at this "
            "corpus size — lower scale_idf/scale_dl (or use bm25_score, "
            "the float production path)"
        )

    toks = _tokens_col(text_col)
    dl = F.size(toks).cast("long")

    pre = [F.col(id_col), dl.alias("dl")]
    present = []  # (i, idf_fp) for df>0 terms
    for i, (t, df_t) in enumerate(zip(terms, dfs)):
        pre.append(_tf(toks, t).alias(f"tf_{i}"))
        if df_t > 0 and n > 0 and sum_dl > 0:
            present.append((i, (scale_idf * (2 * (n - df_t) + 1)) // (2 * df_t + 1)))
    staged = docs.select(*pre)

    tf_sum = sum(
        (F.col(f"tf_{i}") for i in range(1, len(terms))), F.col("tf_0")
    )
    if present:
        contribs = [
            F.expr(
                f"({idf_fp * 44 * scale_dl} * tf_{i}) div "
                f"(20 * {scale_dl} * tf_{i} + {6 * scale_dl} + 18 * "
                f"(({scale_dl} * dl * {n}) div {sum_dl}))"
            )
            for i, idf_fp in present
        ]
        score = sum(contribs[1:], contribs[0])
    else:
        score = F.lit(0).cast("long")
    return staged.select(
        id_col,
        "dl",
        tf_sum.cast("long").alias("tf_sum"),
        score.cast("long").alias("score_fp"),
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = DEFAULT_SCALE_IDF,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Top-k salient terms per document by tf-idf — the keyword /
    topic-fingerprint extractor (classic tf-idf; Sparck Jones 1972).

    Output (id, rank, term, tf, score_fp), rank 1..k per doc, with the
    integer score ``score_fp = tf * idf_fp`` and the rational idf
    ``idf_fp = (scale * (2*(N - df) + 1)) div (2*df + 1)`` (monotone in
    the log idf — see ``bm25_score_fp``); ties broken (score desc,
    term asc), both pinned so the row set is engine-exact. Terms with
    ``df < min_df`` or ``df > max_df_ratio * N`` are dropped first
    (the stopword guard).

    Scale plan (unlike BM25's fixed seed set, this runs over the FULL
    vocabulary, so the df table cannot ride along as literals):
    - explode -> per-(doc, term) counts: ONE data-sized shuffle whose
      key includes doc_id, so it is uniform by construction (a hot
      term does not funnel — its counts pre-aggregate map-side per
      doc);
    - term -> df: a second, |vocab|-bounded shuffle off the same
      frame (``token_histogram``'s bound);
    - tf x df join on term: the df side is vocab-bounded by
      construction and explicitly broadcast (stats through an explode
      are untrustworthy — see the inline comment);
    - per-doc top-k: groupBy(doc) with sort_array + slice — the
      collected list is bounded by the doc's own unique-term count
      (never corpus-sized), then explodes back to k rows.

    Overflow contract: ``scale * (2N + 1) * max tf`` must fit int64 —
    checked loudly against the observed N and max doc length.
    """
    if k <= 0:
        raise ValueError("tfidf_keywords: k must be positive")
    if min_df < 1 or not (0.0 < max_df_ratio <= 1.0):
        raise ValueError(
            "tfidf_keywords: min_df >= 1 and 0 < max_df_ratio <= 1 required"
        )
    toks = _tokens_col(text_col)
    stats = docs.agg(
        F.count("*").alias("n"),
        F.coalesce(F.max(F.size(toks)), F.lit(0)).alias("max_dl"),
    ).first()
    n, max_dl = int(stats["n"]), int(stats["max_dl"])
    if scale * (2 * n + 1) * max(max_dl, 1) >= 2**63:
        raise ValueError(
            "tfidf_keywords: scale * (2N+1) * max_dl overflows int64 — "
            "lower scale"
        )
    max_df = int(max_df_ratio * n)

    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_t = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .withColumn(
            "idf_fp",
            F.expr(f"({scale} * (2 * ({n} - df) + 1)) div (2 * df + 1)"),
        )
    )
    # explicit broadcast for the same reason as inverted_index: the tf
    # side's size estimate flows through explode and a low guess would
    # broadcast the corpus-sized side (see the comment there)
    scored = tf.join(F.broadcast(df_t), "term").select(
        id_col,
        "term",
        "tf",
        (F.col("tf") * F.col("idf_fp")).cast("long").alias("score_fp"),
    )
    top = (
        scored.groupBy(id_col)
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("score_fp")).alias("neg"),
                            F.col("term"),
                            F.col("tf"),
                            F.col("score_fp"),
                        )
                    )
                ),
                1,
                int(k),
            ).alias("tops")
        )
        .select(id_col, F.posexplode("tops").alias("pos", "t"))
    )
    return top.select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("t.term").alias("term"),
        F.col("t.tf").alias("tf"),
        F.col("t.score_fp").alias("score_fp"),
    )


def inverted_index(
    docs: DataFrame,
    shard_size: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Sharded inverted index (term -> sorted posting list of doc ids)
    — the retrieval-side companion of ``bm25_score`` and the classic
    "which documents contain this token" structure behind corpus
    search, decontamination lookups, and targeted re-crawls.

    The scale problem is posting-list skew: a stopword's postings are
    corpus-sized, so "groupBy(term) + collect_list" funnels the whole
    corpus through single reducers. Here every term is pre-split into
    ``n_shards = ceil(df / shard_size)`` shards and a doc lands in
    shard ``doc_id % n_shards`` — deterministic (engine-exact, SQL-
    reproducible) and uniform for dense id domains, so no collected
    list exceeds ~``shard_size`` regardless of term frequency. For
    non-dense/adversarial id spaces substitute a hash for the modulo
    (``pmod(xxhash64(id), n_shards)``) — same plan, loses only the
    cross-engine oracle.

    Output: (term, shard, n_shards, df, postings) with postings a
    doc_id-sorted array<long>, one row per (term, shard).

    Plan: per-doc ``array_distinct`` + explode -> distinct (doc, term)
    pairs (ONE data-sized shuffle, key includes doc_id -> uniform);
    term -> df (|vocab|-bounded shuffle); df joined back on term
    (explicitly broadcast — vocab-bounded by construction, and stats
    through an explode would otherwise risk broadcasting the corpus
    side); groupBy(term, shard) whose
    collected list is capped by shard sizing, never by df.
    ``min_df``/``max_df_ratio`` drop hapaxes/stopwords up front when
    the index should not carry them at all.
    """
    if shard_size <= 0:
        raise ValueError("inverted_index: shard_size must be positive")
    if min_df < 1 or not (0.0 < max_df_ratio <= 1.0):
        raise ValueError(
            "inverted_index: min_df >= 1 and 0 < max_df_ratio <= 1 required"
        )
    toks = _tokens_col(text_col)
    pairs = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )
    df_t = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if max_df_ratio < 1.0:
        n = docs.count()
        df_t = df_t.where(F.col("df") <= int(max_df_ratio * n))
    if min_df > 1:
        df_t = df_t.where(F.col("df") >= min_df)
    df_t = df_t.withColumn(
        "n_shards", F.expr(f"(df + {int(shard_size)} - 1) div {int(shard_size)}")
    )
    # the df side is |vocab|-bounded BY CONSTRUCTION — hint it as the
    # join build side explicitly. Leaving this to stats is actively
    # dangerous here: the exploded pairs side's size estimate flows
    # through explode (fan-out unknown to Catalyst), and a low estimate
    # makes the planner broadcast the CORPUS-sized pairs side — a
    # driver-side build of every (doc, term) row that serializes the
    # whole job (observed: 4x cores bought 1.2x). This is the bounded-
    # dims case where an explicit hint is the policy, not the
    # unbounded-candidate case where hints were removed.
    sharded = pairs.join(F.broadcast(df_t), "term").withColumn(
        "shard", F.pmod(F.col("id"), F.col("n_shards")).cast("long")
    )
    return (
        sharded.groupBy("term", "shard", "n_shards", "df")
        .agg(F.sort_array(F.collect_list("id")).alias("postings"))
        .select("term", "shard", "n_shards", "df", "postings")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Head of the corpus by BM25 — the curation selector. ORDER BY +
    LIMIT compiles to TakeOrderedAndProject: per-partition top-k
    heaps, only k rows cross to the driver-side merge, no full sort.
    Ties broken by id for determinism."""
    if k <= 0:
        raise ValueError("bm25_topk: k must be positive")
    return (
        bm25_score(docs, query_terms, id_col=id_col, text_col=text_col)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(int(k))
    )
