"""Bigram language-model scoring for corpus quality filtering
(CCNet-style, arXiv:1911.00359).

CCNet filters web text by the perplexity of a small language model
trained on a trusted reference corpus: fluent text scores low
perplexity, boilerplate/garbage scores high. Re-expressed
token-native over (doc_id, tokens:array<int>) sequences:

- pass 1 (train): bigram-transition histogram over the REFERENCE
  slice via a mapInPandas fold — each Arrow batch collapses to one
  partial histogram with a single vectorized ``np.unique`` pass over
  packed ``(prev << 32) | tok`` codes, so the shuffle carries at most
  ``|observed bigrams|`` rows per task, bounded by the token DOMAIN
  squared and in practice by the train slice — never the corpus size
  (``token_histogram``'s plan). Left-context counts and the
  vocabulary size fall out of the same table driver-side.
- pass 2 (score): a PURE MAP numpy kernel over every document; the
  model (sorted bigram codes + counts, prev counts, V) travels as one
  broadcast like a dimension table (``rarity_score``'s plan). Nothing
  data-sized ever shuffles.

Two scoring modes:

- ``lm_score`` — integer-exact fixed-point: each transition
  contributes ``(scale * (c(bigram)+1)) // (c(prev)+V)`` (add-one
  smoothing, pure integer floor division, ZERO floats), so the result
  is bit-identical across engines and DuckDB-oracle-checkable — the
  same trick ``dsir.py`` uses for its driver row. Monotone in the
  true transition probability, so thresholding it IS thresholding the
  model probability.
- ``lm_perplexity`` — the true add-one-smoothed bigram perplexity
  ``exp(-mean(ln p))`` in doubles, for ranking in the library;
  differential-tested against an independent pure-python model
  (floats are not cross-engine hashable, hence no oracle row).

``lm_score_join`` is the unbounded-model fallback: when the observed
bigram table outgrows a broadcast (huge BPE vocabularies), the same
score is computed as a native Catalyst explode -> count-table join ->
per-doc re-aggregation — two data-sized shuffles, no collected model,
value-equal to the kernel path (tested).

Reference analog: the reference has no LM scoring; this extends the
quality-gate family (textstats.doc_stats, tokenstats.doc_repetition)
that stands in for its row-validity filters (service/
LogParserUtils.java:19-28 is the closest spiritual ancestor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparser_spark.operators.util import track_broadcast, track_persist

# token ids must fit the packed (prev << 32) | tok bigram code
_MAX_TOKEN = 1 << 31

DEFAULT_SCALE = 10**9


class BigramModel:
    """Collected add-one-smoothed bigram model (the broadcast payload).

    ``big_codes``/``big_counts``: sorted packed bigram codes and their
    train counts. ``prev_ids``/``prev_counts``: sorted left-context
    token ids and their counts (= how often the token occurs as a
    bigram left side). ``vocab_size``: distinct tokens over ALL train
    positions (the add-one V).
    """

    __slots__ = ("big_codes", "big_counts", "prev_ids", "prev_counts", "vocab_size")

    def __init__(self, big_codes, big_counts, prev_ids, prev_counts, vocab_size):
        self.big_codes = big_codes
        self.big_counts = big_counts
        self.prev_ids = prev_ids
        self.prev_counts = prev_counts
        self.vocab_size = int(vocab_size)


def _bigram_partials(tokens_col: str):
    """mapInPandas fold: one partial (code, c) histogram per batch."""

    def fold(batches):
        for pdf in batches:
            codes = []
            for x in pdf[tokens_col]:
                if x is None or len(x) < 2:
                    continue
                a = np.asarray(x, dtype=np.int64)
                # the packed-pair code is (left << 32) | right: ids
                # outside [0, 2^31) smear across the halves and count
                # pairs that never existed — fail loudly, not silently
                # (bigram_model re-checks via the histogram, but
                # bpe_train's count step has only this guard)
                if int(a.min()) < 0 or int(a.max()) >= _MAX_TOKEN:
                    raise ValueError(
                        "token ids must be in [0, 2^31) for packed-pair counting"
                    )
                codes.append((a[:-1] << 32) | a[1:])
            if not codes:
                continue
            code, c = np.unique(np.concatenate(codes), return_counts=True)
            yield pd.DataFrame({"code": code, "c": c})

    return fold


def bigram_model(train: DataFrame, tokens_col: str = "tokens") -> BigramModel:
    """Pass 1: train the model. Two vocab-bounded aggregate jobs (the
    bigram fold above + ``token_histogram`` for V), both collected —
    the broadcast-dims pattern; the collected size is bounded by the
    observed bigram/token domains, never by rows."""
    from logparser_spark.operators.tokenstats import token_histogram

    big = (
        train.select(tokens_col)
        .mapInPandas(_bigram_partials(tokens_col), "code long, c long")
        .groupBy("code")
        .agg(F.sum("c").alias("c"))
        .toPandas()
    )
    uni = token_histogram(train, tokens_col).toPandas()
    if uni.empty:
        raise ValueError("bigram_model: train slice has no tokens")
    if int(uni["token"].min()) < 0 or int(uni["token"].max()) >= _MAX_TOKEN:
        raise ValueError("bigram_model: token ids must be in [0, 2^31)")

    order = np.argsort(big["code"].to_numpy())
    big_codes = big["code"].to_numpy()[order].astype(np.int64)
    big_counts = big["c"].to_numpy()[order].astype(np.int64)
    # left-context counts: fold the bigram table by its prev half —
    # driver-side numpy over a domain-bounded table, no extra job
    prev_all = big_codes >> 32
    prev_ids, seg = np.unique(prev_all, return_index=True)
    prev_counts = np.add.reduceat(big_counts, seg) if len(big_counts) else np.array([], dtype=np.int64)
    return BigramModel(big_codes, big_counts, prev_ids, prev_counts.astype(np.int64), len(uni))


def _lookup(sorted_keys: np.ndarray, sorted_vals: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """vals[key] with 0 for absent keys (vectorized, like rarity's)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(keys), dtype=np.int64)
    idx = np.searchsorted(sorted_keys, keys).clip(0, len(sorted_keys) - 1)
    return np.where(sorted_keys[idx] == keys, sorted_vals[idx], 0)


def _transition_counts(model, toks, n):
    """Shared per-batch segment kernel for the fixed-point and
    perplexity scorers: per-doc transition counts ``n_big``, the
    looked-up per-transition bigram/left-context train counts
    (``cbg``, ``cu``), reduceat ``offs`` and the nonzero mask ``nz``.
    ``cbg`` is None when the batch has no transitions. Lives once so a
    fix to the filter/concatenate/reduceat mechanics cannot drift
    between the two scoring paths."""
    big_codes, big_counts, prev_ids, prev_counts, v = model
    n_big = np.fromiter(
        (0 if x is None or len(x) < 2 else len(x) - 1 for x in toks),
        dtype=np.int64,
        count=n,
    )
    if not n_big.sum():
        return n_big, None, None, None, None, v
    arrs = [
        np.asarray(x, dtype=np.int64) for x in toks if x is not None and len(x) >= 2
    ]
    prev = np.concatenate([a[:-1] for a in arrs])
    codes = (prev << 32) | np.concatenate([a[1:] for a in arrs])
    cbg = _lookup(big_codes, big_counts, codes)
    cu = _lookup(prev_ids, prev_counts, prev)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_big, out=offs[1:])
    return n_big, cbg, cu, offs, n_big > 0, v


def lm_score(
    df: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    scale: int = DEFAULT_SCALE,
    model: BigramModel | None = None,
) -> DataFrame:
    """Integer-exact LM fluency score per document.

    Output (doc_id, n_big, lm_sum, lm_mean), all exact integers:
    ``n_big`` = transition count (len-1), ``lm_sum`` = sum over
    transitions of ``(scale * (c(bigram)+1)) // (c(prev) + V)``,
    ``lm_mean = lm_sum // n_big`` (0 when the doc has < 2 tokens).
    Higher = more in-model. Scale plan: pass-1 aggregates are
    domain-bounded, pass 2 is a zero-shuffle map — see module doc.

    Overflow contract: ``scale * (max bigram count + 1)`` must fit
    int64; checked at model build (at web scale lower ``scale`` as
    counts grow — resolution needs only scale >> V).
    """
    if model is None:
        model = bigram_model(train if train is not None else df, tokens_col)
    if scale * (int(model.big_counts.max(initial=0)) + 1) >= 2**63:
        raise ValueError("lm_score: scale * max bigram count overflows int64")
    bc = df.sparkSession.sparkContext.broadcast(
        (model.big_codes, model.big_counts, model.prev_ids, model.prev_counts, model.vocab_size)
    )
    track_broadcast(bc)  # released by the session's next release_persisted()

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            n_big, cbg, cu, offs, nz, v = _transition_counts(
                bc.value, pdf[tokens_col], n
            )
            out = {
                "__id": pdf[id_col],
                "n_big": n_big,
                "lm_sum": np.zeros(n, dtype=np.int64),
            }
            if cbg is not None:
                w = (scale * (cbg + 1)) // (cu + v)
                out["lm_sum"][nz] = np.add.reduceat(w, offs[:-1][nz])
            res = pd.DataFrame(out)
            res["lm_mean"] = np.where(n_big > 0, out["lm_sum"] // np.maximum(n_big, 1), 0)
            yield res.rename(columns={"__id": id_col})

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, tokens_col).mapInPandas(
        score, f"{id_col} {id_t}, n_big long, lm_sum long, lm_mean long"
    )


def lm_score_join(
    df: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The unbounded-model twin of ``lm_score`` — same integers, pure
    Catalyst: explode transitions, join the (train-derived) count
    tables on uniform hash keys, re-aggregate per doc. Use when the
    observed bigram table outgrows a broadcast (huge BPE vocab x loose
    domains); two data-sized shuffles (the transition join keys and
    the per-doc groupBy), AQE free to broadcast the count tables when
    they ARE small. Value-equal to the kernel path (tested)."""
    if train is None:
        train = df

    def transitions(src: DataFrame, *extra):
        t = F.col(tokens_col)
        pairs = F.arrays_zip(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("prev"),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("tok"),
        )
        return src.select(*extra, F.explode(pairs).alias("p")).select(
            *extra, F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok")
        )

    tb = transitions(train).groupBy("prev", "tok").agg(F.count("*").alias("cbg"))
    tb = track_persist(tb)
    tu = tb.groupBy("prev").agg(F.sum("cbg").alias("cu"))
    stats = (
        train.select(F.explode(tokens_col).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
        .crossJoin(tb.agg(F.max("cbg").alias("max_cbg")))
        .first()
    )
    v = stats["v"]
    if not v:
        raise ValueError("lm_score_join: train slice has no tokens")
    # same int64 contract the kernel path enforces: Spark's non-ANSI
    # long multiply would wrap silently, diverging from the kernel
    # exactly when this unbounded-model path is the one in use
    if scale * ((stats["max_cbg"] or 0) + 1) >= 2**63:
        raise ValueError("lm_score_join: scale * max bigram count overflows int64")

    per = (
        transitions(df, id_col)
        .join(tb, ["prev", "tok"], "left")
        .join(tu, ["prev"], "left")
        .select(
            id_col,
            (
                F.lit(int(scale)) * (F.coalesce(F.col("cbg"), F.lit(0)) + 1)
            ).cast("long").alias("num"),
            (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(int(v))).alias("den"),
        )
        .select(id_col, F.expr("num div den").alias("w"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_big"), F.sum("w").alias("lm_sum"))
    )
    return (
        df.select(id_col)
        .join(per, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_big", F.lit(0)).cast("long").alias("n_big"),
            F.coalesce("lm_sum", F.lit(0)).cast("long").alias("lm_sum"),
            F.coalesce(F.expr("lm_sum div n_big"), F.lit(0)).cast("long").alias("lm_mean"),
        )
    )


def lm_perplexity(
    df: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    model: BigramModel | None = None,
) -> DataFrame:
    """True add-one-smoothed bigram perplexity per doc (CCNet's
    ranking statistic): ``exp(-mean(ln((c(bigram)+1)/(c(prev)+V))))``.
    Doubles — library/ranking use; the oracle-checkable twin is
    ``lm_score``. Same broadcast + pure-map plan."""
    if model is None:
        model = bigram_model(train if train is not None else df, tokens_col)
    bc = df.sparkSession.sparkContext.broadcast(
        (model.big_codes, model.big_counts, model.prev_ids, model.prev_counts, model.vocab_size)
    )
    track_broadcast(bc)  # released by the session's next release_persisted()

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            n_big, cbg, cu, offs, nz, v = _transition_counts(
                bc.value, pdf[tokens_col], n
            )
            ppl = np.full(n, np.nan)
            if cbg is not None:
                nll = -np.log((cbg + 1.0) / (cu + float(v)))
                sums = np.add.reduceat(nll, offs[:-1][nz])
                ppl[nz] = np.exp(sums / n_big[nz])
            yield pd.DataFrame({id_col: pdf[id_col], "n_big": n_big, "ppl": ppl})

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, tokens_col).mapInPandas(
        score, f"{id_col} {id_t}, n_big long, ppl double"
    )


def lm_filter(
    df: DataFrame,
    train: DataFrame | None = None,
    min_mean: int = 0,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The quality gate: keep documents whose integer fluency mean
    clears ``min_mean`` (calibrate on a held-out slice — CCNet keeps
    the head/middle of the perplexity distribution). Semi-join keeps
    the full original rows; the score side is the zero-shuffle map."""
    keep = lm_score(df, train, id_col, tokens_col, scale).where(
        F.col("lm_mean") >= min_mean
    )
    return df.join(keep.select(id_col), [id_col], "left_semi")
