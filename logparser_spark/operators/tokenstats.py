"""Token-array-native statistics over pre-tokenized sequences
(doc_id, tokens:array<int32>) — the training-data-dedup operators that
work directly on the token payload instead of decoded text:

* ``dup_span_stats``  — corpus-level duplicate k-token-window detection
  (the exact-substring-dedup primitive from "Deduplicating Training
  Data Makes Language Models Better": a window that occurs more than
  once anywhere in the corpus marks its positions as duplicated).
* ``doc_repetition`` — within-document repeated-n-gram excess (the
  Gopher-style repetition quality gate), a pure map stage.
* ``hist_quantiles`` — EXACT distribution quantiles computed from a
  value histogram (scale-safe: per-group state is bounded by the value
  DOMAIN, never the row count — unlike ``percentile()`` which buffers
  every row per group).

The rolling window hash is an order-preserving polynomial hash mod
2^64 computed with ONE vectorized pass per Arrow batch: prefix sums of
token*B^pos wrap in uint64, and because B is odd it is invertible mod
2^64, so every window hash is a (prefix difference) * B^-start —
O(total_tokens) work, no per-window loop, no (windows x k) intermediate.
Reference parity: there is no token-level dedup in the reference (it
dedups rows via DB keys, schema.sql:35); these are the §2-extension
training-data ops required by the brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Odd multiplier (golden-ratio constant) -> invertible mod 2^64, so the
# prefix-difference trick below recovers a canonical per-window hash.
_B = 0x9E3779B97F4A7C15
_B_INV = pow(_B, -1, 1 << 64)
_MASK = (1 << 64) - 1


def _window_hash_batch(tok_series: pd.Series, k: int) -> list[np.ndarray]:
    """Per-row arrays of rolling k-window hashes, one vectorized pass.

    h(row, i) = sum_{j<k} t[i+j] * B^j  (mod 2^64), computed as
    (C[g+k] - C[g]) * B^-i where C is the running cumsum of
    t * B^(local_pos) over the batch-flattened token array. Window
    differences never cross row boundaries (only i <= len-k emitted),
    so the flat cumsum is safe.
    """
    n = len(tok_series)
    lens = np.fromiter(
        (0 if x is None else len(x) for x in tok_series), dtype=np.int64, count=n
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        return [np.empty(0, dtype=np.int64)] * n

    flat = np.empty(total, dtype=np.uint64)
    for i, x in enumerate(tok_series):
        if lens[i]:
            flat[offs[i] : offs[i + 1]] = np.asarray(x, dtype=np.int64).astype(
                np.uint64
            )

    max_len = int(lens.max())
    pw = np.empty(max_len, dtype=np.uint64)
    pw[0] = 1
    if max_len > 1:
        np.cumprod(np.full(max_len - 1, _B, dtype=np.uint64), out=pw[1:])
    ipw = np.empty(max_len, dtype=np.uint64)
    ipw[0] = 1
    if max_len > 1:
        np.cumprod(np.full(max_len - 1, _B_INV, dtype=np.uint64), out=ipw[1:])

    local = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
    cum = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(flat * pw[local], out=cum[1:])

    wlens = np.maximum(lens - k + 1, 0)
    woffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wlens, out=woffs[1:])
    tw = int(woffs[-1])
    if tw == 0:
        return [np.empty(0, dtype=np.int64)] * n
    wlocal = np.arange(tw, dtype=np.int64) - np.repeat(woffs[:-1], wlens)
    g = np.repeat(offs[:-1], wlens) + wlocal
    h = ((cum[g + k] - cum[g]) * ipw[wlocal]).view(np.int64)
    return [h[woffs[i] : woffs[i + 1]] for i in range(n)]


def window_hash_udf(k: int):
    """array<int> tokens -> array<long> of the row's k-window hashes.

    Nondeterministic-marked at definition so Catalyst never duplicates
    the kernel by pushing a filter on a derived column below an
    exchange (same trade as the parse UDF — see functions/parse.py).
    """

    @pandas_udf("array<long>")
    def wh(tokens: pd.Series) -> pd.Series:
        return pd.Series(_window_hash_batch(tokens, k))

    return wh.asNondeterministic()


def with_window_hashes(
    df: DataFrame, k: int, tokens_col: str = "tokens", out_col: str = "win_hashes"
) -> DataFrame:
    return df.withColumn(out_col, window_hash_udf(k)(F.col(tokens_col)))


def dup_span_stats(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    materialize: bool = True,
) -> DataFrame:
    """Corpus-duplicate token windows per document.

    Output: (doc_id, n_windows, dup_windows, dup_frac_x1000) where
    dup_windows counts positions whose k-token window occurs more than
    once ANYWHERE in the corpus (including elsewhere in the same doc).

    Scale plan (the canonical exact-span-dedup DAG): hash windows in a
    pure map stage -> explode -> ONE count groupBy on the 64-bit window
    hash (uniform keys; Zipf-hot windows combine map-side in the
    partial aggregate) -> join positions back on the hash (build side
    is one row per distinct window; probe-side hot keys are AQE
    skew-split) -> per-doc count groupBy. Integer-only outputs.

    A 64-bit order-preserving hash stands in for the window itself
    (equal windows always collide; a false collision needs
    sum(delta_j * B^j) = 0 mod 2^64 with |delta| < 2^21 — not reachable
    by this data, and the oracle comparison would expose it).
    """
    hashed = with_window_hashes(
        df.select(F.col(id_col).alias("doc_id"), tokens_col), k
    )
    pos = hashed.select("doc_id", F.explode_outer("win_hashes").alias("h"))
    if materialize:
        # The exploded positions feed TWO consumers (the per-window
        # count and the join probe); without materialization Spark
        # re-executes the tokenize+hash subtree per consumer (no
        # exchange reuse across a nondeterministic UDF). Persisting the
        # 16-byte (doc_id, h) rows once is the standard
        # substring-dedup shape: storage ~2x the token payload,
        # disk-spilling, vs re-reading + re-hashing the corpus.
        # Tracked so harnesses can release it between queries (spilled
        # blocks never age out on their own).
        from logparser_spark.operators.util import track_persist

        pos = track_persist(pos)
    occ = (
        pos.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    dup = occ.where(F.col("occ") > 1).select("h", F.lit(True).alias("is_dup"))
    marked = pos.join(dup, "h", "left")
    out = marked.groupBy("doc_id").agg(
        F.count("h").alias("n_windows"),
        F.count(F.when(F.col("is_dup"), F.lit(1))).alias("dup_windows"),
    )
    return out.select(
        "doc_id",
        "n_windows",
        "dup_windows",
        F.expr(
            "CASE WHEN n_windows = 0 THEN 0L"
            " ELSE (1000 * dup_windows) div n_windows END"
        ).alias("dup_frac_x1000"),
    )


def dup_span_removal(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """ExactSubstr REMOVAL accounting (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for each document,
    how many token positions are covered by at least one corpus-
    duplicated k-window — i.e. exactly how much text the span-removal
    rewrite would cut. Output: (doc_id, n_tok, n_removed, n_kept).

    The covered-position count is the measure of the UNION of the
    duplicated windows' intervals [i, i+k): with the dup starts sorted
    per doc, each start contributes min(k, next_start - start) and the
    last contributes k — one lag/lead window per doc over the (small)
    dup-start set, exactly reproducible in SQL. The detection DAG is
    ``dup_span_stats``'s (hash -> count groupBy -> semi join back);
    the extra per-doc window ranks only duplicated starts, not all
    positions.
    """
    hashed = with_window_hashes(
        df.select(F.col(id_col).alias("doc_id"), tokens_col), k
    )
    pos = hashed.select(
        "doc_id", F.posexplode("win_hashes").alias("i", "h")
    )
    # pos feeds two consumers (the occ groupBy and the semi-join probe);
    # persist or the tokenize+hash kernel runs twice — same trade as
    # dup_span_stats (no exchange reuse across a nondeterministic UDF);
    # tracked for between-query release by the harness
    from logparser_spark.operators.util import track_persist

    pos = track_persist(pos)
    occ = pos.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup_start = pos.join(
        occ.where(F.col("occ") > 1).select("h"), "h", "left_semi"
    ).select("doc_id", "i")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("i")
    # least() skips NULLs, so the last dup start (lead = NULL) already
    # yields k — no coalesce needed
    seg = F.least(F.lit(k).cast("long"), F.lead("i").over(w) - F.col("i"))
    removed = (
        dup_start.select("doc_id", seg.alias("seg"))
        .groupBy("doc_id")
        .agg(F.sum("seg").alias("n_removed"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        # NULL tokens count as empty (size(NULL) is NULL) — matching
        # token_histogram/rarity_score/_window_hash_batch, so the
        # operator family agrees on the same row
        F.coalesce(F.size(tokens_col), F.lit(0)).cast("long").alias("n_tok"),
    )
    return base.join(removed, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        (F.col("n_tok") - F.coalesce("n_removed", F.lit(0))).alias("n_kept"),
    )


def _remove_spans_batch(
    tok_series: pd.Series, starts_series: pd.Series, k: int
) -> list[np.ndarray]:
    """Per-row ExactSubstr rewrite: drop every token position covered
    by >=1 duplicated k-window whose start is listed in ``starts``.

    The covered mask is the classic difference-array interval union:
    +1 at each start, -1 at min(start+k, n), cumsum > 0 — O(n_tok +
    n_starts) per row, no per-interval inner loop, start order
    irrelevant (so the upstream collect_list needs no sort)."""
    out: list[np.ndarray] = []
    for toks, starts in zip(tok_series, starts_series):
        if toks is None or len(toks) == 0:
            out.append(np.empty(0, dtype=np.int32))
            continue
        t = np.asarray(toks, dtype=np.int32)
        if starts is None or len(starts) == 0:
            out.append(t)
            continue
        n = len(t)
        s = np.asarray(starts, dtype=np.int64)
        diff = np.zeros(n + 1, dtype=np.int64)
        np.add.at(diff, s, 1)
        np.add.at(diff, np.minimum(s + k, n), -1)
        covered = np.cumsum(diff[:-1]) > 0
        out.append(t[~covered])
    return out


def remove_spans_udf(k: int):
    """(tokens array<int>, dup_starts array<int>) -> array<int> of the
    kept tokens (ExactSubstr rewrite). Nondeterministic-marked for the
    same Catalyst-duplication reason as window_hash_udf."""

    @pandas_udf("array<int>")
    def rm(tokens: pd.Series, starts: pd.Series) -> pd.Series:
        return pd.Series(
            [a.tolist() for a in _remove_spans_batch(tokens, starts, k)]
        )

    return rm.asNondeterministic()


def dup_span_rewrite(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """ExactSubstr REWRITE materialization (Lee et al. 2022): the
    actual cleaned corpus, not just the accounting — every token
    position covered by a corpus-duplicated k-window is removed and
    the survivors are re-concatenated in order. Output:
    (doc_id, n_tok, n_kept, tokens_clean:array<int>).

    Scale plan: detection is ``dup_span_stats``'s DAG (rolling-hash
    kernel -> 16-byte position explode -> one occurrence groupBy ->
    semi-join back); the dup STARTS — not all positions — fold to one
    array per affected doc (collect_list bounded by windows-per-doc),
    and the original token arrays move exactly once, through the
    doc_id join with that small starts side. The rewrite itself is a
    pure map (difference-array mask per Arrow batch). No stage holds
    more than one doc's tokens plus its starts in Python memory.
    Reference parity: none (DB-key row dedup only, schema.sql:35);
    §2-extension op per the brief.
    """
    from logparser_spark.operators.util import track_persist

    hashed = with_window_hashes(
        df.select(F.col(id_col).alias("doc_id"), tokens_col), k
    )
    pos = hashed.select("doc_id", F.posexplode("win_hashes").alias("i", "h"))
    pos = track_persist(pos)
    occ = pos.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup_start = pos.join(
        occ.where(F.col("occ") > 1).select("h"), "h", "left_semi"
    )
    starts = dup_start.groupBy("doc_id").agg(
        F.collect_list("i").alias("_starts")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks")
    )
    joined = base.join(starts, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.coalesce(F.size("_toks"), F.lit(0)).cast("long").alias("n_tok"),
        remove_spans_udf(k)(F.col("_toks"), F.col("_starts")).alias(
            "tokens_clean"
        ),
    ).withColumn("n_kept", F.size("tokens_clean").cast("long")).select(
        "doc_id", "n_tok", "n_kept", "tokens_clean"
    )


def rewrite_witness_udf(k: int):
    """(tokens, dup_starts) -> struct(kept_sum long, kept_hash string):
    engine-portable content witnesses of the rewrite — exact token-id
    sum of the kept positions and md5 of their comma-joined decimal
    rendering (DuckDB: md5(string_agg(c::VARCHAR, ',' ORDER BY j))).
    Computed inside the kernel so the report path never materializes
    the cleaned arrays into the plan."""
    import hashlib

    @pandas_udf("kept_sum long, kept_hash string")
    def wit(tokens: pd.Series, starts: pd.Series) -> pd.DataFrame:
        cleaned = _remove_spans_batch(tokens, starts, k)
        return pd.DataFrame(
            {
                "kept_sum": [int(a.sum(dtype=np.int64)) for a in cleaned],
                "kept_hash": [
                    hashlib.md5(
                        ",".join(map(str, a.tolist())).encode()
                    ).hexdigest()
                    for a in cleaned
                ],
            }
        )

    return wit.asNondeterministic()


def dup_span_report(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    rewrite_witness: bool = False,
) -> DataFrame:
    """``dup_span_stats`` + ``dup_span_removal`` from ONE detection
    pass: per document, the corpus-duplicated k-window counts AND the
    ExactSubstr removal accounting (tokens covered by >=1 duplicated
    window). Output: (doc_id, n_windows, dup_windows, dup_frac_x1000,
    n_tok, n_removed, n_kept).

    Run separately, the two operators each rebuild the identical
    hash -> explode -> occurrence-count DAG (the expensive part: the
    rolling-hash kernel over every token). Here the exploded position
    table is hashed/persisted once; the per-window occurrence groupBy,
    the dup-flag join, the per-doc counts, and the interval-union
    window all hang off that single cached frame — the marked-position
    join subtree feeds both aggregates inside one plan, so Spark's
    exchange reuse dedups its shuffle. Storage/scale posture identical
    to dup_span_stats (16-byte position rows, AQE skew-split probe).
    """
    from logparser_spark.operators.util import track_persist

    hashed = with_window_hashes(
        df.select(F.col(id_col).alias("doc_id"), tokens_col), k
    )
    # posexplode_outer: empty/short docs keep one NULL row so they
    # surface with n_windows = 0 (and n_tok still reported)
    pos = hashed.select(
        "doc_id",
        # NULL tokens = empty (see dup_span_removal)
        F.coalesce(F.size(tokens_col), F.lit(0)).cast("long").alias("n_tok"),
        F.posexplode_outer("win_hashes").alias("i", "h"),
    )
    pos = track_persist(pos)
    occ = (
        pos.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    dup = occ.where(F.col("occ") > 1).select("h", F.lit(True).alias("is_dup"))
    marked = pos.join(dup, "h", "left")
    per_doc = marked.groupBy("doc_id").agg(
        F.max("n_tok").alias("n_tok"),
        F.count("h").alias("n_windows"),
        F.count(F.when(F.col("is_dup"), F.lit(1))).alias("dup_windows"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("i")
    seg = F.least(F.lit(k).cast("long"), F.lead("i").over(w) - F.col("i"))
    removed = (
        marked.where(F.col("is_dup"))
        .select("doc_id", seg.alias("seg"))
        .groupBy("doc_id")
        .agg(F.sum("seg").alias("n_removed"))
    )
    out = per_doc.join(removed, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        "dup_windows",
        F.expr(
            "CASE WHEN n_windows = 0 THEN 0L"
            " ELSE (1000 * dup_windows) div n_windows END"
        ).alias("dup_frac_x1000"),
        "n_tok",
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        (F.col("n_tok") - F.coalesce("n_removed", F.lit(0))).alias("n_kept"),
    )
    if not rewrite_witness:
        return out
    # ExactSubstr rewrite witnesses from the SAME detection pass: the
    # dup starts fold to one small array per affected doc, the original
    # token arrays move once (the doc_id join), and the kernel emits
    # only (kept_sum, kept_hash) — the cleaned arrays never enter the
    # plan. Cross-checks the accounting: the oracle recomputes both
    # sides independently, so n_kept and the witnesses must agree.
    starts = (
        marked.where(F.col("is_dup"))
        .groupBy("doc_id")
        .agg(F.collect_list("i").alias("_starts"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks")
    )
    wit = (
        base.join(starts, "doc_id", "left")
        .select(
            "doc_id",
            rewrite_witness_udf(k)(F.col("_toks"), F.col("_starts")).alias(
                "_w"
            ),
        )
        .select("doc_id", "_w.kept_sum", "_w.kept_hash")
    )
    return out.join(wit, "doc_id", "left")


def doc_repetition(
    df: DataFrame, k: int = 4, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Within-document repeated-window excess (Gopher repetition gate).

    dup_excess = n_windows - n_distinct_windows, computed row-locally
    (array_distinct on the hash array) — a pure map stage with NO
    shuffle at any scale; the natural pre-filter before the corpus-wide
    ``dup_span_stats`` pass.
    """
    hashed = with_window_hashes(
        df.select(F.col(id_col).alias("doc_id"), tokens_col), k
    )
    n_win = F.size("win_hashes").cast("long")
    n_distinct = F.size(F.array_distinct("win_hashes")).cast("long")
    return hashed.select(
        "doc_id",
        n_win.alias("n_windows"),
        (n_win - n_distinct).alias("dup_excess"),
        F.expr(
            "CASE WHEN size(win_hashes) = 0 THEN 0L"
            " ELSE (1000 * (size(win_hashes) - size(array_distinct(win_hashes))))"
            " div size(win_hashes) END"
        ).cast("long").alias("rep_frac_x1000"),
    )


def token_histogram(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Exact corpus unigram stats: (token, occurrences, docs) where
    occurrences counts every position and docs counts distinct
    sequences containing the token — the vocabulary-coverage /
    token-frequency table used for mixture weighting and tokenizer
    audits.

    Scale plan: a mapInPandas kernel folds each Arrow batch into a
    per-batch histogram with ONE vectorized np.unique pass (both counts
    from the same sort: occurrences over the flattened positions, docs
    over the per-row distinct sets), so the shuffle carries at most
    |vocab| rows per task — bounded by the token DOMAIN (<= 256k for
    real BPE vocabularies), never the corpus size. The alternative
    explode -> groupBy has the same shuffle bound (partial hash agg)
    but materializes one row PER TOKEN POSITION into the aggregate,
    row-at-a-time; the kernel does the equivalent combine at numpy
    speed. The docs count needs no COUNT(DISTINCT) rewrite (no Expand
    doubling) because per-row distinctness is resolved locally.
    """

    def fold(batches):
        for pdf in batches:
            arrs = [
                np.asarray(x, dtype=np.int64)
                for x in pdf[tokens_col]
                if x is not None and len(x)
            ]
            if not arrs:
                continue
            tok, occ = np.unique(np.concatenate(arrs), return_counts=True)
            # the per-row-distinct concat has the SAME key set as tok
            # (every batch token appears in at least one row), so the
            # doc counts align with tok positionally
            _, docs = np.unique(
                np.concatenate([np.unique(a) for a in arrs]), return_counts=True
            )
            yield pd.DataFrame(
                {"token": tok.astype(np.int32), "occurrences": occ, "docs": docs}
            )

    partials = df.select(tokens_col).mapInPandas(
        fold, "token int, occurrences long, docs long"
    )
    return partials.groupBy("token").agg(
        F.sum("occurrences").alias("occurrences"), F.sum("docs").alias("docs")
    )


def rarity_score(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    scale: int = 1_000_000,
    min_count: int = 2,
) -> DataFrame:
    """Per-sequence rare-token density — the corpus-statistics quality
    gate: score each document against GLOBAL unigram frequencies
    (rare/misspelled/garbage tokens score high, boilerplate scores low).

    Output: (doc_id, n_tok, rarity_sum, n_rare) where each position
    contributes ``scale // occ(token)`` to rarity_sum (integer-exact —
    no cross-engine float drift) and n_rare counts positions whose
    token occurs fewer than ``min_count`` times corpus-wide.

    Scale plan (the canonical two-pass corpus-stats pattern): pass 1 is
    ``token_histogram`` (shuffle bounded by |vocab|, never corpus
    size); the histogram — domain-bounded, <= 256k rows for real BPE
    vocabularies — is collected and broadcast like any dimension table;
    pass 2 scores every sequence in a PURE MAP stage (np.searchsorted
    lookup + np.add.reduceat per Arrow batch). Nothing data-sized ever
    shuffles — unlike the explode -> broadcast-join -> per-doc groupBy
    formulation, whose final groupBy shuffles one row per token
    POSITION.

    The broadcast lives until the returned plan is garbage-collected
    (it is captured by the UDF closure); per-job usage is one
    vocab-sized broadcast, same lifetime class as a broadcast dim
    table. Repeated calls in one long session each ship a fresh one.
    """
    hist = token_histogram(df, tokens_col).toPandas()
    order = np.argsort(hist["token"].to_numpy())
    vocab = hist["token"].to_numpy()[order].astype(np.int64)
    occ = hist["occurrences"].to_numpy()[order].astype(np.int64)
    weights = scale // occ
    rare = (occ < min_count).astype(np.int64)
    bc = df.sparkSession.sparkContext.broadcast((vocab, weights, rare))

    def score(batches):
        voc, w, r = bc.value
        for pdf in batches:
            n = len(pdf)
            toks = pdf[tokens_col]
            lens = np.fromiter(
                (0 if x is None else len(x) for x in toks),
                dtype=np.int64,
                count=n,
            )
            total = int(lens.sum())
            out = {
                id_col: pdf[id_col],
                "n_tok": lens,
                "rarity_sum": np.zeros(n, dtype=np.int64),
                "n_rare": np.zeros(n, dtype=np.int64),
            }
            if total and len(voc):
                flat = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in toks if x is not None and len(x)]
                )
                idx = np.searchsorted(voc, flat).clip(0, len(voc) - 1)
                # tokens absent from the pass-1 vocab (possible only if
                # the input re-evaluates nondeterministically between
                # passes) score 0 instead of aliasing a neighbor
                known = voc[idx] == flat
                offs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(lens, out=offs[1:])
                nz = lens > 0
                starts = offs[:-1][nz]
                out["rarity_sum"][nz] = np.add.reduceat(
                    np.where(known, w[idx], 0), starts
                )
                out["n_rare"][nz] = np.add.reduceat(
                    np.where(known, r[idx], 0), starts
                )
            yield pd.DataFrame(out)

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, tokens_col).mapInPandas(
        score, f"{id_col} {id_t}, n_tok long, rarity_sum long, n_rare long"
    )


def decontaminate_stats(
    train: DataFrame,
    bench: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold_x1000: int = 0,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): per training
    document, how many of its k-token windows also occur anywhere in a
    held-out benchmark set, and a contamination flag: hit_windows > 0
    AND exact 1000*hit_windows >= threshold_x1000*n_windows
    (cross-multiplied — never the floored display column, which rounds
    a 1-in-2000-window hit to 0). The default threshold_x1000=0 is
    strict any-overlap (GPT-3 appendix-C: one colliding window flags
    the doc regardless of its length).

    Output: (doc_id, n_windows, hit_windows, hit_frac_x1000,
    contaminated). ``decontaminate`` below is the filtering form.

    Scale plan: both sides hash windows with the shared rolling-hash
    kernel (pure map). The benchmark window set is SMALL by nature
    (eval suites, not corpora) -> distinct hashes then a BROADCAST
    left-semi probe against the exploded training windows, so the
    data-sized side never shuffles: explode is narrow, the semi join is
    map-side, and the only exchanges are the per-doc count groupBy
    (16-byte rows) and the tiny benchmark distinct.
    """
    bench_h = (
        with_window_hashes(bench.select(tokens_col), k)
        .select(F.explode("win_hashes").alias("h"))
        .distinct()
    )
    pos = with_window_hashes(
        train.select(F.col(id_col).alias("doc_id"), tokens_col), k
    ).select("doc_id", F.explode_outer("win_hashes").alias("h"))
    hit = F.broadcast(bench_h.withColumn("is_hit", F.lit(True)))
    out = (
        pos.join(hit, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("h").alias("n_windows"),
            F.count(F.when(F.col("is_hit"), F.lit(1))).alias("hit_windows"),
        )
    )
    return out.select(
        "doc_id",
        "n_windows",
        "hit_windows",
        F.expr(
            "CASE WHEN n_windows = 0 THEN 0L"
            " ELSE (1000 * hit_windows) div n_windows END"
        ).alias("hit_frac_x1000"),
    ).withColumn(
        "contaminated",
        (F.col("hit_windows") > 0)
        & (
            1000 * F.col("hit_windows")
            >= F.lit(threshold_x1000) * F.col("n_windows")
        ),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold_x1000: int = 0,
) -> DataFrame:
    """Training rows with no (or below-threshold) benchmark window
    overlap — the filtering form of ``decontaminate_stats``. The flag
    side collapses to contaminated doc_ids only, so the final anti join
    broadcasts when the contaminated set is small (the common case)."""
    bad = (
        decontaminate_stats(
            train, bench, k, id_col, tokens_col, threshold_x1000
        )
        .where("contaminated")
        .select(F.col("doc_id").alias(id_col))
    )
    return train.join(bad, id_col, "left_anti")


class DomainTooLargeError(RuntimeError):
    """hist_quantiles got a value column whose distinct-value count
    exceeds the per-group histogram bound — a continuous/unbounded
    domain would buffer unbounded state in collect_list. Bucketize the
    value first or use approx_percentile."""


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q_nums: tuple[int, ...] = (500, 900, 990),
    max_domain: int | None = 1_000_000,
) -> DataFrame:
    """Exact linear-interpolated quantiles (quantile_cont semantics)
    from a value histogram, in integer arithmetic.

    For quantile q = q_num/1000 over n values: target index
    t = q_num*(n-1) (thousandths), lo = t // 1000, rem = t % 1000,
    result_x1000 = 1000*v[lo] + rem*(v[lo+1] - v[lo]) — exact integers
    end to end, so the DuckDB oracle reproduces it bit-for-bit.

    Scale plan: ONE groupBy on (group, value) with map-side partials
    does all the data-sized work; the packed per-group histogram is
    bounded by the value DOMAIN (token counts are line-length-bounded),
    not the row count — the buffering ``percentile()`` aggregate would
    OOM at 10^12 rows, this cannot. The bound is ENFORCED: a value
    column with more than ``max_domain`` distinct values (a continuous
    measurement, a raw timestamp) fails fast with DomainTooLargeError
    and the bucketize/approx_percentile advice, instead of OOMing the
    collect_list (``max_domain=None`` skips the probe for callers that
    know their domain).
    """
    hist = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    if max_domain is not None:
        # existence probe on the aggregated frame, which is persisted so
        # the probe's pass IS the main query's input (no second scan of
        # the raw data): stops at max_domain+1 distinct values. When the
        # guard trips, only the probe's partial cache was materialized
        # (MEMORY_AND_DISK — spills, never OOMs) and we raise before any
        # collect_list buffers.
        from logparser_spark.operators.util import track_persist

        hist = track_persist(hist)
        over = (
            hist.select(value_col)
            .distinct()
            .limit(max_domain + 1)
            .count()
        )
        if over > max_domain:
            raise DomainTooLargeError(
                f"{value_col} has > {max_domain} distinct values — the "
                "per-group histogram would buffer unbounded state; "
                "bucketize the value first (e.g. F.floor(col/width)) or "
                "use approx_percentile, or pass max_domain=None if the "
                "domain is genuinely bounded"
            )
    packed = hist.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(value_col).cast("long").alias("v"), F.col("cnt"))
            )
        ).alias("h")
    )

    qn = list(q_nums)

    @pandas_udf("array<long>")
    def qk(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            vs = [int(e["v"]) for e in h]
            cum = np.cumsum([int(e["cnt"]) for e in h])
            n = int(cum[-1]) if len(cum) else 0
            row = []
            for q in qn:
                if n == 0:
                    row.append(None)
                    continue
                t = q * (n - 1)
                lo, rem = divmod(t, 1000)
                v_lo = vs[int(np.searchsorted(cum, lo, side="right"))]
                v_hi = (
                    v_lo
                    if rem == 0
                    else vs[int(np.searchsorted(cum, lo + 1, side="right"))]
                )
                row.append(1000 * v_lo + rem * (v_hi - v_lo))
            out.append(row)
        return pd.Series(out)

    packed = packed.withColumn("qv", qk("h"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(q).cast("long") for q in qn]).alias("q_num"),
        F.col("qv").alias("q_x1000"),
    )
    return packed.select(
        *group_cols, F.explode(pairs).alias("p")
    ).select(*group_cols, F.col("p.q_num").alias("q_num"), F.col("p.q_x1000").alias("q_x1000"))


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q_nums: tuple[int, ...] = (500, 900, 990),
    accuracy: int = 10_000,
) -> DataFrame:
    """The unbounded-domain companion to ``hist_quantiles``: Spark's
    built-in ``percentile_approx`` (Greenwald-Khanna sketch — JVM-side,
    mergeable map-side partials, memory O(accuracy) per group no matter
    how many rows OR distinct values), emitted in ``hist_quantiles``'
    output shape ``(group..., q_num, q_x1000)`` so a caller that hits
    ``DomainTooLargeError`` on a continuous measurement column swaps one
    call for the other.

    Semantics differ where a sketch must: the result is a MEMBER of the
    input (rank error <= 1/accuracy of n), not the linear interpolation
    the exact op computes, so ``q_x1000`` is ``1000 * member`` — same
    fixed-point unit, no fractional part. The exact op stays the
    driver-checked default (cross-engine bit-exact); this is the escape
    hatch its guard message points at, for domains where a per-group
    histogram is unbounded (raw timestamps, float measurements).
    """
    qn = list(q_nums)
    agg = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(q / 1000.0) for q in qn]), F.lit(int(accuracy))
        ).alias("qv")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q).cast("long") for q in qn]).alias("q_num"),
        F.transform("qv", lambda v: v.cast("long") * F.lit(1000).cast("long")).alias(
            "q_x1000"
        ),
    )
    return agg.select(*group_cols, F.explode(pairs).alias("p")).select(
        *group_cols, F.col("p.q_num").alias("q_num"), F.col("p.q_x1000").alias("q_x1000")
    )


def collocations(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 5,
    k: int = 100,
    scale: int = 10**6,
) -> DataFrame:
    """Top-k collocations (statistically-bound token pairs) by
    pointwise mutual information over corpus bigrams — the classic
    collocation miner (Church & Hanks 1990, "Word Association Norms,
    Mutual Information, and Lexicography").

    PMI is computed with BIGRAM-POSITION marginals so one table feeds
    everything: ``pmi = log(N * c(ab) / (c_left(a) * c_right(b)))``
    where N = total bigram positions, c_left/c_right = how often a
    token opens/closes a bigram. Reported as the integer fixed-point
    ratio ``pmi_fp = (scale * N * c(ab)) div (c_left(a) * c_right(b))``
    — log is monotone, so ranking/thresholding pmi_fp IS ranking by
    PMI, and the integer form is cross-engine exact (the
    ``lm_score``/``bm25_score_fp`` convention). ``min_count`` drops
    rare pairs (PMI's well-known low-count instability); ties pinned
    (pmi_fp desc, a asc, b asc).

    Scale plan: ONE data-touching job — the packed-bigram mapInPandas
    fold (``lmscore._bigram_partials``: each Arrow batch collapses to
    a partial histogram, shuffle bounded by the observed bigram
    DOMAIN, never corpus size). The bigram table is persisted
    (domain-bounded) and everything downstream — both marginals, N,
    the candidate filter, the scoring joins (AQE-broadcast), and the
    TakeOrdered top-k — runs on bounded tables.

    Overflow contract (loud): ``scale * N * max c(ab)`` must fit
    int64; lower ``scale`` as the corpus grows — resolution needs only
    scale >> 1.
    """
    if min_count < 1 or k <= 0 or scale <= 0:
        raise ValueError(
            "collocations: min_count >= 1, k > 0, scale > 0 required"
        )
    from logparser_spark.operators.lmscore import _bigram_partials
    from logparser_spark.operators.util import track_persist

    big = (
        df.select(tokens_col)
        .mapInPandas(_bigram_partials(tokens_col), "code long, c long")
        .groupBy("code")
        .agg(F.sum("c").alias("cab"))
        .select(
            F.shiftright("code", 32).alias("a"),
            F.col("code").bitwiseAND(F.lit((1 << 32) - 1)).alias("b"),
            "cab",
        )
    )
    big = track_persist(big)
    tot = big.agg(
        F.coalesce(F.sum("cab"), F.lit(0)).alias("n"),
        F.coalesce(F.max("cab"), F.lit(0)).alias("max_cab"),
    ).first()
    n_big, max_cab = int(tot["n"]), int(tot["max_cab"])
    if scale * n_big * max(max_cab, 1) >= 2**63:
        raise ValueError(
            "collocations: scale * N * max bigram count overflows int64 — "
            "lower scale"
        )
    la = big.groupBy("a").agg(F.sum("cab").alias("ca"))
    rb = big.groupBy("b").agg(F.sum("cab").alias("cb"))
    return (
        big.where(F.col("cab") >= int(min_count))
        .join(la, "a")
        .join(rb, "b")
        .select(
            "a",
            "b",
            "cab",
            "ca",
            "cb",
            # one pre-multiplied literal: two small INT literals would
            # int32-overflow in constant folding before ever meeting
            # the BIGINT column under ANSI mode
            F.expr(f"({scale * n_big} * cab) div (ca * cb)").alias("pmi_fp"),
        )
        .orderBy(F.col("pmi_fp").desc(), "a", "b")
        .limit(int(k))
    )


def novelty_curve(
    df: DataFrame,
    k: int = 20,
    n_shards: int = 10,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Diminishing-returns curve of k-gram novelty per ingest shard —
    "how many NEVER-SEEN-BEFORE k-token windows does each additional
    slice of the corpus contribute?" (the data-scaling diagnostic
    behind dedup-aware dataset sizing: when new_windows flattens,
    more of the same crawl buys little).

    Docs are bucketed into ``n_shards`` ordered ingest shards by id
    range (``shard = least(n-1, doc_id * n div (max_id + 1))`` —
    deterministic, cross-engine exact); a window is NOVEL in the first
    shard (by that order) where it occurs.

    Output: one row per non-empty shard —
    (shard, n_positions, new_windows, cum_new_windows).

    Scale plan: the rolling-hash map (``with_window_hashes``, same
    64-bit window stand-in and collision argument as
    ``dup_span_stats``) -> explode -> ONE uniform groupBy on the
    window hash (min(shard) + nothing else carried; Zipf-hot windows
    combine map-side) -> a second groupBy collapsing the distinct-
    window table to ``n_shards`` rows. Per-shard position counts come
    off the same persisted exploded frame; the cumulative sum runs on
    <= n_shards rows. Token payloads cross zero shuffles.

    Overflow contract: ``max_id * n_shards`` must fit int64 (checked);
    for sparse/huge id domains map ids to dense ordinals first.
    """
    if k < 1 or n_shards < 1:
        raise ValueError("novelty_curve: k >= 1 and n_shards >= 1 required")
    from logparser_spark.operators.util import track_persist

    bounds = df.agg(F.max(F.col(id_col)).alias("m")).first()
    max_id = bounds["m"]
    if max_id is None:
        raise ValueError("novelty_curve: empty input")
    max_id = int(max_id)
    if max_id < 0:
        raise ValueError("novelty_curve: ids must be non-negative")
    if max_id * n_shards >= 2**63:
        raise ValueError(
            "novelty_curve: max_id * n_shards overflows int64 — map ids "
            "to dense ordinals first"
        )
    shard = F.least(
        F.lit(int(n_shards) - 1),
        F.expr(f"CAST({id_col} AS BIGINT) * {int(n_shards)} div {max_id + 1}"),
    ).cast("long")
    hashed = with_window_hashes(
        df.select(F.col(id_col), tokens_col).withColumn("shard", shard), k
    )
    pos = track_persist(
        hashed.select("shard", F.explode("win_hashes").alias("h"))
    )
    per_shard = pos.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_positions")
    )
    firsts = (
        pos.groupBy("h")
        .agg(F.min("shard").alias("first_shard"))
        .groupBy("first_shard")
        .agg(F.count(F.lit(1)).alias("new_windows"))
        .withColumnRenamed("first_shard", "shard")
    )
    from pyspark.sql import Window

    w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_shard.join(firsts, "shard", "left")
        .select(
            "shard",
            "n_positions",
            F.coalesce("new_windows", F.lit(0)).cast("long").alias("new_windows"),
        )
        # <= n_shards rows from here on — the single-partition window
        # sort is a constant-size driver-side-scale step, not a funnel
        .withColumn("cum_new_windows", F.sum("new_windows").over(w).cast("long"))
        .orderBy("shard")
    )
