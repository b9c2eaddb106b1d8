"""Distributed BPE tokenizer training over token-array corpora.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is the
canonical subword-tokenizer trainer: repeatedly count adjacent symbol
pairs corpus-wide, merge the most frequent pair into a new symbol,
repeat. The iteration is inherently sequential in the MERGE RULE but
each step is embarrassingly parallel in the DATA — which is exactly
the Spark shape implemented here:

- count step: a packed-pair histogram fold — each Arrow batch
  collapses to one partial (pair, count) frame, so the shuffle per
  iteration carries at most ``|observed pairs|`` rows per task
  (domain-bounded, never corpus-sized), and the argmax is one tiny
  aggregate. Only iteration 0 pays a dedicated count scan
  (``lmscore._bigram_partials``); every later histogram is emitted by
  the merge pass itself.
- merge step: a PURE MAP numpy kernel rewrites every sequence
  greedily left-to-right (standard BPE semantics, overlap-safe:
  ``aaa`` under pair ``(a,a)`` merges once) — token payloads never
  shuffle, in any iteration — and yields the NEXT iteration's pair
  histogram from the arrays it just built, so each iteration touches
  payloads exactly once.
- plan hygiene: each iteration's output is eagerly
  ``localCheckpoint``ed, truncating the logical plan to one generation
  — stacking N mapInPandas stages into a single lineage makes Catalyst
  re-analysis exponential in N (see ``bpe_train``); checkpoint blocks
  of dropped generations are reclaimed by Spark's ContextCleaner.

Practical-scale notes, mirrored from how real tokenizers are trained:
pass a SAMPLE as ``train`` (pair statistics converge long before the
full corpus is counted) and apply the learned merge table everywhere
with ``bpe_apply`` — one kernel pass, zero shuffles, any corpus size.
Determinism: ties on count break toward the smallest packed pair
code, so the merge sequence is a pure function of the train corpus
(repartition-invariant; tested).

The reference has no tokenizer concept; this extends the
token-payload operator family (tokenstats/packing/lmscore) that the
north rule's pre-tokenized-sequence table makes first-class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparser_spark.operators.lmscore import _MAX_TOKEN, _bigram_partials

__all__ = ["bpe_train", "bpe_apply", "merge_pair_batch"]


def merge_pair_batch(a: np.ndarray, left: int, right: int, new_id: int) -> np.ndarray:
    """Greedy left-to-right single-pair merge of one sequence —
    the exact semantics every BPE implementation uses: scan once,
    merge non-overlapping occurrences, never re-merge output within
    the same pass (``aaa`` + pair (a,a) -> ``<new>a``)."""
    if len(a) < 2:
        return a
    hits = np.flatnonzero((a[:-1] == left) & (a[1:] == right))
    if len(hits) == 0:
        return a
    keep = []
    last = -2
    for h in hits:
        if h > last + 1:  # not consumed by the previous merge
            keep.append(h)
            last = h
    out = np.empty(len(a) - len(keep), dtype=a.dtype)
    w = r = 0
    for h in keep:
        n = h - r
        out[w : w + n] = a[r:h]
        w += n
        out[w] = new_id
        w += 1
        r = h + 2
    out[w:] = a[r:]
    return out


def _merge_count_kernel(left: int, right: int, new_id: int, tokens_col: str, id_col: str):
    """Merge one generation AND emit the packed-pair partial histogram
    of the OUTPUT in the same Arrow pass. Iteration i+1's argmax needs
    exactly these statistics, so fusing them here means each training
    iteration touches (and pandas-decodes) token payloads ONCE — the
    standalone count rescan that an unfused loop pays per iteration is
    gone. Doc rows carry (id, tokens, NULL, NULL); stat rows carry
    (NULL, NULL, pair_code, pair_c) — ``pair_code IS NULL`` is the
    discriminator (a stat row always has it set, a doc row never does).

    Range safety is inductive, not re-checked per pass: the iteration-0
    count (``_bigram_partials``) validates every input id < 2^31, and
    ``bpe_train`` bounds each new_id below ``_MAX_TOKEN``, so merged
    output can never smear across the packed halves."""

    def apply(batches):
        for pdf in batches:
            toks = []
            packs = []
            for x in pdf[tokens_col]:
                if x is None:
                    toks.append(None)
                    continue
                a = merge_pair_batch(np.asarray(x, dtype=np.int64), left, right, new_id)
                toks.append(a)
                if len(a) >= 2:
                    packs.append((a[:-1] << 32) | a[1:])
            docs = pd.DataFrame({id_col: pdf[id_col], tokens_col: toks})
            docs["pair_code"] = None
            docs["pair_c"] = None
            yield docs
            if packs:
                code, c = np.unique(np.concatenate(packs), return_counts=True)
                yield pd.DataFrame(
                    {
                        id_col: [None] * len(code),
                        tokens_col: [None] * len(code),
                        "pair_code": code,
                        "pair_c": c,
                    }
                )

    return apply


def _top_pair(train: DataFrame, tokens_col: str):
    """(left, right, count) of the most frequent adjacent pair, ties
    broken toward the smallest packed code; None when no pair exists.
    One domain-bounded shuffle + a 1-row aggregate. Used only for
    iteration 0 — later iterations read their histogram from the fused
    merge+count pass (``_argmax_partials``)."""
    return _argmax_partials(
        train.select(tokens_col)
        .mapInPandas(_bigram_partials(tokens_col), "code long, c long")
        .select(F.col("code").alias("pair_code"), F.col("c").alias("pair_c"))
    )


def _argmax_partials(partials: DataFrame):
    """Reduce a (pair_code, pair_c) partial-histogram frame to the
    winning (left, right, count), ties toward the smallest packed code.
    The groupBy is bounded by the observed pair domain, never rows."""
    row = (
        partials.groupBy("pair_code")
        .agg(F.sum("pair_c").alias("pair_c"))
        .orderBy(F.col("pair_c").desc(), F.col("pair_code").asc())
        .first()
    )
    if row is None:
        return None
    code = int(row["pair_code"])
    return code >> 32, code & 0xFFFFFFFF, int(row["pair_c"])


def bpe_train(
    train: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    new_id_start: int | None = None,
    docs_per_partition: int | None = 5_000,
) -> tuple[list[tuple[int, int, int, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from ``train``.

    Returns ``(merges, merged_df)``: ``merges`` is the ordered rule
    table ``[(left, right, new_id, count), ...]`` (the artifact you
    ship — apply it anywhere with ``bpe_apply``), ``merged_df`` the
    train corpus after all merges (same columns). Stops early when the
    best remaining pair occurs fewer than ``min_count`` times.

    ``new_id_start`` defaults to ``1 + max token id`` observed in
    train (one extra vocab-bounded job); pass it explicitly when the
    corpus vocabulary is known (e.g. 256 for byte-level).

    Per iteration exactly ONE data-touching job: the fused
    merge+count pass (``_merge_count_kernel``) rewrites every sequence
    and emits the next iteration's packed-pair partial histogram as a
    by-product, so the argmax that picks rule i+1 is a tiny aggregate
    over a few hundred cached stat rows — token payloads are never
    rescanned just to be counted (only iteration 0 pays a dedicated
    count scan, before any merge exists). Each generation is
    ``localCheckpoint``ed (eager), NOT merely persisted: persist keeps
    the full logical lineage, and re-analyzing a plan that deepens by
    one mapInPandas node per merge turns out to be exponential in
    depth in Catalyst (measured: per-iteration wall time doubles from
    ~12 merges, driver heap OOM by ~18). Checkpointing truncates the
    plan so every iteration costs the same regardless of how many
    merges preceded it — the same constant-size-lineage contract
    ``near_dup_clusters`` uses for its propagation rounds. Old
    generations' checkpoint blocks are reclaimed by the ContextCleaner
    once unreferenced; ``train`` is a sample by contract, so at most a
    few sample-sized generations are ever live at once.

    ``docs_per_partition`` sizes the iteration loop for LATENCY, not
    scan bandwidth: a sample small enough to train on is usually far
    smaller than the corpus partitioning it inherits, and 24
    iterations x 32 near-empty tasks is pure scheduling overhead. One
    up-front count (amortized over every iteration) coalesces the
    sample to ~docs_per_partition docs per task, capped at the
    cluster's default parallelism so a genuinely large sample keeps
    every core busy. Pass None to keep the caller's partitioning.
    Partitioning never changes the learned rules (repartition
    invariance is pytest-pinned).
    """
    cur = train.select(id_col, tokens_col)
    if id_col in ("pair_code", "pair_c") or tokens_col in ("pair_code", "pair_c"):
        raise ValueError(
            "bpe_train: id/tokens column may not be named pair_code/pair_c"
        )
    if docs_per_partition is not None:
        sc = train.sparkSession.sparkContext
        rows = cur.count()
        nparts = max(1, min(sc.defaultParallelism, rows // int(docs_per_partition)))
        cur = cur.coalesce(nparts)
    if new_id_start is None:
        new_id_start = (
            int(
                cur.select(F.explode(tokens_col).alias("t"))
                .agg(F.max("t"))
                .first()[0]
                or 0
            )
            + 1
        )
    combined_schema = (
        cur.withColumn("pair_code", F.lit(None).cast("long"))
        .withColumn("pair_c", F.lit(None).cast("long"))
        .schema
    )
    merges: list[tuple[int, int, int, int]] = []
    # iteration 0: the only dedicated count scan
    top = _top_pair(cur, tokens_col) if n_merges > 0 else None
    for i in range(n_merges):
        if new_id_start + i >= _MAX_TOKEN:
            raise ValueError("bpe_train: new token ids exceed 2^31 packed-pair bound")
        if top is None or top[2] < min_count:
            break
        left, right, count = top
        new_id = new_id_start + i
        merges.append((left, right, new_id, count))
        # eager=True materializes this generation now AND truncates the
        # logical plan — constant analysis cost per iteration (see
        # docstring; plain persist() is exponential past ~12 merges).
        combined = cur.mapInPandas(
            _merge_count_kernel(left, right, new_id, tokens_col, id_col),
            combined_schema,
        ).localCheckpoint(eager=True)
        cur = combined.where(F.col("pair_code").isNull()).select(id_col, tokens_col)
        # next rule's argmax: a scan of the cached stat rows only — the
        # final iteration skips it (its histogram has no consumer)
        top = (
            _argmax_partials(
                combined.where(F.col("pair_code").isNotNull()).select(
                    "pair_code", "pair_c"
                )
            )
            if i + 1 < n_merges
            else None
        )
    return merges, cur


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, int, int, int]],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Encode any corpus with a learned merge table: every rule applied
    in training order inside ONE pure-map kernel pass — zero shuffles,
    so this is the piece that runs at full-corpus scale while training
    ran on a sample. Order matters (later rules consume earlier rules'
    output ids); reapplying to the train corpus reproduces
    ``bpe_train``'s merged output exactly (tested)."""
    rules = [(int(a), int(b), int(n)) for a, b, n, _ in merges]

    def apply(batches):
        for pdf in batches:
            out = []
            for x in pdf[tokens_col]:
                if x is None:
                    out.append(None)
                    continue
                a = np.asarray(x, dtype=np.int64)
                for left, right, new_id in rules:
                    a = merge_pair_batch(a, left, right, new_id)
                out.append(a)
            yield pd.DataFrame({id_col: pdf[id_col], tokens_col: out})

    return df.select(id_col, tokens_col).mapInPandas(
        apply, df.select(id_col, tokens_col).schema
    )
