"""Distributed BPE tokenizer training over token-array corpora.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is the
canonical subword-tokenizer trainer: repeatedly count adjacent symbol
pairs corpus-wide, merge the most frequent pair into a new symbol,
repeat. The iteration is inherently sequential in the MERGE RULE but
each step is embarrassingly parallel in the DATA — which is exactly
the Spark shape implemented here:

- count step: the same packed-pair mapInPandas fold the LM trainer
  uses (``lmscore._bigram_partials``) — each Arrow batch collapses to
  one partial (pair, count) histogram, so the shuffle per iteration
  carries at most ``|observed pairs|`` rows per task (domain-bounded,
  never corpus-sized), and the argmax is one tiny aggregate.
- merge step: a PURE MAP numpy kernel rewrites every sequence
  greedily left-to-right (standard BPE semantics, overlap-safe:
  ``aaa`` under pair ``(a,a)`` merges once) — token payloads never
  shuffle, in any iteration.
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


def _merge_kernel(left: int, right: int, new_id: int, tokens_col: str, id_col: str):
    def apply(batches):
        for pdf in batches:
            toks = [
                x
                if x is None
                else merge_pair_batch(np.asarray(x, dtype=np.int64), left, right, new_id)
                for x in pdf[tokens_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], tokens_col: toks})

    return apply


def _top_pair(train: DataFrame, tokens_col: str):
    """(left, right, count) of the most frequent adjacent pair, ties
    broken toward the smallest packed code; None when no pair exists.
    One domain-bounded shuffle + a 1-row aggregate."""
    row = (
        train.select(tokens_col)
        .mapInPandas(_bigram_partials(tokens_col), "code long, c long")
        .groupBy("code")
        .agg(F.sum("c").alias("c"))
        .orderBy(F.col("c").desc(), F.col("code").asc())
        .first()
    )
    if row is None:
        return None
    code = int(row["code"])
    return code >> 32, code & 0xFFFFFFFF, int(row["c"])


def bpe_train(
    train: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    new_id_start: int | None = None,
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

    Per iteration: one domain-bounded pair-count shuffle + one
    zero-shuffle merge map. Each generation is ``localCheckpoint``ed
    (eager), NOT merely persisted: persist keeps the full logical
    lineage, and re-analyzing a plan that deepens by one mapInPandas
    node per merge turns out to be exponential in depth in Catalyst
    (measured: per-iteration wall time doubles from ~12 merges, driver
    heap OOM by ~18). Checkpointing truncates the plan so every
    iteration costs the same regardless of how many merges preceded it
    — the same constant-size-lineage contract ``near_dup_clusters``
    uses for its propagation rounds. Old generations' checkpoint
    blocks are reclaimed by the ContextCleaner once unreferenced;
    ``train`` is a sample by contract, so at most a few sample-sized
    generations are ever live at once.
    """
    cur = train.select(id_col, tokens_col)
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
    merges: list[tuple[int, int, int, int]] = []
    for i in range(n_merges):
        if new_id_start + i >= _MAX_TOKEN:
            raise ValueError("bpe_train: new token ids exceed 2^31 packed-pair bound")
        top = _top_pair(cur, tokens_col)
        if top is None or top[2] < min_count:
            break
        left, right, count = top
        new_id = new_id_start + i
        merges.append((left, right, new_id, count))
        # eager=True materializes this generation now AND truncates the
        # logical plan — constant analysis cost per iteration (see
        # docstring; plain persist() is exponential past ~12 merges).
        cur = cur.mapInPandas(
            _merge_kernel(left, right, new_id, tokens_col, id_col),
            cur.schema,
        ).localCheckpoint(eager=True)
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
