"""Sequence packing / chunking for LLM-pretraining data prep over
pre-tokenized sequences (doc_id, tokens:array<int32>):

* ``pack_concat_chunks`` — the standard "concatenate the corpus in a
  deterministic document order and cut it into fixed-length context
  windows" packing used for pretraining batches, computed as a
  DISTRIBUTED PREFIX SUM: no single-partition window, no driver-side
  token movement, tokens themselves never shuffle.
* ``chunk_sliding`` — per-document sliding-window chunking (max_len
  with overlap, HF-tokenizer ``return_overflowing_tokens`` semantics),
  a pure row-local map stage.

Reference parity: the reference has no token packing (it is a log
parser; closest is its fixed-size COPY buffering,
LogFileParser.java:42-43) — these are §2-extension training-data ops
required by the brief.

Scale notes (the 100 TB story):
- ``pack_concat_chunks`` needs only the NARROW (doc_id, n_tok)
  projection to place every document: ~16 bytes/row moves through the
  range shuffle, the token payload stays where it was scanned. The
  per-partition totals collected to the driver are one row per
  partition (a few KB at 10k partitions); the partition-base join is a
  broadcast. Emitting the physically packed arrays afterwards is a
  single extra hash shuffle of (chunk_id, token-slice) rows — see
  ``pack_assignments``'s docstring — and is deliberately separate so
  stat-only consumers never pay it.
- ``chunk_sliding`` is embarrassingly parallel; the kernel is one
  vectorized cumsum pass per Arrow batch (no per-window Python loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _with_global_offsets(
    d: DataFrame, n_parts: int, persist: bool
) -> tuple[DataFrame, "object"]:
    """(doc_id, n) -> (doc_id, n, start) with start = exclusive prefix
    sum of n over doc_id order, via the two-phase distributed pattern:

    1. range-partition + sort by doc_id (the only data-sized shuffle,
       and it carries just the narrow projection);
    2. one mapInPandas pass per partition -> local running offsets;
    3. per-partition totals -> driver prefix sum (one row per
       partition) -> broadcast join of partition bases.

    Returns (offsets_df, handle_to_unpersist). The local-offset frame
    is persisted by default because it feeds two actions (the base
    collect and the final plan) and the persist PINS the plan's
    RDD/RangePartitioner (InMemoryRelation), so evicted blocks
    recompute under the SAME sampled range boundaries. WITHOUT the
    persist those two actions are two separate SQL executions whose
    RangePartitioners sample boundaries with different seeds
    (seeded on rdd.id) — partition bases from execution 1 applied to
    execution 2's shifted partitions would silently corrupt offsets.
    So ``persist=False`` (the extreme-scale path: no 16 B/row cache)
    switches to a plan that is deterministic ACROSS executions by
    construction: pid = width_bucket(doc_id) — a pure row function,
    immune to resampling — with the prefix sum as a per-bucket running
    window. Balanced when doc_ids are roughly uniform over [min, max]
    (content-hash or dense ids — the common corpus case); for skewed
    id SPACES keep the default sampled-range path.
    """
    from pyspark import TaskContext

    if not persist:
        mm = d.agg(
            F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
        ).first()
        if mm["mn"] is None:  # empty input
            return (
                d.select("doc_id", "n", F.lit(0).cast("long").alias("start")),
                None,
            )
        mn, mx = int(mm["mn"]), int(mm["mx"])
        # buckets 1..n_parts for v in [mn, mx]; +1 keeps mx in-bound
        pid = F.expr(f"width_bucket(doc_id, {mn}L, {mx}L + 1L, {n_parts})")
        b = d.withColumn("pid", pid.cast("int"))
        totals = {
            r["pid"]: r["tot"]
            for r in b.groupBy("pid").agg(F.sum("n").alias("tot")).collect()
        }
        bases, acc = [], 0
        for p in sorted(totals):
            bases.append((p, acc))
            acc += int(totals[p])
        spark = d.sparkSession
        base_df = spark.createDataFrame(bases or [(0, 0)], "pid int, base long")
        from pyspark.sql import Window

        w = (
            Window.partitionBy("pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            b.withColumn("local_start", F.sum("n").over(w) - F.col("n"))
            .join(F.broadcast(base_df), "pid")
            .select(
                "doc_id",
                "n",
                (F.col("base") + F.col("local_start")).alias("start"),
            )
        )
        return out, None

    ranged = d.repartitionByRange(n_parts, "doc_id").sortWithinPartitions("doc_id")

    def local_offsets(batches):
        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            n = pdf["n"].to_numpy(dtype=np.int64)
            starts = run + np.cumsum(n) - n
            run += int(n.sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n": pdf["n"],
                    "pid": np.full(len(pdf), pid, dtype=np.int32),
                    "local_start": starts,
                }
            )

    from logparser_spark.operators.util import track_persist

    loc = track_persist(  # released by the harness between queries
        ranged.mapInPandas(
            local_offsets, "doc_id long, n long, pid int, local_start long"
        )
    )
    handle = loc
    totals = {
        r["pid"]: r["tot"]
        for r in loc.groupBy("pid").agg(F.sum("n").alias("tot")).collect()
    }
    bases, acc = [], 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += int(totals[pid])
    spark = d.sparkSession
    base_df = spark.createDataFrame(bases or [(0, 0)], "pid int, base long")
    out = loc.join(F.broadcast(base_df), "pid").select(
        "doc_id", "n", (F.col("base") + F.col("local_start")).alias("start")
    )
    return out, handle


def pack_assignments(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    len_col: str | None = None,
    tokens_col: str = "tokens",
    n_parts: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Document -> context-window assignments for concat-and-chunk
    packing: one row per (doc, chunk) overlap with the exact token
    span, ordered deterministically by doc_id.

    Output: (doc_id, chunk_id, start, n) where the doc occupies global
    token positions [start, start+n) and chunk c covers
    [c*seq_len, (c+1)*seq_len). Zero-length docs place nothing.

    This IS the packing plan: materializing packed arrays from it is
    ``assignments -> slice(tokens, overlap span) -> groupBy(chunk_id)
    -> concat in start order`` — one hash shuffle of token slices on
    uniform int keys. Kept separate so statistics consumers
    (``pack_chunk_stats``) never shuffle tokens at all.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    n_expr = (
        F.col(len_col).cast("long")
        if len_col
        else F.size(tokens_col).cast("long")
    )
    d = df.select(F.col(id_col).alias("doc_id"), n_expr.alias("n")).where(
        F.col("n") > 0
    )
    if n_parts is None:
        n_parts = d.sparkSession.sparkContext.defaultParallelism
    off, _handle = _with_global_offsets(d, n_parts, persist)
    # integer div, not double division: global token offsets exceed
    # 2^53 at full corpus scale, where double arithmetic loses exactness
    return off.select(
        "doc_id",
        "start",
        "n",
        F.explode(
            F.sequence(
                F.expr(f"start div {int(seq_len)}"),
                F.expr(f"(start + n - 1) div {int(seq_len)}"),
            )
        ).alias("chunk_id"),
    )


def pack_chunk_stats(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    len_col: str | None = None,
    tokens_col: str = "tokens",
    n_parts: int | None = None,
) -> DataFrame:
    """Per-context-window packing stats: (chunk_id, n_docs, n_tokens,
    first_doc). n_tokens == seq_len everywhere except the final chunk;
    n_docs counts documents overlapping the window (boundary docs count
    in every window they touch)."""
    a = pack_assignments(
        df, seq_len, id_col=id_col, len_col=len_col, tokens_col=tokens_col,
        n_parts=n_parts,
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * seq_len)
    hi = F.least(
        F.col("start") + F.col("n") - 1, (F.col("chunk_id") + 1) * seq_len - 1
    )
    return (
        a.withColumn("span", hi - lo + 1)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("span").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def pack_materialize(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_parts: int | None = None,
) -> DataFrame:
    """Emit the ACTUAL packed context windows: (chunk_id, tokens,
    n_tokens) where tokens is the concatenation of every document's
    overlap slice in doc_id order — the physical output of
    concat-and-chunk packing (``pack_assignments`` is the plan; this
    materializes it).

    Scale plan: the assignment join shuffles the token payload once on
    doc_id (both sides data-sized but the narrow side is 32 B/row),
    map-side slicing cuts each doc to its per-chunk overlap, and the
    final groupBy(chunk_id) shuffles only the SLICES — every token
    moves at most twice, no token ever crosses the driver. Per-chunk
    state is bounded by seq_len (collect_list of slices whose lengths
    sum to <= seq_len), so reducers never buffer unbounded rows. The
    within-chunk concat order is pinned by the slice's global start
    (array_sort on a (start, slice) struct — lexicographic, start
    first)."""
    a = pack_assignments(
        df, seq_len, id_col=id_col, tokens_col=tokens_col, n_parts=n_parts
    )
    j = a.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("__t")),
        "doc_id",
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("start") + F.col("n"), (F.col("chunk_id") + 1) * seq_len)
    piece = F.slice(
        F.col("__t"),
        (lo - F.col("start") + 1).cast("int"),
        (hi - lo).cast("int"),
    )
    return (
        j.select(
            "chunk_id", lo.alias("__lo"), piece.alias("__p")
        )
        .groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__lo"), F.col("__p")))
                    ),
                    lambda s: s["__p"],
                )
            ).alias("tokens")
        )
        .select(
            "chunk_id",
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )


def array_sum_udf():
    """array<int> -> long sum, one flat-concat + reduceat pass per
    Arrow batch (no per-row Python) — the cheap content witness for
    materialized packed chunks (F.aggregate would evaluate interpreted
    per element)."""

    @pandas_udf("long")
    def arr_sum(a: pd.Series) -> pd.Series:
        n = len(a)
        lens = np.fromiter(
            (0 if x is None else len(x) for x in a), dtype=np.int64, count=n
        )
        out = np.zeros(n, dtype=np.int64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in a if x is not None and len(x)]
            )
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            nz = lens > 0
            out[nz] = np.add.reduceat(flat, offs[:-1][nz])
        return pd.Series(out)

    return arr_sum


def _sliding_chunk_batch(
    tok_series: pd.Series, max_len: int, stride: int
) -> tuple[list, list, list]:
    """Per-row (offsets, lengths, token-sums) arrays for sliding
    windows: chunk i covers [i*stride, i*stride + min(max_len, m -
    i*stride)); n_chunks = 1 + ceil(max(m - max_len, 0) / stride).
    Sums come from one flat cumsum over the batch's concatenated
    tokens — no per-window loop."""
    n = len(tok_series)
    lens = np.fromiter(
        (0 if x is None else len(x) for x in tok_series), dtype=np.int64, count=n
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    flat = np.empty(total, dtype=np.int64)
    for i, x in enumerate(tok_series):
        if lens[i]:
            flat[offs[i] : offs[i + 1]] = np.asarray(x, dtype=np.int64)
    cum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(flat, out=cum[1:])

    n_chunks = np.where(
        lens == 0, 0, 1 + (np.maximum(lens - max_len, 0) + stride - 1) // stride
    )
    coffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=coffs[1:])
    tc = int(coffs[-1])
    ci = np.arange(tc, dtype=np.int64) - np.repeat(coffs[:-1], n_chunks)
    row_len = np.repeat(lens, n_chunks)
    row_off = np.repeat(offs[:-1], n_chunks)
    c_off = ci * stride
    c_len = np.minimum(max_len, row_len - c_off)
    c_sum = cum[row_off + c_off + c_len] - cum[row_off + c_off]
    return (
        [c_off[coffs[i] : coffs[i + 1]] for i in range(n)],
        [c_len[coffs[i] : coffs[i + 1]] for i in range(n)],
        [c_sum[coffs[i] : coffs[i + 1]] for i in range(n)],
    )


def sliding_chunk_udf(max_len: int, stride: int):
    """tokens -> array<array<long>> of [off, len, tok_sum] triples.
    Nondeterministic-marked at definition so Catalyst never duplicates
    the kernel below an exchange (see functions/parse.py)."""

    @pandas_udf("array<array<long>>")
    def ch(tokens: pd.Series) -> pd.Series:
        o, l, s = _sliding_chunk_batch(tokens, max_len, stride)
        return pd.Series(
            [np.stack([a, b, c], axis=1) if len(a) else [] for a, b, c in zip(o, l, s)]
        )

    return ch.asNondeterministic()


def chunk_sliding(
    df: DataFrame,
    max_len: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Split each document into max_len-token windows advancing by
    (max_len - overlap); the last window is the first one reaching the
    end (so it may be short, and every token is covered exactly once
    outside overlap regions). Output: (doc_id, chunk_idx, off,
    n_tokens, tok_sum) with tok_sum the exact sum of the window's token
    ids — a cheap content witness the SQL oracle reproduces. Pure map
    stage: zero shuffle at any scale."""
    if not 0 <= overlap < max_len:
        raise ValueError("need 0 <= overlap < max_len")
    stride = max_len - overlap
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        sliding_chunk_udf(max_len, stride)(F.col(tokens_col)).alias("chunks"),
    )
    ex = hashed.select("doc_id", F.posexplode("chunks").alias("chunk_idx", "t"))
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("t")[0].alias("off"),
        F.col("t")[1].alias("n_tokens"),
        F.col("t")[2].alias("tok_sum"),
    )
