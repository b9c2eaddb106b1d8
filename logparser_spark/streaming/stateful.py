"""Custom stateful streaming operators (applyInPandasWithState).

The built-in streaming operators cover windows and session gaps; what
they cannot express is cross-batch *set membership* — "emit this row
only if its key was never seen in ANY earlier micro-batch". That is
exactly streaming exact-dedup for a training-data ingest: a document
whose content hash already flowed through the pipe must not be emitted
again, no matter how many files/batches ago it appeared.

State model: one state row per content-hash group holding the count of
keeper-eligible (non-NULL doc_id) occurrences seen so far. New groups
emit their first row (the keeper); existing groups emit nothing and
just bump the count. State lives in
the streaming state store (checkpointed, recovered on restart — the
restart path is pytest-pinned), and since keys are content hashes the
state is uniformly partitioned, no skew.

Scale note: state size is O(distinct keys). For unbounded corpora,
bound it the same way batch dedup would — partition the ingest by
content-hash prefix and run one query per shard, or expire state with
``GroupStateTimeout.ProcessingTimeTimeout`` when "seen recently" is an
acceptable dedup contract. Both knobs are orthogonal to the operator's
logic below.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# emitted: the first-seen row per content hash
DEDUP_OUTPUT_SCHEMA = (
    "text_hash string, doc_id long, source string, n_chars long"
)
DEDUP_STATE_SCHEMA = "seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per content-hash group: emit the min-doc_id row on first sight,
    count-only afterwards. Runs once per group per micro-batch with the
    group's rows as pandas batches."""
    seen = state.get[0] if state.exists else 0
    first = None
    n = 0
    for pdf in pdfs:
        # rows with NULL doc_id can never be the keeper (idxmin on an
        # all-NaN series would raise and kill the whole streaming query
        # on one bad record) and must not count toward `seen` either: a
        # group whose FIRST micro-batch is all-NULL ids would otherwise
        # permanently suppress the real keeper arriving in a later batch
        ids = pdf["doc_id"]
        valid = ids.notna()
        n += int(valid.sum())
        if not valid.any():
            continue
        cand = pdf.loc[ids.idxmin()]
        if first is None or cand["doc_id"] < first["doc_id"]:
            first = cand
    state.update((seen + n,))
    if seen == 0 and first is not None:
        n_chars = first["n_chars"]
        yield pd.DataFrame(
            {
                "text_hash": [key[0]],
                "doc_id": [int(first["doc_id"])],
                "source": [first["source"]],
                # NULL text -> NULL n_chars arrives as NaN; emit 0
                # (mirrored by the oracle's final COALESCE(..., 0))
                "n_chars": [int(n_chars) if pd.notna(n_chars) else 0],
            }
        )


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """documents stream -> stream of first-seen (keeper) rows per
    md5(text), deduplicated ACROSS micro-batches via keyed state.

    (``dropDuplicates`` on a stream also keeps state, but cannot pick
    the keeper row by a rule, report per-key occurrence counts, or
    attach expiry policy — the reasons this is a custom operator.)
    """
    keyed = docs_stream.select(
        F.md5("text").alias("text_hash"),
        "doc_id",
        "source",
        F.coalesce("n_chars", F.length("text"), F.lit(0)).alias("n_chars"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_dedup_sink(deduped: DataFrame, out_root: str):
    """Append the keeper stream to a parquet sink with its own
    checkpoint (state + sink log recovered together on restart)."""
    return (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_root, "keepers"))
        .option("checkpointLocation", os.path.join(out_root, "_dedup_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------
# streaming heavy hitters (batched space-saving + threshold alerts)
# ---------------------------------------------------------------------

HH_OUTPUT_SCHEMA = "group string, item string"
HH_STATE_SCHEMA = (
    "items array<string>, counts array<long>, emitted array<string>"
)


def _heavy_hitters_fn(threshold: int, capacity: int):
    """Per-group state fn: maintain space-saving counters (Metwally et
    al. 2005, "Efficient computation of frequent and top-k elements in
    data streams") across micro-batches; emit an item ONCE, the first
    batch its estimated count reaches ``threshold``.

    Append-safety is the design constraint (the same one
    ``_dedup_fn`` solves): the emitted row set must not depend on how
    the stream was micro-batched. With ``capacity`` >= distinct items
    per group there are no evictions, estimates are exact, and the
    alert set == {items whose TOTAL count >= threshold} regardless of
    batching — the DuckDB-oracle mode. Below that, space-saving's
    one-sided guarantee (estimate >= true, min counter monotone over
    evictions) still means no false negatives: every truly-heavy item
    alerts; over-estimates can add alerts (bounded by the sketch
    error N/capacity — pytest-pinned). The ``emitted`` set makes the
    once-only contract survive evict/re-insert cycles."""

    def fn(key, pdfs, state):
        if state.exists:
            items, counts, emitted_l = state.get
            counters = dict(zip(items, counts))
            emitted = set(emitted_l)
        else:
            counters, emitted = {}, set()
        batch = pd.concat([pdf["item"] for pdf in pdfs])
        vc = batch.value_counts()
        # deterministic insertion order (count desc, item asc): with
        # evictions the result depends on order, pin it
        for item, cnt in sorted(vc.items(), key=lambda kv: (-kv[1], kv[0])):
            cnt = int(cnt)
            if item in counters:
                counters[item] += cnt
            elif len(counters) < capacity:
                counters[item] = cnt
            else:
                evict = min(counters, key=lambda i: (counters[i], i))
                counters[item] = counters.pop(evict) + cnt
        fresh = sorted(
            i
            for i, c in counters.items()
            if c >= threshold and i not in emitted
        )
        emitted |= set(fresh)
        ks = list(counters)
        state.update((ks, [counters[i] for i in ks], sorted(emitted)))
        if fresh:
            yield pd.DataFrame({"group": key[0], "item": fresh})

    return fn


def streaming_heavy_hitters(
    stream: DataFrame,
    threshold: int,
    capacity: int = 1 << 20,
    group_col: str = "group",
    item_col: str = "item",
) -> DataFrame:
    """Stream of (group, item) -> append-mode stream of threshold
    alerts: one row per (group, item) the first time the item's
    (space-saving-estimated) count within its group reaches
    ``threshold`` — the streaming rate/abuse monitor ("alert when any
    URL crosses N hits").

    State per group is O(capacity + alerts), never O(distinct items);
    groups partition the state store uniformly. Exact (and therefore
    batch-oracle-equal) when capacity >= distinct items per group;
    below that a bounded-error sketch with no false negatives (see
    ``_heavy_hitters_fn``)."""
    if threshold < 1 or capacity < 1:
        raise ValueError(
            "streaming_heavy_hitters: threshold >= 1 and capacity >= 1"
        )
    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(item_col).cast("string").alias("item"),
    ).where(F.col("item").isNotNull())
    return keyed.groupBy("group").applyInPandasWithState(
        _heavy_hitters_fn(int(threshold), int(capacity)),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
