"""Custom stateful streaming operator (applyInPandasWithState):
cross-batch exact dedup. A key emitted in one run of the query must
never be emitted again after a restart — the state store, not the
micro-batch, is the set of seen hashes."""

import os

import pandas as pd
import pytest

from logparser_spark.streaming.stateful import start_dedup_sink, streaming_exact_dedup

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]),
        DOCS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    src = str(base / "src")
    out = str(base / "out")
    os.makedirs(src)
    return src, out


def _drain(spark, src, out):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    q = start_dedup_sink(streaming_exact_dedup(stream), out)
    q.awaitTermination(300)


def _keepers(spark, out):
    return {
        r.text_hash: r.doc_id
        for r in spark.read.parquet(os.path.join(out, "keepers")).collect()
    }


def test_dedup_within_and_across_batches(spark, dirs):
    src, out = dirs
    # batch 1: "alpha" duplicated (keeper = min doc_id), "beta" unique
    _write_docs(
        spark,
        src,
        [
            (11, "alpha text", "en", "s1", 10),
            (7, "alpha text", "en", "s2", 10),
            (20, "beta text", "en", "s1", 9),
        ],
    )
    _drain(spark, src, out)
    k1 = _keepers(spark, out)
    assert sorted(k1.values()) == [7, 20]  # min doc_id kept for alpha

    # batch 2 (restart, same checkpoint): a dup of alpha from batch 1
    # and one genuinely new doc — only the new doc may be emitted
    _write_docs(
        spark,
        src,
        [
            (3, "alpha text", "en", "s3", 10),  # seen in a PREVIOUS run
            (40, "gamma text", "en", "s1", 10),
        ],
    )
    _drain(spark, src, out)
    k2 = _keepers(spark, out)
    assert sorted(k2.values()) == [7, 20, 40]
    # alpha's keeper is still the batch-1 row: state survived restart
    assert set(k2.items()) >= set(k1.items())


def test_dedup_restart_emits_nothing_new(spark, dirs):
    src, out = dirs
    _write_docs(spark, src, [(1, "only doc", "en", "s", 8)])
    _drain(spark, src, out)
    _drain(spark, src, out)  # no new input: replay must add nothing
    assert list(_keepers(spark, out).values()) == [1]


def test_dedup_tolerates_null_text(spark, dirs):
    """Dirty data the batch path tolerates must not kill the stream:
    a NULL-text row groups under a NULL hash and emits n_chars=0."""
    src, out = dirs
    _write_docs(spark, src, [(5, None, "en", "s", None), (6, "ok", "en", "s", 2)])
    _drain(spark, src, out)
    rows = {
        r.doc_id: (r.text_hash, r.n_chars)
        for r in spark.read.parquet(os.path.join(out, "keepers")).collect()
    }
    assert rows[6] == (rows[6][0], 2)
    assert rows[5][0] is None and rows[5][1] == 0


def test_dedup_null_only_first_batch_does_not_suppress_keeper(spark, dirs):
    """A group whose FIRST micro-batch holds only NULL-doc_id rows must
    still emit the real keeper when it arrives in a LATER batch — the
    state gate counts keeper-eligible rows, not raw rows."""
    src, out = dirs
    _write_docs(spark, src, [(None, "late keeper", "en", "s", 11)])
    _drain(spark, src, out)
    assert _keepers(spark, out) == {}  # nothing eligible yet
    _write_docs(spark, src, [(9, "late keeper", "en", "s", 11)])
    _drain(spark, src, out)
    assert list(_keepers(spark, out).values()) == [9]


def test_dedup_tolerates_null_doc_id(spark, dirs):
    """A NULL doc_id row must never crash the query (idxmin over an
    all-NaN group raises) nor become keeper; a hash seen ONLY with
    null ids emits nothing."""
    src, out = dirs
    _write_docs(
        spark,
        src,
        [
            (None, "dup text", "en", "s", 8),   # null id, same hash as below
            (7, "dup text", "en", "s", 8),      # real keeper
            (None, "null only", "en", "s", 9),  # hash with ONLY null ids
            (3, "clean", "en", "s", 5),
        ],
    )
    _drain(spark, src, out)
    got = _keepers(spark, out)
    import pyspark.sql.functions as F

    h = {r.t: r.h for r in spark.createDataFrame(
        [("dup text",), ("clean",)], "t string"
    ).select("t", F.md5("t").alias("h")).collect()}
    assert got[h["dup text"]] == 7
    assert got[h["clean"]] == 3
    assert len(got) == 2  # the null-only hash emitted nothing


# ---------------------------------------------------------------------
# streaming heavy hitters
# ---------------------------------------------------------------------

PAIR_SCHEMA = "g string, it string"


def _write_pairs(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "it"]), PAIR_SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)


def _drain_hh(spark, src, out, threshold, capacity, max_files=None):
    from logparser_spark.streaming.stateful import streaming_heavy_hitters

    reader = spark.readStream.schema(PAIR_SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src)
    alerts = streaming_heavy_hitters(
        stream, threshold=threshold, capacity=capacity,
        group_col="g", item_col="it",
    )
    q = (
        alerts.writeStream.format("parquet")
        .option("path", os.path.join(out, "alerts"))
        .option("checkpointLocation", os.path.join(out, "_hh_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.group, r.item)
        for r in spark.read.parquet(os.path.join(out, "alerts")).collect()
    }


def _rows(counts):
    out = []
    for (g, it), c in counts.items():
        out += [(g, it)] * c
    return out


def test_heavy_hitters_exact_equals_batch_threshold(spark, dirs):
    src, out = dirs
    counts = {
        ("a", "x"): 7, ("a", "y"): 3, ("a", "z"): 1,
        ("b", "x"): 2, ("b", "w"): 5,
    }
    _write_pairs(spark, src, _rows(counts))
    got = _drain_hh(spark, src, out, threshold=5, capacity=1 << 16)
    assert got == {("a", "x"), ("b", "w")}


def test_heavy_hitters_batching_invariance_and_cross_batch_sum(spark, dirs):
    src, out = dirs
    # 4 appends of 3 each: "x" never crosses within one batch, only
    # across state — and maxFilesPerTrigger=1 forces 4 micro-batches
    for _ in range(4):
        _write_pairs(spark, src, [("a", "x")] * 3 + [("a", "noise")])
    got = _drain_hh(spark, src, out, threshold=10, capacity=1 << 16, max_files=1)
    assert got == {("a", "x")}


def test_heavy_hitters_restart_emits_once(spark, dirs):
    src, out = dirs
    _write_pairs(spark, src, [("a", "x")] * 6)
    got1 = _drain_hh(spark, src, out, threshold=5, capacity=1 << 16)
    assert got1 == {("a", "x")}
    # restart with the same checkpoint: more x rows must NOT re-alert,
    # a fresh crosser must
    _write_pairs(spark, src, [("a", "x")] * 6 + [("a", "y")] * 5)
    got2 = _drain_hh(spark, src, out, threshold=5, capacity=1 << 16)
    assert got2 == {("a", "x"), ("a", "y")}


def test_heavy_hitters_sketch_no_false_negatives(spark, dirs):
    import random

    src, out = dirs
    rng = random.Random(3)
    rows = []
    true = {}
    for i in range(40):
        it = f"i{i}"
        c = 30 if i < 3 else rng.randrange(1, 4)
        true[it] = c
        rows += [("g", it)] * c
    rng.shuffle(rows)
    _write_pairs(spark, src, rows)
    got = _drain_hh(spark, src, out, threshold=25, capacity=8)
    heavy = {("g", it) for it, c in true.items() if c >= 25}
    assert heavy <= got, "space-saving must never miss a true heavy item"
    # over-alerts are bounded by the sketch's N/capacity error
    n = sum(true.values())
    assert all(
        true[it] + n / 8 >= 25 for _, it in got
    ), "every alert must be within the documented over-estimate bound"
