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
