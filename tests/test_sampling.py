"""Deterministic hash-mix sampling and incremental dedup-vs-corpus."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators.sampling import (
    dedup_incremental,
    hash_mix_sample,
    mix_sample_oracle_where,
    rate_to_hex_threshold,
)

RATES = {"en": 0.5, "zh": 1.0, "de": 0.0}


def py_keep(doc_id, lang, rates, default_rate):
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
    rate = rates.get(lang, default_rate) if lang is not None else default_rate
    thr = rate_to_hex_threshold(rate)
    return thr is None or h < thr


def _rows():
    langs = ["en", "zh", "de", "fr", None]
    return [(i, langs[i % 5]) for i in range(500)]


def test_hash_mix_sample_matches_python_model(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in hash_mix_sample(df, RATES, default_rate=0.25).collect()
    )
    exp = sorted((i, g) for i, g in _rows() if py_keep(i, g, RATES, 0.25))
    assert got == exp
    # sanity on the mix itself: all zh kept, no de, en strictly thinned
    langs = [g for _, g in got]
    assert langs.count("zh") == 100 and langs.count("de") == 0
    assert 0 < langs.count("en") < 100


def test_hash_mix_sample_stable_under_repartition(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in hash_mix_sample(df, RATES).collect())
    b = sorted(
        r["doc_id"] for r in hash_mix_sample(df.repartition(13), RATES).collect()
    )
    assert a == b


def test_oracle_where_matches_spark(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    got = sorted(
        r["doc_id"] for r in hash_mix_sample(df, RATES, default_rate=0.25).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _rows())
    where = mix_sample_oracle_where(RATES, default_rate=0.25)
    exp = sorted(
        r[0] for r in con.execute(f"SELECT doc_id FROM t WHERE {where}").fetchall()
    )
    assert got == exp


def test_rate_threshold_edges():
    assert rate_to_hex_threshold(0.0) == "0000"  # keeps nothing (h >= '0000')
    assert rate_to_hex_threshold(1.0) is None
    assert rate_to_hex_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        rate_to_hex_threshold(1.5)


def test_dedup_incremental(spark):
    corpus = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "aaa"), (11, "new one"), (12, "new one"), (13, None)],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in dedup_incremental(new, corpus).collect())
    # corpus text "aaa" drops 10; within-batch dup 11/12 both survive
    # (incremental dedup filters against the CORPUS only); NULL text has
    # NULL signature -> never matches -> kept
    assert got == [11, 12, 13]


def test_curation_funnel_model(spark):
    from logparser_spark.operators.sampling import curation_funnel

    rows = [
        # (doc_id, text, lang, source, n_chars)
        (1, "w " * 9 + "tail", "en", "s1", 22),     # 10 words, alpha 45% -> gate fail
        (2, " ".join(["alpha"] * 12), "en", "s1", 71),
        (3, " ".join(["alpha"] * 12), "en", "s2", 71),   # dup of 2 -> dropped
        (4, " ".join(["beta"] * 12), "zh", "s1", 59),
        (5, "short", "zh", "s1", 5),                      # gate fail
        (6, " ".join(["gamma"] * 12), "de", "s1", 71),    # lang rate 0 -> dropped
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["chars_total"])
        for r in curation_funnel(df, RATES, default_rate=1.0).collect()
    }
    # doc 2 survives iff its md5 hash-mix keeps it (en rate 0.5)
    exp = {}
    for doc_id, lang, source, n_chars in [(2, "en", "s1", 71), (4, "zh", "s1", 59)]:
        if py_keep(doc_id, lang, RATES, 1.0):
            nd, ct = exp.get((lang, source), (0, 0))
            exp[(lang, source)] = (nd + 1, ct + n_chars)
    # doc 1: 10 words, alpha 10/22*100 = 45 < 50 -> gate fail, never present
    assert got == exp
    assert ("de", "s1") not in got


def test_oracle_where_empty_rates_valid_sql(spark):
    """Empty rates dict: hash_mix_sample keeps rows by default_rate
    alone; the oracle WHERE must be valid SQL (a naive NOT IN () is a
    parser error) and reproduce the same row set."""
    df = spark.createDataFrame(_rows(), "doc_id long, lang string")
    got = sorted(
        r["doc_id"] for r in hash_mix_sample(df, {}, default_rate=0.25).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _rows())
    where = mix_sample_oracle_where({}, default_rate=0.25)
    exp = sorted(
        r[0] for r in con.execute(f"SELECT doc_id FROM t WHERE {where}").fetchall()
    )
    assert got == exp and 0 < len(got) < 500
