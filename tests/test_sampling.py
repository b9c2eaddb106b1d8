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


# --- token_budget_select -------------------------------------------------


def _budget_rows(spark):
    """7 domains, heavy score ties, some NULL scores, varied tokens."""
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.pmod(F.xxhash64("id"), F.lit(7))).alias("lang"),
        F.pmod(F.xxhash64(F.col("id") * 3), F.lit(500)).alias("n_tokens"),
        F.when(F.pmod(F.xxhash64(F.col("id") * 5), F.lit(20)) == 0, None)
        .otherwise(F.pmod(F.xxhash64(F.col("id") * 7), F.lit(50)).cast("double"))
        .alias("score"),
    )


def _naive_budget(df, budget):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc_nulls_last("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum", F.sum(F.coalesce("n_tokens", F.lit(0))).over(w))
        .where(F.col("cum") <= budget)
        .select("doc_id")
    )


@pytest.mark.parametrize("budget", [0, 100, 3000, 10**9])
def test_token_budget_select_matches_naive_window(spark, budget):
    from logparser_spark.operators.sampling import token_budget_select

    df = _budget_rows(spark)
    got = sorted(r.doc_id for r in token_budget_select(df, budget).collect())
    want = sorted(r.doc_id for r in _naive_budget(df, budget).collect())
    assert got == want
    if budget >= 10**9:
        assert len(got) == 2000  # budget beyond corpus: everything kept


def test_token_budget_select_coarse_buckets(spark):
    """n_buckets=2 forces nearly every row through the boundary-sort
    path — the select-by-threshold split must not change the result."""
    from logparser_spark.operators.sampling import token_budget_select

    df = _budget_rows(spark)
    got = sorted(
        r.doc_id for r in token_budget_select(df, 3000, n_buckets=2).collect()
    )
    want = sorted(r.doc_id for r in _naive_budget(df, 3000).collect())
    assert got == want


def test_token_budget_select_constant_scores(spark):
    """Degenerate domain (all scores equal -> one bucket): falls back to
    the exact sort, ordered purely by doc_id."""
    from logparser_spark.operators.sampling import token_budget_select

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("lang"),
        F.lit(10).alias("n_tokens"),
        F.lit(1.0).alias("score"),
    )
    got = sorted(r.doc_id for r in token_budget_select(df, 95).collect())
    assert got == list(range(9))  # 9 * 10 = 90 <= 95 < 100


def test_token_budget_select_null_tokens_count_zero(spark):
    from logparser_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame(
        [(1, "x", None, 5.0), (2, "x", 10, 4.0), (3, "x", 10, 3.0)],
        "doc_id long, lang string, n_tokens int, score double",
    )
    got = sorted(r.doc_id for r in token_budget_select(df, 10).collect())
    assert got == [1, 2]  # NULL tokens cost nothing; budget stops at doc 2


# --- leakage_safe_split --------------------------------------------------


def test_split_case_sql_validation():
    from logparser_spark.operators.sampling import split_case_sql

    with pytest.raises(ValueError):
        split_case_sql({"train": 1.0}, "x")  # < 2 splits
    with pytest.raises(ValueError):
        split_case_sql({"a": 0.6, "b": 0.6}, "x")  # sum != 1
    with pytest.raises(ValueError):
        split_case_sql({"a": 1.2, "b": -0.2}, "x")  # negative


def test_leakage_safe_split_cluster_atomic_and_duckdb_parity(spark):
    """Every cluster lands whole in one split; the Spark CASE and the
    identical string in DuckDB agree row-for-row; fractions are near
    the weights at 3.3k clusters."""
    from logparser_spark.operators.sampling import (
        leakage_safe_split,
        split_case_sql,
    )

    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    clusters = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 3).cast("long").alias("cluster_id"),
    )
    sp = leakage_safe_split(None, weights=weights, clusters=clusters)
    per = (
        sp.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert per == 1
    frac = {r["split"]: r["count"] / 10000 for r in sp.groupBy("split").count().collect()}
    assert abs(frac["train"] - 0.9) < 0.02 and set(frac) == set(weights)

    con = duckdb.connect()
    con.register("c", clusters.toPandas())
    case = split_case_sql(weights, "cluster_id")
    ora = con.execute(f"SELECT doc_id, {case} AS split FROM c ORDER BY doc_id").fetchall()
    got = [(r.doc_id, r.split) for r in sp.orderBy("doc_id").collect()]
    assert got == [tuple(r) for r in ora]


def test_leakage_safe_split_near_dups_never_straddle(spark):
    """End-to-end over text docs: near-duplicate pairs must share a
    split (the property a doc-hash split violates)."""
    from logparser_spark.operators.sampling import leakage_safe_split

    rows = []
    for i in range(60):
        words = " ".join(f"w{(i * 17 + j) % 97}" for j in range(30))
        rows.append((i * 2, words))
        rows.append((i * 2 + 1, words + " tail"))  # near-dup of its even twin
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sp = leakage_safe_split(docs, weights={"train": 0.8, "val": 0.2}, threshold=0.5)
    pairs = (
        sp.alias("a")
        .join(sp.alias("b"), F.expr("a.doc_id + 1 = b.doc_id AND a.doc_id % 2 = 0"))
        .where(F.expr("a.split <> b.split"))
        .count()
    )
    assert pairs == 0
    assert sp.count() == 120


def test_token_budget_select_null_domain_is_a_domain(spark):
    """NULL domain rows form their own budget group (null-safe joins);
    a plain equi-join would silently drop them. Output values are the
    input's — NULL tokens count 0 toward the budget but return NULL."""
    from logparser_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame(
        [
            (1, None, 5, 9.0),
            (2, None, 5, 8.0),
            (3, "a", 5, 7.0),
            (4, "a", None, 6.0),
        ],
        "doc_id long, lang string, n_tokens int, score double",
    )
    out = {r.doc_id: r for r in token_budget_select(df, budget=7).collect()}
    assert sorted(out) == [1, 3, 4]  # doc 4: NULL tokens cost 0 -> kept
    assert out[1].lang is None and out[4].n_tokens is None  # values preserved
    assert out[3].n_tokens == 5 and out[3].score == 7.0
