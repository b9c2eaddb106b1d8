"""Round-3 curation operators: stratified exact-quota sampling,
PII-style redaction, exact token histogram, benchmark decontamination."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_spark.operators.sampling import shard_assign, stratified_take
from logparser_spark.operators.textstats import (
    REDACT_PATTERNS,
    redact_pii,
    redact_pii_oracle_select,
)
from logparser_spark.operators.tokenstats import (
    decontaminate,
    decontaminate_stats,
    rarity_score,
    token_histogram,
)

# ---------------------------------------------------------------- strat


def _strat_rows():
    # three groups with very different sizes: a (200), b (30), c (1)
    rows = [(i, "a") for i in range(200)]
    rows += [(1000 + i, "b") for i in range(30)]
    rows += [(9999, "c")]
    return rows


def _py_take(rows, quota):
    by_g = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    keep = []
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep += [(i, g) for i in ids[:quota]]
    return sorted(keep)


@pytest.mark.parametrize("quota", [1, 40])
def test_stratified_take_matches_python_model(spark, quota):
    df = spark.createDataFrame(_strat_rows(), "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in stratified_take(df, quota=quota).collect()
    )
    assert got == _py_take(_strat_rows(), quota)
    # undersized groups are kept whole
    ng = {g: 0 for g in "abc"}
    for _, g in got:
        ng[g] += 1
    assert ng["a"] == quota and ng["b"] == min(30, quota) and ng["c"] == 1


def test_stratified_take_salt_invariant(spark):
    # the salt is internal: any salts value and any partitioning give
    # the SAME row set (content-derived order only)
    df = spark.createDataFrame(_strat_rows(), "doc_id long, source string")
    a = sorted(r["doc_id"] for r in stratified_take(df, 25, salts=2).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_take(df.repartition(17), 25, salts=64).collect()
    )
    assert a == b and len(a) == 25 + 25 + 1


# --------------------------------------------------------------- shards


def _py_shards(ids, n_shards):
    rows = []
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        shard = int(h[:4], 16) % n_shards
        rows.append((i, shard, h))
    out = {}
    by_shard = {}
    for i, s, h in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        out[i] = (s, by_shard.get(s, 0))
        by_shard[s] = by_shard.get(s, 0) + 1
    return out


@pytest.mark.parametrize("n_shards", [1, 8, 256])
def test_shard_assign_matches_python_model(spark, n_shards):
    ids = list(range(700))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assign(df, n_shards=n_shards).collect()
    }
    assert got == _py_shards(ids, n_shards)


def test_shard_assign_partitioning_invariant(spark):
    ids = [(i,) for i in range(500)]
    a = shard_assign(
        spark.createDataFrame(ids, "doc_id long"), n_shards=16, n_parts=3
    )
    b = shard_assign(
        spark.createDataFrame(ids, "doc_id long").repartition(11),
        n_shards=16,
        n_parts=7,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # positions are dense 0..|shard|-1 within every shard
    import collections

    per = collections.defaultdict(list)
    for doc_id, shard, pos in a.collect():
        per[shard].append(pos)
    for shard, ps in per.items():
        assert sorted(ps) == list(range(len(ps))), shard


# --------------------------------------------------------------- redact

_RED_DOCS = [
    (1, "login from 10.22.0.144 by user42 at 1700000001234"),
    (2, "svc_acct_7 touched 192.168.1.1 and 8.8.8.8"),
    (3, "no identifiers here"),
    (4, "card 1234567890123456 ip 1.2.3.4 users user1 user2"),
]


def _py_redact(text):
    import re

    counts = [len(re.findall(p, text)) for _, p, _ in REDACT_PATTERNS]
    red = text
    for _, p, rep in REDACT_PATTERNS:
        red = re.sub(p, rep, red)
    return counts, hashlib.md5(red.encode()).hexdigest()


def test_redact_pii_counts_and_sig(spark):
    df = spark.createDataFrame(_RED_DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for doc_id, text in _RED_DOCS:
        (n_ip, n_num, n_user), sig = _py_redact(text)
        r = out[doc_id]
        assert (r["n_ipv4"], r["n_longnum"], r["n_userid"]) == (
            n_ip,
            n_num,
            n_user,
        ), text
        assert r["redacted_sig"] == sig, text
    # the crafted rows exercise every pattern at least once
    assert out[1]["n_ipv4"] == 1 and out[1]["n_longnum"] == 1
    assert out[1]["n_userid"] == 1 and out[2]["n_userid"] == 1
    assert out[4]["n_longnum"] == 1 and out[4]["n_userid"] == 2


def test_redact_pii_no_shuffle(spark):
    df = spark.createDataFrame(_RED_DOCS, "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_redact_oracle_select_matches_spark(spark):
    df = spark.createDataFrame(_RED_DOCS, "doc_id long, text string")
    got = sorted(map(tuple, redact_pii(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", _RED_DOCS)
    exp = sorted(
        con.execute(
            f"SELECT doc_id, {redact_pii_oracle_select('text')} FROM d"
        ).fetchall()
    )
    assert got == exp


# ------------------------------------------------------------ histogram


def test_token_histogram_matches_explode_groupby(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.randrange(50) for _ in range(rng.randrange(0, 60))])
        for i in range(300)
    ]
    rows += [(300, None), (301, [])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = sorted(map(tuple, token_histogram(df).collect()))
    base = (
        df.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("occurrences"),
            F.countDistinct("doc_id").alias("docs"),
        )
    )
    exp = sorted(map(tuple, base.collect()))
    assert got == exp and len(got) > 0


def test_rarity_score_matches_python_model(spark):
    import random
    from collections import Counter

    rng = random.Random(3)
    rows = [
        (i, [rng.randrange(20) for _ in range(rng.randrange(0, 25))])
        for i in range(200)
    ]
    rows += [(200, None), (201, []), (202, [999])]  # 999: singleton
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {r["doc_id"]: r.asDict() for r in rarity_score(df).collect()}

    occ = Counter(t for _, ts in rows if ts for t in ts)
    for doc_id, ts in rows:
        ts = ts or []
        exp = {
            "doc_id": doc_id,
            "n_tok": len(ts),
            "rarity_sum": sum(1_000_000 // occ[t] for t in ts),
            "n_rare": sum(1 for t in ts if occ[t] < 2),
        }
        assert got[doc_id] == exp, doc_id
    assert got[202]["rarity_sum"] == 1_000_000 and got[202]["n_rare"] == 1


def test_rarity_score_scoring_pass_no_shuffle(spark):
    # pass 2 must be a pure map: the only wide op in the WHOLE operator
    # is the |vocab|-bounded histogram inside pass 1 (already executed
    # by the time the returned plan exists)
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [2, 3, 3])], "doc_id long, tokens array<int>"
    )
    out = rarity_score(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# -------------------------------------------------------------- decon


def test_decontaminate_stats_tiny(spark):
    train = spark.createDataFrame(
        [
            (1, [1, 2, 3, 4]),  # windows {123,234}; 234 in bench -> 1/2
            (2, [9, 9, 9]),  # window {999}, not in bench
            (3, [2, 3, 4]),  # exactly the bench window -> 1/1
            (4, [5]),  # too short: 0 windows
        ],
        "doc_id long, tokens array<int>",
    )
    bench = spark.createDataFrame(
        [(100, [2, 3, 4, 7, 7, 7])], "doc_id long, tokens array<int>"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate_stats(train, bench, k=3).collect()
    }
    assert out[1] == {
        "doc_id": 1, "n_windows": 2, "hit_windows": 1,
        "hit_frac_x1000": 500, "contaminated": True,
    }
    assert out[2]["hit_windows"] == 0 and not out[2]["contaminated"]
    assert out[3]["hit_frac_x1000"] == 1000 and out[3]["contaminated"]
    assert out[4] == {
        "doc_id": 4, "n_windows": 0, "hit_windows": 0,
        "hit_frac_x1000": 0, "contaminated": False,
    }
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, bench, k=3).collect()
    )
    assert kept == [2, 4]


def test_decontaminate_any_overlap_long_doc(spark):
    # 1 hit among >1000 windows: the floored hit_frac_x1000 display
    # column rounds to 0 — the flag must use the exact compare and
    # still fire under the any-overlap default
    train = spark.createDataFrame(
        [(1, list(range(3000)))], "doc_id long, tokens array<int>"
    )
    bench = spark.createDataFrame(
        [(9, [5, 6, 7])], "doc_id long, tokens array<int>"
    )
    out = decontaminate_stats(train, bench, k=3).collect()[0]
    assert out["n_windows"] == 2998 and out["hit_windows"] == 1
    assert out["hit_frac_x1000"] == 0 and out["contaminated"]
    # fractional threshold: 1 hit in 2998 windows is below 1/1000
    out2 = decontaminate_stats(train, bench, k=3, threshold_x1000=1).collect()[0]
    assert not out2["contaminated"]


def test_decontaminate_self_overlap(spark):
    # bench drawn FROM the train set: every benched doc is contaminated
    train = spark.createDataFrame(
        [(i, [i, i + 1, i + 2, i + 3, i + 4]) for i in range(0, 100, 5)],
        "doc_id long, tokens array<int>",
    )
    bench = train.where(F.col("doc_id") % 4 == 0)
    out = decontaminate_stats(train, bench, k=5)
    flagged = sorted(r["doc_id"] for r in out.where("contaminated").collect())
    assert flagged == [i for i in range(0, 100, 5) if i % 4 == 0]


# ---------------------------------------------------------------- doc_stats


def test_doc_stats_equals_individual_operators(spark):
    """The one-pass profile must agree with quality_features,
    token_counts and lang_id column for column (it exists to read the
    corpus once, not to change any value)."""
    from logparser_spark.operators import textstats

    rows = [
        (1, "en", "the quick brown fox jumps over the lazy dog . " * 3),
        (2, "es", "el que la de y en un por con para"),
        (3, "zh", "的 是 在 了 和"),
        (4, "en", "x"),
        (5, "de", "der die das und ist von mit ein zu auf !!! 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    prof = {r["doc_id"]: r.asDict() for r in textstats.doc_stats(df).collect()}
    qf = {r["doc_id"]: r.asDict() for r in textstats.quality_features(df).collect()}
    tc = {r["doc_id"]: r.asDict() for r in textstats.token_counts(df).collect()}
    li = {
        r["doc_id"]: r.asDict()
        for r in textstats.lang_id(df)
        .select("doc_id", "lang", "predicted_lang", "best_score")
        .collect()
    }
    for i in prof:
        merged = {**qf[i], **tc[i], **li[i]}
        assert prof[i] == {k: merged[k] for k in prof[i]}, i


def test_doc_stats_requires_only_doc_id_and_text(spark):
    """The operator must not bake fixture columns in: any frame with
    (doc_id, text) profiles; extra columns pass through only when
    requested via carry_cols."""
    from logparser_spark.operators import textstats

    df = spark.createDataFrame([(1, "hello world .")], "doc_id long, text string")
    cols = textstats.doc_stats(df).columns
    assert "lang" not in cols and cols[0] == "doc_id"
    df2 = spark.createDataFrame(
        [(1, "s9", "hello world .")], "doc_id long, shard string, text string"
    )
    assert textstats.doc_stats(df2, carry_cols=("shard",)).columns[1] == "shard"


def test_stratified_take_reserved_columns_rejected(spark):
    """Internal __h/__salt/__rn columns would be silently replaced and
    dropped; fail fast instead (same contract as asof_join)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, __h string"
    )
    with _pytest.raises(ValueError, match="reserved"):
        stratified_take(df, quota=1)
