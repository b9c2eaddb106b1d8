"""URL canonicalization: known tricky cases, idempotence over a seeded
random URL-ish corpus (one Spark job), and the dup-groups primitive."""

import random

from pyspark.sql import functions as F

from logparser_spark.functions.urlnorm import (
    normalize_url_expr,
    url_dup_groups,
    with_normalized_url,
)

CASES = [
    # (raw, canonical)
    ("http://A.B.com:80/x?b=2&a=1#frag", "http://a.b.com/x?a=1&b=2"),
    ("HTTPS://Host.com:443/", "https://host.com"),
    ("http://h.com:8080/p", "http://h.com:8080/p"),
    ("http://h.com/PaTh", "http://h.com/PaTh"),  # path case preserved
    ("a.B:443", "a.b:443"),  # scheme-less CONNECT target: port kept
    ("h.com", "h.com"),
    ("http://h.com/?x=1", "http://h.com?x=1"),
    ("http://h.com/a/b?z=1&y=2&x=3", "http://h.com/a/b?x=3&y=2&z=1"),
    ("-", "-"),
    ("", ""),
    ("http://", "http://"),  # no host -> untouched
    ("http://[::1]:8080/p", "http://[::1]:8080/p"),  # ipv6 -> untouched
    ("ftp://F.com:21/f", "ftp://f.com/f"),
    # userinfo is case-sensitive and misparses the simple grammar ->
    # pass through verbatim, never emit a mangled/conflated URL
    ("http://Alice@h.com/x", "http://Alice@h.com/x"),
    ("HTTP://u:p@Host.com:80/x", "HTTP://u:p@Host.com:80/x"),
    # repeated query key: order is semantics (last-value-wins servers)
    ("http://H.com/x?a=2&a=1", "http://h.com/x?a=2&a=1"),
    ("http://h.com/x?b=1&a=2&b=3", "http://h.com/x?b=1&a=2&b=3"),
    # a "path" not starting with '/' means the grammar misplaced the
    # authority boundary ('...:80abc' would rebuild as host+path =
    # a DIFFERENT host) -> pass through verbatim
    ("http://example.com:80abc", "http://example.com:80abc"),
    ("h.com:abc", "h.com:abc"),
]


def test_known_canonical_forms(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r.n for r in df.select(normalize_url_expr("url").alias("n")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_normalization_is_idempotent(spark):
    rng = random.Random(7)
    schemes = ["http://", "HTTPS://", "", "ftp://", "ws://"]
    hosts = ["A.b.COM", "x.y", "h", "10.0.0.1", "[::1]", "", "U@h.co", "u:p@H.c"]
    ports = ["", ":80", ":443", ":8080", ":0443"]
    paths = ["", "/", "/A/b", "/p?not=path", "//x"]
    queries = ["", "?b=1&a=2", "?a=1&", "?&", "?Z", "?a=1&a=0", "?x&x", "?a=1&a"]
    frags = ["", "#f", "##x", "#a?b=1"]
    urls = [
        rng.choice(schemes)
        + rng.choice(hosts)
        + rng.choice(ports)
        + rng.choice(paths)
        + rng.choice(queries)
        + rng.choice(frags)
        for _ in range(400)
    ] + [raw for raw, _ in CASES]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = normalize_url_expr("url")
    twice = normalize_url_expr(once)
    bad = (
        df.select("url", once.alias("n1"), twice.alias("n2"))
        .where(~(F.col("n1").eqNullSafe(F.col("n2"))))
        .collect()
    )
    assert bad == [], bad[:5]


def test_url_dup_groups_collapses_spellings(spark):
    rows = [
        ("http://A.com:80/x?b=1&a=2",),
        ("http://a.com/x?a=2&b=1",),
        ("http://a.com/x?a=2&b=1#frag",),
        ("http://other.com/",),
        ("http://other.com",),  # same canonical, 2 spellings
        ("http://unique.com/solo",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r.url_norm: (r.n_spellings, r.occurrences)
        for r in url_dup_groups(df).collect()
    }
    assert got == {
        "http://a.com/x?a=2&b=1": (3, 3),
        "http://other.com": (2, 2),
    }
    # and the projection op is shuffle-free
    plan = with_normalized_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
