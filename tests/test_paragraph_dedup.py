"""paragraph_dedup: differential test vs a pure-python model of the
global-first-occurrence rule, plus edge pins."""

import random

from logparser_spark.operators.dedup import paragraph_dedup


def _py_model(rows, delim="\n"):
    """(doc_id, text) -> {doc_id: (n_paras, n_dup, text_clean)} under
    the documented rule: trim each paragraph, drop blanks, keeper =
    first (doc_id, pos) occurrence corpus-wide, reassemble in order."""
    first: dict[str, tuple] = {}
    paras_by_doc = {}
    for doc_id, text in sorted(rows):
        out = []
        for pos, p in enumerate((text or "").split(delim)):
            p = p.strip()
            if not p:
                continue
            out.append((pos, p))
            if p not in first:
                first[p] = (doc_id, pos)
        paras_by_doc[doc_id] = out
    res = {}
    for doc_id, _ in rows:
        ps = paras_by_doc[doc_id]
        kept = [p for pos, p in ps if first[p] == (doc_id, pos)]
        res[doc_id] = (len(ps), len(ps) - len(kept), delim.join(kept))
    return res


def test_matches_python_model(spark):
    rng = random.Random(5)
    pool = [f"para {i} body" for i in range(12)]  # small pool -> many dups
    rows = [
        (
            i,
            "\n".join(
                rng.choice(pool) for _ in range(rng.randrange(0, 8))
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["text_clean"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == _py_model(rows)


def test_within_doc_duplicates_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma"),  # within-doc dup
            (2, "beta\ndelta"),  # cross-doc dup of beta
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}
    assert got[1]["text_clean"] == "alpha\nbeta\ngamma"
    assert (got[1]["n_paras"], got[1]["n_dup_paras"]) == (4, 1)
    assert got[2]["text_clean"] == "delta"
    assert (got[2]["n_paras"], got[2]["n_dup_paras"]) == (2, 1)


def test_blank_null_and_fully_duplicated(spark):
    df = spark.createDataFrame(
        [
            (1, "x\n\n  \nx"),  # blanks dropped; second x is a dup
            (2, None),
            (3, ""),
            (4, "x"),  # whole doc already seen -> empties out
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}
    assert got[1] == {
        "doc_id": 1,
        "n_paras": 2,
        "n_dup_paras": 1,
        "text_clean": "x",
    }
    assert got[2] == {"doc_id": 2, "n_paras": 0, "n_dup_paras": 0, "text_clean": ""}
    assert got[3] == {"doc_id": 3, "n_paras": 0, "n_dup_paras": 0, "text_clean": ""}
    assert got[4] == {"doc_id": 4, "n_paras": 1, "n_dup_paras": 1, "text_clean": ""}


def test_custom_delimiter(spark):
    df = spark.createDataFrame(
        [(1, "a||b||a"), (2, "b||c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in paragraph_dedup(df, delim="||").collect()
    }
    assert got == {1: "a||b", 2: "c"}
