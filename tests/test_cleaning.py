"""C4 cleaning: differential test against a naive per-row Python model
of the same rules, plus pinned edge cases and a zero-shuffle plan
assert."""

import re

from logparser_spark.operators.cleaning import c4_clean


def naive_c4(text, min_words_per_line=5, min_lines=3):
    # NULL pins to the empty-page case: 0 lines, is_kept False — a NULL
    # verdict would escape both is_kept and ~is_kept drop accounting
    text = text or ""
    lines = text.split("\n") if text else []
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]\s*$', l)
        and len([w for w in re.split(r"\s+", l.strip()) if w]) >= min_words_per_line
    ]
    ok = (
        len(kept) >= min_lines
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return len(lines), len(kept), ok, ("\n".join(kept) if ok else None)


DOCS = [
    (0, "one two three four five.\nsix seven eight nine ten!\n"
        'eleven twelve thirteen fourteen fifteen?"\nshort line.'),
    (1, "no terminal punctuation here at all\nanother one without"),
    (2, "a b c d e.\nf g h i j.\nk l m n o.\ncontains Lorem Ipsum text."),
    (3, "a b c d e.\nf g h i j.\nk l m n o. { code block }"),
    (4, "only one good line here today.\ntoo short.\nnope"),
    (5, ""),
    (6, "ends with quote one two three.\"\nwords words words words words!\n"
        "five words ending in dot.\ntrailing spaces after period.   "),
    (7, "exactly five words right here.\nsecond line of five words.\n"
        "third line makes it pass."),
    (8, None),
]


def test_c4_clean_matches_naive_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_lines_kept, r.is_kept, r.clean_text)
        for r in c4_clean(df).collect()
    }
    assert len(got) == len(DOCS)
    for doc_id, text in DOCS:
        assert got[doc_id] == naive_c4(text), (doc_id, text)
    # the fixture must exercise both verdicts and every drop rule
    assert got[0][2] and got[7][2]
    assert not got[1][2] and not got[2][2] and not got[3][2] and not got[4][2]


def test_c4_clean_is_zero_shuffle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
