"""Result-set export at the API edge (reference S8: page -> CSV/JSON,
static/app.js:1616-1662, done client-side there; here a distributed
write or an inline JSON column).

These run on *result* DataFrames (pages, top-K, summaries) — small by
construction — so a coalesce(1) for a single artifact file is safe; for
large exports leave ``single_file=False`` and let every task write its
split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def to_json_rows(df: DataFrame) -> DataFrame:
    """One JSON string per row (the reference's JSON blob shape,
    to_json(struct(*)) at the edge — nested types stay native until
    here)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))
