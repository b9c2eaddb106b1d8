"""Upsert semantics over key-addressed parquet tables — the reference's
two ON CONFLICT shapes re-expressed as set operations + atomic
overwrite:

- O5 upsert-ignore  (INSERT .. ON CONFLICT DO NOTHING,
  DatabaseManager.java:404-417,445-458): new rows minus existing keys
  via LEFT ANTI join, appended.
- O6 upsert-replace (ON CONFLICT .. DO UPDATE,
  PrecalculatedTopService.java:198-217): keep-latest per key via
  row_number over (key ORDER BY version DESC), full overwrite.

On Iceberg both are a single ``MERGE INTO``; this container has no
Iceberg runtime, so the helpers express the same semantics with the
anti-join/window primitives that MERGE compiles to anyway. The anti
join broadcasts whichever side is small (dim tables are tiny — the
reference only upserts dimension/summary rows, never the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_ignore(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``existing`` plus rows of ``new`` whose key is unseen.

    Duplicate keys *within* ``new`` keep the first by the remaining
    column order (deterministic via a min struct, mirroring DO NOTHING
    firing once per conflicting key).
    """
    non_key = [c for c in new.columns if c not in keys]
    if non_key:
        # min over the non-key struct == "first by column order", as an
        # AGGREGATE: map-side partial aggregation collapses a hot key
        # per task before the shuffle, where a window row_number would
        # funnel the whole key through one partition.
        dedup = new.groupBy(*keys).agg(
            F.min(F.struct(*[F.col(c) for c in non_key])).alias("_m")
        )
        new_dedup = dedup.select(
            *keys, *[F.col(f"_m.{c}").alias(c) for c in non_key]
        ).select(*new.columns)
    else:
        # pure-key table (a legitimate DO NOTHING shape): identical
        # rows need no tie-break.
        new_dedup = new.dropDuplicates(keys)
    fresh = new_dedup.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
    return existing.unionByName(fresh)


def upsert_replace(
    existing: DataFrame, new: DataFrame, keys: list[str], version_col: str
) -> DataFrame:
    """Union then keep-latest per key by ``version_col`` (ties favor
    ``new``): the DO UPDATE shape. Output has one row per key."""
    tagged_old = existing.withColumn("_src", F.lit(0))
    tagged_new = new.withColumn("_src", F.lit(1))
    allrows = tagged_old.unionByName(tagged_new)
    payload = [c for c in existing.columns if c not in keys]
    # keep-latest as max_by aggregate, not a window: partial aggregation
    # makes hot keys skew-safe (see keep_latest)
    agg = allrows.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col(version_col), F.col("_src")),
        ).alias("_top")
    )
    return agg.select(
        *keys, *[F.col(f"_top.{c}").alias(c) for c in payload]
    ).select(*existing.columns)
