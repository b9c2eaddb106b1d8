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
from pyspark.sql.window import Window


def upsert_ignore(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``existing`` plus rows of ``new`` whose key is unseen.

    Duplicate keys *within* ``new`` keep the first by the remaining
    column order (deterministic via a min struct, mirroring DO NOTHING
    firing once per conflicting key).
    """
    non_key = [c for c in new.columns if c not in keys]
    if non_key:
        w = Window.partitionBy(*keys).orderBy(*non_key)
        new_dedup = (
            new.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        # pure-key table (a legitimate DO NOTHING shape): an empty
        # orderBy would throw; identical rows need no tie-break.
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
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col), F.desc("_src"))
    return (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
