"""Reader for the tokenized-sequence input table.

Analog of the reference's file-scan source (LogFileParser.java:65-83),
re-expressed as a parallel columnar scan: every executor reads its own
parquet splits and feeds Arrow batches straight into the parse UDF —
the single 4 MB BufferedReader thread becomes N concurrent scanners.

An explicit schema is always supplied (the reference eagerly types at
parse time; we eagerly type at scan time — no inference job).
On a cluster this reader points at an Iceberg table
(``spark.read.format("iceberg")``); the container has no Iceberg
runtime jar, so the parquet directory layout stands in — the DataFrame
lineage downstream is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RAW_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)


def read_raw_sequences(
    spark: SparkSession, path: str | list[str], validate: bool = False
) -> DataFrame:
    """Read the tokenized-sequence table with the pinned schema.

    ``validate=True`` enforces the generator invariant
    ``n_tok == size(tokens)`` by FILTERING violating rows out (schema
    unchanged); leave False on trusted inputs to skip the extra
    size() evaluation per row.
    """
    df = spark.read.schema(RAW_SCHEMA).parquet(
        *(path if isinstance(path, list) else [path])
    )
    if validate:
        from pyspark.sql import functions as F

        df = df.filter(F.size("tokens") == F.col("n_tok"))
    return df
