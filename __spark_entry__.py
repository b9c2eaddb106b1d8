"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: full tokenized parse→enrich→route→aggregate
              over sf0.001-derived lines (per-category sink totals).
``queries`` — one entry per implemented operator (SURVEY.md §2 plus
              the training-data extensions).
``oracle_sql`` — DuckDB-equivalent SQL for every SQL-expressible query;
              approximate/hash-family ops (simhash, fingerprint,
              ann_lsh) intentionally have no oracle → rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from logparser_spark.driver_queries import q_sink_totals

    return q_sink_totals(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logparser_spark.driver_queries import PIPELINE_QUERIES
    from logparser_spark.driver_queries_docs import DOC_QUERIES

    def _utc(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # release intermediates the PREVIOUS query persisted (the
            # driver has materialized its result by now) so a full-surface
            # sweep never accumulates disk-spilled cache blocks
            from logparser_spark.operators.util import release_persisted

            release_persisted()
            return fn(spark, sf_dir)

        return wrapped

    out = {}
    for name, fn in {**PIPELINE_QUERIES, **DOC_QUERIES}.items():
        out[name] = _utc(fn)
    return out


def oracle_sql() -> dict[str, str]:
    from logparser_spark.driver_queries import PIPELINE_ORACLES
    from logparser_spark.driver_queries_docs import DOC_ORACLES

    return {**PIPELINE_ORACLES, **DOC_ORACLES}
