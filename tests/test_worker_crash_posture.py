"""Defensive posture for Python-worker deaths: a crashed worker must
surface the Python traceback that killed it, not an opaque JVM-side
Arrow connection reset (the round-2 driver-bench kill produced exactly
that unreadable failure, per its stderr tail)."""

import pandas as pd
import pytest
from pyspark.sql.functions import pandas_udf


def test_faulthandler_confs_pinned(spark):
    assert spark.conf.get("spark.python.worker.faulthandler.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.execution.pyspark.udf.faulthandler.enabled")
        == "true"
    )


def test_forced_worker_abort_surfaces_python_traceback(spark):
    @pandas_udf("long")
    def hard_abort(s: pd.Series) -> pd.Series:
        import os

        os.abort()  # simulates a native crash (segfault-class death)

    df = spark.range(0, 4, 1, 1).select(hard_abort("id").alias("x"))
    with pytest.raises(Exception) as ei:
        df.collect()
    msg = str(ei.value)
    # the faulthandler dump names the crashing Python frame
    assert "hard_abort" in msg, msg[:2000]
    assert "Current thread" in msg or "Fatal Python error" in msg, msg[:2000]
