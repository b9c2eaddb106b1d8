"""Live-progress + cancellation facade (reference parity with the
parse status/cancel endpoints, LogParsingService.java:83-166,520-595)."""

import json
import os
import threading
import time

from logparser_spark.plans.pipeline import run_pipeline
from logparser_spark.plans.progress import ProgressReporter, cancel_job_group


def test_progress_records_written_during_chunked_run(
    spark, tiny_input, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("prog"))
    run_pipeline(spark, tiny_input, out, n_chunks=2, progress=True)
    path = os.path.join(out, "progress.jsonl")
    assert os.path.exists(path)
    recs = [json.loads(l) for l in open(path)]
    assert recs[-1].get("final") is True
    # at least one sampled record saw live jobs with task counters
    live = [r for r in recs if r["jobs"]]
    assert live, recs
    job = live[-1]["jobs"][-1]
    assert job["tasks_total"] > 0
    assert {"stage_id", "tasks", "completed"} <= set(job["stages"][0])
    assert all(r["job_group"] == f"pipeline-{os.path.basename(out)}" for r in recs)


def test_cancel_stops_inflight_run(spark, tmp_path_factory):
    """cancel() must abort a running job group quickly — the slow job
    would otherwise run for ~100 s."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def slow(s: pd.Series) -> pd.Series:
        time.sleep(0.25)
        return s

    out = str(tmp_path_factory.mktemp("cancel"))
    df = spark.range(0, 2000, 1, 400).select(slow("id").alias("x"))

    errors: list[Exception] = []

    def run():
        try:
            with ProgressReporter(spark, out, job_group="cancel-me"):
                df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # cancellation surfaces here
            errors.append(exc)

    t = threading.Thread(target=run)
    t0 = time.monotonic()
    t.start()
    time.sleep(2.0)  # let tasks start
    cancel_job_group(spark, "cancel-me")
    t.join(timeout=30)
    assert not t.is_alive()
    assert time.monotonic() - t0 < 30
    assert errors and "cancel" in str(errors[0]).lower()
