"""In-flight progress + cancellation facade for pipeline runs.

Reference parity: LogParsingService exposes live parse progress and a
cancel endpoint (LogParsingService.java:83-166,520-595, backed by
model/ParsingStatus.java:3-54). The Spark-native equivalents are the
StatusTracker (per-stage task counters, polled — no listener bus
subscription needed from Python) and job groups (``cancelJobGroup``
interrupts every job the pipeline submits under its group).

Usage::

    with ProgressReporter(spark, out_root) as prog:
        ... submit jobs ...           # all run under prog.job_group
    # <out_root>/progress.jsonl now holds the sampled timeline

    prog.cancel()                     # from another thread: stop the run

``run_pipeline(..., progress=True)`` wires this in; the records land
next to the manifest so one directory carries the full lineage story
(what ran, how fast, and what its live progress looked like).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any

from pyspark.sql import SparkSession


class ProgressReporter:
    """Samples per-stage task progress for every job submitted under a
    job group and appends JSON-line records to
    ``<out_root>/progress.jsonl``.

    Polling the StatusTracker from a daemon thread costs a few local
    RPC calls per tick and nothing on executors — safe to leave on for
    production runs (the reference polls its status object the same
    way). The thread only *observes*; the run's correctness never
    depends on it.
    """

    def __init__(
        self,
        spark: SparkSession,
        out_root: str,
        job_group: str | None = None,
        interval_sec: float = 0.5,
        description: str = "logparser pipeline",
    ):
        self.spark = spark
        self.out_root = out_root
        self.job_group = job_group or f"pipeline-{os.path.basename(out_root.rstrip('/'))}"
        self.interval_sec = interval_sec
        self.description = description
        self.path = os.path.join(out_root, "progress.jsonl")
        # the file is append-only across runs into the same out_root, so
        # every record carries a per-run id + wall-clock start — without
        # it, two runs' t_sec timelines interleave ambiguously
        import uuid

        self.run_id = uuid.uuid4().hex[:12]
        self.started_at = time.time()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0

    # -- lifecycle ----------------------------------------------------

    def __enter__(self) -> "ProgressReporter":
        os.makedirs(self.out_root, exist_ok=True)
        sc = self.spark.sparkContext
        # interruptOnCancel: cancel interrupts running tasks instead of
        # waiting for them (safe: our tasks hold no external locks)
        sc.setJobGroup(self.job_group, self.description, interruptOnCancel=True)
        self._t0 = time.monotonic()
        self._stop.clear()
        self._thread = threading.Thread(target=self._poll_loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # teardown must never mask the body's real exception: the
        # context (or whole session) may already be dead here
        try:
            self._write(self._snapshot(final=True))
        except Exception:
            pass
        try:
            # clear this thread's group (setJobGroup requires strings;
            # local properties accept None as "unset")
            sc = self.spark.sparkContext
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            sc.setLocalProperty("spark.job.interruptOnCancel", None)
        except Exception:
            pass

    def cancel(self) -> None:
        """Stop every job of this run (thread-safe; callable from any
        thread — the reference's cancel endpoint analog)."""
        self.spark.sparkContext.cancelJobGroup(self.job_group)

    # -- internals ----------------------------------------------------

    def _poll_loop(self) -> None:
        while not self._stop.wait(self.interval_sec):
            try:
                rec = self._snapshot()
            except Exception:  # session shutting down mid-poll
                return
            if rec["jobs"]:
                self._write(rec)

    def _snapshot(self, final: bool = False) -> dict[str, Any]:
        tracker = self.spark.sparkContext.statusTracker()
        jobs = []
        for job_id in sorted(tracker.getJobIdsForGroup(self.job_group)):
            info = tracker.getJobInfo(job_id)
            if info is None:
                continue
            stages = []
            done = total = 0
            for sid in info.stageIds:
                st = tracker.getStageInfo(sid)
                if st is None:
                    continue
                stages.append(
                    {
                        "stage_id": sid,
                        "tasks": st.numTasks,
                        "active": st.numActiveTasks,
                        "completed": st.numCompletedTasks,
                        "failed": st.numFailedTasks,
                    }
                )
                done += st.numCompletedTasks
                total += st.numTasks
            jobs.append(
                {
                    "job_id": job_id,
                    "status": str(info.status),
                    "tasks_completed": done,
                    "tasks_total": total,
                    "stages": stages,
                }
            )
        return {
            "run_id": self.run_id,
            "started_at": round(self.started_at, 3),
            "t_sec": round(time.monotonic() - self._t0, 3),
            "job_group": self.job_group,
            **({"final": True} if final else {}),
            "jobs": jobs,
        }

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


def cancel_job_group(spark: SparkSession, job_group: str) -> None:
    """Module-level cancel for callers that only hold the group name
    (e.g. an operator console cancelling a run started elsewhere)."""
    spark.sparkContext.cancelJobGroup(job_group)
