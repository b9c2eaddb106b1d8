"""Lineage manifest + resume logic.

Reference analog: the freshness check that skips a re-parse when the
sink already holds the file's data (LogFileParser.java:975-1047),
generalized to per-chunk granularity per the north rule.

The manifest is an append-only JSONL file; one record per committed
chunk carrying lineage (exact input files), row counts per category,
and throughput metrics. A chunk is the unit of resume: on restart,
committed chunks are skipped; a chunk that crashed after writing some
sink files but before its manifest record is rolled back by filename
prefix (MultiSinkWriter.remove_chunk) and re-run — end state identical
to an uninterrupted run (tested).

Appends are staged through a temp file + fsync + atomic rename of the
whole manifest so a torn write cannot corrupt history.
"""

from __future__ import annotations

import json
import os
import tempfile


class Manifest:
    def __init__(self, root: str):
        self.path = os.path.join(root, "manifest.jsonl")
        os.makedirs(root, exist_ok=True)

    def completed_chunks(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for ln in f:
                    ln = ln.strip()
                    if ln:
                        rec = json.loads(ln)
                        done[rec["chunk_id"]] = rec
        return done

    def commit_chunk(self, record: dict) -> None:
        existing = b""
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                existing = f.read()
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path))
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(existing)
                f.write((json.dumps(record, sort_keys=True) + "\n").encode())
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
