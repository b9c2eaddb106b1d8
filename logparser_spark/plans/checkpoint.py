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

Commits are O(1): one appended line + fsync per chunk (a rewrite-whole-
file commit is O(n) per chunk = O(n²) total manifest I/O across a load
with thousands of chunks — a measurable driver stall at the target
scale). Torn-write safety moves to the READER: a crash mid-append can
only tear the FINAL line, the reader skips any unparseable line (that
chunk never committed, so it is rolled back and re-run — identical to
crashing just before the commit), and the next commit terminates a torn
tail with a newline so the fragment can never splice into a later
record.
"""

from __future__ import annotations

import json
import os


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
                    if not ln:
                        continue
                    try:
                        rec = json.loads(ln)
                    except ValueError:
                        # torn append from a crash mid-commit: the
                        # record never committed; its chunk re-runs
                        # after the usual filename-prefix rollback
                        continue
                    done[rec["chunk_id"]] = rec
        return done

    def commit_chunk(self, record: dict) -> None:
        line = (json.dumps(record, sort_keys=True) + "\n").encode()
        with open(self.path, "ab") as f:
            # terminate a torn fragment left by a crashed commit so
            # this record starts on its own line (the fragment becomes
            # one unparseable line the reader skips)
            if f.tell() > 0:
                with open(self.path, "rb") as r:
                    r.seek(-1, os.SEEK_END)
                    if r.read(1) != b"\n":
                        f.write(b"\n")
            f.write(line)
            f.flush()
            os.fsync(f.fileno())
