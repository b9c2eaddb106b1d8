"""End-to-end pipeline correctness vs the independent oracle
(SURVEY.md §5 invariants 1-3, 5): token-array equality per routed row,
routed-row set equality per sink, per-sink aggregate equality, top-K
equality with pinned tie-breaks, and kill/resume idempotence."""

import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from logparser_spark import oracle
from logparser_spark.operators import aggregates as agg
from logparser_spark.plans.pipeline import run_aggregates, run_pipeline, build_routed
from logparser_spark.sources.sequences import read_raw_sequences
from logparser_spark.sources.sinks import read_sink


@pytest.fixture(scope="module")
def pipeline_out(spark, tiny_input, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    run_pipeline(spark, tiny_input, out, n_chunks=2)
    return out


@pytest.fixture(scope="module")
def oracle_parsed(tiny_lines):
    parsed = oracle.parse_frame(tiny_lines["line"])
    parsed["doc_id"] = tiny_lines["doc_id"].values
    parsed["source"] = tiny_lines["source"].values
    return parsed


def test_routed_row_set_equality(spark, pipeline_out, oracle_parsed):
    got = {
        (r.category, r.doc_id)
        for r in read_sink(spark, pipeline_out).select("category", "doc_id").collect()
    }
    want = set(zip(oracle_parsed["category"], oracle_parsed["doc_id"]))
    assert got == want


def test_token_array_equality(spark, pipeline_out, tiny_input):
    """Every routed row carries its original tokens byte-identical."""
    inp = {
        r.doc_id: r.tokens
        for r in read_raw_sequences(spark, tiny_input).collect()
    }
    rows = read_sink(spark, pipeline_out).select("doc_id", "tokens", "n_tok").collect()
    assert len(rows) == len(inp)
    for r in rows:
        assert r.tokens == inp[r.doc_id], r.doc_id
        assert r.n_tok == len(r.tokens)


def test_sink_totals_equality(spark, pipeline_out, oracle_parsed):
    got = agg.sink_totals(read_sink(spark, pipeline_out)).toPandas()
    want = oracle.aggregate_sinks(oracle_parsed)
    got = got.sort_values("category").reset_index(drop=True)
    for col in ["row_count", "error_count", "unique_ips", "bytes_total", "avg_response_time_ms"]:
        assert list(got[col]) == list(want[col]), col


def test_sink_totals_approx_distinct_within_tolerance(spark, pipeline_out, oracle_parsed):
    """The documented 10^12-scale knob: HLL++ distinct within 10% of
    exact (default rsd is 5%)."""
    got = (
        agg.sink_totals(read_sink(spark, pipeline_out), approx_distinct=True)
        .toPandas()
        .sort_values("category")
        .reset_index(drop=True)
    )
    want = oracle.aggregate_sinks(oracle_parsed)
    assert list(got["row_count"]) == list(want["row_count"])  # only distinct is approx
    for g, w in zip(got["unique_ips"], want["unique_ips"]):
        assert abs(g - w) <= max(2, 0.1 * w)


def test_status_hist_equality(spark, pipeline_out, oracle_parsed):
    got = (
        agg.status_hist(read_sink(spark, pipeline_out))
        .toPandas()
        .sort_values(["category", "status_class"])
        .reset_index(drop=True)
    )
    want = oracle.status_hist(oracle_parsed)
    pd.testing.assert_frame_equal(
        got.astype({"row_count": "int64"}), want.astype({"row_count": "int64"})
    )


def test_hourly_hist_equality(spark, pipeline_out, oracle_parsed):
    got = (
        agg.hourly_hist(read_sink(spark, pipeline_out))
        .toPandas()
        .sort_values(["category", "hour"])
        .reset_index(drop=True)
    )
    want = oracle.hourly_hist(oracle_parsed)
    assert got.shape == want.shape  # dense 24 x categories
    pd.testing.assert_frame_equal(
        got.astype({"hour": "int64", "row_count": "int64"}),
        want.astype({"hour": "int64", "row_count": "int64"}),
    )


def test_top_urls_equality(spark, pipeline_out, oracle_parsed):
    got = agg.top_urls(read_sink(spark, pipeline_out), k=100).toPandas()
    want = oracle.top_urls(oracle_parsed, k=100)
    assert list(got["url"]) == list(want["url"])
    for col in ["request_count", "avg_response_time", "total_bytes", "last_access_us"]:
        assert list(got[col].astype("int64")) == list(want[col].astype("int64")), col


def test_top_urls_salted_equals_unsalted(spark, pipeline_out):
    df = read_sink(spark, pipeline_out)
    a = agg.top_urls(df, k=50, salted=True).toPandas()
    b = agg.top_urls(df, k=50, salted=False).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_top_users_equality(spark, pipeline_out, oracle_parsed):
    got = agg.top_users(read_sink(spark, pipeline_out), k=10).toPandas()
    want = oracle.top_users(oracle_parsed, k=10)
    assert list(got["username"]) == list(want["username"])
    for col in ["min_ip", "request_count", "unique_ips", "avg_response_time",
                "total_bytes", "first_seen_us", "last_seen_us"]:
        assert list(got[col]) == list(want[col]), col


def test_enrichment_null_handling(spark, pipeline_out):
    """Unseen dim keys get defaults; seen keys carry dim attributes."""
    df = read_sink(spark, pipeline_out).select("action", "action_family", "ip_class")
    fams = {r.action: r.action_family for r in df.distinct().collect() if r.action}
    assert fams["TCP_MISS"] == "MISS"
    assert fams["TCP_DENIED"] == "DENIED"
    assert fams["NONE"] == "OTHER"


def test_quarantine_has_reject_reason(spark, pipeline_out):
    q = read_sink(spark, pipeline_out, category="quarantine")
    reasons = {r.reject_reason for r in q.select("reject_reason").distinct().collect()}
    assert "regex_mismatch" in reasons
    assert "invalid_username" in reasons
    assert q.filter("valid = 1").count() == 0


def test_resume_after_injected_failure(spark, tiny_input, tmp_path_factory):
    """Kill after chunk 1 of 4, restart, final state == uninterrupted run."""
    out_a = str(tmp_path_factory.mktemp("resume_a"))
    out_b = str(tmp_path_factory.mktemp("resume_b"))

    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, tiny_input, out_a, n_chunks=4, fail_after_chunk=1)
    res = run_pipeline(spark, tiny_input, out_a, n_chunks=4)  # resume
    assert res["chunks"] == 4

    run_pipeline(spark, tiny_input, out_b, n_chunks=4)  # uninterrupted

    a = {(r.doc_id, r.category) for r in read_sink(spark, out_a).select("doc_id", "category").collect()}
    b = {(r.doc_id, r.category) for r in read_sink(spark, out_b).select("doc_id", "category").collect()}
    assert a == b
    # no duplicated doc_ids after resume
    assert len(a) == read_sink(spark, out_a).count()


def test_manifest_metrics(spark, tiny_input, tmp_path_factory):
    from logparser_spark.plans.checkpoint import Manifest

    out = str(tmp_path_factory.mktemp("metrics"))
    run_pipeline(spark, tiny_input, out, n_chunks=2)
    recs = Manifest(out).completed_chunks()
    assert len(recs) == 2
    for rec in recs.values():
        assert rec["rows"] > 0
        assert rec["rows_per_sec"] > 0
        assert set(rec["rows_per_category"]) <= {"quarantine", "denied", "error", "success", "other"}


def test_manifest_counts_match_data_and_observation(spark, tiny_input, tmp_path_factory):
    """Manifest counts come from the writer's exact footer walk (the
    source of record — Observation accumulators overcount on stage
    reattempts); they must equal an INDEPENDENT Spark read-back count
    per category, and on a clean run (no reattempts) the Observation
    cross-check must have agreed (no observed_rows divergence record)."""
    from logparser_spark.plans.checkpoint import Manifest

    out = str(tmp_path_factory.mktemp("footers"))
    run_pipeline(spark, tiny_input, out, n_chunks=2)
    readback = {
        r["category"]: r["n"]
        for r in read_sink(spark, out).groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    total = 0
    merged: dict[str, int] = {}
    for rec in Manifest(out).completed_chunks().values():
        assert "observed_rows" not in rec  # clean run: cross-check agreed
        total += rec["rows"]
        for c, n in rec["rows_per_category"].items():
            merged[c] = merged.get(c, 0) + n
    assert merged == readback
    assert total == sum(readback.values())


def test_manifest_partition_metrics(spark, tiny_input, tmp_path_factory):
    """Each chunk record carries per-partition-dir lineage (rows, bytes,
    files) whose totals reconcile with the chunk counts."""
    from logparser_spark.plans.checkpoint import Manifest

    out = str(tmp_path_factory.mktemp("partmetrics"))
    run_pipeline(spark, tiny_input, out, n_chunks=1)
    for rec in Manifest(out).completed_chunks().values():
        parts = rec["partitions"]
        assert parts and all(p.startswith("category=") for p in parts)
        assert sum(p["rows"] for p in parts.values()) == rec["rows"]
        assert all(p["bytes"] > 0 and p["files"] >= 1 for p in parts.values())
        per_cat = {}
        for name, p in parts.items():
            cat = name.split("/")[0].split("=", 1)[1]
            per_cat[cat] = per_cat.get(cat, 0) + p["rows"]
        assert per_cat == rec["rows_per_category"]


def test_manifest_partition_watermarks(spark, tiny_input, tmp_path_factory):
    """Each partition-dir record carries the partition's max event time
    (the north rule's per-partition watermark), sourced from parquet
    footer column statistics and equal to an independent Spark
    max(time) read-back per (category, day)."""
    from datetime import datetime

    from logparser_spark.plans.checkpoint import Manifest

    out = str(tmp_path_factory.mktemp("watermarks"))
    run_pipeline(spark, tiny_input, out, n_chunks=1)
    want = {
        (r["category"], r["day"]): r["wm"]
        for r in read_sink(spark, out)
        # partition discovery may infer day as DATE; compare as string
        .groupBy("category", F.col("day").cast("string").alias("day"))
        .agg(F.max("time").alias("wm"))
        .collect()
    }
    seen = 0
    for rec in Manifest(out).completed_chunks().values():
        for name, p in rec["partitions"].items():
            cat = name.split("/")[0].split("=", 1)[1]
            day = name.split("/")[1].split("=", 1)[1]
            if day == "__HIVE_DEFAULT_PARTITION__":
                # null-time rows (timestamp rejects routed to
                # quarantine): no event time, so no watermark — it must
                # be absent, never a fabricated time
                assert p["watermark"] is None, name
                continue
            assert p["watermark"] is not None, name
            got = datetime.fromisoformat(p["watermark"])
            exp = want[(cat, day)]
            # footer stats are tz-aware UTC; Spark collect under the
            # pinned UTC session returns naive UTC datetimes
            assert got.replace(tzinfo=None) == exp, name
            seen += 1
    assert seen > 0


def test_summary_tables_written(spark, pipeline_out):
    import os

    run_aggregates(spark, pipeline_out)
    for t in ["agg_sink_totals", "agg_status_hist", "agg_hourly_hist", "top_urls", "top_users"]:
        assert os.path.exists(os.path.join(pipeline_out, "summary", t))


def test_counts_exact_under_speculation(tiny_input, tmp_path_factory):
    """End-to-end run with spark.speculation=true (a fresh JVM — the
    conf is per-SparkContext): speculative duplicate attempts may
    inflate Observation accumulators, but manifest counts must stay
    exact because the writer's footer walk is the source of record."""
    import json
    import subprocess
    import sys

    out = str(tmp_path_factory.mktemp("spec"))
    code = f"""
import sys, json
sys.path.insert(0, "/root/repo")
from logparser_spark.session import build_session
from logparser_spark.plans.pipeline import run_pipeline
from logparser_spark.plans.checkpoint import Manifest
from logparser_spark.sources.sinks import read_sink
spark = build_session(
    app_name="spec-test", master="local[4]", shuffle_partitions=8,
    extra_conf={{
        "spark.speculation": "true",
        "spark.speculation.interval": "50ms",
        "spark.speculation.multiplier": "1.0",
        "spark.speculation.quantile": "0.1",
    }},
)
run_pipeline(spark, {tiny_input!r}, {out!r}, n_chunks=2)
recs = Manifest({out!r}).completed_chunks()
actual = read_sink(spark, {out!r}).count()
print(json.dumps({{
    "manifest_rows": sum(r["rows"] for r in recs.values()),
    "actual_rows": actual,
}}))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["manifest_rows"] == rec["actual_rows"] == 10_000


def test_manifest_commit_is_append_and_torn_tail_tolerated(tmp_path):
    """Commits are O(1) appends; a torn final line (crash mid-commit)
    reads as 'not committed' and can never splice into the NEXT commit's
    record."""
    from logparser_spark.plans.checkpoint import Manifest

    m = Manifest(str(tmp_path))
    m.commit_chunk({"chunk_id": "chunk-00000", "rows": 1})
    size_one = os.path.getsize(m.path)
    m.commit_chunk({"chunk_id": "chunk-00001", "rows": 2})
    # append-only: the first record's bytes are a prefix, untouched
    assert os.path.getsize(m.path) > size_one
    with open(m.path, "rb") as fh:
        assert fh.read(size_one).decode().splitlines()[0].startswith("{")

    # simulate a crash mid-append: torn fragment, no trailing newline
    with open(m.path, "ab") as fh:
        fh.write(b'{"chunk_id": "chunk-000')
    done = m.completed_chunks()
    assert set(done) == {"chunk-00000", "chunk-00001"}  # torn = not committed

    # the next commit must drop the fragment, not splice into it
    m.commit_chunk({"chunk_id": "chunk-00002", "rows": 3})
    done = m.completed_chunks()
    assert set(done) == {"chunk-00000", "chunk-00001", "chunk-00002"}
    assert done["chunk-00002"]["rows"] == 3
    with open(m.path, "rb") as fh:
        raw = fh.read()
    assert b'"chunk_id": "chunk-000\n' not in raw  # fragment truncated
    assert all(ln.startswith(b"{") and ln.endswith(b"}") for ln in raw.splitlines())


def test_manifest_corrupted_committed_record_refuses_resume(tmp_path):
    """Damage to a COMMITTED (newline-terminated / interior) record must
    raise, not silently mark the chunk un-committed: after compaction the
    rollback-by-prefix deletes nothing and a re-run would duplicate every
    row of the chunk."""
    from logparser_spark.plans.checkpoint import Manifest

    m = Manifest(str(tmp_path))
    m.commit_chunk({"chunk_id": "chunk-00000", "rows": 1})
    m.commit_chunk({"chunk_id": "chunk-00001", "rows": 2})
    with open(m.path, "rb") as fh:
        lines = fh.read().splitlines(keepends=True)
    # bit-rot the FIRST (interior) record
    lines[0] = b"\x00" + lines[0][1:]
    with open(m.path, "wb") as fh:
        fh.writelines(lines)
    with pytest.raises(ValueError, match="corrupted"):
        m.completed_chunks()

    # newline-terminated final record damaged -> also corruption
    m2 = Manifest(str(tmp_path / "m2"))
    m2.commit_chunk({"chunk_id": "chunk-00000", "rows": 1})
    with open(m2.path, "rb") as fh:
        raw = fh.read()
    with open(m2.path, "wb") as fh:
        fh.write(b"garbage" + raw[7:])
    with pytest.raises(ValueError, match="corrupted"):
        m2.completed_chunks()


def test_compact_after_dispatches_to_writer_compact(spark, tiny_input, tmp_path_factory):
    """A table-format writer (compact() method, no data_dir) must get
    its own compaction called — not silently skipped, not routed to the
    parquet-layout pass."""
    from logparser_spark.sources.sinks import MultiSinkWriter

    out = str(tmp_path_factory.mktemp("compact_dispatch"))

    class TableFormatWriter:
        """Minimal writer contract + compact(), deliberately WITHOUT
        data_dir (forwards storage to a real parquet writer)."""

        def __init__(self, root):
            self._inner = MultiSinkWriter(root)
            self.compacted = False

        def write_chunk(self, df, chunk_id):
            return self._inner.write_chunk(df, chunk_id)

        def remove_chunk(self, chunk_id):
            self._inner.remove_chunk(chunk_id)

        def exact_chunk_counts(self, chunk_id):
            return self._inner.exact_chunk_counts(chunk_id)

        def partition_metrics(self, chunk_id):
            return self._inner.partition_metrics(chunk_id)

        def compact(self):
            self.compacted = True

    w = TableFormatWriter(out)
    res = run_pipeline(
        spark, tiny_input, out, n_chunks=1, writer=w, compact_after=True
    )
    assert w.compacted
    assert res["compaction"] == {"kind": "rewrite_data_files"}

    class BareWriter:
        """Writer contract WITHOUT compact() or data_dir: asking for
        compact_after must fail loudly, never silently skip."""

        def __init__(self, root):
            self._inner = MultiSinkWriter(root)

        def write_chunk(self, df, chunk_id):
            return self._inner.write_chunk(df, chunk_id)

        def remove_chunk(self, chunk_id):
            self._inner.remove_chunk(chunk_id)

        def exact_chunk_counts(self, chunk_id):
            return self._inner.exact_chunk_counts(chunk_id)

        def partition_metrics(self, chunk_id):
            return self._inner.partition_metrics(chunk_id)

    out2 = str(tmp_path_factory.mktemp("compact_dispatch2"))
    with pytest.raises(ValueError, match="compact_after"):
        run_pipeline(
            spark, tiny_input, out2, n_chunks=1,
            writer=BareWriter(out2), compact_after=True,
        )


def test_day_and_hour_buckets_are_session_timezone_proof(spark):
    """hour/day derivations must be UTC by construction (epoch
    arithmetic), not via hour()/date_format()/date_trunc() which honor
    spark.sql.session.timeZone — an unpinned consumer session must
    bucket identically to the pinned one."""
    import datetime as dt

    from logparser_spark.sources.sinks import day_expr

    # 2024-01-02T03:00:00Z: in America/New_York this is 22:00 on Jan 1
    ts = dt.datetime(2024, 1, 2, 3, 0, 0)
    df = spark.createDataFrame(
        [("u", 200, ts, "ok", 1)],
        "username string, status_code int, time timestamp, category string, valid int",
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        d = df.select(day_expr("time").alias("day")).collect()[0].day
        assert d == "2024-01-02"  # not 2024-01-01
        h = agg.hourly_hist(df).filter(F.col("row_count") > 0).collect()
        assert [r.hour for r in h] == [3]  # not 22
        day = agg.daily_rollup(df).collect()[0].day
        assert (day.day, day.hour) == (2, 0) or str(day).startswith("2024-01-02")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_utc_bucketing_pre_epoch_floors(spark):
    """The epoch div arithmetic truncates toward zero; pre-1970 rows
    must FLOOR instead — 1969-12-31T23:30Z is hour 23 of 1969-12-31,
    not hour 0 of 1970-01-01 (hourly_hist would silently drop a
    negative slot from its dense 0..23 grid). The pipeline's own parse
    admits only unsigned epochs, but the operators are generic."""
    import datetime as dt

    from logparser_spark.sources.sinks import day_expr

    rows = [
        ("u", 200, dt.datetime(1969, 12, 31, 23, 30), "ok", 1),  # hour 23
        ("u", 200, dt.datetime(1969, 12, 31, 1, 30), "ok", 1),  # hour 1
        ("u", 200, dt.datetime(1970, 1, 1, 5, 0), "ok", 1),  # hour 5
    ]
    df = spark.createDataFrame(
        rows,
        "username string, status_code int, time timestamp, category string, valid int",
    )
    h = agg.hourly_hist(df).filter(F.col("row_count") > 0).collect()
    assert sorted(r.hour for r in h) == [1, 5, 23]
    days = [r.day for r in df.select(day_expr("time").alias("day")).collect()]
    assert days == ["1969-12-31", "1969-12-31", "1970-01-01"]
    roll = {str(r.day): r.request_count for r in agg.daily_rollup(df).collect()}
    assert roll == {"1969-12-31 00:00:00": 2, "1970-01-01 00:00:00": 1}


def test_chunk_id_with_glob_metacharacters_rejected(spark, tmp_path):
    """Chunk ids become filename prefixes AND glob patterns; a
    metacharacter id would make remove_chunk silently delete nothing
    (duplicate rows after resume), so it must fail loudly."""
    from logparser_spark.sources.sinks import MultiSinkWriter

    w = MultiSinkWriter(str(tmp_path))
    for bad in ("run[1]", "a*b", "x?y", "a/b", ""):
        with pytest.raises(ValueError, match="chunk_id"):
            w.remove_chunk(bad)
    w.remove_chunk("chunk-00001")  # valid id on empty sink: no-op, no error
