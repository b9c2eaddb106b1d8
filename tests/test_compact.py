"""Post-load compaction: byte-identical results, bounded file counts,
crash-protocol healing, resume still valid."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from logparser_spark.plans.checkpoint import Manifest
from logparser_spark.plans.pipeline import run_pipeline
from logparser_spark.sources.compact import compact_sinks, _partition_dirs
from logparser_spark.sources.sinks import read_sink


def _row_multiset(spark, out):
    df = read_sink(spark, out)
    return sorted(
        r[0]
        for r in df.select(
            F.md5(F.to_json(F.struct(*sorted(df.columns)))).alias("h")
        ).collect()
    )


@pytest.fixture(scope="module")
def loaded(spark, tiny_input, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact_sink"))
    # 4 chunks -> each (category, day) partition accumulates per-chunk
    # files, exactly the long-lived-table growth pattern
    run_pipeline(spark, tiny_input, out, n_chunks=4)
    return out


def test_compaction_preserves_results_and_bounds_files(spark, loaded):
    before = _row_multiset(spark, loaded)
    counts_before = {
        d: len(glob.glob(os.path.join(d, "*.parquet")))
        for d in _partition_dirs(loaded)
    }
    assert any(c >= 2 for c in counts_before.values()), counts_before

    # tiny target -> n_out = ceil(bytes/target); still strictly fewer
    # files than the per-chunk accumulation for multi-file partitions
    summary = compact_sinks(spark, loaded, target_file_bytes=1 << 30)
    assert summary["partitions_rewritten"] > 0

    after = _row_multiset(spark, loaded)
    assert after == before  # byte-identical query results

    for d in _partition_dirs(loaded):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, d  # 1 GiB target -> single file each
    # manifest carries the rewrite lineage
    done = Manifest(loaded).completed_chunks()
    rec = done[summary["chunk_id"]]
    assert rec["kind"] == "compaction"
    assert rec["partitions"] and rec["old_files"]
    # every old file really is gone
    assert all(not os.path.exists(os.path.join(loaded, f)) for f in rec["old_files"])


def test_second_compaction_is_noop_and_resume_valid(spark, loaded, tiny_input):
    s2 = compact_sinks(spark, loaded, target_file_bytes=1 << 30)
    assert s2["partitions_rewritten"] == 0  # already compact

    # resume: same input -> every chunk already committed, nothing runs,
    # no resume-mismatch (compaction records don't disturb chunk ids)
    res = run_pipeline(spark, tiny_input, loaded, n_chunks=4)
    assert res["rows_this_run"] == 0


def test_pending_delete_healing(spark, loaded):
    """A crash between manifest commit and source deletion leaves old
    files on disk; the next compaction run must finish the delete."""
    d = _partition_dirs(loaded)[0]
    ghost = os.path.join(d, "chunk-00000-part-ghost.parquet")
    cur = glob.glob(os.path.join(d, "*.parquet"))[0]
    import shutil

    shutil.copy(cur, ghost)
    # forge the committed record naming ghost as an undead old file
    rel = os.path.relpath(ghost, loaded)
    Manifest(loaded).commit_chunk(
        {"chunk_id": "compact-90000", "kind": "compaction", "old_files": [rel]}
    )
    s = compact_sinks(spark, loaded, target_file_bytes=1 << 30)
    assert s["healed_pending_deletes"] == 1
    assert not os.path.exists(ghost)


def test_uncommitted_compaction_rolled_back(spark, loaded):
    """Files promoted under a compact id the manifest never committed
    are garbage from a crash before the commit point — removed."""
    d = _partition_dirs(loaded)[-1]
    cur = glob.glob(os.path.join(d, "*.parquet"))[0]
    orphan = os.path.join(d, "compact-88888-part-orphan.parquet")
    import shutil

    shutil.copy(cur, orphan)
    before = _row_multiset(spark, loaded)  # doubled rows right now
    s = compact_sinks(spark, loaded, target_file_bytes=1 << 30)
    assert s["rolled_back_files"] == 1
    assert not os.path.exists(orphan)
    assert len(_row_multiset(spark, loaded)) < len(before)


def test_uncommitted_chunk_excluded_from_compaction(
    spark, tiny_input, tmp_path_factory
):
    """Files of a chunk that crashed between promote and manifest commit
    must NOT be compaction sources: baking them into a compacted file
    would survive the resume's chunk rollback and duplicate the chunk's
    rows when it re-processes."""
    import shutil

    out = str(tmp_path_factory.mktemp("compact_uncommitted"))
    run_pipeline(spark, tiny_input, out, n_chunks=2)
    clean = _row_multiset(spark, out)
    d = next(
        dd
        for dd in _partition_dirs(out)
        if len(glob.glob(os.path.join(dd, "*.parquet"))) >= 2
    )
    src = glob.glob(os.path.join(d, "*.parquet"))[0]
    ghost = os.path.join(d, "chunk-77777-part-ghost.parquet")
    shutil.copy(src, ghost)

    s = compact_sinks(spark, out, target_file_bytes=1 << 30)
    assert s["partitions_rewritten"] > 0
    # the uncommitted file is untouched — the resume owns its rollback
    assert os.path.exists(ghost)
    os.remove(ghost)  # what the resume's remove_chunk would do
    assert _row_multiset(spark, out) == clean  # no baked-in duplicates


def test_partial_failure_leaves_live_dirs_untouched(
    spark, tiny_input, tmp_path_factory
):
    """One partition's rewrite failing must abort the WHOLE compaction
    with every live directory byte-identical (verify happens in staging,
    promote only after all partitions verified) — no window where a
    reader double-counts a partition that was promoted before a sibling
    failed."""
    out = str(tmp_path_factory.mktemp("compact_partial"))
    run_pipeline(spark, tiny_input, out, n_chunks=3)

    def snapshot():
        return {
            d: sorted(
                os.path.basename(f)
                for f in glob.glob(os.path.join(d, "*.parquet"))
            )
            for d in _partition_dirs(out)
        }

    before = snapshot()
    victim_dir = next(
        d for d, files in before.items() if len(files) >= 2
    )
    victim = sorted(glob.glob(os.path.join(victim_dir, "*.parquet")))[0]
    orig = open(victim, "rb").read()
    with open(victim, "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        compact_sinks(spark, out, target_file_bytes=1 << 30)
    assert snapshot() == before  # nothing promoted, nothing deleted
    assert not glob.glob(
        os.path.join(out, "data", "**", "compact-*.parquet"), recursive=True
    )
    assert not os.path.exists(os.path.join(out, "_staging", "compact-00000"))
    # heal the corruption -> the same compaction now succeeds
    with open(victim, "wb") as fh:
        fh.write(orig)
    s = compact_sinks(spark, out, target_file_bytes=1 << 30)
    assert s["partitions_rewritten"] > 0


def test_run_pipeline_compact_after(spark, tiny_input, tmp_path_factory):
    """compact_after=True = the reference's rebuild-after-load: chunks
    land, then one compaction pass; results identical to a plain load."""
    out = str(tmp_path_factory.mktemp("compact_inline"))
    res = run_pipeline(spark, tiny_input, out, n_chunks=3, compact_after=True)
    assert res["compaction"]["partitions_rewritten"] > 0
    for d in _partition_dirs(out):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    ref = str(tmp_path_factory.mktemp("compact_ref"))
    run_pipeline(spark, tiny_input, ref, n_chunks=3)
    assert _row_multiset(spark, out) == _row_multiset(spark, ref)
