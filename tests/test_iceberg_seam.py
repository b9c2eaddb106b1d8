"""The Iceberg adapter seam: SQL builders pinned, graceful degradation
when the runtime jar is absent (as in this sandbox), and the pluggable
writer contract on run_pipeline."""

import pytest

from logparser_spark.sources import iceberg as ice


def test_runtime_absent_here(spark):
    assert ice.iceberg_available(spark) is False


def test_writer_raises_clear_error_without_runtime(spark):
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        ice.IcebergMultiSinkWriter(spark, "lake.db.routed")


def test_merge_upsert_raises_without_runtime(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(NotImplementedError, match="MERGE INTO"):
        ice.merge_upsert(spark, "lake.db.dim", df, ["k"])


def test_create_table_sql_partitioning():
    sql = ice.create_table_sql("lake.db.routed", "doc_id string, time timestamp")
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (category, days(time))" in sql
    assert "write.distribution-mode' = 'none" in sql  # direct task writes


def test_merge_into_sql_ignore_shape():
    sql = ice.merge_into_sql("t.dim", "src", ["k1", "k2"], ["v"], mode="ignore")
    assert sql == (
        "MERGE INTO t.dim t USING src s ON t.k1 = s.k1 AND t.k2 = s.k2"
        " WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_into_sql_replace_shape():
    sql = ice.merge_into_sql("t.dim", "src", ["k"], ["a", "b"], mode="replace")
    assert sql == (
        "MERGE INTO t.dim t USING src s ON t.k = s.k"
        " WHEN MATCHED THEN UPDATE SET t.a = s.a, t.b = s.b"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError):
        ice.merge_into_sql("t", "s", ["k"], [], mode="nope")


def test_run_pipeline_accepts_custom_writer(spark, tiny_input, tmp_path_factory):
    """The writer seam: any write_chunk/remove_chunk object slots in,
    and a last_snapshot_id attribute lands in the manifest lineage."""
    from logparser_spark.plans.checkpoint import Manifest
    from logparser_spark.plans.pipeline import run_pipeline
    from logparser_spark.sources.sinks import MultiSinkWriter

    out = str(tmp_path_factory.mktemp("seam"))

    class RecordingWriter(MultiSinkWriter):
        def __init__(self, root):
            super().__init__(root)
            self.chunks = []

        def write_chunk(self, df, chunk_id):
            self.chunks.append(chunk_id)
            return super().write_chunk(df, chunk_id)

        def last_snapshot_id(self, chunk_id):
            return 1000 + self.chunks.index(chunk_id)

    w = RecordingWriter(out)
    run_pipeline(spark, tiny_input, out, n_chunks=2, writer=w)
    recs = Manifest(out).completed_chunks()
    assert len(recs) == 2 and w.chunks == sorted(recs)
    assert [recs[c]["snapshot_id"] for c in sorted(recs)] == [1000, 1001]
