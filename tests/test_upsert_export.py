"""Upsert-ignore / upsert-replace semantics (reference O5/O6) and the
export edge (S8)."""

import glob
import json

from logparser_spark.operators.upsert import upsert_ignore, upsert_replace
from logparser_spark.sources.export import export_csv, export_json, to_json_rows


def test_upsert_ignore_keeps_existing(spark):
    existing = spark.createDataFrame(
        [(200, "old"), (404, "old")], "status_code int, src string"
    )
    new = spark.createDataFrame(
        [(200, "NEW"), (500, "NEW"), (500, "NEW2")], "status_code int, src string"
    )
    got = {
        (r.status_code, r.src)
        for r in upsert_ignore(existing, new, ["status_code"]).collect()
    }
    # 200 conflict ignored; 500 inserted once (first by column order)
    assert got == {(200, "old"), (404, "old"), (500, "NEW")}


def test_upsert_ignore_pure_key_table(spark):
    """A keys-only table (ON CONFLICT DO NOTHING on a vocabulary dim)
    must dedupe, not crash on an empty window orderBy."""
    existing = spark.createDataFrame([(200,), (404,)], "status_code int")
    new = spark.createDataFrame([(200,), (500,), (500,)], "status_code int")
    got = sorted(
        r.status_code for r in upsert_ignore(existing, new, ["status_code"]).collect()
    )
    assert got == [200, 404, 500]


def test_upsert_replace_keeps_latest(spark):
    existing = spark.createDataFrame(
        [("urls", 100, 1, "v1"), ("users", 10, 5, "v5")],
        "type string, k int, calculated_at long, data string",
    )
    new = spark.createDataFrame(
        [("urls", 100, 7, "v7"), ("domains", 50, 2, "v2"), ("users", 10, 5, "v5new")],
        "type string, k int, calculated_at long, data string",
    )
    got = {
        (r.type, r.k): (r.calculated_at, r.data)
        for r in upsert_replace(existing, new, ["type", "k"], "calculated_at").collect()
    }
    assert got[("urls", 100)] == (7, "v7")  # replaced
    assert got[("domains", 50)] == (2, "v2")  # inserted
    assert got[("users", 10)] == (5, "v5new")  # tie -> new wins (DO UPDATE)
    assert len(got) == 3


def test_export_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, v string"
    )
    export_csv(df, str(tmp_path / "csv"))
    files = glob.glob(str(tmp_path / "csv" / "*.csv"))
    assert len(files) == 1  # single artifact file
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "id,v" and len(lines) == 3

    export_json(df, str(tmp_path / "json"))
    jfiles = glob.glob(str(tmp_path / "json" / "*.json"))
    rows = [json.loads(ln) for f in jfiles for ln in open(f) if ln.strip()]
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_to_json_rows_inline(spark):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    [row] = to_json_rows(df).collect()
    assert json.loads(row.json) == {"id": 1, "v": "a"}
