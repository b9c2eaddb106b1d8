"""The user-facing facade: page query, filter builder, precomputed
fast path vs live aggregation equivalence."""

import pytest
from pyspark.sql import functions as F

from logparser_spark.api import LogFilter, LogPipelineAPI
from logparser_spark.plans.pipeline import run_aggregates, run_pipeline


@pytest.fixture(scope="module")
def api(spark, tiny_input, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("api_sink"))
    run_pipeline(spark, tiny_input, out, n_chunks=1)
    run_aggregates(spark, out)
    return LogPipelineAPI(spark, out)


def test_page_query_ordered_and_sliced(api):
    p1 = api.get_logs(page=1, size=20).collect()
    p2 = api.get_logs(page=2, size=20).collect()
    assert len(p1) == 20 and len(p2) == 20
    times = [r.time for r in p1 + p2]
    assert times == sorted(times, reverse=True)
    assert {r.doc_id for r in p1}.isdisjoint({r.doc_id for r in p2})


def test_keyset_pagination_equals_offset_sweep(api):
    """get_logs_after (keyset) must reproduce OFFSET paging exactly:
    walk the full result in pages, feeding each page's last row back as
    the next cursor — every page identical to its offset twin."""
    size = 400  # ~6 pages over the tiny fixture: full sweep, bounded jobs
    cursor = None
    page = 1
    seen = 0
    while True:
        offset_rows = api.get_logs(page=page, size=size).collect()
        if cursor is None:
            keyset_rows = offset_rows  # page 1 IS get_logs
        else:
            keyset_rows = api.get_logs_after(cursor[0], cursor[1], size=size).collect()
        assert [(r.doc_id, r.time) for r in keyset_rows] == [
            (r.doc_id, r.time) for r in offset_rows
        ], f"page {page}"
        if not offset_rows:
            break
        seen += len(offset_rows)
        last = offset_rows[-1]
        cursor = (last.time, last.doc_id)
        page += 1
        if len(offset_rows) < size:
            # final partial page: one more loop proves both are empty
            assert api.get_logs_after(cursor[0], cursor[1], size=size).count() == 0
            break
    assert seen == api._facts(None).count()  # swept everything


def test_keyset_pagination_respects_filters(api):
    flt = LogFilter(action="TCP_DENIED")
    p1 = api.get_logs(flt, page=1, size=10).collect()
    assert len(p1) == 10
    last = p1[-1]
    p2 = api.get_logs_after(last.time, last.doc_id, flt, size=10).collect()
    assert p2 == api.get_logs(flt, page=2, size=10).collect()
    assert all(r.action == "TCP_DENIED" for r in p2)


def test_filtered_page(api):
    flt = LogFilter(action="TCP_DENIED")
    rows = api.get_logs(flt, size=500).collect()
    assert len(rows) > 0
    assert all(r.action == "TCP_DENIED" for r in rows)


def test_search_filter_matches_url_or_domain(api):
    flt = LogFilter(search="d01.example.com")
    rows = api.get_logs(flt, size=500).collect()
    assert len(rows) > 0
    assert all("d01.example.com" in (r.url or "") or "d01.example.com" in (r.domain or "") for r in rows)


def test_unfiltered_stats_uses_summary_and_matches_live(api):
    fast = {r.category: r.row_count for r in api.get_statistics().collect()}
    live = {
        r.category: r.row_count
        for r in api.get_statistics(LogFilter(search=None, ip=None)).collect()
    }
    assert fast == live  # empty filter routes to summary; same numbers


def test_top_urls_fast_path_equals_live(api):
    fast = [(r.url, r.request_count) for r in api.get_top_urls(k=10).collect()]
    live = [(r.url, r.request_count) for r in api.get_top_urls(LogFilter(), k=10).collect()]
    # LogFilter() is empty -> also fast path; force live with a no-op-ish filter
    live2 = [
        (r.url, r.request_count)
        for r in api.get_top_urls(LogFilter(status_code=None, time_from="2000-01-01 00:00:00"), k=10).collect()
    ]
    assert fast == live == live2


def test_count_pages(api):
    n = api.count_pages(size=1000)
    assert n >= 1


def test_dims_nonempty(api):
    assert api.get_statuses().count() > 0
    assert api.get_actions().count() > 0


def test_combined_tops_matches_individual_endpoints(api):
    both = api.get_combined_tops(k_urls=10, k_users=5)
    urls = [(r.url, r.request_count) for r in both["topUrls"].collect()]
    users = [(r.username, r.request_count) for r in both["topUsers"].collect()]
    assert urls == [(r.url, r.request_count) for r in api.get_top_urls(k=10).collect()]
    assert users == [
        (r.username, r.request_count) for r in api.get_top_users(k=5).collect()
    ]


def test_summary_rows_recorded_no_spark_count(api):
    """Fast-path eligibility reads summary/_k.json (written by the
    aggregate stage), not a per-call Spark count()."""
    import json
    import os

    kpath = os.path.join(api.root, "summary", "_k.json")
    assert os.path.exists(kpath)
    ks = json.load(open(kpath))
    assert ks["top_urls"] == api._summary("top_urls").count()
    assert api._summary_rows("top_urls") == ks["top_urls"]


def test_empty_string_filter_keeps_fast_path(api):
    """'' (an HTTP layer's absent query param) must count as empty —
    is_empty and apply share one truthiness rule, so the call takes the
    precomputed path instead of a full live scan for identical rows."""
    assert LogFilter(search="", ip="", action="", time_from="").is_empty()
    assert LogFilter(search="x").is_empty() is False
    assert LogFilter(status_code=0).is_empty() is False  # explicit 0 filters


def test_top_k_fast_path_serves_any_k_when_exhaustive(api):
    """A top-K summary holding FEWER rows than its cap saw every
    distinct key — it is the complete ranking and stays valid for any
    requested k (no permanent live-scan penalty on small vocabularies)."""
    meta = api._summary_meta("top_urls")
    assert meta is not None and set(meta) >= {"rows", "exhaustive"}
    if not meta["exhaustive"]:
        pytest.skip("fixture has >= cap distinct urls; exhaustive path not hit")
    assert api._summary_for_k("top_urls", 10**6) is not None
    fast = [tuple(r) for r in api.get_top_urls(k=10**6).collect()]
    from logparser_spark.operators import aggregates as agg

    live = [tuple(r) for r in agg.top_urls(api._facts(None), k=10**6).collect()]
    assert fast == live


def test_partial_summary_dir_falls_back_to_live(api):
    """A summary dir without its commit marker (a crashed aggregate
    stage's partial overwrite) must be treated as absent — the call
    falls back to live aggregation, never serves a partial table."""
    import os
    import shutil

    marker = os.path.join(api.root, "summary", "top_users", "_meta.json")
    bak = marker + ".bak"
    shutil.move(marker, bak)
    try:
        assert api._summary("top_users") is None
        live = [tuple(r) for r in api.get_top_users(k=10).collect()]
    finally:
        shutil.move(bak, marker)
    fast = [tuple(r) for r in api.get_top_users(k=10).collect()]
    assert live == fast


def test_summary_fast_path_eligibility(spark, tmp_path):
    """Deterministic pin of fast-path eligibility: rows >= k OR the
    summary is exhaustive (never truncated); no marker -> ineligible;
    the marker is read ONCE and a dir vanishing under a concurrent
    republish yields live-fallback (None), never a crash."""
    api2 = LogPipelineAPI(spark, str(tmp_path))
    d = tmp_path / "summary" / "top_urls"
    spark.createDataFrame(
        [("u", 1)], "url string, request_count long"
    ).coalesce(1).write.parquet(str(d))
    assert api2._summary_for_k("top_urls", 1) is None  # no marker
    (d / "_meta.json").write_text('{"rows": 60, "exhaustive": true}')
    assert api2._summary_for_k("top_urls", 10**6) is not None
    (d / "_meta.json").write_text('{"rows": 100, "exhaustive": false}')
    assert api2._summary_for_k("top_urls", 100) is not None
    assert api2._summary_for_k("top_urls", 101) is None
    # TOCTOU: marker passes but the data files are gone mid-republish
    for f in d.glob("*.parquet"):
        f.unlink()
    assert api2._summary_for_k("top_urls", 10) is None
