#!/usr/bin/env python
"""Benchmark harness.

Default (driver) mode: time the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (north-rule evidence): run the identical end-to-end
parse->enrich->route->write->aggregate job over a deterministic 10M-row
tokenized-sequence fixture at two parallelism levels (local[N] and
local[4N]) in separate subprocesses (clean JVM each) and report
throughput at both plus scaling efficiency into BENCH.md.

``--pipeline-run`` is the internal subprocess entry used by --scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: the pipeline family + the training-data extensions.
# parse_route is the flagship (full tokenize->parse->route materialization).
BENCH_QUERIES = [
    "parsed_rows",
    "sink_totals",
    "status_hist",
    "hourly_hist",
    "top_urls",
    "top_users",
    "page_query",
    "keep_latest",
    "daily_rollup",
    "dim_statuses",
    "dim_actions",
    "dataset_period",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "text_quality",
    "token_counts",
    "lang_id",
    "fingerprint",
    "ann_brute",
    "ann_lsh",
]


def _force(df) -> None:
    """Materialize every row without driver collect cost."""
    df.write.format("noop").mode("overwrite").save()


def run_driver_bench(sf_dir: str) -> dict:
    from logparser_spark.session import build_session

    spark = build_session(app_name="bench", master=f"local[{CPUS}]")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # warmup: exercise codegen + arrow paths once, untimed
    _force(qs["sink_totals"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    seq_per_sec = (
        round(n_events / timings["parsed_rows"], 1) if timings.get("parsed_rows") else None
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    return {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "parse_route_seq_per_sec": seq_per_sec,
        "events_rows": n_events,
        "cpus": int(CPUS),
    }


# ---------------------------------------------------------------------
# scaling study (--scaling / --pipeline-run)
# ---------------------------------------------------------------------


def pipeline_run(master: str, input_path: str, out_root: str) -> dict:
    """One end-to-end run: read sequences -> parse -> enrich -> route ->
    multi-sink write -> per-sink aggregates. Prints metrics JSON."""
    from logparser_spark.plans.pipeline import run_aggregates, run_pipeline
    from logparser_spark.session import build_session

    spark = build_session(app_name=f"pipeline-{master}", master=master)
    if os.path.exists(out_root):
        shutil.rmtree(out_root)

    t0 = time.monotonic()
    stats = run_pipeline(spark, input_path, out_root, n_chunks=1)
    t_load = time.monotonic() - t0
    t1 = time.monotonic()
    run_aggregates(spark, out_root)
    t_agg = time.monotonic() - t1

    rows = stats["rows_this_run"]
    wall = t_load + t_agg
    return {
        "master": master,
        "rows": rows,
        "load_sec": round(t_load, 2),
        "agg_sec": round(t_agg, 2),
        "wall_sec": round(wall, 2),
        "seq_per_sec": round(rows / wall, 1),
    }


def run_scaling(n_low: int, fixture_scale: str = "bench") -> dict:
    from logparser_spark.fixtures import ensure_fixture

    input_path = ensure_fixture(fixture_scale)
    n_high = 4 * n_low
    results = {}
    for n in (n_low, n_high):
        out_root = f"/tmp/bench_scaling_out_{n}"
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--pipeline-run",
            "--master",
            f"local[{n}]",
            "--input",
            input_path,
            "--out",
            out_root,
        ]
        print(f"[scaling] running {cmd[-5]}={cmd[-4]} ...", file=sys.stderr)
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
        shutil.rmtree(out_root, ignore_errors=True)

    lo, hi = results[n_low], results[n_high]
    eff = hi["seq_per_sec"] / (4 * lo["seq_per_sec"])
    summary = {
        "fixture": fixture_scale,
        "rows": lo["rows"],
        "n_low": n_low,
        "n_high": n_high,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "speedup": round(hi["seq_per_sec"] / lo["seq_per_sec"], 2),
    }
    _write_bench_md(summary)
    return summary


def _write_bench_md(s: dict) -> None:
    lo, hi = s["low"], s["high"]
    md = f"""# BENCH — measured throughput & scaling (this repo)

End-to-end **parse -> enrich -> route -> multi-sink write -> aggregate**
over the deterministic tokenized-sequence fixture
(`logparser_spark.fixtures.write_raw_sequences`, seed=42,
{s['rows']:,} rows, 32 parquet files). Identical job, identical input,
two parallelism levels, separate JVMs (`python bench.py --scaling`).

North-rule criterion: scaling efficiency >= 0.8 between N and 4N
parallelism. No real cluster exists in this sandbox, so N executors is
evidenced by `local[{s['n_low']}]` vs `local[{s['n_high']}]` cores
(same machine, same input), per the round instructions.

| parallelism | load (s) | aggregate (s) | total (s) | throughput (seq/s) |
| --- | --- | --- | --- | --- |
| local[{s['n_low']}]  | {lo['load_sec']} | {lo['agg_sec']} | {lo['wall_sec']} | {lo['seq_per_sec']:,} |
| local[{s['n_high']}] | {hi['load_sec']} | {hi['agg_sec']} | {hi['wall_sec']} | {hi['seq_per_sec']:,} |

- **speedup {s['n_low']} -> {s['n_high']} cores: {s['speedup']}x**
- **scaling efficiency: {s['scaling_efficiency']}** (= throughput(4N) / (4 x throughput(N)); target >= 0.8)

Reference single-node baseline (BASELINE.md): ~155k lines/s implied
parse throughput (60M lines / 386.5 s, single parse thread + COPY
thread). The numbers above are the same parse semantics (11-group
regex, username validity, status fallback, domain extraction) plus
enrichment joins, routed multi-sink parquet writes, and the full
per-sink aggregate stage — work the reference does in later separate
stages (indexing + statistics, another ~390 s on its profile).

Regenerate: `python bench.py --scaling --n {s['n_low']}`.
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--n", type=int, default=8, help="low parallelism; high = 4n")
    ap.add_argument("--fixture", default="bench")
    ap.add_argument("--pipeline-run", action="store_true")
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument("--input")
    ap.add_argument("--out", default="/tmp/bench_pipeline_out")
    ap.add_argument("--sf-dir", default=SF_DIR_DEFAULT)
    args = ap.parse_args()

    if args.pipeline_run:
        print(json.dumps(pipeline_run(args.master, args.input, args.out)))
    elif args.scaling:
        print(json.dumps(run_scaling(args.n, args.fixture)))
    else:
        print(json.dumps(run_driver_bench(args.sf_dir)))


if __name__ == "__main__":
    main()
