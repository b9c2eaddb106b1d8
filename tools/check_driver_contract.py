"""Local mimic of the driver's correctness gate: run each
__spark_entry__.queries() entry at a given sf dir AND its oracle_sql()
in DuckDB, compare row count + order-insensitive value multiset.

Usage: python tools/check_driver_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 1 and not sys.argv[1].startswith("/"):
        sys.exit(f"first arg must be an sf dir path, got {sys.argv[1]!r}")
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from logparser_spark.session import build_session

    spark = build_session(app_name="contract-check", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}; have {sorted(qs)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: rows-only query returned 0 rows")
            else:
                print(
                    f"ok   {name}: rows-only ({len(srows)} rows, {time.monotonic()-t0:.1f}s)"
                )
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            sm = row_multiset(scols, srows)
            om = row_multiset(ocols, orows)
            if sm != om:
                diffs = [(a, b) for a, b in zip(sm, om) if a != b]
                print(f"FAIL {name}: {len(diffs)} value mismatches of {len(sm)} rows")
                for a, b in diffs[:3]:
                    print(f"   spark: {a}\n   duck : {b}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.monotonic()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
