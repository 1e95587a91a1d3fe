#!/usr/bin/env python
"""Measure the single-row-group leaf-scan penalty the bench notes blame.

BENCH_NOTES pins most of the residual Spark-vs-DuckDB gap at sf0.1 on the
input LAYOUT: every driver testdata table is ONE parquet row group, and a
row group is Spark's minimum split unit, so every leaf scan is a single
task no matter how many cores exist — while DuckDB parallelizes inside a
row group.  This script turns that inference into a measurement:

1. rewrite each sf table into a sibling layout with ~``--groups`` row
   groups per file (same rows, same schema, same single file — ONLY the
   row-group chunking changes);
2. run the bench HEADLINE queries on BOTH engines against BOTH layouts
   (same warm-up + noop-sink protocol as scripts/scaling_curve.py);
3. print the per-layout totals and the Spark/DuckDB ratio side by side.

Expected: the chunked layout leaves DuckDB roughly unchanged and speeds
Spark's scan-bound queries up, pulling the ratio well under the
single-row-group figure — evidence that the gap is layout, not engine
(at 100 TB the layout is many-files-many-row-groups by construction,
i.e. the chunked case is the realistic one).

Usage: python scripts/rowgroup_evidence.py [--sf DIR] [--groups N]
       [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_curve import TABLES  # noqa: E402
from bench import HEADLINE  # noqa: E402


def rewrite_chunked(sf_dir: str, out_dir: str, groups: int) -> None:
    """Rewrite each table as one file with ~``groups`` row groups (pyarrow
    round-trip: bytes-identical schema and values, different chunking)."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        rows_per_group = max(1, tbl.num_rows // groups)
        dst = os.path.join(out_dir, f"{t}.parquet")
        pq.write_table(tbl, dst, row_group_size=rows_per_group)
        meta = pq.ParquetFile(dst).metadata
        print(
            f"  {t}: {tbl.num_rows} rows -> {meta.num_row_groups} row groups",
            file=sys.stderr,
        )


def spark_min_times(spark, sf_dir, queries, n_runs: int) -> dict[str, float]:
    """bench.py protocol: compose once, warm once untimed, per-query MIN
    over ``n_runs`` bare noop-sink actions (full plan re-executed each
    run, nothing cached)."""
    import time

    dfs = {n: queries[n](spark, sf_dir) for n in HEADLINE}
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    best = {n: float("inf") for n in HEADLINE}
    for _ in range(n_runs):
        for n, df in dfs.items():
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best[n] = min(best[n], time.time() - t0)
    return {n: round(v, 3) for n, v in best.items()}


def duck_min_times(sf_dir, sql_by_name, n_runs: int) -> dict[str, float]:
    import time

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out = {}
    for name in HEADLINE:
        sql = sql_by_name.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (IO cache)
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--out", default="/tmp/spark_graft_chunked_sf")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from data_engineering_challenge_spark.session import get_spark
    import __spark_entry__ as entry

    print(f"rewriting {args.sf} with ~{args.groups} row groups/table",
          file=sys.stderr)
    rewrite_chunked(args.sf, args.out, args.groups)

    spark = get_spark(
        app_name="rowgroup-evidence",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entry.queries()
    oracles = entry.oracle_sql()

    out = {}
    for label, d in (("1_row_group", args.sf), ("chunked", args.out)):
        s = spark_min_times(spark, d, qs, args.runs)
        k = duck_min_times(d, oracles, args.runs)
        common = [n for n in s if n in k]
        st, dt = sum(s[n] for n in common), sum(k[n] for n in common)
        out[label] = {
            "spark_total_s": round(st, 3),
            "duckdb_total_s": round(dt, 3),
            "ratio": round(st / dt, 2) if dt else None,
            "spark": s,
            "duckdb": k,
        }
        print(json.dumps({label: out[label]}))

    print("\n| layout | spark total (s) | duckdb total (s) | ratio |")
    print("|---|---|---|---|")
    for label, r in out.items():
        print(
            f"| {label} | {r['spark_total_s']} | {r['duckdb_total_s']} "
            f"| {r['ratio']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
