#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "n_runs": N,
   "run_totals": [...]}

Materialization is a ``noop``-format write — full computation of every
output row, no driver-side collect cost, no Catalyst pruning of the
benchmarked expressions (a bare count() would let the optimizer skip
computed columns).

Protocol (documented in BENCH_NOTES.md): every query is COMPOSED ONCE
(plan construction + analysis happen once, as a long-running job would),
warmed once untimed (whole-stage-codegen compile + JIT), then the bare
actions are timed over ``$SPARK_GRAFT_BENCH_RUNS`` (default 5)
repetitions.  Per-query time is the MIN across runs — the steady-state
floor, robust to scheduler noise the single-shot protocol absorbed into
the number; per-run totals are emitted alongside so the variance band is
visible in the artifact itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: the flagship pipeline + the heaviest operator families
HEADLINE = [
    "channel_report",        # full 3-step attribution pipeline
    "journeys_build",        # as-of join alone
    "attr_position_engagement",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "top3_customers_per_nation",
    "sessionize_events",
    "events_rollup",
    "text_stats",
    "minhash_lsh_candidates",
    "cosine_topk",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from data_engineering_challenge_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entry.queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    # compose once: plan construction + analysis are a per-PLAN cost, not a
    # per-EXECUTION cost — a long-running job builds its DataFrames once and
    # acts on them repeatedly, so the composed objects are reused across
    # timed runs (the noop write still re-executes the full plan each time;
    # nothing is cached/persisted)
    dfs = {name: qs[name](spark, sf_dir) for name in HEADLINE}

    # one untimed warm-up pass of every headline query: first execution pays
    # whole-stage-codegen compilation + JIT (~2x); steady-state is what a
    # long-running cluster job sees, so that's what we report
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_runs):
        for name in HEADLINE:
            t0 = time.time()
            dfs[name].write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)

    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    run_totals = [
        round(sum(samples[name][i] for name in HEADLINE), 3)
        for i in range(n_runs)
    ]

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_runs": n_runs,
                "run_totals": run_totals,
                # additive (round 13): the per-round environmental
                # drift band at a glance — max-min of the run totals
                "run_spread": round(max(run_totals) - min(run_totals), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
