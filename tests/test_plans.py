"""Physical-plan regression tests — the 100 TB-readiness properties the
engine must not lose: predicate pushdown into parquet, column pruning,
broadcast joins for dimensions, and no gratuitous shuffles.

These assert on plan STRUCTURE (not timings), so they are stable across
machines and catch regressions like a cast wrapping a filter column (which
silently kills pushdown — see the TIMESTAMP_NTZ note in queries_relational).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_and_columns_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # reached the parquet scan
    # pruned scan: grouping+agg columns only, never the full 11-column row
    assert "l_orderkey" not in plan.split("ReadSchema:")[1]
    # one agg shuffle, plus AT MOST the adaptive round-robin fan-out of an
    # under-split scan (engaged on the current single-row-group testdata;
    # a regenerated multi-row-group layout makes it a no-op and the count
    # drops to 1 — both are correct plans, so the pin is layout-robust:
    # any EXTRA exchange must be the round-robin fan-out, never a second
    # keyed shuffle)  (advice, round 14)
    n_ex = plan.count("Exchange")
    assert 1 <= n_ex <= 2, plan
    if n_ex == 2:
        assert "RoundRobinPartitioning" in plan  # the fan-out, not keyed
    assert plan.count("Exchange hashpartitioning") == 1


def test_journeys_join_pushdown_and_broadcast(spark):
    plan = _plan(spark, "journeys_build")
    # the conversions-side filter is pushed into the scan
    assert "EqualTo(event_type,purchase)" in plan
    # equi-join on user_id with broadcast of the small (conversions) side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_text_stats_is_pure_map(spark):
    plan = _plan(spark, "text_stats")
    assert plan.count("Exchange") == 0  # no shuffle at all
    read = plan.split("ReadSchema:")[1]
    assert "text" in read and "source" not in read  # column pruning


def test_q5_all_dims_broadcast(spark):
    plan = _plan(spark, "q5_nation_revenue")
    # five dimension joins, all broadcast: lineitem never shuffles pre-agg
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed down


def test_q3_top_k_avoids_global_sort(spark):
    plan = _plan(spark, "q3_top_orders")
    assert "TakeOrderedAndProject" in plan  # heap-based top-k, no full sort


def test_attribution_single_shuffle(spark):
    plan = _plan(spark, "attr_position_engagement")
    # window family over conversion_id: one hash shuffle feeds all windows
    n_exchange = plan.count("Exchange hashpartitioning(conversion_id")
    assert n_exchange == 1, plan


@pytest.mark.parametrize("name", ["channel_report"])
def test_report_uses_broadcast_for_costs(spark, name):
    plan = _plan(spark, name)
    # the fused flagship (r14) has exactly one join left — the journey
    # join, broadcast at this scale — because cost/date/revenue are
    # attached inline/carried through the attribution shuffle instead of
    # re-joined afterwards
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_q19_disjunctive_preds_pushdown(spark):
    plan = _plan(spark, "q19_disjunctive_preds")
    # Catalyst factors table-local conjuncts out of the OR and pushes them:
    # the lineitem scan must see a quantity filter, the part scan a brand Or
    read_side = plan.split("ReadSchema:")[0]
    assert "l_quantity" in read_side
    assert "Or(" in plan  # the disjunction survives as a pushed/partial filter
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_not_cartesian(spark):
    plan = _plan(spark, "range_join_error_context")
    # the bucketization must turn the time-range theta join into an
    # equi-join: any nested-loop/cartesian here is quadratic at scale
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q7_single_fact_shuffle_join(spark):
    plan = _plan(spark, "q7_nation_volume")
    # supplier/customer/nation broadcast; orders may broadcast at tiny SF
    # (AQE) but there must be no nested-loop join anywhere
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_partitioned_write_prunes_on_reread(spark, tmp_path):
    """Date-partitioned pipeline outputs: a date-ranged re-read must prune
    to the matching partitions (the reference's ranged re-run idempotency,
    channel_reporter.py:99, without rescanning the whole table)."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import io

    df = spark.range(100).select(
        F.col("id"),
        F.date_format(
            F.date_add(F.lit("2024-01-01"), (F.col("id") % 10).cast("int")),
            "yyyy-MM-dd",
        ).alias("conv_date"),
    )
    path = str(tmp_path / "journeys")
    io.write_parquet(df, path, partition_by=["conv_date"])

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("conv_date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate lands in PartitionFilters (applied at file
    # listing — the scan never touches the other 9 date directories), not
    # as a post-scan data filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "conv_date" in pf and "2024-01-05" in pf
    assert one_day.count() == 10


def test_q6_plan_floor(spark):
    """Q6 must stay the cheapest possible plan: all predicates reach the
    scan, no join, exactly one agg exchange."""
    plan = _plan(spark, "q6_forecast_revenue")
    # pushed filter list is elided in toString — check the scan saw the
    # shipdate bound and every filter column reached DataFilters
    assert "GreaterThanOrEqual(l_shipda" in plan
    assert "isnotnull(l_quantity" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_q8_two_role_dims_broadcast(spark):
    """Q8: every dimension (both nation roles, region, customer, supplier,
    part) broadcasts — only the lineitem⋈orders spine may shuffle."""
    plan = _plan(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "EqualTo(r_name,AMERICA)" in plan  # dim filters pushed
    assert "EqualTo(p_type,PROMO)" in plan


def test_embedding_near_dup_is_bucket_join(spark):
    """The registered near-dup query must stay LSH-bucketed: candidate
    generation via band/bucket aggregation, never an all-pairs theta
    self-join (id_a < id_b as the only join condition)."""
    plan = _plan(spark, "embedding_near_dup")
    assert "CartesianProduct" not in plan
    # the all-pairs anti-pattern shows up as a broadcast nested loop with
    # a lone < condition; the LSH path joins candidates by equi-keys
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_argmax_no_global_window(spark):
    """The aggregate-then-argmax must not funnel every per-supplier row
    through a single-partition window: the scalar MAX is a broadcast 1-row
    aggregate joined back (ties preserved).  At 100 TB an unpartitioned
    window here is a one-task straggler."""
    plan = _plan(spark, "q15_top_supplier")
    assert "Window" not in plan
    # Catalyst rewrites the crossJoin+filter into an equi-join on the max
    # value; either way the scalar side must come in as a broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_part_min_cost_single_shuffle_single_scan(spark):
    """The grouped argmin must be ONE lineitem scan + ONE l_partkey
    shuffle: repartition("l_partkey") satisfies the composite aggregate's
    clustering AND the per-part MIN window's, and the per-group window
    avoids the join-back form's duplicate aggregate branch (two scans)."""
    plan = _plan(spark, "part_min_cost_supplier")
    assert plan.count("Exchange") == 1
    assert plan.count("Scan parquet") == 1 or plan.count("FileScan") == 1
    assert plan.count("Window") == 1  # per-group window, not a global one


def test_q9_only_orders_join_shuffles(spark):
    """Q9's widest-tree join: supplier, nation, and the filtered part are
    all broadcast; lineitem<->orders is the ONLY shuffled join, so the
    fact side never re-shuffles for dimension enrichment."""
    plan = _plan(spark, "q9_profit_by_nation_year")
    # supplier/nation/part always broadcast (orders may also broadcast at
    # toy SF — AQE decides by stats; what must NEVER appear is a sort-merge
    # join on a dimension)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "Contains(p_name,a)" in plan  # dim filter pushed into part scan
    assert "CartesianProduct" not in plan


def test_q11_threshold_is_broadcast_scalar(spark):
    """The global total must be a broadcast 1-row aggregate (no global
    window), and the denominator branch — which statically duplicates the
    per-part aggregate — must physically REUSE its shuffle at runtime:
    AQE's exchange reuse makes the final plan one lineitem scan + one
    shuffle, with the total read from the reused exchange output."""
    df = entry.queries()["q11_important_parts"](spark, SF)
    static = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in static
    assert "BroadcastNestedLoopJoin" in static or "BroadcastHashJoin" in static
    df.collect()  # AQE finalizes stages; reuse is a runtime decision
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_q20_single_shuffle_nested_agg(spark):
    """Q20's nested-aggregate threshold reuses the Q2 clustering trick:
    hashpartitioning(l_partkey) serves both the (part, supplier) aggregate
    and the per-part total window — one lineitem scan, one fact shuffle,
    then a broadcast semi-join into supplier."""
    plan = _plan(spark, "q20_dominant_suppliers")
    n_scans = max(plan.count("Scan parquet"), plan.count("FileScan"))
    assert n_scans == 2  # lineitem once + supplier once
    assert plan.count("Window") == 1
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_q21_one_scan_not_three(spark):
    """The EXISTS/NOT-EXISTS chain must be the single per-order aggregate
    rewrite — one lineitem scan, not the oracle's three self-join scans."""
    plan = _plan(spark, "q21_sole_return_suppliers")
    # lineitem once + broadcast supplier once
    n_scans = max(plan.count("Scan parquet"), plan.count("FileScan"))
    assert n_scans == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_no_joins_two_exchanges(spark):
    """Funnel = conditional-MIN pivot + global 1-row aggregate: no joins,
    no windows, and only the per-user shuffle plus the final single-
    partition gather."""
    plan = _plan(spark, "funnel_conversion")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") == 2


def test_length_bucket_batches_one_exchange(spark):
    """The batch-assembly window partitions by len_bucket, and the
    following (len_bucket, batch_no) aggregate is satisfied by that same
    hash partitioning (subset-key clustering) — ONE data shuffle
    end-to-end, not two."""
    plan = _plan(spark, "length_bucket_batches")
    assert plan.count("Window") == 1
    # one hashpartitioning exchange; allow no second for the aggregate
    assert plan.count("Exchange hashpartitioning") == 1


def test_semdedup_assignment_broadcast_prune_equi_join(spark):
    """Centroid assignment must broadcast the K-row centroid frame (never
    shuffle the corpus against it), and the within-cluster prune must be
    an equi-join on the cluster key — a cartesian/broadcast-nested-loop
    there would be the O(n^2) semantic-dedup wall the clustering exists
    to avoid."""
    plan = _plan(spark, "semdedup_prune")
    assert "BroadcastNestedLoopJoin" in plan  # K-row centroid crossJoin
    # the id_a > id_b prune condition rides an EQUI join on cluster
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dataset_split_is_map_only(spark):
    """Split assignment must be a pure projection over the scan — zero
    Exchanges, zero joins; at 100 TB this runs at scan speed."""
    plan = _plan(spark, "dataset_split")
    assert "Exchange" not in plan and "Join" not in plan


def test_curated_manifest_bloom_probe_precedes_bench_join(spark):
    """The curation chain's decontamination must run the bloom probe as a
    FILTER (shiftleft over the literal word array) so only candidates
    reach the single broadcast benchmark join."""
    plan = _plan(spark, "curated_corpus_manifest")
    assert "shiftleft" in plan          # the inlined bloom probe filter
    assert "BroadcastHashJoin" in plan  # the exact verify join
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_block_equi_join_never_cartesian(spark):
    """Blocking+verify must stay an equi-join on the block key — a
    levenshtein predicate alone would plan as a nested-loop cross
    product, the thing blocking exists to prevent."""
    plan = _plan(spark, "fuzzy_name_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_peak_concurrency_no_global_sweep(spark):
    """The sweep-line windows partition BY DAY (and by user for the
    sessionize stage) — a single-partition Exchange would mean the whole
    event log funnels through one task, the classic interval-analytics
    scale bug."""
    plan = _plan(spark, "peak_concurrency")
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_transition_matrix_no_single_partition(spark):
    """Row-normalization partitions by from_type on the aggregated
    |types|^2 frame — never a global window over raw events."""
    plan = _plan(spark, "event_transition_matrix")
    assert "Exchange SinglePartition" not in plan


def test_value_drift_bounds_are_broadcast(spark):
    """The 1-row bounds frame joins as a broadcast nested loop (the only
    sane plan for a scalar cross join); the events side shuffles once for
    the bucket aggregate.  The two single-partition windows run on the
    10-row counted frame, not the event log."""
    plan = _plan(spark, "value_drift_buckets")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_triangles_never_cartesian(spark):
    """Wedge and closing-edge joins are equi-joins; the only cross join
    is the final broadcast of two 1-row counts."""
    plan = _plan(spark, "copurchase_triangles")
    assert "CartesianProduct" not in plan


def test_sql_surface_plans_match_dataframe_surface(spark):
    """The SQL entry point is the same engine, not a parallel
    implementation: the SQL-authored channel report compiles to the
    same physical shape as the DataFrame chain (equal shuffle count,
    same join strategies) — Catalyst doesn't care which surface
    authored the plan."""
    sql_plan = _plan(spark, "sql_channel_report")
    df_plan = _plan(spark, "channel_report")
    # keyed shuffles and join strategies must match exactly.  Total
    # Exchange may differ by AT MOST the DataFrame path's adaptive
    # round-robin fan-out of the costed-sessions scan (landed r15 — a
    # plain SQL string has no fan_out_scan equivalent; it is a no-op on
    # well-split tables, where the counts are equal).  The r14 version of
    # this carve-out cited a fan-out that did not exist (advice r14);
    # this one is pinned to the actual plan: any surplus exchange must be
    # RoundRobinPartitioning, never a keyed shuffle.
    for marker in (
        "Exchange hashpartitioning",
        "SortMergeJoin",
        "BroadcastHashJoin",
    ):
        assert sql_plan.count(marker) == df_plan.count(marker), (
            f"{marker}: SQL {sql_plan.count(marker)} vs "
            f"DataFrame {df_plan.count(marker)}"
        )
    extra = df_plan.count("Exchange") - sql_plan.count("Exchange")
    assert 0 <= extra <= 1, (sql_plan, df_plan)
    if extra:
        assert "RoundRobinPartitioning" in df_plan


def test_sql_channel_report_values_equal_dataframe(spark):
    """Value-level certificate on top of the shared oracle: the SQL and
    DataFrame flagships return bit-identical rows (decimal-exact sums
    make this deterministic)."""
    qs = entry.queries()
    a = sorted(map(tuple, qs["sql_channel_report"](spark, SF).collect()))
    b = sorted(map(tuple, qs["channel_report"](spark, SF).collect()))
    assert a == b


def test_sql_activity_profile_shares_user_partitioning(spark):
    """agg → window → re-agg on user_id: the window's user_id exchange
    must be REUSED by the final aggregation — exactly 2 exchanges
    ((user_id, day) for the daily agg, user_id for everything after),
    never 3."""
    plan = _plan(spark, "sql_user_activity_profile")
    assert plan.count("Exchange") == 2, plan
