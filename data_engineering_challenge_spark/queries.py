"""Query registry: every implemented operator as a (Spark callable, DuckDB
oracle SQL) pair — the surface the driver's correctness gate checks
(``__spark_entry__.queries`` / ``oracle_sql``).

Conventions that make the cross-engine compare EXACT (not approximate):

* Aggregation of arbitrary doubles is order-dependent in IEEE float math, so
  both sides cast aggregation inputs to ``DECIMAL(28,10)`` and cast the sum
  back to double — exact summation, identical bits regardless of
  partitioning or engine.  (At scale this is also a real feature: money
  aggregates that don't drift with the shuffle layout.)
* Division/multiplication of bit-identical doubles is bit-identical in both
  engines, so ratios (ihc, CPO, ROAS) need no special handling once their
  inputs match.
* Timestamps are emitted as epoch-microsecond BIGINTs or formatted strings —
  never raw timestamp columns — to remove precision/timezone ambiguity.
* Window attribution scores are exact binary fractions (1.0/2.0/4.0), so
  their window sums are exact in any order.
* Every computed column is aliased identically in the Spark chain and the
  oracle SQL (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import attribution as attr
from .operators import journeys as jny
from .operators import report as rpt
from .sources.io import fan_out_scan
from . import roles

SparkQuery = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark_callable, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            # a duplicate name silently REPLACES the earlier query (dict
            # semantics) — the old query vanishes from the gate while its
            # green history keeps it out of the rotation's attention;
            # fail at import instead
            raise ValueError(f"duplicate registry query name: {name!r}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


#: registry emission order, robust to EITHER a time-bounded or a
#: count-bounded correctness gate:
#:   1. _CORE_FIRST — the reference's attribution pipeline surface (the
#:      operators a user of the reference actually runs), cheapest first
#:      within the block, so the core always gets recorded;
#:   2. _CHEAP_FIRST — everything else by measured verify cost ascending
#:      (scripts/verify_local.py at sf0.01: Spark exec + DuckDB oracle +
#:      value hashing), maximizing rows under a time budget;
#:   3. unlisted names (future queries) in registration order;
#:   4. _TAIL — the expensive few, last, so they can't crowd anything out.
_CORE_FIRST = [
    "journeys_date_window",
    "ihc_normalize",
    "attribution_verify",
    "attr_first_touch",
    "attr_position_engagement",
    "attr_last_touch",
    "report_summary",
    "channel_report",
    "attr_linear",
    "attr_external_chunked",
    "journeys_build",
]

_CHEAP_FIRST = [
    "text_stats", "lang_guess", "token_count_bpe", "events_cube",
    "q6_forecast_revenue", "token_budget_packing", "clean_text_normalized",
    "q15_top_supplier", "q13_order_count_distribution",
    "dedup_survivors_quality",
    "dedup_exact_docs", "semi_join_big_orders", "anti_join_quiet_customers",
    "distinct_users_per_type", "intersect_active_customers",
    "sliding_window_counts", "q14_promo_share", "customer_revenue_quartiles",
    "text_quality", "daily_type_running_total", "events_rollup",
    "q4_priority_count", "q18_large_orders", "channel_7day_rolling",
    "q19_disjunctive_preds", "q22_idle_customers", "events_pivot",
    "range_join_error_context", "events_grouping_sets", "multimodal_features",
    "multimodal_frame_sample",
    "events_json_props", "except_customers", "q17_small_qty_revenue",
    "asof_nearest_session", "q1_pricing_summary", "top3_customers_per_nation",
    "sessionize_events", "minhash_signatures", "embedding_near_dup_exact",
    "q8_market_share", "contamination_overlap", "profile_orders_columns",
    "events_json_schema_parse", "price_histogram", "event_gap_stats",
    "q3_top_orders", "brand_revenue", "supplier_part_distinct_aggs",
    "q10_returned_items", "cosine_topk", "tfidf_top_terms",
    "quantity_percentiles", "q7_nation_volume", "minhash_lsh_candidates",
    "journeys_date_window", "q5_nation_revenue", "ann_topk_lsh",
    "ihc_normalize", "attribution_verify", "attr_first_touch",
    "attr_position_engagement", "report_summary", "winnow_fingerprints",
    "attr_last_touch", "doc_fingerprints", "channel_report",
    "simhash_fingerprints", "ngram_jaccard_pairs", "attr_linear",
    "lsh_verified_pairs", "embedding_near_dup", "hash_sample_stratified",
    # round-5 additions, measured verify cost ascending (sf0.01)
    "stratified_topk_sample", "pricing_summary_unpivot",
    "length_bucket_batches", "semdedup_prune",
    "dataset_split", "csv_roundtrip_stats", "bpe_merge_ranks",
    "multimodal_image_stats",
    "jsonl_roundtrip_stats", "winnow_token_fingerprints",
    "winnow_overlap_pairs", "bpe_train_merges",
    "contamination_bloom", "streaming_stateful_first_seen",
    "curated_corpus_manifest", "streaming_near_dup_admission",
    # round-5 second-pass additions, measured verify cost ascending (sf0.01)
    "weighted_sample_systematic", "equal_freq_histogram",
    "value_drift_buckets", "click_purchase_recon",
    "event_transition_matrix", "peak_concurrency", "fuzzy_name_pairs",
    "doc_chunk_windows", "rolling_7day_active_users",
    "synthetic_source_agg", "copurchase_lift",
    "streaming_synthetic_source",
    "twap_by_type", "winsorized_price_stats", "capped_running_balance",
    "copurchase_triangles",
    # round-5 third-pass additions (scale-pattern family), cost ascending
    "percent_rank_normalize", "table_checksum", "rle_token_runs",
    "orc_roundtrip_stats", "ewma_value", "linear_trend_by_type",
    "pareto_frontier", "cms_heavy_hitters", "global_row_ids",
    "table_diff_reconcile", "streaming_ewma",
    "daily_count_anomalies", "user_type_profile_map",
    "pyds_manifest_roundtrip_stats", "snapshot_time_travel",
    "streaming_snapshot_ingest", "pandas_api_type_stats",
    "snapshot_pruned_lookup", "snapshot_view_refresh",
    "part_hierarchy_rollup", "cdc_feed_generate",
    "streaming_cms_heavy_hitters", "streaming_linear_trend",
    # round-6 additions, measured verify cost ascending (sf0.01)
    "sql_user_activity_profile", "sql_nation_revenue_share",
    "snapshot_history", "gap_fill_forward", "events_variant_extract",
    "ngram_coverage_score", "snapshot_restore_asof", "sql_channel_report",
    "snapshot_mor_merge",
    # round-7 additions, measured verify cost ascending (sf0.01)
    "snapshot_partitioned_prune", "snapshot_evolution_read",
    "sql_snapshot_asof_report", "snapshot_wap_publish",
    "snapshot_pruned_mor_lookup", "snapshot_cdf_feed",
    "snapshot_branch_publish", "snapshot_files_meta",
    "snapshot_cherry_pick",
    # round-8 additions, measured verify cost ascending (sf0.01)
    "sql_catalog_report", "bpe_encode_tokens",
    "snapshot_metadata_agg", "snapshot_partitions_meta",
    "snapshot_expectations_gate", "snapshot_clone_diverge",
    "snapshot_zorder_lookup", "snapshot_pushdown_scan",
    "snapshot_merge_into", "snapshot_update_where",
    "streaming_partitioned_ingest",
    # round-9 additions, measured verify cost ascending (sf0.01)
    "snapshot_copy_into_ingest", "snapshot_add_column_defaults",
    "snapshot_bloom_prune", "sql_inline_time_travel",
    "snapshot_analyze_stats", "snapshot_zorder_rewrite",
    "snapshot_generated_columns",
    # round-10 additions, measured verify cost ascending (sf0.01)
    "sql_pruned_lookup", "snapshot_partitioned_zorder",
    "sql_ddl_layout", "snapshot_mor_evolution",
    # round-11 additions, measured verify cost ascending (sf0.01)
    "sql_metadata_partition_count", "sql_metadata_agg",
    "sql_show_partitions", "sql_partition_transform_pruned",
    "sql_timestamp_pruned_scan", "sql_star_join_pruned",
    # round-12 additions, measured verify cost ascending (sf0.01)
    "sql_or_pruned_lookup", "sql_left_join_pruned",
    "sql_partition_group_count", "sql_metadata_range_count",
    "sql_distinct_partitions",
]

#: the expensive tail, ascending: large-result collects, iterative and
#: streaming execution — still verified, just last so they can't crowd out
#: cheaper rows under a bounded gate
_TAIL = [
    "sql_dml_lifecycle",
    "sql_mview_maintenance",
    "minhash_lsh_candidates_xxh",
    "dup_clusters_cc",
    "near_dup_corpus_prune",
    "streaming_incremental_journeys",
    "streaming_stream_stream_journeys",
    "cdc_apply_replay",
    "streaming_incremental_report",
    "streaming_snapshot_cdc",
    "streaming_snapshot_source",
    "streaming_rate_limited_backfill",
    "streaming_snapshot_cdf_source",
    "snapshot_view_refresh_cdf",
    "snapshot_cdf_updates",
    "snapshot_replication",
    "snapshot_replication_maintained",
    "ivf_topk",
    "pq_topk",
]


def _green_counts() -> dict[str, int]:
    """Per-query count of GREEN driver rows across the CORRECTNESS_r{N}.json
    artifacts at the repo root.  Green = executed without error, row counts
    matched, and neither schema nor value hash mismatched (hash may be null
    for rows-only queries).  A crashed/err row counts as NOT recorded, so
    the rotation sends that query back to the front."""
    import json

    root = Path(__file__).resolve().parent.parent
    counts: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        if not re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name):
            continue
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                counts[name] = counts.get(name, 0) + 1
    return counts


def _emission_order() -> list[str]:
    """Core pinned first, then everything else least-verified-first.

    The driver's correctness gate records only a bounded prefix of this
    order per round, so a FIXED order would leave the tail permanently
    without hard driver evidence.  Instead the non-core names are sorted by
    how many green driver rows they already have (fewest first, ties by the
    curated cheap-first order), recomputed each round from the
    CORRECTNESS_r*.json artifacts: anything unrecorded — including a query
    whose row errored — rotates to the front, and once coverage equalizes
    the order degrades gracefully to the curated one.  Deterministic — a
    pure function of the committed artifacts."""
    core = [n for n in _CORE_FIRST if n in _REGISTRY]
    seen: set[str] = set(core)
    ring: list[str] = []
    for n in _CHEAP_FIRST:
        if n in _REGISTRY and n not in seen:
            seen.add(n)
            ring.append(n)
    tail = {n for n in _TAIL if n in _REGISTRY}
    for n in _REGISTRY:  # unlisted (future) queries, registration order
        if n not in seen and n not in tail:
            seen.add(n)
            ring.append(n)
    ring.extend(n for n in _TAIL if n in tail)

    greens = _green_counts()
    idx = {n: i for i, n in enumerate(ring)}
    ring.sort(key=lambda n: (greens.get(n, 0), idx[n]))
    return core + ring


def queries() -> dict[str, SparkQuery]:
    return {name: _REGISTRY[name][0] for name in _emission_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _emission_order()
        if _REGISTRY[name][1] is not None
    }


def dsum(col: Column | str) -> Column:
    """Exact order-independent sum: cast to decimal, sum, back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(28,10)")).cast("double")


#: SQL twin of :func:`dsum`.  The final decimal->double conversion goes
#: through VARCHAR because DuckDB's direct DECIMAL->DOUBLE cast is not
#: correctly rounded once the scaled int128 exceeds 2^53 (int128->double,
#: then a divide — two roundings); the string path is correctly rounded and
#: therefore bit-identical to Spark's BigDecimal->double.
def _dsum_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .sources.io import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = roles.load_events(spark, sf_dir)
    return jny.build_journeys(
        roles.conversions_from_events(events), roles.sessions_from_events(events)
    )


# common oracle CTE prelude: the role mapping + the journey join
_SQL_PRELUDE = f"""
WITH sessions AS ({roles.SQL_SESSIONS}),
conversions AS ({roles.SQL_CONVERSIONS}),
costs AS ({roles.SQL_COSTS}),
journeys AS (
    SELECT c.conv_id AS conversion_id,
           s.session_id,
           s.ts,
           s.channel_name AS channel_label,
           s.holder_engagement,
           s.closer_engagement,
           CAST(0 AS INTEGER) AS conversion,
           s.impression_interaction,
           c.conv_ts,
           c.revenue
    FROM conversions c
    JOIN sessions s
      ON s.user_id = c.user_id AND s.ts <= c.conv_ts
)
"""


# --------------------------------------------------------------------------
# journey construction (SURVEY.md §2.4 — the as-of/prefix join)
# --------------------------------------------------------------------------


@register(
    "journeys_build",
    _SQL_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       channel_label,
       holder_engagement,
       closer_engagement,
       conversion,
       impression_interaction
FROM journeys
""",
)
def q_journeys_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of journey join (reference cj_builder.py:81-113) — every session of
    the conversion's user at-or-before the conversion time."""
    j = _journeys(spark, sf_dir)
    return j.select(
        "conversion_id",
        "session_id",
        F.unix_micros("timestamp").alias("ts_us"),
        "channel_label",
        "holder_engagement",
        "closer_engagement",
        "conversion",
        "impression_interaction",
    )


@register(
    "journeys_date_window",
    _SQL_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       channel_label
FROM journeys
WHERE CAST(conv_ts AS DATE) >= DATE '2024-01-10'
  AND CAST(conv_ts AS DATE) <= DATE '2024-01-20'
""",
)
def q_journeys_date_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusive date-range predicate on the conversion date (reference
    cj_builder.py:45-53; bounds inclusive both ends)."""
    events = roles.load_events(spark, sf_dir)
    j = jny.build_journeys(
        roles.conversions_from_events(events),
        roles.sessions_from_events(events),
        start_date="2024-01-10",
        end_date="2024-01-20",
    )
    return j.select(
        "conversion_id",
        "session_id",
        F.unix_micros("timestamp").alias("ts_us"),
        "channel_label",
    )


# --------------------------------------------------------------------------
# attribution family (SURVEY.md §2.8)
# --------------------------------------------------------------------------

_SQL_ATTR_PRELUDE = _SQL_PRELUDE


@register(
    "attr_linear",
    _SQL_ATTR_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
FROM journeys
""",
)
def q_attr_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_linear(_journeys(spark, sf_dir))


@register(
    "attr_last_touch",
    _SQL_ATTR_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY conversion_id ORDER BY ts DESC, session_id DESC
            ) = 1 THEN 1.0 ELSE 0.0 END AS ihc
FROM journeys
""",
)
def q_attr_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_last_touch(_journeys(spark, sf_dir))


@register(
    "attr_first_touch",
    _SQL_ATTR_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY conversion_id ORDER BY ts ASC, session_id ASC
            ) = 1 THEN 1.0 ELSE 0.0 END AS ihc
FROM journeys
""",
)
def q_attr_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_first_touch(_journeys(spark, sf_dir))


@register(
    "attr_position_engagement",
    _SQL_ATTR_PRELUDE
    + """
, scored AS (
    SELECT conversion_id, session_id,
           CASE
             WHEN ROW_NUMBER() OVER w = 1 THEN 2.0
             WHEN ROW_NUMBER() OVER w = COUNT(*) OVER (PARTITION BY conversion_id)
                  THEN 2.0 * (1.0 + closer_engagement)
             ELSE 1.0 * (1.0 + holder_engagement)
           END AS raw
    FROM journeys
    WINDOW w AS (PARTITION BY conversion_id ORDER BY ts ASC, session_id ASC)
)
SELECT conversion_id, session_id,
       raw / SUM(raw) OVER (PARTITION BY conversion_id) AS ihc
FROM scored
""",
)
def q_attr_position_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attr.attribute_position_engagement(_journeys(spark, sf_dir))


@register(
    "ihc_normalize",
    _SQL_ATTR_PRELUDE
    + """
, raw_attr AS (
    SELECT conversion_id, session_id,
           (session_id % 7 + 1) / 4.0 AS ihc
    FROM journeys
)
SELECT conversion_id, session_id,
       CASE WHEN ABS(SUM(ihc) OVER w - 1.0) > 0.0001
             AND SUM(ihc) OVER w <> 0.0
            THEN ihc / SUM(ihc) OVER w
            ELSE ihc END AS ihc
FROM raw_attr
WINDOW w AS (PARTITION BY conversion_id)
""",
)
def q_ihc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped tolerance-gated renormalization (reference api_client.py:79-107)
    over a synthetic raw attribution (exact binary fractions, so the window
    sums are order-independent)."""
    j = _journeys(spark, sf_dir)
    raw = j.select(
        "conversion_id",
        "session_id",
        ((F.col("session_id") % 7 + 1) / 4.0).alias("ihc"),
    )
    return attr.normalize_ihc(raw)


@register(
    "attribution_verify",
    _SQL_ATTR_PRELUDE
    + """
, scored AS (
    SELECT conversion_id, session_id,
           CASE
             WHEN ROW_NUMBER() OVER w = 1 THEN 2.0
             WHEN ROW_NUMBER() OVER w = COUNT(*) OVER (PARTITION BY conversion_id)
                  THEN 2.0 * (1.0 + closer_engagement)
             ELSE 1.0 * (1.0 + holder_engagement)
           END AS raw
    FROM journeys
    WINDOW w AS (PARTITION BY conversion_id ORDER BY ts ASC, session_id ASC)
), attributed AS (
    SELECT conversion_id, session_id,
           raw / SUM(raw) OVER (PARTITION BY conversion_id) AS ihc
    FROM scored
)
SELECT conversion_id,
       {dsum} AS ihc_sum,
       CAST(ABS({dsum} - 1.0) <= 0.0001 AS INTEGER) AS is_valid
FROM attributed
GROUP BY conversion_id
""".replace("{dsum}", _dsum_sql("ihc")),
)
def q_attribution_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-write invariant check (reference api_client.py:254-268): Σihc per
    conversion + conforming flag.  Decimal-exact sum so the flag is stable."""
    a = attr.attribute_position_engagement(_journeys(spark, sf_dir))
    return a.groupBy("conversion_id").agg(
        dsum("ihc").alias("ihc_sum"),
        (F.abs(dsum("ihc") - 1.0) <= 0.0001).cast("int").alias("is_valid"),
    )


# --------------------------------------------------------------------------
# channel report (SURVEY.md §2.5 — the flagship)
# --------------------------------------------------------------------------

_SQL_REPORT = (
    _SQL_PRELUDE
    + """
, scored AS (
    SELECT conversion_id, session_id,
           CASE
             WHEN ROW_NUMBER() OVER w = 1 THEN 2.0
             WHEN ROW_NUMBER() OVER w = COUNT(*) OVER (PARTITION BY conversion_id)
                  THEN 2.0 * (1.0 + closer_engagement)
             ELSE 1.0 * (1.0 + holder_engagement)
           END AS raw
    FROM journeys
    WINDOW w AS (PARTITION BY conversion_id ORDER BY ts ASC, session_id ASC)
), attributed AS (
    SELECT conversion_id, session_id,
           raw / SUM(raw) OVER (PARTITION BY conversion_id) AS ihc
    FROM scored
), session_data AS (
    SELECT s.session_id, s.channel_name, CAST(s.ts AS DATE) AS date,
           COALESCE(co.cost, 0.0) AS cost
    FROM sessions s LEFT JOIN costs co ON s.session_id = co.session_id
), attribution_data AS (
    SELECT sd.channel_name, sd.date, sd.cost, a.ihc,
           a.ihc * c.revenue AS ihc_revenue
    FROM session_data sd
    JOIN attributed a ON sd.session_id = a.session_id
    JOIN conversions c ON a.conversion_id = c.conv_id
), channel_date_report AS (
    SELECT channel_name, date,
           {dsum_cost} AS cost,
           {dsum_ihc} AS ihc,
           {dsum_rev} AS ihc_revenue
    FROM attribution_data
    GROUP BY channel_name, date
)
SELECT channel_name, date, cost, ihc, ihc_revenue,
       CASE WHEN ihc <> 0.0 THEN cost / ihc ELSE 0.0 END AS CPO,
       CASE WHEN cost <> 0.0 THEN ihc_revenue / cost ELSE 0.0 END AS ROAS
FROM channel_date_report
""".replace("{dsum_cost}", _dsum_sql("cost"))
    .replace("{dsum_ihc}", _dsum_sql("ihc"))
    .replace("{dsum_rev}", _dsum_sql("ihc_revenue"))
)


def _report_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused flagship composition (r14, guide §8/§2.4): per-session cost
    and date and per-conversion revenue are attached BEFORE the one
    attribution shuffle (carry_* plumbing), so the report aggregates the
    attributed rows directly — 2 scans / 1 keyed shuffle instead of the
    naive 5 scans / 3 keyed shuffles, bit-identical sums (fused-vs-generic
    row equality is pinned in tests/test_report.py).

    The cost attach is INLINE rather than the role-layer LEFT JOIN —
    `roles.costed_sessions_from_events` holds the argument and keeps the
    role formulas single-sourced (advice, round 14).  The generic
    channel_report operator keeps the real LEFT JOIN for arbitrary costs
    tables; the equality test compares this composition against it on
    the actual testdata every run."""
    events = roles.load_events(spark, sf_dir)
    conversions = roles.conversions_from_events(events)
    # adaptive fan-out of the costed-sessions scan (r15): the fused
    # flagship pipelines the journey probe AND the conversion_id shuffle
    # write into the events scan stage, so an under-split events table
    # (3 splits at the ×10 upscale) serializes the pipeline's heaviest
    # stage.  Interleaved A/B (n=3 minima, quiet): sf1.0 7.0→5.8 s,
    # sf0.1 1.19→1.07 s.  r14's rejection of a probe-side fan-out was on
    # the PLAIN sessions path (attr/journeys queries — unchanged here),
    # whose per-row downstream work is far lighter.  No-op at scale.
    sess_costed = fan_out_scan(roles.costed_sessions_from_events(events))
    j = jny.build_journeys(
        conversions,
        sess_costed,
        carry_session_cols=("date", "cost"),
        carry_conversion_cols=("revenue",),
    )
    a = attr.attribute_position_engagement(
        j, carry_cols=("channel_label", "date", "cost", "revenue")
    )
    return rpt.channel_report_from_attributed(a, exact_sums=True)


@register("channel_report", _SQL_REPORT)
def q_channel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full 3-step pipeline ending in the reference's 3-CTE
    report (channel_reporter.py:33-118) — cost / attributed conversions /
    attributed revenue / CPO / ROAS per (channel, day)."""
    return _report_df(spark, sf_dir)


@register(
    "report_summary",
    "WITH report AS ("
    + _SQL_REPORT
    + """
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       {dsum_cost} AS total_cost,
       {dsum_rev} AS total_ihc_revenue,
       CAST(CAST(SUM(CASE WHEN CPO > 0 THEN CAST(CPO AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE)
           / COUNT(CASE WHEN CPO > 0 THEN 1 END) AS avg_cpo,
       CAST(CAST(SUM(CASE WHEN ROAS > 0 THEN CAST(ROAS AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE)
           / COUNT(CASE WHEN ROAS > 0 THEN 1 END) AS avg_roas
FROM report
""".replace("{dsum_cost}", _dsum_sql("cost"))
    .replace("{dsum_rev}", _dsum_sql("ihc_revenue")),
)
def q_report_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary aggregates over the report (reference
    channel_reporter.py:133-151): totals + filtered means (SURVEY.md §2.5)."""
    report = _report_df(spark, sf_dir)
    return report.agg(
        F.count("*").alias("n_rows"),
        dsum("cost").alias("total_cost"),
        dsum("ihc_revenue").alias("total_ihc_revenue"),
        (
            F.sum(F.when(F.col("CPO") > 0, F.col("CPO").cast("decimal(28,10)"))).cast(
                "double"
            )
            / F.count(F.when(F.col("CPO") > 0, 1))
        ).alias("avg_cpo"),
        (
            F.sum(
                F.when(F.col("ROAS") > 0, F.col("ROAS").cast("decimal(28,10)"))
            ).cast("double")
            / F.count(F.when(F.col("ROAS") > 0, 1))
        ).alias("avg_roas"),
    )


@register(
    "attr_external_chunked",
    _SQL_ATTR_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
FROM journeys
-- same eligibility rule as the Spark side: a conversion whose journey alone
-- exceeds max_sessions_per_request is SKIPPED (api_client.py:197-199); at
-- sf0.01 no journey is that long, but both sides must compute over the
-- identical conversion set for the gate to hold at any SF
WHERE conversion_id NOT IN (
    SELECT conversion_id FROM journeys GROUP BY conversion_id HAVING COUNT(*) > 5000
)
""",
)
def q_attr_external_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.7 chunked external-scorer path (applyInPandas, cap-bounded
    sub-batches, hash-distributed chunks) with the bundled linear scorer —
    oracle = plain SQL linear attribution, so the whole Arrow/pandas
    plumbing is correctness-checked, not just unit-tested."""
    from .operators import batching

    j = _journeys(spark, sf_dir)
    out = batching.attribute_external(
        j, max_journeys_per_request=50, max_sessions_per_request=5000
    )
    return out.select("conversion_id", "session_id", "ihc")
