"""Property-based invariants (SURVEY.md §5.4), hypothesis-driven:

* Σ ihc = 1 per conversion for every attribution model (the reference's own
  runtime invariant, api_client.py:92-98)
* journey row count == the O(C*S) reference loop's count, computed in pure
  Python (the distributed join must equal the naive semantics)
* date-filtered journeys ⊆ unfiltered journeys
* normalize_ihc is idempotent
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators import attribution as attr
from data_engineering_challenge_spark.operators.journeys import build_journeys

T0 = datetime(2024, 1, 1)

# a compact world: few users, minutes-resolution times — enough to hit
# boundary collisions (session exactly at conversion time) often
sessions_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),      # user
        st.integers(0, 500),    # minutes offset
    ),
    min_size=0,
    max_size=30,
)
conversions_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 500)),
    min_size=1,
    max_size=8,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _frames(spark, sessions, conversions):
    sdf = spark.createDataFrame(
        [
            Row(
                session_id=i,
                user_id=f"u{u}",
                ts=T0 + timedelta(minutes=m),
                channel_name="c",
                holder_engagement=i % 2,
                closer_engagement=i % 3 == 0 and 1 or 0,
                impression_interaction=0,
            )
            for i, (u, m) in enumerate(sessions)
        ]
        or [Row(session_id=0, user_id="zz", ts=T0, channel_name="c",
                holder_engagement=0, closer_engagement=0, impression_interaction=0)]
    )
    cdf = spark.createDataFrame(
        [
            Row(conv_id=i, user_id=f"u{u}", conv_ts=T0 + timedelta(minutes=m),
                revenue=10.0)
            for i, (u, m) in enumerate(conversions)
        ]
    )
    return sdf, cdf


@given(sessions=sessions_strategy, conversions=conversions_strategy)
@_settings
def test_journeys_match_naive_loop(spark, sessions, conversions):
    sdf, cdf = _frames(spark, sessions, conversions)
    got = build_journeys(cdf, sdf).count()
    # the reference's O(C*S) loop, in pure python (cj_builder.py:81-90)
    expected = sum(
        1
        for ci, (cu, cm) in enumerate(conversions)
        for si, (su, sm) in enumerate(sessions)
        if su == cu and sm <= cm
    )
    assert got == expected


@given(sessions=sessions_strategy, conversions=conversions_strategy)
@_settings
def test_ihc_sums_to_one_for_every_model(spark, sessions, conversions):
    sdf, cdf = _frames(spark, sessions, conversions)
    j = build_journeys(cdf, sdf)
    if j.isEmpty():
        return
    for fn in (
        attr.attribute_last_touch,
        attr.attribute_first_touch,
        attr.attribute_linear,
        attr.attribute_position_engagement,
    ):
        sums = fn(j).groupBy("conversion_id").agg(F.sum("ihc").alias("s")).collect()
        for r in sums:
            assert abs(r.s - 1.0) < 1e-9, (fn.__name__, r)


@given(
    sessions=sessions_strategy,
    conversions=conversions_strategy,
    lo=st.integers(0, 200),
    hi=st.integers(200, 500),
)
@_settings
def test_filtered_journeys_subset_of_unfiltered(spark, sessions, conversions, lo, hi):
    sdf, cdf = _frames(spark, sessions, conversions)
    all_rows = {
        (r.conversion_id, r.session_id) for r in build_journeys(cdf, sdf).collect()
    }
    start = (T0 + timedelta(minutes=lo)).strftime("%Y-%m-%d")
    end = (T0 + timedelta(minutes=hi)).strftime("%Y-%m-%d")
    filt = {
        (r.conversion_id, r.session_id)
        for r in build_journeys(cdf, sdf, start_date=start, end_date=end).collect()
    }
    assert filt <= all_rows


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 3), st.floats(0.0, 2.0, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_normalize_idempotent(spark, raw):
    df = spark.createDataFrame(
        [Row(conversion_id=c, session_id=i, ihc=v) for i, (c, v) in enumerate(raw)]
    )
    once = attr.normalize_ihc(df)
    twice = attr.normalize_ihc(once)
    a = {r.session_id: r.ihc for r in once.collect()}
    b = {r.session_id: r.ihc for r in twice.collect()}
    for k in a:
        assert b[k] == pytest.approx(a[k], abs=1e-9)


def test_approx_aggs_within_tolerance(spark):
    """The approximate aggregates the 100 TB path swaps in
    (approx_count_distinct / approx_percentile) must land within their
    documented error of the exact answers on real testdata."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact_d"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row.approx_d - row.exact_d) / row.exact_d < 0.06  # 3x rsd
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.01


@given(
    sizes=st.dictionaries(
        st.integers(min_value=1, max_value=50),
        st.integers(min_value=1, max_value=12),
        min_size=1,
        max_size=25,
    ),
    max_journeys=st.integers(min_value=1, max_value=6),
    max_sessions=st.integers(min_value=12, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_sub_batches_cap_invariants(sizes, max_journeys, max_sessions):
    """Pure-pandas property: _sub_batches must (a) never exceed either cap
    in any emitted batch (given no single conversion exceeds the session
    cap — over-cap ones are filtered before distribution), (b) keep every
    conversion's journey in exactly one batch, intact, and (c) never
    split a conversion across batches."""
    import pandas as pd

    from data_engineering_challenge_spark.operators.batching import _sub_batches

    rows = [
        {"conversion_id": cid, "session_id": cid * 1000 + i}
        for cid, n in sizes.items()
        for i in range(n)
    ]
    pdf = pd.DataFrame(rows)

    seen: dict = {}
    for batch in _sub_batches(pdf, max_journeys, max_sessions):
        convs = batch.groupby("conversion_id").size()
        assert len(convs) <= max_journeys
        # a single over-cap conversion may stand alone (caller filters
        # those); multi-conversion batches must respect the session cap
        if len(convs) > 1:
            assert len(batch) <= max_sessions
        for cid, n in convs.items():
            assert cid not in seen  # never split / repeated
            seen[cid] = n
    assert seen == dict(sizes)  # full coverage, journeys intact


def test_hll_rollup_accuracy_and_merge_consistency(spark):
    """The HLL rollup's estimates stay within 2% of exact distinct counts
    (lgK=12 default), and the grand total obtained by UNIONING per-type
    sketches equals the estimate of a single global sketch — merge
    associativity, the property that makes sketch rollups trustworthy."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from data_engineering_challenge_spark import roles

    sf = "/root/testdata/sf0.01"
    got = {
        r.event_type: r.est_users
        for r in e.queries()["distinct_users_hll_rollup"](spark, sf).collect()
    }

    events = roles.load_events(spark, sf)
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = events.select("user_id").distinct().count()

    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.02, (k, est, exact[k])

    direct_total = (
        events.agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0].est
    )
    assert got["ALL"] == direct_total  # union of parts == whole


def test_theta_overlap_matches_exact_set_ops(spark):
    """Theta intersection/union/difference estimates vs exact semi-join
    counts (sub-sketch-capacity cardinalities here, so the sketches are in
    their exact regime — estimates must round to the true counts)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from data_engineering_challenge_spark import roles

    sf = "/root/testdata/sf0.01"
    row = e.queries()["theta_user_overlap"](spark, sf).collect()[0]

    events = roles.load_events(spark, sf)
    clicks = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clicks.join(buys, "user_id", "left_semi").count()
    either = clicks.union(buys).distinct().count()
    only = clicks.join(buys, "user_id", "left_anti").count()

    assert row.clicked_and_purchased == both
    assert row.clicked_or_purchased == either
    assert row.clicked_never_purchased == only


def test_kll_quantiles_rank_error_bounded(spark):
    """KLL quantile estimates: each reported pXX must sit within ±2% RANK
    error of the exact distribution (the sketch's guarantee is on rank,
    not value), for every per-type row and the merged ALL row."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from data_engineering_challenge_spark import roles

    sf = "/root/testdata/sf0.01"
    rows = e.queries()["kll_value_quantiles"](spark, sf).collect()

    events = roles.load_events(spark, sf)
    for r in rows:
        vals = (
            events if r.event_type == "ALL"
            else events.filter(F.col("event_type") == r.event_type)
        ).select("value").orderBy("value").collect()
        sorted_vals = [x.value for x in vals]
        n = len(sorted_vals)
        for q, est in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            import bisect
            rank = bisect.bisect_right(sorted_vals, est) / n
            assert abs(rank - q) < 0.02, (r.event_type, q, est, rank)


# ---------------------------------------------------------------------------
# sketch family at OVER-capacity cardinality: the tests above run the
# sketches in their exact regime (sub-capacity); these force genuine
# ESTIMATION (>=100k distinct keys vs lgK=12 / k=4096 / k=200 capacities)
# and assert the documented error bounds — the regime a 100 TB rollup
# actually runs in.
# ---------------------------------------------------------------------------


def test_hll_estimate_regime_error_and_merge(spark):
    """150k distinct keys >> 2^12 HLL buckets: the estimate must land
    within the documented ~1.6% RSE (bound at 3% here, ~2 sigma), and the
    union of 8 per-group sketches must equal the single global sketch's
    estimate EXACTLY (each key sets the same bucket regardless of
    grouping, so union-of-parts is bit-identical to the whole)."""
    from pyspark.sql import functions as F

    n = 150_000
    df = spark.range(n)
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
    ).collect()[0].est
    assert abs(direct - n) / n < 0.03, direct

    parts = df.withColumn("g", F.pmod("id", F.lit(8))).groupBy("g").agg(
        F.hll_sketch_agg("id").alias("sk")
    )
    merged = parts.agg(F.hll_union_agg("sk").alias("u")).select(
        F.hll_sketch_estimate("u").alias("est")
    ).collect()[0].est
    assert merged == direct


def test_theta_estimate_regime_set_algebra_bounds(spark):
    """Theta set algebra with 120k-element sets (>> 4096 nominal entries):
    union/intersection/difference estimates vs ground truth within
    sketch-theory bounds — union ~1/sqrt(k) RSE (bound 5%), intersection/
    difference looser (error compounds over two sketches; bound 10% of
    the TRUE UNION size, the denominator theta guarantees relate to)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 120_000).agg(F.theta_sketch_agg("id").alias("a"))
    b = spark.range(60_000, 180_000).agg(F.theta_sketch_agg("id").alias("b"))
    row = a.crossJoin(b).select(
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("u"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("i"),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias("d"),
    ).collect()[0]
    true_u, true_i, true_d = 180_000, 60_000, 60_000
    assert abs(row.u - true_u) / true_u < 0.05, row.u
    assert abs(row.i - true_i) / true_u < 0.10, row.i
    assert abs(row.d - true_d) / true_u < 0.10, row.d


def test_kll_estimate_regime_rank_error(spark):
    """KLL over 200k distinct values (>> k=200 compaction capacity): every
    quantile estimate must sit within 2% RANK error (the sketch's
    guarantee is on rank, not value — for the uniform 0..n-1 id column
    rank and value coincide, making the check exact), both for the single
    global sketch and for a binary-merge fold of 8 per-group sketches."""
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).select(F.col("id").cast("double").alias("v"))

    def qs(col):
        return [
            F.kll_sketch_get_quantile_double(col, F.lit(q)).alias(f"p{int(q*100)}")
            for q in (0.5, 0.95, 0.99)
        ]

    row = df.agg(F.kll_sketch_agg_double("v").alias("sk")).select(
        *qs(F.col("sk"))
    ).collect()[0]
    for q, est in ((0.5, row.p50), (0.95, row.p95), (0.99, row.p99)):
        assert abs(est / n - q) < 0.02, (q, est)

    parts = df.withColumn(
        "g", F.pmod(F.col("v").cast("bigint"), F.lit(8))
    ).groupBy("g").agg(F.kll_sketch_agg_double("v").alias("sk"))
    merged_sketch = F.aggregate(
        F.expr("slice(arr, 2, size(arr) - 1)"),
        F.element_at(F.col("arr"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    mrow = parts.agg(F.collect_list("sk").alias("arr")).select(
        *qs(merged_sketch)
    ).collect()[0]
    for q, est in ((0.5, mrow.p50), (0.95, mrow.p95), (0.99, mrow.p99)):
        assert abs(est / n - q) < 0.02, (q, est)


# ---------------------------------------------------------------------------
# apply_cdc vs a python dict model: any sequence of I/U/D change batches
# must leave the table exactly where naive per-row replay leaves a dict
# ---------------------------------------------------------------------------

cdc_batches_strategy = st.lists(  # batches of (key, value, op) changes
    st.lists(
        st.tuples(
            st.integers(0, 5),                      # key
            st.integers(0, 99),                     # value
            st.sampled_from(["I", "U", "D"]),       # op
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=cdc_batches_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_apply_cdc_matches_dict_replay(spark, tmp_path_factory, batches):
    """Model check: apply_cdc over arbitrary I/U/D batch sequences equals
    naive in-order dict replay (upsert on I/U, pop on D) — including
    same-key collisions inside one batch (last change wins)."""
    import shutil

    from pyspark.sql import Row

    from data_engineering_challenge_spark.streaming import incremental as st_inc

    d = tmp_path_factory.mktemp("cdc")
    path = str(d / "table")
    model: dict[int, int] = {}
    try:
        for batch in batches:
            for k, v, op in batch:
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = v
            bdf = spark.createDataFrame(
                [Row(k=k, v=v, _op=op) for k, v, op in batch]
            )
            st_inc.apply_cdc(bdf, path, ["k"])
            got = {r.k: r.v for r in spark.read.parquet(path).collect()}
            assert got == model, (batch, got, model)
    finally:
        shutil.rmtree(str(d), ignore_errors=True)


# ---------------------------------------------------------------------------
# apply_cdc with an explicit sequence column: arbitrary ARRIVAL order within
# each batch (a shuffled/multi-partition feed) must not change the outcome —
# the final table equals dict replay in SEQUENCE order
# ---------------------------------------------------------------------------

cdc_seq_batches_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 5),                      # key
            st.integers(0, 99),                     # value
            st.sampled_from(["I", "U", "D"]),       # op
        ),
        min_size=1,
        max_size=6,
    ).flatmap(
        lambda rows: st.permutations(
            [(k, v, op, seq) for seq, (k, v, op) in enumerate(rows)]
        )
    ),
    min_size=1,
    max_size=3,
)


@given(batches=cdc_seq_batches_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_apply_cdc_seq_col_order_independent(spark, tmp_path_factory, batches):
    """Model check: with seq_col, apply_cdc over batches whose rows arrive
    in ARBITRARY order (hypothesis permutes them) equals dict replay in
    sequence order — the correctness property a replayed / rebalanced /
    multi-partition change feed needs (arrival order is meaningless there;
    without seq_col the winner would follow the permutation)."""
    import shutil

    from pyspark.sql import Row

    from data_engineering_challenge_spark.streaming import incremental as st_inc

    d = tmp_path_factory.mktemp("cdc_seq")
    path = str(d / "table")
    model: dict[int, int] = {}
    try:
        for batch in batches:
            for k, v, op, _seq in sorted(batch, key=lambda r: r[3]):
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = v
            bdf = spark.createDataFrame(
                [Row(k=k, v=v, _op=op, seq=seq) for k, v, op, seq in batch]
            ).repartition(3)  # scatter arrival order across partitions
            st_inc.apply_cdc(bdf, path, ["k"], seq_col="seq")
            got = {
                r.k: r.v
                for r in st_inc.read_merged(spark, path).collect()
            }
            assert got == model, (batch, got, model)
    finally:
        shutil.rmtree(str(d), ignore_errors=True)


# ---------------------------------------------------------------------------
# analytics family: sweep-line and triangle count vs brute force
# ---------------------------------------------------------------------------

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),        # user_id
        st.integers(min_value=0, max_value=3 * 86_400_000_000),  # us offset, 3 days
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


@given(evs=_events_strategy)
@_settings
def test_peak_concurrency_matches_brute_force(spark, evs, tmp_path_factory):
    """The day-partitioned sweep equals the O(points x sessions) brute
    force: for every session start point, count sessions covering it,
    maxed per day.  (The max concurrency on a day is always attained at
    some interval's start — or the day boundary for spanning sessions —
    so probing starts + day starts is exhaustive.)"""
    from data_engineering_challenge_spark.queries_analytics import (
        peak_concurrency,
    )

    base = datetime(2024, 3, 1)
    rows = [
        (i + 1, uid, base + timedelta(microseconds=us), "view", 1.0, None)
        for i, (uid, us) in enumerate(sorted(set(evs)))
    ]
    tmp = tmp_path_factory.mktemp("sweep")
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts timestamp, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got = {
        r["day"]: r["peak_concurrent"]
        for r in peak_concurrency(spark, str(tmp)).collect()
    }

    # brute force: sessionize in python (30-min gap), then per day probe
    # candidate points (session starts + day starts)
    by_user: dict[int, list[int]] = {}
    for _, uid, ts, *_ in rows:
        by_user.setdefault(uid, []).append(
            int((ts - datetime(1970, 1, 1)).total_seconds() * 1e6)
        )
    sessions = []
    gap = 1_800_000_000
    for uid, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if t - prev > gap:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    day_us = 86_400_000_000
    expected: dict[str, int] = {}
    days = {ts // day_us for s, e in sessions for ts in (s, e)}
    for d in days:
        d_lo, d_hi = d * day_us, (d + 1) * day_us - 1
        probes = {s for s, e in sessions if d_lo <= s <= d_hi}
        probes.add(d_lo)
        best = 0
        for p in probes:
            live = sum(1 for s, e in sessions if s <= p <= e)
            best = max(best, live)
        # only days that intersect at least one session appear
        if any(s <= d_hi and e >= d_lo for s, e in sessions):
            day_str = (
                datetime(1970, 1, 1) + timedelta(microseconds=d * day_us)
            ).strftime("%Y-%m-%d")
            expected[day_str] = best
    assert got == expected


_orders_strategy = st.lists(
    st.lists(
        st.integers(min_value=1, max_value=8), min_size=2, max_size=4, unique=True
    ),
    min_size=1,
    max_size=6,
)


@given(orders=_orders_strategy)
@_settings
def test_triangles_match_brute_force(spark, orders, tmp_path_factory):
    """Degree-oriented counting equals brute-force enumeration over all
    id-ordered vertex triples, on random co-purchase graphs (≤8 nodes)."""
    from itertools import combinations

    from data_engineering_challenge_spark.queries_analytics import (
        copurchase_triangles,
    )

    rows = [
        (ok + 1, pk) for ok, parts in enumerate(orders) for pk in parts
    ]
    tmp = tmp_path_factory.mktemp("tri")
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    row = copurchase_triangles(spark, str(tmp), min_support=1).collect()[0]

    edges = set()
    for parts in orders:
        for a, b in combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    nodes = sorted({v for e in edges for v in e})
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri


# ---------------------------------------------------------------------------
# snapshot-diff CDC closure: apply_cdc(old, generate_cdc_feed(old,new)) == new
# ---------------------------------------------------------------------------

table_version_strategy = st.tuples(
    # old: key -> value; new: key -> value (arbitrary overlap/drift)
    st.dictionaries(st.integers(0, 12), st.integers(0, 9), max_size=10),
    st.dictionaries(st.integers(0, 12), st.integers(0, 9), max_size=10),
)


@given(versions=table_version_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_cdc_feed_closure_property(spark, tmp_path_factory, versions):
    """For ARBITRARY old/new table versions, the generated snapshot-diff
    feed applied to old yields new exactly (and an empty diff when the
    versions already agree)."""
    import shutil

    from data_engineering_challenge_spark import queries_scale as qsc
    from data_engineering_challenge_spark.streaming.incremental import apply_cdc

    old_d, new_d = versions
    old = spark.createDataFrame(
        [(k, v) for k, v in sorted(old_d.items())] or [(None, None)],
        "k bigint, v bigint",
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [(k, v) for k, v in sorted(new_d.items())] or [(None, None)],
        "k bigint, v bigint",
    ).filter(F.col("k").isNotNull())

    feed = qsc.generate_cdc_feed(old, new, ["k"])
    n_feed = feed.count()
    if old_d == new_d:
        assert n_feed == 0
        return
    tmp = tmp_path_factory.mktemp("cdc_closure")
    path = str(tmp / "tbl")
    old.write.parquet(path)
    if n_feed:
        apply_cdc(feed, path, ["k"])
    got = {
        (r.k, r.v) for r in spark.read.parquet(path).drop("_kb").collect()
    }
    assert got == set(new_d.items())
    shutil.rmtree(str(tmp), ignore_errors=True)


# ---------------------------------------------------------------------------
# merge-on-read vs copy-on-write vs dict replay: any I/U/D batch sequence
# must leave all three in exactly the same state
# ---------------------------------------------------------------------------


@given(batches=cdc_batches_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_mor_merge_matches_cow_and_dict_replay(spark, tmp_path_factory, batches):
    """Model check: `snapshot_mor_merge` (delete files at read) and
    `snapshot_merge_keys` (copy-on-write) applied batch-by-batch must
    both equal naive dict replay for EVERY feed hypothesis generates —
    including re-insert-after-delete, same-key churn within a batch
    (arrival order wins, matching the dict), and delete-of-absent-key."""
    import shutil

    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import snapshots as sn

    d = tmp_path_factory.mktemp("mor_prop")
    mor, cow = str(d / "mor"), str(d / "cow")
    model: dict[int, int] = {}
    try:
        for batch in batches:
            for k, v, op in batch:
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = v
            # seq = within-batch arrival index, so the engines' ordering
            # contract matches the dict's last-write-wins exactly even
            # after the repartition scatters physical arrival
            bdf = spark.createDataFrame(
                [
                    Row(k=k, v=v, _op=op, seq=i)
                    for i, (k, v, op) in enumerate(batch)
                ]
            ).repartition(3)
            sn.snapshot_mor_merge(spark, mor, bdf, ["k"], seq_col="seq")
            sn.snapshot_merge_keys(spark, cow, bdf, ["k"], seq_col="seq")
            got_mor = {
                r.k: r.v
                for r in sn.read_snapshot_mor(spark, mor)
                .select("k", "v")
                .collect()
            }
            got_cow = {
                r.k: r.v
                for r in sn.read_snapshot(spark, cow)
                .select("k", "v")
                .collect()
            }
            assert got_mor == got_cow == model, (batch, got_mor, got_cow, model)
    finally:
        shutil.rmtree(str(d), ignore_errors=True)


# --------------------------------------------------- MERGE INTO (r8)

# condition/expression pools: each entry is (SQL-for-Spark, python-twin)
_M_CONDS = [
    None,
    ("s.a % 2 = 0", lambda t, s: s["a"] % 2 == 0),
    ("t.v > 10", lambda t, s: t["v"] > 10),
]
_UPDATES = [
    ("s.a * 10", lambda t, s: s["a"] * 10),
    ("t.v + 1", lambda t, s: t["v"] + 1),
]
_B_CONDS = [
    None,
    ("t.v > 10", lambda t, s: t["v"] > 10),
    ("t.k % 2 = 0", lambda t, s: t["k"] % 2 == 0),
]
# by-source rows have NO source side: updates must reference t only
_B_UPDATES = [
    ("t.v + 1", lambda t, s: t["v"] + 1),
    ("t.v * 2", lambda t, s: t["v"] * 2),
]
_I_CONDS = [
    None,
    ("s.a % 2 = 0", lambda t, s: s["a"] % 2 == 0),
]

merge_case = st.fixed_dictionaries(
    {
        "target": st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 20)),
            min_size=1, max_size=10,
        ),
        "source": st.lists(
            st.tuples(st.integers(0, 8), st.integers(0, 20)),
            min_size=0, max_size=8, unique_by=lambda r: r[0],
        ),
        # ordered matched clauses: each slot (kind, cond_idx, upd_idx)
        "matched": st.lists(
            st.tuples(
                st.sampled_from(["update", "delete"]),
                st.integers(0, len(_M_CONDS) - 1),
                st.integers(0, len(_UPDATES) - 1),
            ),
            min_size=0, max_size=2,
        ),
        "by_src": st.lists(
            st.tuples(
                st.sampled_from(["update", "delete"]),
                st.integers(0, len(_B_CONDS) - 1),
                st.integers(0, len(_UPDATES) - 1),
            ),
            min_size=0, max_size=2,
        ),
        "insert": st.one_of(
            st.none(), st.integers(0, len(_I_CONDS) - 1)
        ),
    }
)


def _ref_merge(case) -> list[tuple]:
    """Pure-python MERGE reference: SQL semantics, first matched clause
    wins, unmatched-source inserts, by-source clauses on target-only
    rows (source keys are unique by construction)."""
    src = {k: {"k": k, "a": a} for k, a in case["source"]}
    out: list[tuple] = []
    for k, v in case["target"]:
        t = {"k": k, "v": v}
        s = src.get(k)
        clauses = case["matched"] if s is not None else case["by_src"]
        conds = _M_CONDS if s is not None else _B_CONDS
        upds = _UPDATES if s is not None else _B_UPDATES
        applied = False
        for kind, ci, ui in clauses:
            cond = conds[ci]
            if cond is None or cond[1](t, s):
                if kind == "update":
                    out.append((k, upds[ui][1](t, s)))
                applied = True
                break  # first clause wins ('delete' emits nothing)
        if not applied:
            out.append((k, v))
    if case["insert"] is not None:
        tkeys = {k for k, _ in case["target"]}
        cond = _I_CONDS[case["insert"]]
        for k, s in src.items():
            if k not in tkeys and (cond is None or cond[1](None, s)):
                out.append((k, s["a"]))
    return sorted(out)


@given(case=merge_case)
@_settings
def test_merge_into_matches_pure_python_reference(spark, tmp_path_factory, case):
    """Randomized clause matrices: `snapshot_merge_into` must equal the
    naive row-at-a-time SQL-semantics reference on every draw."""
    from data_engineering_challenge_spark.sources import snapshots as sn

    if not case["matched"] and case["insert"] is None and not case["by_src"]:
        return  # the operator refuses clause-less merges (tested elsewhere)
    root = str(tmp_path_factory.mktemp("mrg") / "tbl")
    tdf = spark.createDataFrame(case["target"], "k INT, v INT")
    sn.snapshot_overwrite(tdf.coalesce(1), root)
    sdf = spark.createDataFrame(
        case["source"] or [(None, None)], "k INT, a INT"
    )
    if not case["source"]:
        sdf = sdf.filter("k IS NOT NULL")  # typed empty frame
    sn.snapshot_merge_into(
        spark,
        root,
        sdf,
        on=["k"],
        when_matched=[
            ("update" if kind == "update" else "delete",
             None if _M_CONDS[ci] is None else _M_CONDS[ci][0],
             {"v": _UPDATES[ui][0]} if kind == "update" else None)
            for kind, ci, ui in case["matched"]
        ] or None,
        when_not_matched=(
            None
            if case["insert"] is None
            else (
                "insert",
                None
                if _I_CONDS[case["insert"]] is None
                else _I_CONDS[case["insert"]][0],
                {"k": "s.k", "v": "s.a"},
            )
        ),
        when_not_matched_by_source=[
            ("update" if kind == "update" else "delete",
             None if _B_CONDS[ci] is None else _B_CONDS[ci][0],
             {"v": _B_UPDATES[ui][0]} if kind == "update" else None)
            for kind, ci, ui in case["by_src"]
        ] or None,
    )
    got = sorted(
        (r.k, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
    )
    assert got == _ref_merge(case)


# ---------------------------------------------------------------------------
# materialized views: refresh == recompute under arbitrary DML (round 9)
# ---------------------------------------------------------------------------

mv_dml_strategy = st.lists(
    st.one_of(
        # insert a batch of (group, value) rows
        st.tuples(
            st.just("insert"),
            st.lists(
                st.tuples(st.integers(0, 3), st.integers(-50, 50)),
                min_size=1,
                max_size=6,
            ),
        ),
        # delete one group entirely (tests rowcount retraction to zero)
        st.tuples(st.just("delete_group"), st.integers(0, 3)),
        # shift every value in one group (update = delete+insert in CDF)
        st.tuples(st.just("update_group"), st.integers(0, 3)),
        # refresh mid-sequence (multi-hop deltas must compose)
        st.tuples(st.just("refresh"), st.just(None)),
    ),
    min_size=1,
    max_size=7,
)


@given(ops=mv_dml_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_mview_refresh_equals_recompute(spark, tmp_path_factory, ops):
    """Model check: after ANY sequence of inserts / group deletions /
    group-wide updates — with refreshes interleaved at arbitrary points
    so the CDF deltas span arbitrary hop ranges — one final
    `refresh_mview` makes the materialized view equal the from-scratch
    aggregate (counts and sums retract exactly; fully-retracted groups
    vanish).  This is the invariant that makes an incrementally
    maintained report trustworthy."""
    import shutil

    from data_engineering_challenge_spark.sources import catalog as cat
    from data_engineering_challenge_spark.sources import snapshots as sn
    from data_engineering_challenge_spark.sql_exec import execute_sql

    d = tmp_path_factory.mktemp("mv_prop")
    cdir = str(d / "catalog")
    try:
        execute_sql(
            spark,
            "CREATE TABLE t AS SELECT CAST(0 AS INT) AS g, "
            "CAST(1 AS BIGINT) AS v",
            cdir,
        )
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m AS SELECT g, COUNT(*) AS n, "
            "SUM(v) AS v FROM t GROUP BY g",
            cdir,
        )
        for op, arg in ops:
            if op == "insert":
                values = ", ".join(f"({g}, CAST({v} AS BIGINT))" for g, v in arg)
                execute_sql(spark, f"INSERT INTO t VALUES {values}", cdir)
            elif op == "delete_group":
                execute_sql(spark, f"DELETE FROM t WHERE g = {arg}", cdir)
            elif op == "update_group":
                execute_sql(
                    spark, f"UPDATE t SET v = v + 7 WHERE g = {arg}", cdir
                )
            else:
                cat.refresh_mview(spark, cdir, "m")
        cat.refresh_mview(spark, cdir, "m")
        got = sorted(
            tuple(r)
            for r in execute_sql(spark, "SELECT * FROM m", cdir).collect()
        )
        want = sorted(
            tuple(r)
            for r in execute_sql(
                spark,
                "SELECT g, COUNT(*) AS n, SUM(v) AS v FROM t GROUP BY g",
                cdir,
            ).collect()
        )
        assert got == want, (ops, got, want)
    finally:
        shutil.rmtree(str(d), ignore_errors=True)


# ---------------------------------------------------------------------------
# round 12: statement-level pruning is answer-preserving under random
# WHERE shapes (conjunctions, same-column disjunctions, ranges, INs)
# ---------------------------------------------------------------------------

_cmp_ops = st.sampled_from([">=", ">", "<=", "<", "="])


def _pred_strategy():
    # one atom on k (bigint, clustered), v (double), or s (string)
    k_atom = st.one_of(
        st.tuples(st.just("k"), _cmp_ops, st.integers(-5, 105)),
        st.builds(
            lambda a, b: ("k", "BETWEEN", (min(a, b), max(a, b))),
            st.integers(-5, 105), st.integers(-5, 105),
        ),
        st.builds(
            lambda vals: ("k", "IN", vals),
            st.lists(st.integers(-5, 105), min_size=1, max_size=4),
        ),
    )
    v_atom = st.tuples(
        st.just("v"), _cmp_ops,
        st.floats(-10, 60, allow_nan=False).map(lambda x: round(x, 2)),
    )
    s_atom = st.tuples(
        st.just("s"), _cmp_ops,
        st.integers(0, 105).map(lambda i: f"s{i:04d}"),
    )
    return st.one_of(k_atom, v_atom, s_atom)


def _atom_sql(a) -> str:
    col, op, val = a
    if op == "BETWEEN":
        return f"{col} BETWEEN {val[0]} AND {val[1]}"
    if op == "IN":
        return f"{col} IN ({', '.join(str(v) for v in val)})"
    v = f"'{val}'" if isinstance(val, str) else str(val)
    return f"{col} {op} {v}"


@pytest.fixture(scope="module")
def _prune_world(spark, tmp_path_factory):
    """One committed, clustered, stats+bloom-recorded table plus a
    PLAIN twin view — the oracle for every random statement."""
    from data_engineering_challenge_spark.sources import catalog as cat
    from data_engineering_challenge_spark.sources import snapshots as sn

    tmp = tmp_path_factory.mktemp("prune_world")
    root = str(tmp / "tbl")
    df = spark.sql(
        "SELECT id AS k, CAST(id AS DOUBLE) / 2 AS v, "
        "CONCAT('s', LPAD(CAST(id AS STRING), 4, '0')) AS s "
        "FROM RANGE(100)"
    )
    sn.snapshot_append_clustered(
        df, root, ["k"], n_files=6,
        stats_cols=["k", "v", "s"], bloom_cols=["s"],
    )
    cdir = str(tmp / "cat")
    cat.catalog_register(cdir, "pw", root)
    df.createOrReplaceTempView("pw_plain")
    return cdir


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    atoms=st.lists(_pred_strategy(), min_size=1, max_size=3),
    disjunct=st.booleans(),
    data=st.data(),
)
def test_pruned_statement_answers_match_plain(
    spark, _prune_world, atoms, disjunct, data
):
    """ANSWER-PRESERVATION property for the whole pruning/metadata
    stack (round 12): for random conjunctions, same-column
    disjunctions, ranges, INs and equalities — including shapes the
    claims machinery refuses — `execute_sql` over the catalog table
    equals plain `spark.sql` over an identical in-memory view.  The
    pruned attach, the OR→IN/envelope claims, and the metadata
    COUNT/MIN/MAX fast paths all ride this one invariant: pruning
    may only change which FILES open, never the rows."""
    from data_engineering_challenge_spark.sql_exec import execute_sql

    if disjunct:
        # same-column OR (the round-12 claims) — force one column so
        # the disjunction is claimable at least sometimes
        col = atoms[0][0]
        same = [a for a in atoms if a[0] == col] or atoms[:1]
        body = " OR ".join(_atom_sql(a) for a in same)
    else:
        body = " AND ".join(_atom_sql(a) for a in atoms)
    # round 14: a random IN-subquery conjunct — the masked span must
    # claim nothing while the OTHER conjuncts still claim; the answer
    # never moves either way
    if data.draw(st.booleans()):
        vals = data.draw(
            st.lists(st.integers(-5, 105), min_size=1, max_size=3)
        )
        rows = ", ".join(f"({v})" for v in vals)
        body = (
            f"({body}) AND k IN (SELECT x FROM VALUES {rows} AS t(x))"
        )
    sel = data.draw(
        st.sampled_from([
            "COUNT(*) AS n",
            "COUNT(*) AS n, MIN(k) AS lo, MAX(k) AS hi",
            # round 13: the hybrid SUM/AVG fold rides the same
            # invariant (interior sums fold, boundary scans, refusals
            # fall back — the answer never moves)
            "SUM(k) AS sk, AVG(k) AS ak, COUNT(*) AS n",
            "k, v, s",
        ])
    )
    got = execute_sql(
        spark, f"SELECT {sel} FROM pw WHERE {body}", _prune_world
    ).collect()
    want = spark.sql(
        f"SELECT {sel} FROM pw_plain WHERE {body}"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)), body
    # round 13: the TOP-K attach rides the same invariant — `k` is
    # unique in this world, so the LIMIT set is deterministic
    direction = data.draw(st.sampled_from(["ASC", "DESC"]))
    n = data.draw(st.integers(1, 40))
    tk = f"WHERE {body} ORDER BY k {direction} LIMIT {n}"
    got2 = execute_sql(
        spark, f"SELECT k, v FROM pw {tk}", _prune_world
    ).collect()
    want2 = spark.sql(f"SELECT k, v FROM pw_plain {tk}").collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, want2)), tk


# ---------------------------------------------------------------------------
# round 12: metadata fast paths over a PARTITIONED table preserve
# answers under random partition equality/IN/OR × range compositions
# ---------------------------------------------------------------------------


def _patom_sql(a) -> str:
    kind, payload = a
    if kind == "eq":
        return f"DAY(ts) = {payload}"
    if kind == "in":
        return f"DAY(ts) IN ({', '.join(str(v) for v in payload)})"
    if kind == "or":
        return " OR ".join(f"DAY(ts) = {v}" for v in payload)
    op, v = payload
    return f"k {op} {v}"


_patom = st.one_of(
    st.tuples(st.just("eq"), st.integers(0, 8)),
    st.tuples(
        st.just("in"),
        st.lists(st.integers(0, 8), min_size=1, max_size=3),
    ),
    st.tuples(
        st.just("or"),
        st.lists(st.integers(0, 8), min_size=2, max_size=3),
    ),
    st.tuples(
        st.just("rng"),
        st.tuples(
            st.sampled_from([">=", ">", "<=", "<"]),
            st.integers(-5, 305),
        ),
    ),
)


@pytest.fixture(scope="module")
def _partition_world(spark, tmp_path_factory):
    from data_engineering_challenge_spark.sql_exec import (
        execute_sql_script,
    )

    tmp = tmp_path_factory.mktemp("partition_world")
    cdir = str(tmp / "cat")
    execute_sql_script(
        spark,
        """
        CREATE TABLE pwp (k BIGINT, ts TIMESTAMP, v DOUBLE)
          PARTITIONED BY (DAY(ts) AS d) STATS BY (k);
        INSERT INTO pwp SELECT id, TIMESTAMP'2024-01-01 00:00:00'
          + MAKE_INTERVAL(0, 0, 0, CAST(id % 7 AS INT), 0, 0, 0),
          CAST(id AS DOUBLE) FROM RANGE(300);
        """,
        cdir,
    )
    spark.sql(
        "SELECT id AS k, TIMESTAMP'2024-01-01 00:00:00'"
        " + MAKE_INTERVAL(0, 0, 0, CAST(id % 7 AS INT), 0, 0, 0) AS ts,"
        " CAST(id AS DOUBLE) AS v FROM RANGE(300)"
    ).createOrReplaceTempView("pwp_plain")
    return cdir


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(atoms=st.lists(_patom, min_size=1, max_size=2), data=st.data())
def test_partition_metadata_answers_match_plain(
    spark, _partition_world, atoms, data
):
    """ANSWER-PRESERVATION for the partition metadata paths (round
    12): random day-transform equalities, IN lists, same-transform
    ORs, and k-ranges — alone and composed — through `execute_sql`
    (which may take the partition-count, hybrid-range, or pruned-scan
    route) must equal plain `spark.sql` over the same rows; so must
    the GROUP BY and DISTINCT manifest shapes."""
    from data_engineering_challenge_spark.sql_exec import execute_sql

    body = " AND ".join(
        f"({_patom_sql(a)})" if a[0] == "or" else _patom_sql(a)
        for a in atoms
    )
    sel = data.draw(
        st.sampled_from(
            [
                "COUNT(*) AS n",
                "COUNT(*) AS n, MIN(k) AS lo",
                "SUM(k) AS sk, AVG(k) AS ak",  # round-13 hybrid fold
                "k",
            ]
        )
    )
    got = execute_sql(
        spark, f"SELECT {sel} FROM pwp WHERE {body}", _partition_world
    ).collect()
    want = spark.sql(
        f"SELECT {sel} FROM pwp_plain WHERE {body}"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)), body
    # the manifest GROUP BY / DISTINCT shapes stay exact too
    shape = data.draw(
        st.sampled_from(
            [
                "SELECT DAY(ts) AS d, COUNT(*) AS n FROM {} "
                "GROUP BY DAY(ts)",
                "SELECT DISTINCT DAY(ts) AS d FROM {}",
                # round 13: the DISTINCT family
                "SELECT COUNT(DISTINCT DAY(ts)) AS nd FROM {}",
                "SELECT DISTINCT DAY(ts) AS d FROM {} ORDER BY d "
                "DESC LIMIT 3",
            ]
        )
    )
    got2 = execute_sql(
        spark, shape.format("pwp"), _partition_world
    ).collect()
    want2 = spark.sql(shape.format("pwp_plain")).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, want2))
    # round 13: the grouped HYBRID — the same random WHERE under a
    # partition GROUP BY with COUNT/SUM/MIN must also never move;
    # a random HAVING/ORDER/LIMIT tail rides the folded result
    tail = data.draw(
        st.sampled_from([
            "",
            " HAVING COUNT(*) >= 20",
            " ORDER BY d DESC",
            " HAVING SUM(k) > 1000 ORDER BY d LIMIT 3",
            " ORDER BY 1 LIMIT 2",
        ])
    )
    grouped = (
        "SELECT DAY(ts) AS d, COUNT(*) AS n, SUM(k) AS sk, "
        "MIN(k) AS lo FROM {} WHERE " + body + " GROUP BY DAY(ts)"
        + tail
    )
    got3 = execute_sql(
        spark, grouped.format("pwp"), _partition_world
    ).collect()
    want3 = spark.sql(grouped.format("pwp_plain")).collect()
    if tail and ("LIMIT" in tail or "ORDER" in tail):
        # group keys are unique: the ordered rows compare 1:1
        assert [tuple(r) for r in got3] == [
            tuple(r) for r in want3
        ], (body, tail)
    else:
        assert sorted(map(tuple, got3)) == sorted(
            map(tuple, want3)
        ), (body, tail)


# ---------------------------------------------------------------------------
# round 13: JOIN-SHAPE statement pruning is answer-preserving under
# random inner/LEFT/RIGHT/SEMI/ANTI statements with randomly placed
# conjuncts (qualified / unqualified / disjunctive), over a MoR table,
# optionally re-spelled through a CTE (VERDICT r12 'Next round #4')
# ---------------------------------------------------------------------------

_jatom_ops = st.sampled_from([">=", ">", "<=", "<", "="])


def _jatom_sql(qual, a) -> str:
    col, op, val = a
    name = f"{qual}.{col}" if qual else col
    if op == "BETWEEN":
        return f"{name} BETWEEN {val[0]} AND {val[1]}"
    if op == "OR2":
        (a1, b1), (a2, b2) = val
        return (
            f"({name} BETWEEN {a1} AND {b1} "
            f"OR {name} BETWEEN {a2} AND {b2})"
        )
    return f"{name} {op} {val}"


_fact_atom = st.one_of(
    st.tuples(st.just("k"), _jatom_ops, st.integers(-5, 205)),
    st.builds(
        lambda a, b: ("k", "BETWEEN", (min(a, b), max(a, b))),
        st.integers(-5, 205), st.integers(-5, 205),
    ),
    st.builds(
        lambda a, b, c, d: (
            "k", "OR2",
            ((min(a, b), max(a, b)), (min(c, d), max(c, d))),
        ),
        st.integers(-5, 205), st.integers(-5, 205),
        st.integers(-5, 205), st.integers(-5, 205),
    ),
    st.tuples(st.just("v"), _jatom_ops, st.integers(-5, 610)),
)
_dim_atom = st.tuples(st.just("w"), _jatom_ops, st.integers(-5, 120))

_join_shapes = st.sampled_from([
    ",", "JOIN", "INNER JOIN", "LEFT JOIN", "LEFT OUTER JOIN",
    "RIGHT JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN",
])


@pytest.fixture(scope="module")
def _join_world(spark, tmp_path_factory):
    """A clustered fact table WITH MoR DELETE FILES joined to a small
    dim, plus plain in-memory twins reflecting the post-delete rows —
    the oracle for every random join statement."""
    from data_engineering_challenge_spark.sql_exec import (
        execute_sql_script,
    )

    tmp = tmp_path_factory.mktemp("join_world")
    cdir = str(tmp / "cat")
    execute_sql_script(
        spark,
        """
        CREATE TABLE jf (k BIGINT, v BIGINT, g BIGINT)
            CLUSTERED BY (k) STATS BY (k, v);
        INSERT INTO jf SELECT id, id * 3, id % 10 FROM RANGE(200);
        DELETE FROM jf WHERE k >= 150 AND k < 170;
        CREATE TABLE jd (g BIGINT, w BIGINT) STATS BY (g);
        INSERT INTO jd SELECT id, id * 11 FROM RANGE(10);
        """,
        cdir,
    )
    spark.sql(
        "SELECT id AS k, id * 3 AS v, id % 10 AS g FROM RANGE(200) "
        "WHERE id < 150 OR id >= 170"
    ).createOrReplaceTempView("jf_plain")
    spark.sql(
        "SELECT id AS g, id * 11 AS w FROM RANGE(10)"
    ).createOrReplaceTempView("jd_plain")
    return cdir


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    shape=_join_shapes,
    fact_atoms=st.lists(_fact_atom, min_size=0, max_size=2),
    dim_atoms=st.lists(_dim_atom, min_size=0, max_size=1),
    fact_qual=st.sampled_from(["f", None]),
    use_cte=st.booleans(),
    data=st.data(),
)
def test_join_statement_pruning_answers_match_plain(
    spark, _join_world, shape, fact_atoms, dim_atoms, fact_qual,
    use_cte, data,
):
    """ANSWER-PRESERVATION for the join walker's prunable/invisible
    flags (round 13 — VERDICT r12 'Next round #4', insurance on the
    round-12 OUTER/SEMI/ANTI logic): random two-table statements over
    a MoR-carrying fact table — every join shape the walker
    understands, conjuncts spelled qualified, unqualified and as
    same-column disjunctions, optionally re-spelled through a CTE —
    must answer exactly like plain ``spark.sql`` over identical
    views.  Pruning may only change which FILES open."""
    from data_engineering_challenge_spark.sql_exec import execute_sql

    invisible = "SEMI" in shape or "ANTI" in shape
    if invisible:
        dim_atoms = []  # dim columns are invisible in the WHERE
    conjs = [_jatom_sql(fact_qual, a) for a in fact_atoms]
    conjs += [_jatom_sql("d", a) for a in dim_atoms]
    if shape == ",":
        join_clause = ", jd AS d"
        conjs = ["f.g = d.g"] + conjs
    else:
        join_clause = f" {shape} jd AS d ON f.g = d.g"
    if invisible:
        sel = "f.k AS k, f.v AS v"
    else:
        sel = data.draw(st.sampled_from([
            "f.k AS k, f.v AS v",
            "f.k AS k, d.w AS w",
            "COUNT(*) AS n",
        ]))
    where = (" WHERE " + " AND ".join(conjs)) if conjs else ""
    stmt = f"SELECT {sel} FROM jf AS f{join_clause}{where}"
    if use_cte:
        # the CTE unit path must make the same claims soundly
        stmt = f"WITH x AS ({stmt}) SELECT * FROM x"
    plain = stmt.replace("FROM jf AS f", "FROM jf_plain AS f").replace(
        " jd AS d", " jd_plain AS d"
    )
    got = execute_sql(spark, stmt, _join_world).collect()
    want = spark.sql(plain).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)), stmt
