"""Edge semantics for the round-4 event-analytics and TPC-H-shape queries:
funnel ordering, SCD2 interval construction, and the Q21 aggregate rewrite
— each driven through the registered query on a constructed events fixture
(written as parquet so the query runs exactly as the driver runs it)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

import __spark_entry__ as entry


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=uid,
                event_type=et,
                value=1.0,
                props="{}",
            )
            for i, (uid, et, ts) in enumerate(rows)
        ]
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_counts_only_ordered_stages(spark, tmp_path):
    """A click BEFORE the first view must not count as view->click; a
    purchase before the first qualifying click must not complete the
    funnel; users without a view never enter the funnel at all."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    sf = _write_events(
        spark,
        tmp_path,
        [
            # u1: clean view -> click -> purchase (full funnel)
            (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
            # u2: click precedes the first view -> view only
            (2, "click", t(0)), (2, "view", t(1)), (2, "purchase", t(2)),
            # u3: ordered view -> click, but purchase came before the click
            (3, "view", t(0)), (3, "purchase", t(1)), (3, "click", t(2)),
            # u4: no view at all -> invisible to the funnel
            (4, "click", t(0)), (4, "purchase", t(1)),
        ],
    )
    row = entry.queries()["funnel_conversion"](spark, sf).collect()[0]
    assert row.n_view == 3            # u1, u2, u3
    assert row.n_view_then_click == 2  # u1, u3
    assert row.n_full_funnel == 1      # u1 only


def test_scd2_intervals_collapse_runs_and_close_on_change(spark, tmp_path):
    """Consecutive same-type events collapse into one interval; each
    interval's valid_to equals the NEXT change's valid_from; the current
    state stays open (NULL valid_to)."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "view", t(0)), (1, "view", t(1)),       # run collapses
            (1, "click", t(2)),                          # change
            (1, "view", t(3)),                           # back again: NEW row
            (2, "signup", t(0)),                         # single-state user
        ],
    )
    rows = entry.queries()["scd2_user_event_history"](spark, sf).collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.valid_from_us)):
        by_user.setdefault(r.user_id, []).append(
            (r.event_type, r.valid_from_us, r.valid_to_us)
        )
    us = lambda m: int(dt.datetime(2024, 1, 1, 0, m).timestamp() * 1e6)  # noqa: E731
    assert by_user[1] == [
        ("view", us(0), us(2)),   # the t(1) repeat did NOT open a row
        ("click", us(2), us(3)),
        ("view", us(3), None),    # current state open-ended
    ]
    assert by_user[2] == [("signup", us(0), None)]


def test_q21_sole_return_supplier_semantics(spark, tmp_path):
    """Q21 chain on a constructed lineitem: qualifies only when the order
    has ANOTHER supplier (EXISTS) and NO other supplier returned
    (NOT EXISTS); sole-supplier orders and two-returner orders drop."""
    li = spark.createDataFrame(
        [
            # order 1: supp 10 returned, supp 20 clean -> supp 10 qualifies
            Row(l_orderkey=1, l_suppkey=10, l_returnflag="R"),
            Row(l_orderkey=1, l_suppkey=20, l_returnflag="N"),
            # order 2: both suppliers returned -> nobody qualifies
            Row(l_orderkey=2, l_suppkey=10, l_returnflag="R"),
            Row(l_orderkey=2, l_suppkey=20, l_returnflag="R"),
            # order 3: single supplier returned -> no other supplier, drop
            Row(l_orderkey=3, l_suppkey=10, l_returnflag="R"),
            # order 4: supp 20 returned twice (two lines), supp 30 clean ->
            # supp 20 qualifies ONCE (distinct per order)
            Row(l_orderkey=4, l_suppkey=20, l_returnflag="R"),
            Row(l_orderkey=4, l_suppkey=20, l_returnflag="R"),
            Row(l_orderkey=4, l_suppkey=30, l_returnflag="N"),
        ]
    )
    sup = spark.createDataFrame(
        [Row(s_suppkey=k, s_name=f"S{k}") for k in (10, 20, 30)]
    )
    from pyspark.sql import functions as F

    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(ret_supp).alias("n_ret_supps"),
        F.min(ret_supp).alias("sole_ret_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1)
    )
    got = {
        (r.s_name, r.numwait)
        for r in qualifying.join(
            F.broadcast(sup), qualifying["sole_ret_supp"] == sup["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .collect()
    }
    assert got == {("S10", 1), ("S20", 1)}
