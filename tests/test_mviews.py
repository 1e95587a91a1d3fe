"""Materialized views as CATALOG objects (`sources/catalog.py` +
`sql_exec.py`): the incrementally-maintainable aggregate shape
(GROUP BY + COUNT(*) + SUMs), CDF-driven refresh that retracts under
DML, rebuild across CDF-inexpressible hops, and the strict SQL grammar
that refuses non-retractable aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import catalog as cat
from data_engineering_challenge_spark.sources import snapshots as sn
from data_engineering_challenge_spark.sql_exec import (
    SqlSyntaxError,
    execute_sql,
)


@pytest.fixture()
def cdir(tmp_path):
    return str(tmp_path / "catalog")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_sales(spark, cdir):
    execute_sql(
        spark,
        "CREATE TABLE sales AS SELECT id % 3 AS region, id AS k, "
        "CAST(id AS BIGINT) * 10 AS amt FROM RANGE(12)",
        cdir,
    )


def test_mview_create_select_refresh(spark, cdir):
    _mk_sales(spark, cdir)
    v = execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW sales_by_region AS "
        "SELECT region, COUNT(*) AS n, SUM(amt) AS amt "
        "FROM sales GROUP BY region",
        cdir,
    )
    assert isinstance(v, int)
    expect = _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n, SUM(amt) AS amt "
            "FROM sales GROUP BY region",
            cdir,
        )
    )
    assert _rows(
        execute_sql(spark, "SELECT * FROM sales_by_region", cdir)
    ) == expect
    # stale until refreshed: new rows don't appear...
    execute_sql(
        spark, "INSERT INTO sales SELECT 0, 100, CAST(999 AS BIGINT)", cdir
    )
    assert _rows(
        execute_sql(spark, "SELECT * FROM sales_by_region", cdir)
    ) == expect
    # ...and REFRESH converges to the from-scratch aggregate
    execute_sql(spark, "REFRESH MATERIALIZED VIEW sales_by_region", cdir)
    assert _rows(
        execute_sql(spark, "SELECT * FROM sales_by_region", cdir)
    ) == _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n, SUM(amt) AS amt "
            "FROM sales GROUP BY region",
            cdir,
        )
    )


def test_mview_refresh_retracts_under_dml(spark, cdir):
    """DELETE and UPDATE flow through the change feed as retractions —
    the refreshed view equals the recompute, including a group that
    vanishes when its rowcount hits zero."""
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n, "
        "SUM(amt) AS amt FROM sales GROUP BY region",
        cdir,
    )
    execute_sql(spark, "DELETE FROM sales WHERE region = 2", cdir)
    execute_sql(
        spark, "UPDATE sales SET amt = amt + 5 WHERE region = 0", cdir
    )
    _, mode = cat.refresh_mview(spark, cdir, "mv")
    got = _rows(execute_sql(spark, "SELECT * FROM mv", cdir))
    want = _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n, SUM(amt) AS amt FROM sales "
            "GROUP BY region",
            cdir,
        )
    )
    assert got == want
    assert all(r[0] != 2 for r in got), "fully-retracted group vanishes"


def test_mview_rebuild_across_overwrite(spark, cdir):
    """An overwrite hop is not CDF-expressible — the refresh falls back
    to a full recompute (mode='rebuild') instead of failing or lying."""
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    execute_sql(
        spark,
        "INSERT OVERWRITE sales SELECT id % 2 AS region, id AS k, "
        "CAST(id AS BIGINT) AS amt FROM RANGE(6)",
        cdir,
    )
    _, mode = cat.refresh_mview(spark, cdir, "mv")
    assert mode == "rebuild"
    assert _rows(execute_sql(spark, "SELECT * FROM mv", cdir)) == _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n FROM sales GROUP BY region",
            cdir,
        )
    )
    # and a no-op refresh reports current
    _, mode = cat.refresh_mview(spark, cdir, "mv")
    assert mode == "current"


def test_mview_survives_fresh_session_attach(spark, cdir):
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    s2 = spark.newSession()
    out = cat.attach_catalog(s2, cdir)
    assert "mv" in out  # processed version reported
    assert s2.sql("SELECT COUNT(*) AS c FROM mv").collect()[0].c == 3


def test_mview_grammar_refusals(spark, cdir):
    _mk_sales(spark, cdir)
    with pytest.raises(SqlSyntaxError, match="COUNT\\(\\*\\) AS n is required"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m1 AS SELECT region, SUM(amt) AS amt "
            "FROM sales GROUP BY region",
            cdir,
        )
    with pytest.raises(SqlSyntaxError, match="cannot un-see"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m2 AS SELECT region, COUNT(*) AS n, "
            "MIN(amt) AS amt FROM sales GROUP BY region",
            cdir,
        )
    with pytest.raises(SqlSyntaxError, match="aliased AS n"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m3 AS SELECT region, COUNT(*) AS c "
            "FROM sales GROUP BY region",
            cdir,
        )
    with pytest.raises(SqlSyntaxError, match="must be exactly the GROUP BY"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m4 AS SELECT region, k, COUNT(*) AS n "
            "FROM sales GROUP BY region",
            cdir,
        )
    # a failed initial materialization leaves nothing registered
    with pytest.raises(Exception):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW m5 AS SELECT region, COUNT(*) AS n, "
            "SUM(nope) AS nope FROM sales GROUP BY region",
            cdir,
        )
    assert "m5" not in cat.catalog_entries(cdir)
    # none of the refused names leaked into the catalog
    assert set(cat.catalog_entries(cdir)) == {"sales"}


def test_mview_lifecycle_and_write_protection(spark, cdir):
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    # read-only on every DML surface
    with pytest.raises(ValueError, match="read-only"):
        execute_sql(spark, "INSERT INTO mv SELECT 1, 1", cdir)
    with pytest.raises(ValueError, match="read-only"):
        execute_sql(spark, "DELETE FROM mv", cdir)
    # DESCRIBE shows the definition and processed version
    d = execute_sql(spark, "DESCRIBE mv", cdir).collect()[0]
    assert d.kind == "mview" and d.source == "sales"
    assert d.processed_version == sn.current_version(
        cat.catalog_entries(cdir)["sales"]["root"]
    )
    # OR REPLACE invalidates the derived state and rebuilds
    execute_sql(
        spark,
        "CREATE OR REPLACE MATERIALIZED VIEW mv AS "
        "SELECT k, COUNT(*) AS n, SUM(amt) AS amt FROM sales GROUP BY k",
        cdir,
    )
    assert execute_sql(spark, "SELECT * FROM mv", cdir).columns == [
        "k", "n", "amt",
    ]
    # DROP removes the entry, the session view, and the derived data
    execute_sql(spark, "DROP MATERIALIZED VIEW mv", cdir)
    assert "mv" not in cat.catalog_entries(cdir)
    import os

    assert not os.path.exists(cat._mview_path(cdir, "mv"))


def test_view_over_mview_survives_fresh_session(spark, cdir):
    """A stored VIEW referencing an mview must attach in fresh sessions
    — mviews attach before plain views."""
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    execute_sql(
        spark, "CREATE VIEW mv_top AS SELECT * FROM mv WHERE n > 3", cdir
    )
    assert len(execute_sql(spark, "SELECT * FROM mv_top", cdir).collect()) == 3
    s2 = spark.newSession()
    cat.attach_catalog(s2, cdir)
    assert s2.sql("SELECT COUNT(*) AS c FROM mv_top").collect()[0].c == 3


def test_failed_replace_keeps_prior_mview(spark, cdir):
    """CREATE OR REPLACE with a typo'd column refuses at analysis,
    BEFORE the prior working view or its derived state is touched."""
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    before = _rows(execute_sql(spark, "SELECT * FROM mv", cdir))
    with pytest.raises(Exception, match="nope|UNRESOLVED|cannot be resolved"):
        execute_sql(
            spark,
            "CREATE OR REPLACE MATERIALIZED VIEW mv AS SELECT region, "
            "COUNT(*) AS n, SUM(nope) AS nope FROM sales GROUP BY region",
            cdir,
        )
    e = cat.catalog_entries(cdir)["mv"]
    assert e["sum_cols"] == [], "prior definition survives"
    assert _rows(execute_sql(spark, "SELECT * FROM mv", cdir)) == before
    s2 = spark.newSession()
    cat.attach_catalog(s2, cdir)
    assert sorted(tuple(r) for r in s2.sql("SELECT * FROM mv").collect()) == before


def test_mview_rebuilds_across_expired_history(spark, cdir):
    """History expiring between refreshes surfaces as a manifest
    FileNotFoundError — the refresh must fall back to the from-scratch
    recompute, not fail forever."""
    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n, "
        "SUM(amt) AS amt FROM sales GROUP BY region",
        cdir,
    )
    root = cat.catalog_entries(cdir)["sales"]["root"]
    for i in range(5):
        execute_sql(
            spark,
            f"INSERT INTO sales SELECT {i} % 3, {100 + i}, "
            f"CAST({i} AS BIGINT)",
            cdir,
        )
    sn.expire_versions(root, keep_last=2)
    _, mode = cat.refresh_mview(spark, cdir, "mv")
    assert mode == "rebuild"
    assert _rows(execute_sql(spark, "SELECT * FROM mv", cdir)) == _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n, SUM(amt) AS amt FROM sales "
            "GROUP BY region",
            cdir,
        )
    )


def test_replace_defers_destroying_prior_state(spark, cdir, tmp_path):
    """OR REPLACE must not destroy the prior materialized state before
    the new entry is claimed AND its first refresh succeeds: a refresh
    that dies mid-replace leaves the prior parquet recoverable on disk
    (``~prior``); a successful refresh retires it."""
    import os

    _mk_sales(spark, cdir)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS SELECT region, COUNT(*) AS n "
        "FROM sales GROUP BY region",
        cdir,
    )
    vp = cat._mview_path(cdir, "mv")
    assert os.path.isdir(vp)
    # register the replacement WITHOUT refreshing (the failure window):
    # the old state has been moved aside, not destroyed
    cat.catalog_register_mview(
        cdir, "mv", "sales", ["region"], ["amt"], replace=True
    )
    assert not os.path.isdir(vp)
    assert os.path.isdir(vp + "~prior"), "prior state must survive"
    # the successful first refresh of the new definition retires it
    cat.refresh_mview(spark, cdir, "mv")
    assert os.path.isdir(vp)
    assert not os.path.isdir(vp + "~prior")
    out = _rows(execute_sql(spark, "SELECT * FROM mv", cdir))
    assert out == _rows(
        execute_sql(
            spark,
            "SELECT region, COUNT(*) AS n, SUM(amt) AS amt "
            "FROM sales GROUP BY region",
            cdir,
        )
    )
