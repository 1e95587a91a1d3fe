"""Persistent snapshot catalog (`sources/catalog.py`): durable
name → {root, pins} registry, atomic-claim create, early pin
validation, fresh-session re-attach — closing the reference's
tables-by-name ergonomic edge (db_operations.py:46-57)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import catalog as cat
from data_engineering_challenge_spark.sources import snapshots as sn


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_catalog_register_attach_and_pins(spark, tmp_path):
    cdir = str(tmp_path / "catalog")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)   # v0
    sn.snapshot_append(_df(spark, 10, 20).coalesce(1), root)  # v1
    sn.snapshot_create_tag(root, "audit", version=0)
    cat.catalog_register(cdir, "orders_live", root)
    cat.catalog_register(cdir, "orders_audit", root, ref="audit")
    cat.catalog_register(cdir, "orders_v0", root, version=0)
    # duplicate names claim loudly; replace is explicit
    with pytest.raises(ValueError, match="already exists"):
        cat.catalog_register(cdir, "orders_live", root)
    cat.catalog_register(
        cdir, "orders_live", root, replace=True, comment="repointed"
    )
    assert set(cat.catalog_entries(cdir)) == {
        "orders_live", "orders_audit", "orders_v0"
    }
    # a FRESH session re-attaches by name alone — the durable registry
    s2 = spark.newSession()
    pinned = cat.attach_catalog(s2, cdir)
    assert pinned == {"orders_live": 1, "orders_audit": 0, "orders_v0": 0}
    assert s2.sql("SELECT COUNT(*) n FROM orders_live").first().n == 20
    assert s2.sql("SELECT COUNT(*) n FROM orders_audit").first().n == 10
    # the original session never saw those views (temp views are
    # session-scoped; the catalog is what crosses sessions)
    assert "orders_live" not in [
        t.name for t in spark.catalog.listTables()
    ]
    # pins keep meaning across table growth; live view follows on
    # re-attach
    sn.snapshot_append(_df(spark, 20, 25).coalesce(1), root)  # v2
    pinned = cat.attach_catalog(s2, cdir, names=["orders_live"])
    assert pinned == {"orders_live": 2}
    assert s2.sql("SELECT COUNT(*) n FROM orders_live").first().n == 25
    assert s2.sql("SELECT COUNT(*) n FROM orders_v0").first().n == 10
    cat.catalog_drop(cdir, "orders_v0")
    assert "orders_v0" not in cat.catalog_entries(cdir)
    with pytest.raises(FileNotFoundError):
        cat.catalog_drop(cdir, "orders_v0")


def test_catalog_validates_early_and_namespaces(spark, tmp_path):
    cdir = str(tmp_path / "catalog")
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError, match="no committed"):
        cat.catalog_register(cdir, "ghost", str(tmp_path / "nope"))
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root)
    with pytest.raises(FileNotFoundError, match="version 9"):
        cat.catalog_register(cdir, "t", root, version=9)
    with pytest.raises(FileNotFoundError):
        cat.catalog_register(cdir, "t", root, ref="no-such-ref")
    with pytest.raises(ValueError, match="at most one"):
        cat.catalog_register(cdir, "t", root, version=0, ref="x")
    with pytest.raises(ValueError, match="invalid table name"):
        cat.catalog_register(cdir, "a/b", root)
    cat.catalog_register(cdir, "t", root)
    out = cat.attach_catalog(spark, cdir, prefix="prod_")
    assert out == {"t": 0}
    assert spark.sql("SELECT COUNT(*) n FROM prod_t").first().n == 5
    with pytest.raises(FileNotFoundError, match="not in the catalog"):
        cat.attach_catalog(spark, cdir, names=["missing"])


def test_catalog_ref_pin_follows_branch(spark, tmp_path):
    """A ref pin resolves at ATTACH time: a branch-pinned catalog entry
    follows the branch head — the audit-workflow composition."""
    cdir = str(tmp_path / "catalog")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)
    sn.snapshot_create_branch(root, "staging")
    cat.catalog_register(cdir, "t_staging", root, ref="staging")
    b1 = sn.snapshot_append_to_branch(
        _df(spark, 10, 30).coalesce(1), root, "staging"
    )
    pinned = cat.attach_catalog(spark, cdir)
    assert pinned == {"t_staging": b1}
    assert spark.sql("SELECT COUNT(*) n FROM t_staging").first().n == 30


def test_datasource_reads_through_catalog(spark, tmp_path):
    """The snapshot_table DataSource resolves catalog names on the
    reader surface: batch reads honor the recorded pin, streams refuse
    pinned entries and follow unpinned ones."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        register_snapshot_source,
    )
    from data_engineering_challenge_spark.streaming import incremental as st

    register_snapshot_source(spark)
    cdir = str(tmp_path / "catalog")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)   # v0
    sn.snapshot_create_tag(root, "audit", version=0)
    sn.snapshot_append(_df(spark, 10, 30).coalesce(1), root)  # v1
    cat.catalog_register(cdir, "t_live", root)
    cat.catalog_register(cdir, "t_audit", root, ref="audit")

    def read(name):
        return (
            spark.read.format("snapshot_table")
            .option("catalog", cdir)
            .option("table", name)
            .load()
        )

    assert read("t_live").count() == 30
    assert read("t_audit").count() == 10, "tag pin honored by the reader"
    with pytest.raises(Exception, match="not in the catalog"):
        read("ghost").count()
    with pytest.raises(Exception, match="root or catalog"):
        (
            spark.read.format("snapshot_table")
            .option("catalog", cdir)
            .option("table", "t_live")
            .option("root", root)
            .load()
            .count()
        )
    # streams: unpinned names stream; pinned names refuse loudly
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("snapshot_table")
        .option("catalog", cdir)
        .option("table", "t_live")
        .load()
    )
    st.run_available_now(stream, out, ckpt)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(30)
    )
    with pytest.raises(Exception, match="pinned"):
        s2 = (
            spark.readStream.format("snapshot_table")
            .option("catalog", cdir)
            .option("table", "t_audit")
            .load()
        )
        st.run_available_now(s2, str(tmp_path / "o2"), str(tmp_path / "c2"))


def test_datasource_pin_schema_and_override_refusal(spark, tmp_path):
    """r8 review pins: a catalog-pinned batch read derives its SCHEMA
    from the pinned version (no phantom columns from later appends; no
    head-manifest refusals leaking into the pin), and an explicit
    version option on a pinned name refuses loudly instead of silently
    overriding the pin."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    cdir = str(tmp_path / "catalog")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0: id, v
    cat.catalog_register(cdir, "t_v0", root, version=0)
    # the live head gains a column AFTER the pin
    wide = spark.range(10, 20).select(
        "id", (F.col("id") * 2).alias("v"), F.lit(1).alias("w")
    )
    sn.snapshot_append(wide.coalesce(1), root)  # v1: id, v, w

    def read(name):
        return (
            spark.read.format("snapshot_table")
            .option("catalog", cdir)
            .option("table", name)
            .load()
        )

    df = read("t_v0")
    assert df.columns == ["id", "v"], "pinned schema, no phantom w"
    assert df.count() == 10
    with pytest.raises(Exception, match="override the pin"):
        (
            spark.read.format("snapshot_table")
            .option("catalog", cdir)
            .option("table", "t_v0")
            .option("version", "1")
            .load()
            .count()
        )
    # an unpinned name still accepts an explicit version
    cat.catalog_register(cdir, "t_any", root)
    got = (
        spark.read.format("snapshot_table")
        .option("catalog", cdir)
        .option("table", "t_any")
        .option("version", "0")
        .load()
    )
    assert got.count() == 10
