"""GENERATED columns (`snapshot_set_generated` — Delta's GENERATED
ALWAYS AS): write-time derivation recomputed inside every data write
job, declared as inherited table metadata with the same write/commit
race guard as CHECK constraints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import catalog as cat
from data_engineering_challenge_spark.sources import snapshots as sn
from data_engineering_challenge_spark.sql_exec import execute_sql


@pytest.fixture()
def cdir(tmp_path):
    return str(tmp_path / "catalog")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, root):
    sn.snapshot_overwrite(
        spark.range(4).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("bigint").alias("v"),
            (F.col("id") * 2 + 1).cast("bigint").alias("v1"),
        ),
        root,
    )


def test_generated_always_recomputed(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bigint")
    # writer OMITS the column → it materializes
    sn.snapshot_append(
        spark.range(4, 6).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        root,
    )
    # writer provides WRONG values → GENERATED ALWAYS: recomputed
    sn.snapshot_append(
        spark.range(6, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit(999).cast("bigint").alias("v1"),
        ),
        root,
    )
    got = _rows(sn.read_snapshot(spark, root).select("k", "v", "v1"))
    assert got == [(i, 2 * i, 2 * i + 1) for i in range(8)]
    # UPDATE changes the source column — the derivation follows
    sn.snapshot_update_where(spark, root, "k = 0", {"v": "100"})
    r0 = sn.read_snapshot_mor(spark, root).filter("k = 0").collect()[0]
    assert (r0.v, r0.v1) == (100, 101)
    # DROP stops the derivation: a later write keeps provided values
    sn.snapshot_drop_generated(root, "v1")
    sn.snapshot_append(
        spark.range(8, 9).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit(999).cast("bigint").alias("v1"),
        ),
        root,
    )
    assert sn.read_snapshot_mor(spark, root).filter("k = 8").collect()[
        0
    ].v1 == 999


def test_generated_declaration_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    # existing rows must already satisfy the derivation
    with pytest.raises(ValueError, match="existing row violates"):
        sn.snapshot_set_generated(spark, root, "v1", "v + 2", "bigint")
    # the column must exist (declare-at-creation = CTAS computes it)
    with pytest.raises(ValueError, match="not in the table"):
        sn.snapshot_set_generated(spark, root, "nope", "v + 1", "bigint")
    with pytest.raises(ValueError, match="not a valid Spark DDL type"):
        sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bignt")
    sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bigint")
    with pytest.raises(ValueError, match="replace=True"):
        sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bigint")
    # evolution cannot break the derivation silently
    with pytest.raises(ValueError, match="GENERATED column"):
        sn.snapshot_evolve(root, renames={"v1": "w"})
    with pytest.raises(ValueError, match="referenced by generated"):
        sn.snapshot_evolve(root, drops=["v"])


def test_generated_composes_with_partitioning_and_checks(spark, tmp_path):
    """The derivation computes FIRST, so a partition transform and a
    CHECK constraint may both reference the derived column; compaction
    rewrites recompute idempotently."""
    root = str(tmp_path / "t")
    sn.snapshot_append_partitioned(
        spark.range(8).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("bigint").alias("bucket"),
        ),
        root,
        {"b": "bucket"},
    )
    sn.snapshot_set_generated(spark, root, "bucket", "k % 2", "bigint")
    sn.snapshot_set_check(spark, root, "b_ok", "bucket IN (0, 1)")
    # writer omits the generated column; the transform sees it computed
    sn.snapshot_append_partitioned(
        spark.range(8, 12).select(F.col("id").alias("k")),
        root,
        {"b": "bucket"},
    )
    got = _rows(sn.read_snapshot(spark, root).select("k", "bucket"))
    assert got == [(i, i % 2) for i in range(12)]
    pruned = sn.read_snapshot_pruned(
        spark, root, partition_eq={"b": "1"}
    )
    assert sorted(r.k for r in pruned.collect()) == [
        i for i in range(12) if i % 2 == 1
    ]
    sn.snapshot_compact(spark, root)
    assert _rows(
        sn.read_snapshot(spark, root).select("k", "bucket")
    ) == got


def test_generated_sql_surface_and_clone(spark, cdir):
    execute_sql(
        spark,
        "CREATE TABLE g AS SELECT id AS k, CAST(id * id AS BIGINT) AS sq "
        "FROM RANGE(3)",
        cdir,
    )
    execute_sql(
        spark,
        "ALTER TABLE g SET GENERATED COLUMN sq BIGINT AS (k * k)",
        cdir,
    )
    execute_sql(spark, "INSERT INTO g (k) SELECT 5", cdir)
    assert _rows(execute_sql(spark, "SELECT k, sq FROM g", cdir)) == [
        (0, 0), (1, 1), (2, 4), (5, 25),
    ]
    # the contract travels with a CLONE
    execute_sql(spark, "CREATE TABLE g2 CLONE g", cdir)
    execute_sql(spark, "INSERT INTO g2 (k) SELECT 6", cdir)
    assert (6, 36) in _rows(execute_sql(spark, "SELECT k, sq FROM g2", cdir))
    execute_sql(spark, "ALTER TABLE g DROP GENERATED COLUMN sq", cdir)
    root = cat.catalog_entries(cdir)["g"]["root"]
    assert sn._table_generated(root) == {}


def test_generated_on_evolved_table_binds_correctly(spark, tmp_path):
    """On a schema-evolved table, a generated column the writer OMITS
    must still read back with its computed values — the file binding
    records the files' ACTUAL columns (the chokepoint materialized it),
    not the caller's frame."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    sn.snapshot_evolve(root, renames={"k": "key"})  # table is now evolved
    sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bigint")
    sn.snapshot_append(
        spark.range(4, 6).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("v")
        ),
        root,
    )
    got = _rows(sn.read_snapshot(spark, root).select("key", "v", "v1"))
    assert got == [(i, 2 * i, 2 * i + 1) for i in range(6)], (
        "computed values must not read back as NULL through an "
        "incomplete field binding"
    )


def test_generated_declaration_type_and_chain_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    # declared type must equal the stored type (no schema splits)
    with pytest.raises(ValueError, match="stored type"):
        sn.snapshot_set_generated(spark, root, "v1", "v + 1", "int")
    sn.snapshot_set_generated(spark, root, "v1", "v + 1", "bigint")
    # no derivation chains (and no self-reference)
    with pytest.raises(ValueError, match="generated column"):
        sn.snapshot_set_generated(spark, root, "v", "v1 - 1", "bigint")
    with pytest.raises(ValueError, match="generated column"):
        sn.snapshot_set_generated(
            spark, root, "v1", "v1 + 0", "bigint", replace=True
        )


def test_copy_into_records_generated_policy_stats(spark, tmp_path):
    """COPY INTO inherits stats/bloom policy columns that are GENERATED
    even when the source files omit them — the chokepoint materializes
    the column, so the ingested files must carry its pruning claims."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    land = tmp_path / "landing"
    land.mkdir()
    sn.snapshot_append_clustered(
        spark.range(8).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("kk")
        ),
        root,
        ["kk"],
        n_files=1,
        stats_cols=["kk"],
    )
    sn.snapshot_set_generated(spark, root, "kk", "k + 100", "bigint")
    pq.write_table(
        pa.table({"k": list(range(8, 12))}), str(land / "a.parquet")
    )
    r = sn.snapshot_copy_into(spark, root, str(land / "*.parquet"))
    assert r["loaded"]
    m = sn._read_manifest(root, r["version"])
    new = sorted(set(m["files"]) - set(sn._read_manifest(root, 1)["files"]))
    assert new and all(
        m["stats"].get(f, {}).get("kk") for f in new if m["rows"][f] > 0
    ), "ingested files must carry pruning claims for the generated col"
    got = _rows(sn.read_snapshot(spark, root).select("k", "kk"))
    assert got == [(i, i + 100) for i in range(12)]
