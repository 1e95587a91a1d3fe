"""Snapshot table as a STREAMING SOURCE — the Delta streaming-source
pattern composed from two proven pieces: the Python DataSource stream
API (`pyds.py` proves the offset lifecycle) and the snapshot format's
version lineage (`snapshots.read_snapshot_changes` proves the
file-delta rule).  ``spark.readStream.format("snapshot_table")
.option("root", dir).load()`` turns every committed APPEND into
micro-batch rows:

* OFFSETS ARE VERSIONS: ``{"version": N}``.  A new stream starts at -1
  (the whole current snapshot is the first batch — Delta's initial
  snapshot semantics); a checkpointed restart resumes from the recorded
  version, so a drained source replays NOTHING and a later commit is
  exactly the next batch's delta.
* PARTITION-PLANNED, ARROW-BATCHED: ``partitions(start, end)`` is the
  manifest file-set difference (one `InputPartition` per parquet file —
  the natural task grain; planning is metadata-only on the driver), and
  ``read`` runs on EXECUTORS yielding pyarrow RecordBatches — no
  row-at-a-time Python anywhere, which is what makes this the scale
  path rather than the `SimpleDataSourceStreamReader` prefetch-on-driver
  variant.
* LOUD WHERE SEMANTICS END (the `read_snapshot_changes` discipline,
  carried through): an overwrite between offsets means the delta is not
  append-only, and ANY delete-set change (a MoR merge/delete) removes
  or resurrects rows no added-file diff can express — both fail the
  batch instead of silently streaming wrong rows.  Schema evolution
  that RENAMES or DROPS columns (or adds one with an initial default)
  is refused at plan time — the raw file feed cannot relabel rows and
  a stream's schema is fixed at start; ADD-only evolution and plain
  additive appends ARE supported: each file is padded to the stream
  schema with NULL columns, exactly like a merge-schema batch read
  (`_trivially_bound`).

The batch side (``spark.read.format("snapshot_table")``) reads the
pinned latest version with the same per-file partitioning — one
registration serves both surfaces.

Reference parity: the reference has no streaming at all; this is the
CDC-consumer entry the Spark-native platform adds (SURVEY §2.9), and
the registry's `streaming_snapshot_source` query certifies it by
feeding the stream back into the exactly-once snapshot append sink and
hash-matching the round trip against the raw-events oracle.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import snapshots as sn


class _SnapshotFilePartition(InputPartition):
    """One parquet file to read.  In change-feed mode, ``change`` tags
    the event type ('insert' = a data file the commit added, full rows;
    'delete' = an equality-delete key list, key-only tombstones) and
    ``version`` the commit that produced it."""

    def __init__(
        self,
        path: str,
        change: str | None = None,
        version: int | None = None,
    ):
        self.path = path
        self.change = change
        self.version = version


#: change-feed metadata columns appended to the table schema
_CDF_COLS = ("_change_type", "_commit_version")


def _change_feed_on(options) -> bool:
    return str(options.get("change_feed", "")).lower() in ("true", "1")


def _ddl_atom(ddl: str):
    """A SCALAR Spark DDL type parsed WITHOUT a SparkContext (the
    DataSource's ``schema()`` runs in the planning worker, where
    `_parse_datatype_string` raises) — covers every type
    `snapshot_evolve` adds in practice; None for anything else."""
    import re as _re

    from pyspark.sql import types as T

    s = ddl.strip().lower()
    atoms = {
        "tinyint": T.ByteType(), "byte": T.ByteType(),
        "smallint": T.ShortType(), "short": T.ShortType(),
        "int": T.IntegerType(), "integer": T.IntegerType(),
        "bigint": T.LongType(), "long": T.LongType(),
        "float": T.FloatType(), "real": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
        "binary": T.BinaryType(),
        "decimal": T.DecimalType(10, 0),
    }
    if s in atoms:
        return atoms[s]
    m = _re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    return None


def _trivially_bound(m: dict) -> bool:
    """True when an evolved manifest's logical read IS the raw
    merge-schema read: every live file binds every physical column to
    a live field of the SAME name (no rename or drop touches any live
    file) and no field carries an initial default (a raw read would
    show NULL where the logical read projects the default).  ADD-only
    evolution — the common ``ALTER TABLE ADD COLUMN`` — satisfies
    this, so such tables stay streamable: missing columns pad as NULL,
    exactly the merge-schema batch rule."""
    fields = m.get("fields")
    if not fields:
        return True
    if any(f.get("default") is not None for f in fields):
        return False
    id_to_name = {f["id"]: f["name"] for f in fields}
    for mp in (m.get("file_fields") or {}).values():
        for phys, fid in mp.items():
            if id_to_name.get(fid) != phys:
                return False
    return True


def _refuse_unstreamable(m: dict, what: str) -> None:
    if m.get("fields") and not _trivially_bound(m):
        raise ValueError(
            f"{what}: the table evolved with renames/drops (or a "
            "defaulted add) — the raw file feed cannot relabel rows "
            "and the stream schema is fixed at start; compact first "
            "or read in batch (ADD-only evolution streams fine)"
        )


def _delkey(m: dict) -> set:
    return {(d["file"], d["seq"]) for d in m.get("delete_files") or []}


def _hops(
    root: str, from_v: int, to_v: int, include_from: bool = False
) -> list[tuple[int, list[str]]]:
    """Per-commit added files for ``(from_v, to_v]`` in ASCENDING
    version order — `_added_files` restated at hop grain, with the
    same loud failures, so a rate-limited stream can split a version's
    file set across micro-batches at a DETERMINISTIC boundary (each
    hop's adds are sorted; an offset's ``idx`` indexes that order).
    ``include_from`` extends the walk to cover ``from_v``'s own hop —
    the resume case where ``from_v`` was only partially consumed.
    Compaction hops contribute NO files (row-content-preserving, same
    rule `_added_files` applies)."""
    to_m = sn._read_manifest(root, to_v)
    _refuse_unstreamable(to_m, "snapshot_table stream")
    chain = [to_m]
    while chain[-1]["version"] != from_v:
        parent = chain[-1]["parent"]
        if parent is None or parent < from_v:
            raise ValueError(
                f"snapshot_table stream: v{from_v} is not an ancestor "
                f"of v{to_v} (rollback between offsets?)"
            )
        chain.append(sn._read_manifest(root, parent))
    if include_from:
        parent = chain[-1].get("parent")
        chain.append(
            sn._read_manifest(root, parent)
            if parent is not None
            else {"version": -1, "files": [], "delete_files": []}
        )
    chain.reverse()
    out: list[tuple[int, list[str]]] = []
    for pm, m in zip(chain, chain[1:]):
        v = int(m["version"])
        if m.get("operation") == "compact":
            sn._check_compact_hop(m, "snapshot_table stream")
            out.append((v, []))
            continue
        if not set(pm["files"]) <= set(m["files"]):
            raise ValueError(
                f"snapshot_table stream: v{v} overwrote "
                f"v{pm['version']} — the delta is not append-only; "
                "rebuild the consumer from a fresh checkpoint"
            )
        if _delkey(m) != _delkey(pm):
            raise ValueError(
                f"snapshot_table stream: v{v} changed the MoR "
                "delete-file set — the delta is not expressible as "
                "added rows; consume via diff of time-traveled MoR reads"
            )
        pf = set(pm["files"])
        out.append((v, sorted(f for f in m["files"] if f not in pf)))
    return out


def _added_files(root: str, from_v: int, to_v: int) -> list[str]:
    """Files ADDED between two versions of an append lineage — the
    `read_snapshot_changes` walk (same loud failures) restated over
    manifests only.  ``from_v=-1`` means 'before the first commit':
    the whole ``to_v`` snapshot, which then must carry no deletes."""
    to_m = sn._read_manifest(root, to_v)
    _refuse_unstreamable(to_m, "snapshot_table stream")
    if from_v < 0:
        if to_m.get("delete_files"):
            raise ValueError(
                "snapshot_table stream: the initial snapshot carries MoR "
                "delete files — an added-files stream would resurface "
                "deleted rows; snapshot_compact first"
            )
        return sorted(to_m["files"])
    # the hop walk carries all the loud failures (non-ancestor,
    # overwrite, delete-set change) and the compact-hop skip: major
    # compaction is row-content-preserving — it adds no rows, the
    # deletes it folds necessarily predate this stream's offset range,
    # and a file the compaction rewrote away is still read (immutable,
    # still referenced by its pre-compact manifest)
    return sorted(
        {f for _, adds in _hops(root, from_v, to_v) for f in adds}
    )


def _all_nullable(schema: StructType) -> StructType:
    """Every field nullable — the contract Spark's own file sources
    declare (a parquet footer's REQUIRED becomes nullable at the scan),
    and a necessity here: additive evolution pads old files with NULLs,
    so a footer-derived non-null field would NPE the downstream write."""
    from pyspark.sql.types import StructField

    return StructType(
        [
            StructField(f.name, f.dataType, True, f.metadata)
            for f in schema.fields
        ]
    )


def _arrow_schema_for(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(_all_nullable(schema))


def _read_file_batches(path: str, schema: StructType):
    """Executor-side read of one parquet file as RecordBatches padded
    and reordered to the stream schema (missing columns → NULL — the
    additive-evolution case; extra physical columns are projected
    away)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_schema_for(schema)
    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    cols = [n for n in target.names if n in have]
    for batch in pf.iter_batches(columns=cols):
        arrays = []
        for field in target:
            if field.name in have:
                arrays.append(
                    batch.column(field.name).cast(field.type)
                )
            else:
                arrays.append(pa.nulls(batch.num_rows, field.type))
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


class SnapshotTableDataSource(DataSource):
    """``spark.read[Stream].format("snapshot_table").option("root", dir)``
    — the snapshot table format on the reader surface.  Options:
    ``root`` (required unless resolved by name); ``version`` (batch:
    pin a version instead of _LATEST); ``start_version`` (stream: begin
    at this commit, INCLUSIVE — Delta's ``startingVersion`` — instead
    of the full initial snapshot; fresh checkpoints only, validated at
    stream start).

    STREAM admission control (Delta's maxFilesPerTrigger posture — a
    backfill over a large table must never plan one giant catch-up
    micro-batch): ``max_versions_per_batch`` caps commits per batch
    (the only limiter valid with ``change_feed``, which keeps one
    commit's events atomic); ``max_files_per_trigger`` /
    ``max_bytes_per_trigger`` cap FILE/BYTE grain, splitting even a
    single huge commit (or the initial snapshot) across batches at a
    deterministic sorted-file boundary.  Split offsets are
    SELF-DESCRIBING ({version, idx[, snap]}), so a WAL-replayed batch
    plans identically with no reliance on the options; byte caps admit
    at least one file per batch (progress guarantee), and file sizes
    come from the manifest's write-time ``sizes`` metadata — no
    filesystem stat per file at plan time.

    CATALOG resolution: ``option("catalog", dir).option("table", name)``
    resolves the root (and, for batch reads, the recorded pin) through
    the persistent catalog (`sources/catalog.py`) — tables by NAME on
    the reader surface, matching the SQL surface's `attach_catalog`.  A
    stream refuses a PINNED entry loudly (a stream follows the live
    lineage; a version/asof/ref pin names a fixed or diverging state)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _catalog_entry(self) -> dict | None:
        # memoized: schema()/reader()/streamReader() each need the entry
        # and must see ONE consistent resolution per load — and a
        # catalog of N tables must cost O(1) entry reads, not O(N)
        # directory scans per call
        cached = getattr(self, "_entry_cache", ...)
        if cached is not ...:
            return cached
        cdir = self.options.get("catalog")
        tbl = self.options.get("table")
        if cdir is None and tbl is None:
            self._entry_cache = None
            return None
        if cdir is None or tbl is None:
            raise ValueError(
                "snapshot_table: catalog and table options come together"
            )
        if self.options.get("root"):
            raise ValueError(
                "snapshot_table: pass either root or catalog/table, "
                "not both"
            )
        import json

        from .catalog import _entry_path

        try:
            with open(_entry_path(cdir, tbl)) as fh:
                e = json.load(fh)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"snapshot_table: {tbl!r} is not in the catalog at {cdir}"
            ) from None
        self._entry_cache = e
        return e

    def _root(self) -> str:
        e = self._catalog_entry()
        if e is not None:
            return e["root"]
        root = self.options.get("root")
        if not root:
            raise ValueError(
                "snapshot_table: option 'root' (or catalog/table) is "
                "required"
            )
        return root

    def _pinned_version(self) -> int | None:
        """ONE pin resolution shared by schema() and reader(): the
        explicit ``version`` option (refused alongside a pinned catalog
        entry — overriding an audit pin must be a deliberate re-read by
        root, never a leftover builder option), else the catalog
        entry's recorded pin resolved NOW (a ref follows its branch),
        else None (the live head)."""
        e = self._catalog_entry()
        v = self.options.get("version")
        pin_keys = ("version", "asof", "ref")
        pinned = e is not None and any(
            e.get(k) is not None for k in pin_keys
        )
        if v is not None:
            if pinned:
                raise ValueError(
                    f"snapshot_table: catalog entry {e['name']!r} is "
                    "pinned — an explicit version option would silently "
                    "override the pin; read by root to time-travel past "
                    "a pinned name"
                )
            return int(v)
        if not pinned:
            return None
        root = e["root"]
        if e.get("ref") is not None:
            return sn.resolve_ref(root, e["ref"])
        if e.get("asof") is not None:
            return sn.resolve_asof_version(root, float(e["asof"]))
        return int(e["version"])

    def schema(self) -> StructType:
        """Schema = the UNION of every file epoch's parquet footer
        (metadata only, one footer per file group directory — files
        written together share a schema), exactly what a merge-schema
        batch read would produce: a later NARROWER append cannot
        silently drop columns, and additive columns appear with their
        declared types.  Same-name/different-type conflicts fail loud.
        Explicit ``.schema(...)`` on the reader overrides."""
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow as pa
        import pyarrow.parquet as pq

        root = self._root()
        v = self._pinned_version()
        if v is None:
            v = sn.current_version(root)
        if v is None:
            raise FileNotFoundError(
                f"snapshot_table: no committed version at {root}"
            )
        m = sn._read_manifest(root, v)
        _refuse_unstreamable(m, "snapshot_table")
        if not m["files"]:
            raise ValueError(
                "snapshot_table: empty table — pass an explicit schema"
            )
        fields: dict[str, pa.Field] = {}
        seen_dirs: set[str] = set()
        for f in m["files"]:
            d = os.path.dirname(f)
            if d in seen_dirs:
                continue
            seen_dirs.add(d)
            for field in pq.read_schema(os.path.join(root, f)):
                prev = fields.get(field.name)
                if prev is None:
                    fields[field.name] = field
                elif prev.type != field.type:
                    raise ValueError(
                        f"snapshot_table: column {field.name!r} has "
                        f"conflicting types across file groups "
                        f"({prev.type} vs {field.type}) — pass an "
                        "explicit schema"
                    )
        base = _all_nullable(
            from_arrow_schema(pa.schema(list(fields.values())))
        )
        # an ADD-only evolved table may declare a typed column NO file
        # carries yet — the footer union cannot see it, but the stream
        # schema is FIXED at start: omitting it would project the
        # column away for the stream's whole lifetime once files do
        # carry it.  Append such adds as nullable declared types.
        lf = m.get("fields") or []
        have = {n.lower() for n in base.fieldNames()}
        missing = [
            fl for fl in lf
            if fl.get("type") and fl["name"].lower() not in have
        ]
        if missing:
            from pyspark.sql.types import StructField

            extra = []
            for fl in missing:
                dt = _ddl_atom(fl["type"])
                if dt is None:
                    # a complex declared type this context-free parser
                    # cannot resolve (schema() runs in the plan worker,
                    # no SparkContext): omit the column — the pre-fix
                    # posture, never a wrong type
                    continue
                extra.append(StructField(fl["name"], dt, True))
            base = StructType(list(base.fields) + extra)
        if not _change_feed_on(self.options):
            return base
        from pyspark.sql.types import LongType, StringType, StructField

        if set(_CDF_COLS) & set(base.fieldNames()):
            raise ValueError(
                "snapshot_table change_feed: table already has a "
                "_change_type/_commit_version column"
            )
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
            ]
        )

    def reader(self, schema: StructType) -> "SnapshotBatchReader":
        if _change_feed_on(self.options):
            raise ValueError(
                "snapshot_table: change_feed is a STREAM option — for a "
                "batch change feed use read_snapshot_cdf (full "
                "pre-image delete events, engine-merged)"
            )
        if str(self.options.get("pushdown", "")).lower() in ("true", "1"):
            raise ValueError(
                "snapshot_table: the 'pushdown' file-pruning reader "
                "was WITHDRAWN after measurement — Spark 4.1 keeps ONE "
                "Python-DataSource read plan per relation (the last "
                "scan planned wins for every scan), so per-scan file "
                "pruning silently LOSES ROWS whenever a relation is "
                "scanned twice (a UNION over one view, or reusing a "
                "DataFrame after a filtered query).  Use the SQL "
                "surface (execute_sql prunes single-table WHERE "
                "statements via read_snapshot_pruned) or call "
                "read_snapshot_pruned directly."
            )
        return SnapshotBatchReader(
            self._root(), schema, version=self._pinned_version()
        )

    def streamReader(self, schema: StructType) -> "SnapshotStreamReader":
        e = self._catalog_entry()
        if e is not None and any(
            e.get(k) is not None for k in ("version", "asof", "ref")
        ):
            raise ValueError(
                f"snapshot_table stream: catalog entry {e['name']!r} is "
                "pinned — a stream follows the live lineage; register "
                "an unpinned name or pass root directly"
            )
        sv = self.options.get("start_version")
        mvb = self.options.get("max_versions_per_batch")
        mft = self.options.get("max_files_per_trigger")
        mbt = self.options.get("max_bytes_per_trigger")
        return SnapshotStreamReader(
            self._root(),
            schema,
            start_version=int(sv) if sv is not None else None,
            change_feed=_change_feed_on(self.options),
            max_versions_per_batch=int(mvb) if mvb is not None else None,
            max_files_per_trigger=int(mft) if mft is not None else None,
            max_bytes_per_trigger=int(mbt) if mbt is not None else None,
        )


class SnapshotBatchReader(DataSourceReader):
    """Pinned-version batch scan: one partition per manifest file,
    arrow-batched.  Refuses MoR deletes (use `read_snapshot_mor` — the
    anti-join needs the engine, not a file scan).

    DELIBERATELY defines NO ``pushFilters``: per-scan file pruning is
    UNSOUND on Spark 4.1's Python DataSource — the engine keeps one
    read plan per RELATION (the last scan planned wins for every scan
    of it), so a pruned plan silently serves scans with different (or
    no) filters: a UNION over one view, or any reuse of a DataFrame
    after a filtered query, LOSES ROWS.  Measured and pinned in
    tests/test_snapshot_source.py (round 10; the round-8 pushdown
    reader was withdrawn for this).  File pruning lives where this
    engine controls the whole plan instead: `read_snapshot_pruned`,
    and the SQL executor's statement-level pruned attach."""

    def __init__(
        self,
        root: str,
        schema: StructType,
        version: int | None = None,
    ):
        self.root = root
        self.schema_ = schema
        self.version = (
            int(version) if version is not None else sn.current_version(root)
        )
        if self.version is None:
            raise FileNotFoundError(
                f"snapshot_table: no committed version at {root}"
            )
        m = sn._read_manifest(root, self.version)
        _refuse_unstreamable(m, "snapshot_table batch read")
        if m.get("delete_files"):
            raise ValueError(
                "snapshot_table batch read: version carries MoR delete "
                "files — use read_snapshot_mor or snapshot_compact first"
            )
        self.files = list(m["files"])

    def partitions(self):
        return [
            _SnapshotFilePartition(os.path.join(self.root, f))
            for f in self.files
        ] or [_SnapshotFilePartition("")]

    def read(self, partition: _SnapshotFilePartition):
        if not partition.path:
            return iter(())
        return _read_file_batches(partition.path, self.schema_)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        schema: StructType,
        start_version: int | None = None,
        change_feed: bool = False,
        max_versions_per_batch: int | None = None,
        max_files_per_trigger: int | None = None,
        max_bytes_per_trigger: int | None = None,
    ):
        if max_versions_per_batch is not None and max_versions_per_batch < 1:
            raise ValueError(
                "snapshot_table stream: max_versions_per_batch must be "
                f">= 1, got {max_versions_per_batch}"
            )
        if max_files_per_trigger is not None and max_files_per_trigger < 1:
            raise ValueError(
                "snapshot_table stream: max_files_per_trigger must be "
                f">= 1, got {max_files_per_trigger}"
            )
        if max_bytes_per_trigger is not None and max_bytes_per_trigger < 1:
            raise ValueError(
                "snapshot_table stream: max_bytes_per_trigger must be "
                f">= 1, got {max_bytes_per_trigger}"
            )
        if change_feed and (
            max_files_per_trigger is not None
            or max_bytes_per_trigger is not None
        ):
            raise ValueError(
                "snapshot_table change_feed: file/byte-grain rate limits "
                "would split one commit's events across micro-batches "
                "(a consumer could observe inserts without their "
                "tombstones) — use max_versions_per_batch, which keeps "
                "commits atomic"
            )
        self.root = root
        self.schema_ = schema
        self.start_version = start_version
        self.change_feed = change_feed
        self.max_versions = max_versions_per_batch
        self.max_files = max_files_per_trigger
        self.max_bytes = max_bytes_per_trigger
        # admission-control state (driver-resident for the run): the
        # last offset this reader planned/committed, so latestOffset can
        # cap a BACKFILL to max_versions commits / max_files / max_bytes
        # per micro-batch instead of planning one giant catch-up batch
        # (Delta's maxFilesPerTrigger posture).  Set by the engine's
        # restart protocol (commit of the checkpointed offset, or the
        # replayed batch's partitions() call) before any latestOffset;
        # on a FRESH stream latestOffset primes it via initialOffset.
        self._base_offset: dict | None = None
        self._sizes: dict | None = None  # per-file bytes, latest walk
        if change_feed:
            # the file-read schema is the TABLE schema; the two event
            # columns are appended as constants per partition — they
            # must be the LAST two fields (the layout schema() emits)
            # so the arrow array positions line up
            from pyspark.sql.types import StructType as _ST

            if [f.name for f in schema.fields[-2:]] != list(_CDF_COLS):
                raise ValueError(
                    "snapshot_table change_feed: the stream schema must "
                    f"end with {_CDF_COLS} (omit .schema() to use the "
                    "source's own)"
                )
            self.table_schema = _ST(list(schema.fields[:-2]))
        else:
            self.table_schema = schema

    def _initial_insert_partitions(
        self, e: int
    ) -> list[_SnapshotFilePartition]:
        """Change-feed initial snapshot: every current row as an
        'insert' event at version ``e`` — only event-expressible when
        nothing was ever deleted, with CDF-appropriate guidance
        otherwise (start past the delete-carrying history; the strict
        added-files walk would advise compaction, which is the
        plain-stream remedy, not this one)."""
        to_m = sn._read_manifest(self.root, e)
        if to_m.get("delete_files"):
            raise ValueError(
                "snapshot_table change_feed: the initial snapshot "
                "carries MoR delete files — set start_version to begin "
                "past the delete-carrying history (tombstones stream "
                "from later commits), or snapshot_compact first"
            )
        return [
            _SnapshotFilePartition(os.path.join(self.root, f), "insert", e)
            for f in _added_files(self.root, -1, e)
        ]

    def _cdf_hops(self, s: int, e: int) -> list[_SnapshotFilePartition]:
        """CHANGE-FEED partition plan for commits (s, e]: per hop, the
        added data files become 'insert' partitions (full rows) and the
        added EQUALITY-delete lists become 'delete' partitions —
        key-only tombstones, the Kafka-compacted-topic CDC shape: both
        are pure file reads, so the stream needs no engine join (full
        pre-image deletes are the batch `read_snapshot_cdf`'s job).
        Minor-compaction hops emit nothing; overwrite/restore hops,
        dropped delete files, position deletes and schema evolution
        fail loudly — none is expressible as file-grain events.

        ``s=-1`` replays the WHOLE history as events from an empty
        synthetic base (Delta's ``startingVersion=0``): commit 0's own
        files and delete lists are the first hop."""
        chain = [sn._read_manifest(self.root, e)]
        while chain[-1]["version"] != s:
            parent = chain[-1]["parent"]
            if parent is None and s == -1:
                chain.append(
                    {"version": -1, "files": [], "delete_files": []}
                )
                break
            if parent is None or parent < s:
                raise ValueError(
                    f"snapshot_table stream: v{s} is not an ancestor of "
                    f"v{e} (rollback between offsets?)"
                )
            chain.append(sn._read_manifest(self.root, parent))
        chain.reverse()
        out: list[_SnapshotFilePartition] = []
        for pm, m in zip(chain, chain[1:]):
            v = int(m["version"])
            _refuse_unstreamable(m, "snapshot_table change_feed")
            if m.get("operation") == "compact-deletes":
                if set(m["files"]) != set(pm["files"]):
                    raise ValueError(
                        f"snapshot_table change_feed: v{v} "
                        "compact-deletes commit changed the data file "
                        "set — inconsistent manifest"
                    )
                continue
            if m.get("operation") == "compact":
                # row-content-preserving: the folded deletes already
                # streamed as tombstones when their commits crossed this
                # feed — emit nothing, keep the consumer alive across
                # cron maintenance (the batch read_snapshot_cdf skips
                # the same hops)
                sn._check_compact_hop(m, "snapshot_table change_feed")
                continue
            if not set(pm["files"]) <= set(m["files"]):
                raise ValueError(
                    f"snapshot_table change_feed: v{v} overwrote "
                    f"v{pm['version']} — not expressible as events; "
                    "rebuild the consumer from a fresh checkpoint"
                )
            prev_dels = {d["file"] for d in pm.get("delete_files") or []}
            cur_dels = {d["file"]: d for d in m.get("delete_files") or []}
            if not prev_dels <= set(cur_dels):
                raise ValueError(
                    f"snapshot_table change_feed: v{v} dropped MoR "
                    "delete files — rows were resurrected; rebuild the "
                    "consumer from a fresh checkpoint"
                )
            for f, d in cur_dels.items():
                if f in prev_dels:
                    continue
                if d.get("kind") in ("position", "equality-multi"):
                    raise ValueError(
                        f"snapshot_table change_feed: v{v} added a "
                        f"{d['kind']} delete list — it carries no keys "
                        "to emit as tombstones; consume via the batch "
                        "read_snapshot_cdf"
                    )
                out.append(
                    _SnapshotFilePartition(
                        os.path.join(self.root, f), "delete", v
                    )
                )
            for f in sorted(set(m["files"]) - set(pm["files"])):
                out.append(
                    _SnapshotFilePartition(
                        os.path.join(self.root, f), "insert", v
                    )
                )
        return out

    def initialOffset(self) -> dict:
        # default -1 = 'before the first commit': the first batch is
        # the whole snapshot current at first trigger (Delta's
        # initial-snapshot rule), later batches are per-commit deltas.
        # ``start_version`` matches Delta's startingVersion, INCLUSIVE:
        # the first batch begins with version N's own rows.  Only
        # consulted on a fresh checkpoint — restarts resume from the
        # checkpointed offset (so this validation never re-runs against
        # since-expired history).
        if self.start_version is None:
            self._base_offset = {"version": -1}
            return {"version": -1}
        sv = int(self.start_version)
        if sv < 0:
            raise ValueError(
                f"snapshot_table stream: start_version={sv} is negative"
            )
        cur = sn.current_version(self.root)
        if cur is None:
            raise ValueError(
                f"snapshot_table stream: start_version={sv} but the "
                f"table at {self.root} has no commits"
            )
        if sv > cur + 1:
            # cur+1 is allowed (start from the NEXT commit — nothing
            # to replay yet); anything further is a typo'd version
            raise ValueError(
                f"snapshot_table stream: start_version={sv} is beyond "
                f"the table head v{cur}"
            )
        if sv <= cur:
            # fail fast with the stream's own errors (expired
            # manifest, non-ancestor/rollback, overwrite, MoR hop)
            # instead of a deep FileNotFoundError at first trigger
            try:
                if not self.change_feed:
                    _added_files(self.root, sv - 1, cur)
                else:
                    # sv=0 = full event replay from the empty base
                    self._cdf_hops(sv - 1, cur)
            except FileNotFoundError as exc:
                raise ValueError(
                    f"snapshot_table stream: start_version={sv} needs "
                    f"manifests back to v{sv - 1} for the delta diff, "
                    f"but one was expired ({exc})"
                ) from None
        self._base_offset = {"version": sv - 1}
        if sv == 0:
            # the flag makes the OFFSET self-describing: a WAL-replayed
            # (-1 → e) batch re-plans the same full event replay even
            # if the stream is restarted without the option
            return {"version": -1, "replay": True}
        return {"version": sv - 1}

    def _snap_files(self, w: int) -> list[str]:
        """The initial-snapshot file list at version ``w``, sorted (the
        deterministic order a split offset's ``idx`` indexes), with the
        same admission checks as an unsplit ``(-1, w]`` batch."""
        m = sn._read_manifest(self.root, w)
        _refuse_unstreamable(m, "snapshot_table stream")
        if m.get("delete_files"):
            raise ValueError(
                "snapshot_table stream: the initial snapshot carries MoR "
                "delete files — an added-files stream would resurface "
                "deleted rows; snapshot_compact first"
            )
        return sorted(m["files"])

    def _fsize(self, f: str) -> int:
        """Per-file bytes for byte-grain admission: the manifest's
        recorded size when present (write-time metadata — no fs call),
        else one `getsize` (legacy manifests only)."""
        sz = (self._sizes or {}).get(f)
        if sz is None:
            try:
                sz = os.path.getsize(os.path.join(self.root, f))
            except OSError:
                sz = 0
        return int(sz)

    def latestOffset(self) -> dict:
        v = sn.current_version(self.root)
        head = -1 if v is None else int(v)
        base = self._base_offset
        limited = self.max_files is not None or self.max_bytes is not None
        if head < 0:
            return {"version": head}
        if base is None:
            # The engine consults latestOffset BEFORE initialOffset on
            # a fresh stream (traced on Spark 4.1) — but on a RESTART it
            # re-commits the checkpointed offset to the source (or
            # replays the pending batch through partitions()) before any
            # latestOffset, so both set the baseline.  An unset baseline
            # therefore means FRESH: prime it with our own initial
            # offset so even the first batch — the initial-snapshot
            # backfill that needs admission control most — is capped.
            base = self.initialOffset()
        b_v = int(base["version"])
        cap_v = head
        if self.max_versions is not None:
            cap_v = min(head, b_v + self.max_versions)
        if not limited:
            return {"version": max(cap_v, b_v)}
        # file/byte-grain admission: walk candidate files in offset
        # order, admit until a limit trips (always >= 1 file per batch
        # so a backfill makes progress), emit either a complete-version
        # offset or a mid-version split {"version", "idx"[, "snap"]}
        n_f = 0
        n_b = 0

        def _full() -> bool:
            return (
                self.max_files is not None and n_f >= self.max_files
            ) or (self.max_bytes is not None and n_b >= self.max_bytes)

        if b_v < 0 or base.get("snap"):
            # initial snapshot — possibly mid-way at its pinned version;
            # a coexisting version cap still bounds WHICH version the
            # snapshot pins (same as the version-cap-only behavior)
            w = cap_v if b_v < 0 else b_v
            self._sizes = sn._read_manifest(self.root, w).get("sizes")
            snapf = self._snap_files(w)
            j = int(base.get("idx", 0)) if base.get("snap") else 0
            while j < len(snapf) and not _full():
                n_f += 1
                n_b += self._fsize(snapf[j])
                j += 1
            if j < len(snapf):
                return {"version": w, "idx": j, "snap": True}
            return {"version": w}
        if cap_v <= b_v and "idx" not in base:
            return {"version": b_v}  # nothing pending
        self._sizes = sn._read_manifest(self.root, max(cap_v, b_v)).get(
            "sizes"
        )
        hops = _hops(
            self.root, b_v, max(cap_v, b_v), include_from="idx" in base
        )
        done_v = b_v if "idx" not in base else None
        for u, adds in hops:
            j0 = int(base["idx"]) if ("idx" in base and u == b_v) else 0
            j = j0
            while j < len(adds) and not _full():
                n_f += 1
                n_b += self._fsize(adds[j])
                j += 1
            if j < len(adds):
                if j == j0:
                    # the limit tripped exactly at this hop's boundary —
                    # close the batch at the previous complete version
                    break
                return {"version": u, "idx": j}
            done_v = u
        if done_v is None:
            # only possible if base was mid-version and its hop had no
            # remaining files — normalize to the complete version
            done_v = b_v
        return {"version": done_v}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        self._base_offset = dict(end)  # the cap baseline for NEXT batch
        if self.change_feed:
            if e <= s:
                return []
            if s < 0:
                if start.get("replay"):
                    # start_version=0 = replay the WHOLE history as
                    # per-commit events (Delta's startingVersion=0);
                    # the flag rides in the checkpointed offset, so a
                    # WAL-replayed first batch plans identically even
                    # if the restart omitted the option
                    return self._cdf_hops(-1, e)
                return self._initial_insert_partitions(e)
            return self._cdf_hops(s, e)
        return [
            _SnapshotFilePartition(os.path.join(self.root, f))
            for f in self._plan_plain(start, end)
        ]

    def _plan_plain(self, start: dict, end: dict) -> list[str]:
        """File plan for a plain-stream batch between two offsets, both
        possibly MID-VERSION splits ({"version", "idx"[, "snap"]} —
        ``idx`` counts files already consumed of that version's sorted
        adds; ``snap`` marks an initial-snapshot split, where ``idx``
        indexes the snapshot's whole sorted file list).  Offsets are
        self-describing: a WAL-replayed batch re-plans identically with
        no reliance on reader options or driver state."""
        s, e = int(start["version"]), int(end["version"])
        s_idx = int(start["idx"]) if "idx" in start else None
        e_idx = int(end["idx"]) if "idx" in end else None

        def _key(off: dict) -> tuple:
            # total order over offsets: splits of a version precede its
            # complete offset ({v, idx:k} < {v}); versions order first
            return (
                int(off["version"]),
                int(off["idx"]) if "idx" in off else float("inf"),
            )

        if _key(end) < _key(start):
            # a capped latestOffset must never land behind the engine's
            # committed point (the baseline is primed by the restart
            # protocol); if that invariant ever breaks, planning this
            # batch would REPLAY consumed files — fail loud instead
            raise ValueError(
                f"snapshot_table stream: batch end offset {end} is "
                f"behind start {start} — baseline/engine inconsistency; "
                "restart the stream from its checkpoint"
            )
        if start.get("snap"):
            # resuming a split initial snapshot pinned at version s
            w = s
            snapf = self._snap_files(w)
            k = s_idx or 0
            if end.get("snap"):
                if e != w:
                    raise ValueError(
                        "snapshot_table stream: inconsistent "
                        f"snapshot-split offsets {start} -> {end}"
                    )
                return snapf[k:e_idx]
            # end is past the snapshot: its remainder PLUS the delta
            # hops (w, e] — an unlimited reader resuming a capped
            # checkpoint must not drop post-snapshot commits
            if e == w and e_idx is not None:
                raise ValueError(
                    "snapshot_table stream: inconsistent snapshot-split "
                    f"offsets {start} -> {end}"
                )
            files = snapf[k:]
            if e > w:
                for u, adds in _hops(self.root, w, e):
                    j = e_idx if (e_idx is not None and u == e) else len(
                        adds
                    )
                    files.extend(adds[:j])
            return files
        if end.get("snap"):
            if s != -1:
                raise ValueError(
                    f"snapshot_table stream: inconsistent snapshot-split "
                    f"offsets {start} -> {end}"
                )
            return self._snap_files(e)[:e_idx]
        if e <= s and not (s_idx is not None or e_idx is not None):
            return []
        if s < 0:
            if e_idx is not None:
                raise ValueError(
                    f"snapshot_table stream: inconsistent offsets "
                    f"{start} -> {end} (mid-version end on an initial "
                    "batch must carry the snap flag)"
                )
            return _added_files(self.root, s, e)
        files: list[str] = []
        for u, adds in _hops(
            self.root, s, e, include_from=s_idx is not None
        ):
            k = s_idx if (s_idx is not None and u == s) else 0
            j = e_idx if (e_idx is not None and u == e) else len(adds)
            files.extend(adds[k:j])
        return files

    def read(self, partition: _SnapshotFilePartition):
        batches = _read_file_batches(partition.path, self.table_schema)
        if not self.change_feed:
            return batches

        def _with_events():
            import pyarrow as pa

            target = _arrow_schema_for(self.schema_)
            for batch in batches:
                n = batch.num_rows
                arrays = list(batch.columns) + [
                    pa.array([partition.change] * n, pa.string()),
                    pa.array([partition.version] * n, pa.int64()),
                ]
                yield pa.RecordBatch.from_arrays(arrays, schema=target)

        return _with_events()

    def commit(self, end: dict) -> None:
        # offsets are durable manifests — nothing to clean up; keep the
        # admission-control baseline in step with the engine
        self._base_offset = dict(end)

    def stop(self) -> None:
        pass


def register_snapshot_source(spark) -> None:
    """Idempotent registration of the ``snapshot_table`` format.

    Cached per (session, class) via the shared `pyds._register_once`
    memo (r15): ``spark.dataSource.register`` is a py4j round trip +
    worker-side pickling costing ~0.5 s per call, and every streaming/
    replication composition called it — a long-lived session
    re-registering the SAME class each time paid it dozens of times per
    registry sweep.  Weak on the session so restarts re-register; a
    DIFFERENT class under the same name still reaches Spark."""
    from .pyds import _register_once

    _register_once(spark, SnapshotTableDataSource)


def replicate_snapshot_table(
    spark,
    src_root: str,
    dst_root: str,
    keys: list[str],
    checkpoint_dir: str,
    start_version: int | None = None,
) -> None:
    """TABLE REPLICATION through the streamed change feed — the
    capstone composition: the source's ``change_feed`` stream drains
    into per-epoch `snapshot_mor_merge` commits on the mirror, so the
    mirror is itself a first-class snapshot table (time-travelable,
    CDF-consumable, compactable) that converges to the source's merged
    state after every run.

    Event mapping per micro-batch: a key-only delete TOMBSTONE becomes
    a ``D`` op, an insert event an ``I`` op; within one source commit
    an upsert's tombstone+insert pair carries the same
    ``_commit_version``, so the replay sequence is ``2*version + 1``
    for inserts — the insert WINS the key deterministically (arrival
    order inside a shuffled batch is not a contract).  Exactly-once:
    each epoch commits under a txn tag scoped by the checkpoint
    location, so a replayed batch after a crash is a no-op
    (`snapshot_mor_merge`'s replay-idempotence), and checkpointed
    restarts consume only new source commits.

    ``start_version`` bootstraps like the source option (omit it only
    for tables whose history carries no deletes).  Blocks until the
    pending feed is drained (availableNow)."""
    import hashlib

    from pyspark.sql import functions as F

    register_snapshot_source(spark)
    scope = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]
    reader = (
        spark.readStream.format("snapshot_table")
        .option("root", src_root)
        .option("change_feed", "true")
    )
    if start_version is not None:
        reader = reader.option("start_version", str(start_version))

    def apply_batch(batch, batch_id: int) -> None:
        import uuid as _uuid

        # uuid-suffixed internals: a source column named _op or
        # _replay_seq must never be clobbered (read_snapshot_mor's
        # convention)
        sfx = _uuid.uuid4().hex[:8]
        op_c, seq_c = f"_op_{sfx}", f"_replay_seq_{sfx}"
        is_del = F.col("_change_type") == "delete"
        mapped = batch.select(
            *[c for c in batch.columns if c not in _CDF_COLS],
            F.when(is_del, F.lit("D")).otherwise(F.lit("I")).alias(op_c),
            (
                F.col("_commit_version") * 2
                + F.when(is_del, F.lit(0)).otherwise(F.lit(1))
            ).alias(seq_c),
        )
        # a source with DUPLICATE live rows per key cannot be mirrored
        # through keyed merges — the reduction would keep an arbitrary
        # row and silently lose the rest; fail loudly instead
        dup = (
            mapped.groupBy(*keys, seq_c)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "replicate_snapshot_table: the source has multiple rows "
                f"for one key within a commit (keys={keys}) — keyed "
                "replication requires key-unique sources"
            )
        sn.snapshot_mor_merge(
            spark,
            dst_root,
            mapped,
            keys,
            op_col=op_c,
            seq_col=seq_c,
            drop_seq_col=True,
            tag=f"cdfrepl-{scope}-epoch-{batch_id}",
        )

    q = (
        reader.load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
