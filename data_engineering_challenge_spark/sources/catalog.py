"""Persistent snapshot CATALOG — durable ``name → {root, pins}``
registry so SQL users resolve snapshot tables BY NAME across sessions
(the one ergonomic edge the reference kept: its tables live by name in
one SQLite file, db_operations.py:46-57; here the catalog is a directory
of per-table JSON entries over the snapshot format).

Design, matching the format's own discipline:

* one ENTRY FILE per table name (``<catalog>/<name>.json``) — creation
  is an atomic ``os.link`` claim (EEXIST instead of clobber), so two
  concurrent ``CREATE TABLE`` of the same name race loudly, never
  silently overwrite each other;
* an entry records the table ROOT plus an optional reproducibility PIN
  (``version`` / ``asof`` / ``ref`` — the attach-time semantics of
  `snapshots.attach_snapshot_view`), so "the June audit table" is a
  catalog name, not a root path plus a version number carried
  out-of-band;
* `attach_catalog` re-registers every entry as a temp view in a fresh
  session — the durable counterpart of the session-scoped
  `attach_snapshot_views`;
* replacing an entry is an explicit administrative act
  (``replace=True``, ``os.replace`` — last-writer-wins, documented) and
  `catalog_drop` removes the name; neither touches table data.

At 100 TB the catalog is pure metadata: O(tables) tiny JSON files, read
once per attach — table scans still plan through each table's own
manifests."""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession

from . import snapshots as sn


def _entry_path(catalog_dir: str, name: str) -> str:
    return os.path.join(catalog_dir, f"{name}.json")


def _check_name(fn: str, name: str) -> None:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"{fn}: invalid table name {name!r}")


def catalog_register(
    catalog_dir: str,
    name: str,
    root: str,
    version: int | None = None,
    asof: float | None = None,
    ref: str | None = None,
    replace: bool = False,
    comment: str | None = None,
) -> dict:
    """Register ``name`` → ``root`` (plus at most one pin) in the
    catalog.  Validates EARLY: the root must already be a committed
    snapshot table and an explicit pin must resolve — a catalog entry
    that cannot attach is a lie someone discovers at 2am.  Creation is
    an atomic claim; pass ``replace=True`` to administratively repoint
    an existing name (pins change, the name's meaning is versioned by
    the entry's ``ts``).  Returns the entry dict."""
    _check_name("catalog_register", name)
    if sum(x is not None for x in (version, asof, ref)) > 1:
        raise ValueError(
            "catalog_register: pass at most one of version/asof/ref"
        )
    cur = sn.current_version(root)
    if cur is None:
        raise FileNotFoundError(
            f"catalog_register: {root} has no committed snapshot version"
        )
    # resolve the pin NOW so a bad pin fails at registration, loudly —
    # the entry still stores the SYMBOLIC pin (a ref follows its branch;
    # asof re-resolves against the live lineage at attach)
    if ref is not None:
        sn.resolve_ref(root, ref)
    elif asof is not None:
        sn.resolve_asof_version(root, asof)
    elif version is not None and not os.path.exists(
        sn._manifest_path(root, version)
    ):
        raise FileNotFoundError(
            f"catalog_register: version {version} does not exist at {root}"
        )
    entry = {
        "name": name,
        "root": os.path.abspath(root),
        "version": version,
        "asof": asof,
        "ref": ref,
        "comment": comment,
        "ts": time.time(),
    }
    return _claim_entry(catalog_dir, name, entry, replace, "catalog_register")


def _claim_entry(
    catalog_dir: str, name: str, entry: dict, replace: bool, fn: str
) -> dict:
    """The shared entry-write tail: atomic ``os.link`` claim (EEXIST on
    collision, loud), or explicit administrative ``os.replace`` —
    last-writer-wins, documented."""
    os.makedirs(catalog_dir, exist_ok=True)
    path = _entry_path(catalog_dir, name)
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    if replace:
        os.replace(tmp, path)  # administrative last-writer-wins
        return entry
    try:
        os.link(tmp, path)  # atomic claim: EEXIST on collision
    except FileExistsError:
        raise ValueError(
            f"{fn}: name {name!r} already exists — pass replace=True to "
            "redefine it, or catalog_drop first"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
    return entry


def catalog_register_view(
    catalog_dir: str,
    name: str,
    sql: str,
    replace: bool = False,
    comment: str | None = None,
) -> dict:
    """Register a persistent VIEW: ``name`` → a SQL text re-analyzed at
    every attach (standard view semantics — the definition is durable,
    the data is whatever the referenced tables hold at query time).
    The text may reference catalog TABLE names and previously-created
    views; `attach_catalog` attaches tables first, then views in
    creation order, so a view over a view works as long as it was
    created after its dependency (a forward reference fails loudly at
    attach, exactly like a dropped dependency would).  Same atomic-claim
    discipline as table entries.

    REPLACING a view keeps the ORIGINAL creation ``ts``: attach order is
    creation order, so a redefinition must not re-sequence the view
    after its dependents (that would silently feed them a stale
    definition in-session and break their attach in fresh sessions).
    A replace may therefore never reference views created after the
    original — that forward reference fails loudly at attach, same as
    any other."""
    _check_name("catalog_register_view", name)
    if not sql or not sql.strip():
        raise ValueError("catalog_register_view: empty view SQL")
    ts = time.time()
    if replace:
        prior = catalog_entries(catalog_dir).get(name)
        if prior is not None and prior.get("kind") == "view":
            ts = prior.get("ts") or ts  # keep the creation-order slot
    entry = {
        "name": name,
        "kind": "view",
        "sql": sql,
        "comment": comment,
        "ts": ts,
    }
    return _claim_entry(
        catalog_dir, name, entry, replace, "catalog_register_view"
    )


def catalog_drop(catalog_dir: str, name: str) -> None:
    """Remove a name from the catalog (table data untouched)."""
    _check_name("catalog_drop", name)
    try:
        os.remove(_entry_path(catalog_dir, name))
    except FileNotFoundError:
        raise FileNotFoundError(f"catalog_drop: no table {name!r}") from None


def catalog_entries(catalog_dir: str) -> dict[str, dict]:
    """Every registered table: ``{name: entry}`` (one directory pass;
    entries deleted mid-scan are skipped)."""
    try:
        names = os.listdir(catalog_dir)
    except FileNotFoundError:
        return {}
    out: dict[str, dict] = {}
    for n in sorted(names):
        if not n.endswith(".json") or ".tmp." in n:
            continue
        try:
            with open(os.path.join(catalog_dir, n)) as fh:
                e = json.load(fh)
        except FileNotFoundError:
            continue  # dropped between listdir and read
        out[e["name"]] = e
    return out


def attach_catalog(
    spark: SparkSession,
    catalog_dir: str,
    names: list[str] | None = None,
    prefix: str = "",
) -> dict[str, int]:
    """Attach every catalog table (or the given ``names``) as temp
    views — the fresh-session entry point: a SQL user calls this once
    and queries tables by their DURABLE names; pins recorded in the
    catalog apply exactly as at `attach_snapshot_view` (a ``ref`` pin
    follows its branch head, ``asof``/``version`` pins stay fixed).
    ``prefix`` namespaces the views (e.g. ``"prod_"``).  Returns the
    pinned version per attached TABLE name (persistent views attach too
    but carry no version — they re-analyze at attach over whatever the
    tables resolve to, standard view semantics)."""
    entries = catalog_entries(catalog_dir)
    if names is not None:
        missing = [n for n in names if n not in entries]
        if missing:
            raise FileNotFoundError(
                f"attach_catalog: not in the catalog: {missing}"
            )
        keep = set(names)
    else:
        keep = None
    out: dict[str, int] = {}
    views = [e for e in entries.values() if e.get("kind") == "view"]
    view_asked = keep is not None and any(
        e["name"] in keep for e in views
    )
    if keep is not None:
        # narrowing: attach a view only if requested, plus every
        # EARLIER-created view (the dependency contract — see
        # `catalog_register_view`); no view requested → none attached
        if view_asked:
            cutoff = max(
                e.get("ts") or 0 for e in views if e["name"] in keep
            )
            views = [e for e in views if (e.get("ts") or 0) <= cutoff]
        else:
            views = []
    for name, e in entries.items():
        if e.get("kind") in ("view", "mview"):
            continue
        # narrowed attach touches only the requested tables — UNLESS a
        # view was requested: a view body may reference any table, so
        # that case attaches them all (an unrelated broken entry then
        # fails loudly, the price of unknown dependencies)
        if keep is not None and not view_asked and name not in keep:
            continue
        v = sn.attach_snapshot_view(
            spark,
            prefix + name,
            e["root"],
            version=e.get("version"),
            asof=e.get("asof"),
            ref=e.get("ref"),
        )
        if keep is None or name in keep:
            out[name] = v
    # materialized views BEFORE plain views: they read their own
    # materialized parquet (no dependencies), while a VIEW body may
    # reference an mview by name — attaching mviews later would brick
    # that view's analysis in every fresh session
    for e in entries.values():
        if e.get("kind") != "mview":
            continue
        # a view body may reference any mview, so a requested view
        # attaches them all (same contract as tables above)
        if keep is not None and not view_asked and e["name"] not in keep:
            continue
        vp = _mview_path(catalog_dir, e["name"])
        done = sn._view_processed_version(vp)
        if done is None:
            # never materialized (a crash between register and first
            # refresh): loud when asked for BY NAME, skipped on a broad
            # attach so one broken object cannot brick every SELECT —
            # the name then simply doesn't resolve, and REFRESH/DROP
            # (which don't attach) are the recovery path
            if keep is not None and e["name"] in keep:
                raise FileNotFoundError(
                    f"attach_catalog: materialized view {e['name']!r} "
                    "has never been refreshed — run refresh_mview (or "
                    "SQL REFRESH MATERIALIZED VIEW) first"
                )
            continue
        spark.read.parquet(vp).createOrReplaceTempView(
            prefix + e["name"]
        )
        if keep is None or e["name"] in keep:
            out[e["name"]] = done
    # plain views AFTER tables and mviews, in creation order: a view may
    # reference any table/mview and any earlier-created view (spark.sql
    # analyzes eagerly, so a missing dependency fails loudly right here,
    # not at first query)
    if views and prefix:
        raise ValueError(
            "attach_catalog: prefix is incompatible with persistent "
            "views — a view's SQL text references UNPREFIXED catalog "
            "names, so a prefixed attach would silently resolve against "
            "whatever happens to be registered under those names"
        )
    for e in sorted(views, key=lambda x: x.get("ts") or 0):
        # view bodies may use inline time travel (t VERSION AS OF n) —
        # the same rewrite the SQL executor applies (late import: the
        # executor imports this module at its top level)
        from ..sql_exec import _rewrite_time_travel

        body = _rewrite_time_travel(spark, catalog_dir, e["sql"])
        spark.sql(body).createOrReplaceTempView(prefix + e["name"])
    return out


# --------------------------------------------------------------------------
# materialized views (incrementally maintained catalog objects)
# --------------------------------------------------------------------------


def _mview_path(catalog_dir: str, name: str) -> str:
    """Materialized data lives under the catalog's own ``_mviews/``
    area — ignored by `catalog_entries` (which only reads ``*.json``)."""
    return os.path.join(catalog_dir, "_mviews", name)


def catalog_register_mview(
    catalog_dir: str,
    name: str,
    source: str,
    group_cols: list[str],
    sum_cols: list[str],
    sql: str | None = None,
    replace: bool = False,
    comment: str | None = None,
) -> dict:
    """Register a MATERIALIZED VIEW: a durable, incrementally-maintained
    aggregate over ONE catalog snapshot table.  The maintainable shape
    is the additive one (`snapshots.refresh_incremental_agg_cdf`):
    ``GROUP BY group_cols`` with a rowcount ``n`` plus ``SUM`` columns —
    counts and sums RETRACT under the change data feed, so a refresh
    costs O(delta + view), never a table rescan; min/max (which cannot
    retract) are refused at registration by construction of the shape.
    ``sql`` records the defining text for DESCRIBE/provenance only —
    the registered (source, group_cols, sum_cols) triple is the
    contract.  Data materializes under ``<catalog>/_mviews/<name>``;
    the entry itself is the same atomic-claim JSON as every other
    catalog object."""
    _check_name("catalog_register_mview", name)
    _check_name("catalog_register_mview", source)
    if not group_cols:
        raise ValueError("catalog_register_mview: group_cols is empty")
    dup = set(group_cols) & set(sum_cols)
    if dup:
        raise ValueError(
            f"catalog_register_mview: columns both grouped and summed: "
            f"{sorted(dup)}"
        )
    if "n" in group_cols or "n" in sum_cols:
        raise ValueError(
            "catalog_register_mview: column name 'n' is reserved for "
            "the view's rowcount"
        )
    ts = time.time()
    prior = None
    if replace:
        prior = catalog_entries(catalog_dir).get(name)
        if prior is not None and prior.get("kind") == "mview":
            ts = prior.get("ts") or ts
    entry = {
        "name": name,
        "kind": "mview",
        "source": source,
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        "sql": sql,
        "comment": comment,
        "ts": ts,
    }
    out = _claim_entry(
        catalog_dir, name, entry, replace, "catalog_register_mview"
    )
    if prior is not None and prior.get("kind") == "mview":
        # the definition is the contract: a replace invalidates the
        # derived state (merging a new shape into old materialized
        # rows would silently corrupt the aggregate).  But destroy
        # NOTHING before the replacement entry is claimed, and even
        # then only move the old state ASIDE — if the first refresh of
        # the new definition fails, the prior working state is still
        # on disk for recovery; `refresh_mview` retires it once the
        # new definition materializes successfully.
        import shutil

        vp = _mview_path(catalog_dir, name)
        shutil.rmtree(vp + "~prior", ignore_errors=True)
        if os.path.isdir(vp):
            os.rename(vp, vp + "~prior")
    return out


def refresh_mview(
    spark: SparkSession, catalog_dir: str, name: str
) -> tuple[int | None, str]:
    """Bring a materialized view up to its source's head.  Returns
    ``(processed_version, mode)``: mode ``"incremental"`` (CDF-driven,
    O(delta + view)), ``"full"`` (first materialization), ``"rebuild"``
    (the history carried a hop the change feed cannot express —
    overwrite/restore — so the view recomputed from the current
    snapshot: always correct, the aggregate is derivable from scratch),
    or ``"current"`` (nothing to do).  The source must be a LIVE table
    entry: a pinned source never changes, which makes a *materialized*
    view of it pointless — register a plain view over the pinned name
    instead."""
    entries = catalog_entries(catalog_dir)
    e = entries.get(name)
    if e is None or e.get("kind") != "mview":
        raise FileNotFoundError(
            f"refresh_mview: no materialized view {name!r} in the "
            f"catalog at {catalog_dir}"
        )
    src = entries.get(e["source"])
    if src is None:
        raise FileNotFoundError(
            f"refresh_mview: source table {e['source']!r} of {name!r} "
            "is not in the catalog (dropped?)"
        )
    if src.get("kind") not in (None, "table"):
        raise ValueError(
            f"refresh_mview: source {e['source']!r} is a "
            f"{src.get('kind')} — a materialized view aggregates a "
            "snapshot TABLE"
        )
    if any(src.get(k) is not None for k in ("version", "asof", "ref")):
        raise ValueError(
            f"refresh_mview: source {e['source']!r} carries a "
            "reproducibility pin — a pinned table never changes; use a "
            "plain view instead"
        )
    vp = _mview_path(catalog_dir, name)
    cur_sig = _mview_state_sig(vp)
    if cur_sig is not None and cur_sig != _mview_def_sig(e):
        # the materialized state was produced under a DIFFERENT
        # definition — the orphan a replace leaves if it crashes
        # between claiming the new entry and moving the old state
        # aside.  Additively merging the new source's delta into the
        # old definition's rows would silently corrupt the aggregate;
        # drop the state and rebuild from scratch (always correct).
        import shutil

        shutil.rmtree(vp, ignore_errors=True)
    before = sn._view_processed_version(vp)
    marker = {_MVIEW_DEF: _mview_def_sig(e)}
    try:
        v = sn.refresh_incremental_agg_cdf(
            spark, src["root"], vp, e["group_cols"], e["sum_cols"],
            extra_marker=marker,
        )
        _stamp_mview_def(vp, e)
    except (ValueError, FileNotFoundError):
        # a hop the CDF cannot express (overwrite/restore), or history
        # EXPIRED between the view's processed version and the head
        # (FileNotFoundError from the manifest walk): recompute from
        # the current snapshot — dropping the marker makes the refresh
        # take the from-scratch path, which is always correct
        import shutil

        shutil.rmtree(vp, ignore_errors=True)
        v = sn.refresh_incremental_agg_cdf(
            spark, src["root"], vp, e["group_cols"], e["sum_cols"],
            extra_marker=marker,
        )
        _retire_prior_mview(vp)
        return v, "rebuild"
    _retire_prior_mview(vp)
    if v is None:
        return before, "current"
    return v, "full" if before is None else "incremental"


def _retire_prior_mview(vp: str) -> None:
    """Drop the ``~prior`` state a replace set aside — only once the
    REPLACEMENT definition has materialized successfully (the caller
    just refreshed without error), so a failed first refresh always
    leaves the prior working state recoverable on disk."""
    import shutil

    shutil.rmtree(vp + "~prior", ignore_errors=True)


#: definition fingerprint carried INSIDE the materialized directory
#: (underscore-prefixed: Spark's file listing skips it).  The state is
#: only ever merged into by the definition that produced it; the
#: fingerprint makes that checkable, so a crash-orphaned directory (a
#: replace that died between the entry claim and moving the old state
#: aside) is detected and rebuilt instead of silently merged into.
_MVIEW_DEF = "_DEFINITION"


def _mview_def_sig(e: dict) -> str:
    import hashlib

    return hashlib.md5(
        json.dumps(
            [e["source"], list(e["group_cols"]), list(e["sum_cols"])]
        ).encode()
    ).hexdigest()


def _mview_state_sig(vp: str) -> str | None:
    """The fingerprint of the state on disk; None = no state, or a
    pre-fingerprint build's state (those orderings destroyed the old
    directory before the claim, so an orphan cannot exist — accept;
    every state THIS build publishes carries the stamp atomically)."""
    try:
        with open(os.path.join(vp, _MVIEW_DEF)) as fh:
            return fh.read().strip()
    except FileNotFoundError:
        return None


def _stamp_mview_def(vp: str, e: dict) -> None:
    """Heal a fingerprint-less state: refreshes that PUBLISH carry the
    stamp inside the atomic swap itself (``extra_marker`` — no crash
    window), so this post-stamp only covers 'current' no-op refreshes
    over legacy (pre-fingerprint) directories."""
    if not os.path.isdir(vp):
        return  # "current" no-op on a never-materialized view
    tmp = os.path.join(vp, f".{_MVIEW_DEF}.{os.getpid()}.tmp")
    with open(tmp, "w") as fh:
        fh.write(_mview_def_sig(e))
    os.replace(tmp, os.path.join(vp, _MVIEW_DEF))


def drop_mview(catalog_dir: str, name: str) -> None:
    """Remove a materialized view: the catalog entry AND its
    materialized data (derived state — rebuilt by re-registering and
    refreshing; the SOURCE table is untouched)."""
    import shutil

    e = catalog_entries(catalog_dir).get(name)
    if e is None or e.get("kind") != "mview":
        raise FileNotFoundError(
            f"drop_mview: no materialized view {name!r}"
        )
    catalog_drop(catalog_dir, name)
    shutil.rmtree(_mview_path(catalog_dir, name), ignore_errors=True)
    shutil.rmtree(
        _mview_path(catalog_dir, name) + "~prior", ignore_errors=True
    )
