#!/usr/bin/env python
"""Measure the file-level BLOOM FILTER data-skipping claims.

1. A point lookup on a HASH-SCATTERED key cannot be pruned by min/max
   stats (every file's range spans the domain) — a bloomless scan opens
   every file.  With ``bloom_cols`` sized to the load (m ≈ 10× distinct
   keys per file), `read_snapshot_pruned(point_eq=…)` opens ~1 file
   regardless of file count.  Measured: files opened per lookup
   (bloomed vs stats-only) over a present-key sample, at two file
   counts.
2. SIZING IS THE CONTRACT: an UNDERSIZED filter (default 8192 bits
   under 25k distinct keys/file) saturates — FPP → 1 and skipping
   degrades to zero, correct but useless.  Measured alongside the
   sized case so the failure mode is in the record, not a surprise.
3. False-positive rate, probed with IN-DOMAIN absent keys (the table
   holds even keys, probes are odd) so range stats cannot mask the
   bloom's answer — every kept file is a false positive.
4. Cost: manifest-entry bytes with/without blooms (m bits per file per
   column) and the append wall-time delta (one extra hash pass).

Results land in BENCH_NOTES.md by hand — this script only prints JSON.

Usage: python scripts/bloom_evidence.py [--rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_challenge_spark.session import get_spark  # noqa: E402
from data_engineering_challenge_spark.sources import snapshots as sn  # noqa: E402


def _scattered(spark, n, parts):
    """Even keys only — odd keys are in-domain ABSENT probes."""
    return (
        spark.range(0, n)
        .select((F.col("id") * 2).alias("k"), (F.col("id") % 97).alias("v"))
        .repartition(parts, "k")
    )


def _kept(root, col, value):
    m = sn._read_manifest(root, sn.current_version(root))
    blooms = m.get("blooms") or {}
    stats = m.get("stats") or {}
    kept = 0
    for f in m["files"]:
        rng = (stats.get(f) or {}).get(col)
        if rng is not None and (rng[0] > value or rng[1] < value):
            continue
        b = (blooms.get(f) or {}).get(col)
        if b is None or sn._bloom_maybe_contains(b, value):
            kept += 1
    return kept, len(m["files"])


def _entry_bytes(root):
    edir = os.path.join(root, "_manifests", "entries")
    return sum(
        os.path.getsize(os.path.join(edir, f)) for f in os.listdir(edir)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    args = ap.parse_args()
    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    out: dict = {"rows": args.rows}

    for parts in (8, 32):
        tmp = tempfile.mkdtemp(prefix="bloom_ev_")
        distinct = args.rows // parts
        sized_bits = ((10 * distinct + 7) // 8) * 8  # m ≈ 10n, byte-aligned
        df = _scattered(spark, args.rows, parts)

        roots = {
            "plain": (f"{tmp}/plain", None, None),
            "sized": (f"{tmp}/sized", ["k"], sized_bits),
            "default_bits": (f"{tmp}/dflt", ["k"], 8192),
        }
        times, ebytes = {}, {}
        for name, (root, bcols, bits) in roots.items():
            t0 = time.time()
            sn.snapshot_append(
                df,
                root,
                stats_cols=["k"],
                bloom_cols=bcols,
                bloom_bits=bits or 8192,
            )
            times[name] = round(time.time() - t0, 2)
            ebytes[name] = _entry_bytes(root)

        present = [2 * k for k in range(7, args.rows, max(1, args.rows // 40))]
        absent = [2 * k + 1 for k in range(7, args.rows, max(1, args.rows // 40))]

        def avg_kept(root, keys):
            ks = [_kept(root, "k", k)[0] for k in keys]
            return round(sum(ks) / len(ks), 2)

        out[f"files_{parts}"] = {
            "n_files": parts,
            "distinct_per_file": distinct,
            "sized_bits_per_file": sized_bits,
            "append_s": times,
            "entry_bytes": ebytes,
            "avg_files_opened_present": {
                "stats_only": avg_kept(roots["plain"][0], present),
                "bloom_sized": avg_kept(roots["sized"][0], present),
                "bloom_saturated_8192": avg_kept(
                    roots["default_bits"][0], present
                ),
            },
            "avg_false_positive_files_absent_probe": {
                "bloom_sized": avg_kept(roots["sized"][0], absent),
                "bloom_saturated_8192": avg_kept(
                    roots["default_bits"][0], absent
                ),
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
