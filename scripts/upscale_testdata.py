#!/usr/bin/env python
"""Upscale the driver testdata to larger scale factors for LOCAL
scaling-curve evidence (round 12 — VERDICT r11 'Next round #7': find
where the Spark/DuckDB TOTAL crosses).

Replicates each fact table K× with per-replica KEY OFFSETS so join
semantics survive (replica i's orders point at replica i's customers,
lineitems at replica i's orders/parts/suppliers, events/documents/
embeddings get fresh ids).  The tiny dims (region/nation) copy as-is
— tripling facts over fixed dims is exactly how a real warehouse
grows.  Timestamps and payloads are untouched, so per-row work is
identical to the driver's data; only VOLUME changes.  Output is
written OUTSIDE the repo (default /tmp/sfX) — the source tree never
grows and /root/testdata is never touched.

Usage: python scripts/upscale_testdata.py K OUT_DIR [SRC_DIR]
  e.g. python scripts/upscale_testdata.py 3 /tmp/sf0.3
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-table key columns to offset, keyed by the table whose id space
#: they live in (so foreign keys move WITH their dimension's replicas)
KEYS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ["region", "nation"]


def main() -> int:
    k = int(sys.argv[1])
    out_dir = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    # id-space strides: one per key domain, from the SOURCE maxima
    stride: dict[str, int] = {}
    for t, keymap in KEYS.items():
        tbl = pq.read_table(
            os.path.join(src, f"{t}.parquet"),
            columns=[c for c, dom in keymap.items() if dom == t],
        )
        for c in tbl.column_names:
            m = pc.max(tbl[c]).as_py() or 0
            stride[t] = max(stride.get(t, 0), int(m) + 1)
    for t in COPY_AS_IS:
        pq.write_table(
            pq.read_table(os.path.join(src, f"{t}.parquet")),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    for t, keymap in KEYS.items():
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        reps = []
        for i in range(k):
            r = tbl
            for c, dom in keymap.items():
                if i == 0:
                    continue
                off = pa.scalar(
                    i * stride[dom], type=r.schema.field(c).type
                )
                r = r.set_column(
                    r.schema.get_field_index(c),
                    c,
                    pc.add(r[c], off),
                )
            reps.append(r)
        big = pa.concat_tables(reps)
        pq.write_table(
            big,
            os.path.join(out_dir, f"{t}.parquet"),
            row_group_size=1 << 20,
        )
        print(f"{t}: {tbl.num_rows} -> {big.num_rows}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
