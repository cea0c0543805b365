#!/usr/bin/env python3
"""Deterministic LARGE-SCALE synthetic star schema for the 8-vs-32-core
scaling battery (VERDICT r14 item 5: at sf0.1 per-query fixed cost
dominates and the scaling block reads ~1 everywhere, so the bench
cannot demonstrate scale-out; the driver testdata stops at sf0.1, so —
like scripts/make_scale_embeddings.py before it — the scale axis is
SELF-GENERATED here, written under the repo's ``var/`` dir, never into
/root/testdata. DISCLOSED: replication-synthesized data for scale
behavior, not driver data; nothing on the bench or oracle path reads
it).

Method: K deterministic copies of /root/testdata/sf0.1 with disjoint
key spaces — every foreign key shifts by copy_index x (max_key + 1)
consistently across tables (o_custkey with c_custkey, l_partkey with
p_partkey, ...), so join cardinalities, degree distributions and group
sizes scale linearly, exactly like TPC-H's own SF scaling. The tiny
dimension tables (region, nation) are shared, un-replicated, as in
TPC-H. Two content tweaks keep the LLM-data operators honest at scale:

 * documents: every token of copy c>0 gets a ``c<k>`` suffix — the
   within-copy shingle/near-dup structure is IDENTICAL to the
   original, while cross-copy shingle overlap is zero (a verbatim copy
   would make every doc a 10-way exact dup and blow the pair count
   quadratically — that measures a different workload, not scale);
 * embeddings: copy c>0 vectors get small seeded Gaussian noise
   (sigma=0.05) — cluster geometry is preserved, bit-identical
   cross-copy duplicates are not.

Row groups are written at 50k rows so scans SPLIT (the shipped
single-row-group files are the very one-task trap
functions/partitioning.py works around — a scaling probe must not
re-measure it).

Usage: python3 scripts/make_scale_sf.py [K] [out_dir]
Defaults: K=10 (≈ sf1), out=var/sfscale1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42

# key column -> offset group; every column in a group shifts by the
# same per-copy stride (max over the OWNING table's key + 1)
GROUPS = {
    "cust": ("customer", "c_custkey", ["c_custkey", "o_custkey"]),
    "part": ("part", "p_partkey", ["p_partkey", "l_partkey"]),
    "supp": ("supplier", "s_suppkey", ["s_suppkey", "l_suppkey"]),
    "order": ("orders", "o_orderkey", ["o_orderkey", "l_orderkey"]),
    "doc": ("documents", "doc_id", ["doc_id"]),
    "vec": ("embeddings", "vec_id", ["vec_id"]),
    "event": ("events", "event_id", ["event_id"]),
    "euser": ("events", "user_id", ["user_id"]),
}
SHARED = ["region", "nation"]  # TPC-H-style fixed dims
REPLICATED = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "var", "sfscale1",
    )
    strides: dict[str, int] = {}
    col_stride: dict[str, int] = {}
    for g, (tbl, key, cols) in GROUPS.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"), columns=[key])
        strides[g] = int(pc.max(t.column(0)).as_py()) + 1
        for c in cols:
            col_stride[c] = strides[g]
    print("strides:", strides)

    for tbl in SHARED:
        os.makedirs(f"{out}/{tbl}.parquet", exist_ok=True)
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        pq.write_table(t, f"{out}/{tbl}.parquet/part-0.parquet")

    for tbl in REPLICATED:
        src = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        os.makedirs(f"{out}/{tbl}.parquet", exist_ok=True)
        for c in range(k):
            cols = []
            for name in src.column_names:
                col = src.column(name)
                if name in col_stride and c > 0:
                    col = pc.add(col, pa.scalar(c * col_stride[name], col.type))
                elif tbl == "documents" and name == "text" and c > 0:
                    suf = f"c{c}"
                    col = pa.array(
                        [
                            None
                            if v is None
                            else " ".join(w + suf for w in v.split())
                            for v in col.to_pylist()
                        ],
                        type=pa.string(),
                    )
                elif tbl == "embeddings" and name == "embedding" and c > 0:
                    rng = np.random.default_rng(SEED * 1_000_003 + c)
                    arrs = col.to_pylist()
                    noisy = [
                        None
                        if v is None
                        else (
                            np.asarray(v, dtype=np.float32)
                            + rng.normal(0.0, 0.05, size=len(v)).astype(
                                np.float32
                            )
                        ).tolist()
                        for v in arrs
                    ]
                    col = pa.array(noisy, type=col.type)
                cols.append(col)
            t = pa.table(dict(zip(src.column_names, cols)))
            pq.write_table(
                t, f"{out}/{tbl}.parquet/part-{c}.parquet", row_group_size=50_000
            )
        print(f"{tbl}: {src.num_rows} x {k} rows")
    print("done ->", out)


if __name__ == "__main__":
    main()
