#!/usr/bin/env python3
"""Amortized ANN cost split: index BUILD once vs PROBE per query batch.

The one-shot ivf_*_topk calls fuse index construction (centroid fit +
full-corpus assignment, O(N * n_cells) dots) with the probe; at 1M
vectors with cells ~ sqrt(N) the build term is O(N^1.5) and dominates a
100-query batch, which makes the fused wall look worse than brute
force. Production serves REPEATED query batches from a MATERIALIZED
index, so the honest scale numbers are:

  build_s   — one-time: KMeans fit + corpus assign + partitioned write
  probe_s   — per batch: broadcast centroid assign + partition-pruned
              read of n_probe cells + exact re-score
  brute_s   — the same batch against the full corpus (the baseline)

Usage:
  python3 scripts/recall_amortized.py --emb var/embeddings_scale_1m \
      --mod 10007 --cells 1024 --probe 16 [--k 10]

DISCLOSED: --emb points at the self-generated clustered corpus from
scripts/make_scale_embeddings.py, not driver data.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as S
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark


def arg(flag, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


EMB = arg("--emb", "var/embeddings_scale_1m")
MOD = int(arg("--mod", "10007"))
K = int(arg("--k", "10"))
CELLS = int(arg("--cells", "1024"))
PROBE = int(arg("--probe", "16"))
IDX = arg("--index", "var/ivf_index_amortized")

spark = get_spark()
emb = spark.read.parquet(EMB).persist()
n = emb.count()
queries = emb.filter(F.col("vec_id") % MOD == 0).persist()
nq = queries.count()
print(f"n={n} queries={nq} cells={CELLS} probe={PROBE}", flush=True)

MAX_ITER = int(arg("--max-iter", "5"))

t0 = time.time()
S.build_ivf_kmeans_index(emb, IDX, n_cells=CELLS, max_iter=MAX_ITER)
build_s = time.time() - t0
print(f"build_s={build_s:.1f}", flush=True)

# probe twice: first pays JVM/file-index warmup, second is the steady
# state a serving deployment sees
for tag in ("cold", "warm"):
    t0 = time.time()
    approx = S.ivf_topk_from_index(spark, IDX, queries, k=K, n_probe=PROBE).persist()
    n_approx = approx.count()
    probe_s = time.time() - t0
    print(f"probe_{tag}_s={probe_s:.1f} pairs={n_approx}", flush=True)

t0 = time.time()
gt = S.cosine_topk(emb, queries, k=K).select("query_id", "neighbor_id").persist()
n_gt = gt.count()
brute_s = time.time() - t0
hit = gt.join(
    approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
).count()
print(
    f"brute_s={brute_s:.1f} recall@{K}={hit / n_gt:.3f} "
    f"probe_vs_brute={probe_s / brute_s:.2f}x",
    flush=True,
)
