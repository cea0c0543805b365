"""ANN recall/latency study.

Default: the sf0.1 driver testdata (2,000 vectors — the largest the
driver ships; sf1 never appeared). SCALE MODE (VERDICT standing item
"sf1-scale recall/latency evidence"): point ``--emb`` at the
self-generated clustered corpus from scripts/make_scale_embeddings.py
(100k+ vectors, same schema/geometry family — DISCLOSED as synthetic,
built because /root/testdata stops at sf0.1):

    python3 scripts/make_scale_embeddings.py 100000
    python3 scripts/recall_study.py --emb var/embeddings_scale --mod 1009

Ground truth: exact cosine_topk. Goal: recall>=0.9 settings per pruned
path, and how wall-clock scales vs the brute-force baseline.
Parameter grids scale with N (cells ~ sqrt(N) for IVF).
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


EMB = arg("--emb", "/root/testdata/sf0.1/embeddings.parquet")
MOD = int(arg("--mod", "31"))
K = int(arg("--k", "10"))

spark = get_spark()
emb = spark.read.parquet(EMB).persist()
n = emb.count()
queries = emb.filter(F.col("vec_id") % MOD == 0).persist()
nq = queries.count()

t0 = time.time()
gt = S.cosine_topk(emb, queries, k=K).select(
    F.col("query_id"), F.col("neighbor_id")).persist()
n_gt = gt.count()
brute_s = time.time() - t0
print(f"n={n} queries={nq} gt_pairs={n_gt} exact_bruteforce={brute_s:.1f}s", flush=True)


def recall(approx_df, label, t):
    hit = gt.join(
        approx_df.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    print(
        f"{label}: recall@{K}={hit / n_gt:.3f} wall={t:.1f}s "
        f"({t / max(brute_s, 1e-9):.2f}x brute)",
        flush=True,
    )


if n <= 10_000:
    LSH_GRID = [(6, 8), (12, 8), (24, 8), (12, 6), (24, 6), (48, 6), (16, 10)]
    IVF_GRID = [(8, 4), (16, 4), (16, 8), (32, 8), (32, 12), (64, 16)]
    KM_GRID = [(16, 4), (16, 8), (32, 8)]
elif n <= 500_000:
    # cells ~ sqrt(N): candidate set per query ~ n_probe * N / n_cells
    LSH_GRID = [(12, 10), (24, 10), (24, 12), (48, 12)]
    IVF_GRID = [(64, 8), (128, 8), (128, 16), (256, 16), (256, 32)]
    KM_GRID = [(64, 8), (128, 16)]
else:
    # 1M tier (RECALL_SCALE v2): verify cells ~ sqrt(N) holds one more
    # decade (sqrt(1M) = 1000) and locate where sign-LSH's candidate
    # sets stop pruning (the all-pairs regime: planes too few for N ->
    # every bucket is huge). Brute ground truth at this N is the
    # expensive part; the grids stay small on purpose.
    LSH_GRID = [(12, 12), (24, 14), (24, 16)]
    IVF_GRID = [(256, 8), (512, 16), (1024, 16)]
    KM_GRID = [(256, 8), (512, 16), (1024, 16), (1024, 32)]

for n_tables, n_planes in LSH_GRID:
    t0 = time.time()
    a = S.cosine_lsh_topk(emb, queries, k=K, n_planes=n_planes, n_tables=n_tables).persist()
    a.count(); t = time.time() - t0
    recall(a, f"signLSH tables={n_tables} planes={n_planes}", t)
    a.unpersist()

for n_cells, n_probe in IVF_GRID:
    t0 = time.time()
    a = S.ivf_topk(emb, queries, k=K, n_cells=n_cells, n_probe=n_probe).persist()
    a.count(); t = time.time() - t0
    recall(a, f"IVF md5 cells={n_cells} probe={n_probe}", t)
    a.unpersist()

for n_cells, n_probe in KM_GRID:
    t0 = time.time()
    a = S.ivf_kmeans_topk(emb, queries, k=K, n_cells=n_cells, n_probe=n_probe).persist()
    a.count(); t = time.time() - t0
    recall(a, f"IVF kmeans cells={n_cells} probe={n_probe}", t)
    a.unpersist()

t0 = time.time()
a = S.cosine_mllib_lsh_topk(emb, queries, k=K).persist(); a.count(); t = time.time() - t0
recall(a, "MLlib BRP default", t)
