"""ANN recall/latency study at sf0.1 (largest available testdata; sf1 never shipped).
Ground truth: exact cosine_topk. Goal: find recall>=0.9 settings per path."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as S
from pyspark.sql import functions as F

spark = get_spark()
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").persist()
n = emb.count()
queries = emb.filter(F.col("vec_id") % 31 == 0).persist()  # 65 queries
K = 10
t0 = time.time()
gt = S.cosine_topk(emb, queries, k=K).select(
    F.col("query_id"), F.col("neighbor_id")).persist()
n_gt = gt.count()
print(f"n={n} queries={queries.count()} gt_pairs={n_gt} exact={time.time()-t0:.1f}s", flush=True)

def recall(approx_df, label, t):
    hit = gt.join(approx_df.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi").count()
    print(f"{label}: recall@{K}={hit/n_gt:.3f} wall={t:.1f}s", flush=True)

for n_tables, n_planes in [(6, 8), (12, 8), (24, 8), (12, 6), (24, 6), (48, 6), (16, 10)]:
    t0 = time.time()
    a = S.cosine_lsh_topk(emb, queries, k=K, n_planes=n_planes, n_tables=n_tables).persist()
    a.count(); t = time.time() - t0
    recall(a, f"signLSH tables={n_tables} planes={n_planes}", t)
    a.unpersist()

for n_cells, n_probe in [(8, 4), (16, 4), (16, 8), (32, 8), (32, 12), (64, 16)]:
    t0 = time.time()
    a = S.ivf_topk(emb, queries, k=K, n_cells=n_cells, n_probe=n_probe).persist()
    a.count(); t = time.time() - t0
    recall(a, f"IVF md5 cells={n_cells} probe={n_probe}", t)
    a.unpersist()

for n_cells, n_probe in [(16, 4), (16, 8), (32, 8)]:
    t0 = time.time()
    a = S.ivf_kmeans_topk(emb, queries, k=K, n_cells=n_cells, n_probe=n_probe).persist()
    a.count(); t = time.time() - t0
    recall(a, f"IVF kmeans cells={n_cells} probe={n_probe}", t)
    a.unpersist()

t0 = time.time()
a = S.cosine_mllib_lsh_topk(emb, queries, k=K).persist(); a.count(); t = time.time() - t0
recall(a, "MLlib BRP default", t)
