#!/usr/bin/env python3
"""Evidence run for VERDICT r11 item 1: per-batch wall time across a
long intra-drain-dedup drain, with and without the mid-drain state
fold.

Drives streaming/curation.curate_batch directly for N micro-batches
(the foreachBatch body, minus the fixed streaming machinery — exactly
the part whose cost grew with the accumulated state-dir count) and
prints per-batch seconds plus the live non-base state-dir count. With
state_compact_dirs=3 the dir count saw-tooths at <= 4 and the
per-batch time stays flat; with the fold disabled the dir count grows
linearly across the drain (the O(B^2) listing/read term the fold
kills).

Usage: python3 scripts/drain_flatness.py [n_batches] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"


def main():
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.dedup import build_corpus_dedup_index
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.expectations import Check
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    spark = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("drain-flatness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    checks = [Check("text_present", "completeness", "text", 1.0)]
    hi = new.agg(F.max("doc_id")).first()[0]
    cuts = [0] + [hi * (j + 1) // N_BATCHES + 1 for j in range(N_BATCHES)]

    def run(tag, threshold):
        root = tempfile.mkdtemp(prefix=f"drainflat_{tag}_")
        idx = os.path.join(root, "ivf")
        sd = os.path.join(root, "sd")
        metrics = os.path.join(root, "metrics")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
        state = build_corpus_dedup_index(corpus, 8, 16, 3, "doc_id", "text")
        state = (state[0].persist(), state[1].persist())
        per_batch = []
        try:
            for b in range(N_BATCHES):
                batch = new.filter(
                    (F.col("doc_id") >= cuts[b]) & (F.col("doc_id") < cuts[b + 1])
                )
                t0 = time.time()
                SC.curate_batch(
                    batch, b, corpus, state, emb, idx, metrics, checks,
                    quality_threshold=0.68, drain_state_dir=sd,
                    state_compact_dirs=threshold,
                )
                dt = time.time() - t0
                dirs = [
                    d
                    for d in os.listdir(sd + "/state")
                    if d.startswith("batch=") and d != "batch=-1"
                ]
                per_batch.append({"batch": b, "sec": round(dt, 3), "state_dirs": len(dirs)})
        finally:
            state[0].unpersist()
            state[1].unpersist()
            shutil.rmtree(root, ignore_errors=True)
        return per_batch

    fold = run("fold", 3)
    nofold = run("nofold", 10**6)
    print(json.dumps({"n_batches": N_BATCHES, "sf": SF,
                      "fold_threshold_3": fold, "no_fold": nofold}))
    # flatness summary: mean of first vs last quartile of batch times
    def qmeans(rows):
        q = max(1, len(rows) // 4)
        first = sum(r["sec"] for r in rows[:q]) / q
        last = sum(r["sec"] for r in rows[-q:]) / q
        return first, last

    for tag, rows in (("fold", fold), ("no_fold", nofold)):
        f, l = qmeans(rows)
        print(f"{tag}: first-quartile mean {f:.2f}s, last-quartile mean {l:.2f}s, "
              f"ratio {l / f:.2f}, max state_dirs {max(r['state_dirs'] for r in rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
