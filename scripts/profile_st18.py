#!/usr/bin/env python3
"""Phase-level wall-clock profile of st18_intra_drain_dedup (and st15)
— where does the drain actually spend time? Mirrors the query bodies
with timers around each setup phase and a per-batch timer inside the
drain (via a wrapped curate_batch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import tempfile

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark import (
        streaming as _,  # noqa: F401
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import (
        text as TX,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import (
        similarity as SIM,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import (
        get_spark,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import (
        load_table,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import (
        curation as SC,
    )

    spark = get_spark("profile_st18")
    spark.range(1000).count()

    t = {}

    def mark(name, t0):
        t[name] = t.get(name, 0.0) + (time.time() - t0)
        return time.time()

    # wrap curate_batch to time each micro-batch
    orig_curate = SC.curate_batch
    batch_times = []

    def timed_curate(batch, batch_id, *a, **kw):
        t0 = time.time()
        orig_curate(batch, batch_id, *a, **kw)
        batch_times.append((batch_id, round(time.time() - t0, 2)))

    SC.curate_batch = timed_curate

    t_all = time.time()
    t0 = time.time()
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    donor_id = (
        new.filter(TX.quality_score(F.col("text")) >= 0.68)
        .agg(F.min("doc_id"))
        .first()[0]
    )
    t0 = mark("donor_min", t0)
    donor_text = docs.filter(F.col("doc_id") == donor_id).first().text
    t0 = mark("donor_text", t0)
    feed = new.withColumn(
        "text",
        F.when(F.col("doc_id") % 100 == 45, F.lit(donor_text)).otherwise(
            F.col("text")
        ),
    )
    hi = feed.agg(F.max("doc_id")).first()[0]
    t0 = mark("feed_max", t0)
    idx = tempfile.mkdtemp(prefix="pst18_idx_") + "/ivf"
    in_dir = tempfile.mkdtemp(prefix="pst18_in_")
    ck_dir = tempfile.mkdtemp(prefix="pst18_ck_")
    metrics = tempfile.mkdtemp(prefix="pst18_m_") + "/metrics"
    SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=8)
    t0 = mark("build_ivf_index", t0)
    cuts = [0, hi // 3, 2 * hi // 3, hi + 1]
    for j in range(3):
        feed.filter(
            (F.col("doc_id") >= cuts[j]) & (F.col("doc_id") < cuts[j + 1])
        ).coalesce(1).write.parquet(f"{in_dir}/p{j}")
        if j < 2:
            time.sleep(1.1)
    t0 = mark("write_slices(+2.2s sleep)", t0)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/p*/*.parquet")
    )
    SC.run_curation_drain(
        stream, corpus, idx, metrics, ck_dir, emb,
        quality_threshold=0.68, compact_if_due=False,
        intra_drain_dedup=True,
        state_compact_dirs=1,
    )
    t0 = mark("drain_total", t0)
    n = spark.read.parquet(idx + "/corpus_delta").count()
    t0 = mark("final_count", t0)
    total = time.time() - t_all
    print(f"\n=== st18 phases (rows={n}, total {total:.2f}s) ===")
    for k, v in t.items():
        print(f"{v:8.2f}  {k}")
    print("per-batch:", batch_times)
    spark.stop()


if __name__ == "__main__":
    main()
