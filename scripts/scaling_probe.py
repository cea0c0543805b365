#!/usr/bin/env python3
"""Scaling probe: representative queries at sf0.001 / 0.01 / 0.1.

Prints per-query wall-clock at each SF plus the 0.01->0.1 scaling
factor (data grows 10x; a factor near or below 10 means the plan
scales linearly or better on this box — sub-linear factors indicate
fixed plan/compile overhead still dominating, super-linear ones a
shuffle or fan-out growing faster than the data).

Usage: python3 scripts/scaling_probe.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

REPRESENTATIVE = [
    "q1_pricing_summary",        # scan + hash agg
    "q9_profit_proxy",           # broadcast star join
    "q21_waiting_supplier",      # stacked fact aggs
    "a2_o1_user_rating_lists",   # per-user collect_list
    "g4_kcore_alternating",      # iterative filtering
    "g10_label_propagation",     # iterative propagation
    "sp2_random_user",           # det-hash split
    "rec_popularity_top5",       # recommender end-to-end
    "dd4_minhash_lsh_pairs",     # LSH band join
    "dd14_containment",          # inverted-index pair join
    "tx1_text_stats",            # pure codegen text exprs
    "tx17_tfidf_keywords",       # explode + two-level agg + window
    "ev2_sessionize",            # gap sessionization windows
    "ev16_rfm_segments",         # broadcast-quantile bucketing
    "ss2_ann_ivf_topk",          # IVF ANN
    "pk1_pack_sequences",        # bucketed packing
    "dq2_snapshot_diff",         # co-partitioned full-outer reconcile
    "sp11_negative_sampling",    # constant-proposal negatives
    "ss10_radius_search",        # IVF threshold retrieval
    "ev18_gap_islands",          # per-user streak windows
    "a20_heavy_hitters",         # MG sketch-propose / exact-verify
    "ev20_psi_band",             # drift: count aggs + pinned folds
    "ev21_cusum_alarm",          # drift: grid fill + running windows
    "g12_corating_motifs",       # capped item-key motif self-join
    "ss12_recall_report",        # brute-force + IVF recall intersection
    "tx18_bpe_tokenize",         # merge learning + map-side application
    "g13_kcore_incremental",     # fixpoint core + decremental maintenance
    "ss13_recall_curve",         # one-pass probe-depth sweep
    "tx19_bpe_encode_topv",      # mapInPandas merge application
    "sp13_rolling_origin",       # bucketed global rank + fold audit
    "ev22_seasonal_anomalies",   # median/MAD seasonal profile
    "ss14_ivf_pq_topk",          # IVF-pruned ADC scoring
    "dd15_semantic_dedup",       # within-cell pair search + components
    "st18_intra_drain_dedup",    # drain + greedy state dedup (r11)
    "dd16_winnowing",            # window-min fingerprint + guarded pair join (r11)
    "g14_triangles",             # degree-oriented wedge closure (r11)
    "sp15_purged_embargo",       # bucketed rank + boundary-rank arithmetic (r11)
    "dp8_tokenize_pack_shard",   # BPE fertility -> packing -> shards (r11)
    "tx20_dup_span_audit",       # chunk-hash keeper join (r11)
    "g15_ra_link_prediction",    # capped weighted co-rating join (r11)
    "tx21_token_budget_mix",     # budget pass + bucketed prefix-sum select (r12)
    "tx22_ngram_novelty",        # trigram inverted-index df join (r12)
    "dq6_key_skew_report",       # map-side-combined hot-key aggregate (r12)
    "dd17_minhash_calibration",  # candidate-bounded sketch calibration (r12)
    "dq7_join_cardinality",      # count-table join pricing (r12)
    "sp16_leakage_safe_split",   # LSH pairs -> components -> cluster-hash split (r12)
    "tx23_tokenizer_fertility",  # merge learn + broadcast fertility join (r12)
    "dq8_value_histogram",       # 1-row min/max broadcast + bin groupBy (r12)
]


def main() -> None:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import QUERIES

    subs = sys.argv[1:]
    names = [
        n for n in REPRESENTATIVE if not subs or any(s in n for s in subs)
    ]
    spark = get_spark("scaling_probe")
    spark.range(1000).count()  # JVM warm-up

    results: dict[str, list[float]] = {}
    for sf_dir in SFS:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            results.setdefault(name, []).append(time.time() - t0)
            spark.catalog.clearCache()

    print(f"\n{'query':32s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'x(0.01->0.1)':>12s}")
    for name in names:
        t = results[name]
        factor = t[2] / t[1] if t[1] > 0 else float("nan")
        print(f"{name:32s} {t[0]:8.2f} {t[1]:8.2f} {t[2]:8.2f} {factor:12.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
