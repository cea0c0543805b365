#!/usr/bin/env python3
"""Douban-Movie parity axis — the reference's published 2-fold Node2Vec
numbers (BASELINE.md / experiment_results/douban-movie/run1.csv:2):

    MAP@5  0.70566 ± 0.00501   (±2σ band [0.69564, 0.71567])
    nDCG@5 0.64595 ± 0.00601   (±2σ band [0.63392, 0.65798])

Protocol (config_files/test_douban-movie.yml): kcore-20/user (1
iteration), 2-fold user k-fold seed 42, k=5, relevance_threshold=0,
Node2Vec p=1 q=1 n_walks=50 walk_len=10 dim=64 epochs=1 — the pure
ratings-graph path (Douban has NO map.csv/enrichment in the reference;
the walk graph is the user-item bipartite alone).

Inputs: the deterministic geometry clone (scripts/make_douban_clone.py
— raw DMSC.csv is not downloadable here; calibration disclosed there).

    python3 scripts/douban_parity.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = {
    "map5": (0.7056552558782849, 0.005006915629322262),
    "ndcg5": (0.6459506798164443, 0.006012950913802273),
}


def build_config(clone_dir: str) -> dict:
    return {
        "experiment": {
            "dataset": {
                "name": "douban-movie",
                "item": {
                    "path": f"{clone_dir}/item.csv",
                    "extra_features": ["name_EN", "name_CN"],
                },
                "user": {"path": f"{clone_dir}/user.csv", "extra_features": ["name"]},
                "ratings": {"path": f"{clone_dir}/rating.csv", "timestamp": False},
            },
            "preprocess": [
                {
                    "method": "filter_kcore",
                    "parameters": {"k": 20, "iterations": 1, "target": "user"},
                }
            ],
            "split": {
                "seed": 42,
                "test": {"method": "k_fold", "k": 2, "level": "user"},
            },
            "models": [
                {
                    "name": "deepwalk_based",
                    "parameters": {
                        "walk_len": 10,
                        "p": 1.0,
                        "q": 1.0,
                        "n_walks": 50,
                        "embedding_size": 64,
                        "epochs": 1,
                    },
                }
            ],
            "evaluation": {
                "k": 5,
                "relevance_threshold": 0,
                "metrics": ["MAP", "nDCG"],
            },
            "report": {
                "file": os.path.join(
                    tempfile.gettempdir(), "douban_parity_report.csv"
                )
            },
        }
    }


def ensure_clone(clone_dir: str | None = None) -> str:
    from scripts.make_douban_clone import generate, knob_fingerprint

    clone_dir = clone_dir or os.path.join(
        tempfile.gettempdir(), "douban_clone_calibrated"
    )
    # cache keyed on the CALIBRATION KNOBS, not bare file existence —
    # a knob edit must never be measured against a stale on-disk clone
    marker = os.path.join(clone_dir, ".clone_knobs")
    want = knob_fingerprint()
    have = open(marker).read() if os.path.exists(marker) else None
    if have != want or not os.path.exists(os.path.join(clone_dir, "rating.csv")):
        print("clone:", generate(clone_dir), flush=True)
        with open(marker, "w") as fh:
            fh.write(want)
    return clone_dir


def main(out_path: str | None = None) -> dict:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.experiment import (
        run_experiment,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import (
        get_spark,
    )

    spark = get_spark()
    cfg = build_config(ensure_clone())
    res = run_experiment(spark, cfg)
    (model_name, row), = res.items()
    out = {
        "model": model_name,
        "map5_mean": row["MAP@5_mean"],
        "ndcg5_mean": row["nDCG@5_mean"],
        "map5_folds": [row["fold-1_MAP@5"], row["fold-2_MAP@5"]],
        "ndcg5_folds": [row["fold-1_nDCG@5"], row["fold-2_nDCG@5"]],
        "ref_map5_band": [
            REF["map5"][0] - 2 * REF["map5"][1],
            REF["map5"][0] + 2 * REF["map5"][1],
        ],
        "ref_ndcg5_band": [
            REF["ndcg5"][0] - 2 * REF["ndcg5"][1],
            REF["ndcg5"][0] + 2 * REF["ndcg5"][1],
        ],
    }
    out["map5_in_band"] = (
        out["ref_map5_band"][0] <= out["map5_mean"] <= out["ref_map5_band"][1]
    )
    out["ndcg5_in_band"] = (
        out["ref_ndcg5_band"][0] <= out["ndcg5_mean"] <= out["ref_ndcg5_band"][1]
    )
    print(json.dumps(out, indent=2))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
