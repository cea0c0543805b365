#!/usr/bin/env python3
"""SURVEY §6 acceptance: the full YAML experiment on the enriched
ml-100k (real DBpedia enrichment + calibrated ratings clone), asserted
against the reference's published band.

Reference numbers (experiment_results/ml100k_enriched/run1.csv:2 —
"Node2Vec based model + cosine similarity;q=1.0;p=1.0;
embedding_size=64", 5-fold user-level k-fold, k=5, kcore-20,
enrich properties [subject, director]):

    MAP@5  mean 0.16493  std 0.00612
    nDCG@5 mean 0.21498  std 0.00530

Acceptance band: mean within ±2 reference stds. Run:

    python3 scripts/quality_parity.py [out.json]

Builds the clone (scripts/make_ml100k_clone.py) next to the REAL
enriched.csv/map.csv from the reference checkout, runs the experiment
through plans/experiment.run_experiment (the same YAML surface as
scripts/framework.py), prints the verdict and writes the JSON result.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PROCESSED = "/root/reference/datasets/ml-100k/processed"
REF_MAP5_MEAN, REF_MAP5_STD = 0.16493478260869565, 0.006121412115116461
REF_NDCG5_MEAN, REF_NDCG5_STD = 0.2149800198612532, 0.005303680059671639

# TransE on ratings-only triples (transEratings.csv:2; dim=150,
# epochs=5, seed=42, 5-fold) — the second published acceptance row,
# and the reference's ONLY wall-clock figure (23.94 s/fold ± 1.05 on
# an RTX 4060; transEtimesratings.csv:2)
REF_TRANSE_MAP5_MEAN, REF_TRANSE_MAP5_STD = 0.00651, 0.00060
REF_TRANSE_NDCG5_MEAN, REF_TRANSE_NDCG5_STD = 0.01022, 0.00084
REF_TRANSE_SEC_PER_FOLD = 23.94

# Pinned margin floors in units of the REFERENCE std (VERDICT r13
# item 2): in-band is necessary but not sufficient — a mean drifting
# toward a band edge is silent erosion until the band flips red one
# nudge later. The floors pin the CURRENT measured distance to the
# nearest edge (r13 goldens), so any future change that erodes a
# margin fails THIS assertion loudly — naming the re-centering
# procedure — before it fails the band. transe/map5 documents the one
# knife-edge: 0.035 sigma after the r13 reader-fix recalibration
# (quality_parity_transe_r13.json; 0.005331 vs edge 0.005310). The
# aspirational target for every cell is >= 0.5 sigma; cells already
# there are pinned AT 0.5 so they cannot quietly fall below it.
MARGIN_FLOORS = {  # model -> (map5_floor_sigma, ndcg5_floor_sigma)
    "node2vec": (0.5, 0.5),
    "transe": (0.035, 0.5),
    "transe_sharded": (0.5, 0.5),
}


def margin_sigmas(mean: float, band: list[float]) -> float:
    """Distance from mean to the NEAREST band edge, in band sigmas
    (the band spans ±2σ, so σ = width / 4). Negative = out of band."""
    lo, hi = band
    return min(mean - lo, hi - mean) / ((hi - lo) / 4.0)

MODEL_SPECS = {
    "node2vec": {
        "name": "deepwalk_based",
        "parameters": {
            "walk_len": 10,
            "p": 1.0,
            "q": 1.0,
            "n_walks": 50,
            "embedding_size": 64,
            "epochs": 1,
        },
    },
    "transe": {
        "name": "transE",
        "parameters": {"embedding_dim": 150, "epochs": 5, "seed": 42},
    },
    # the fully sharded trainer (r11): same model, same published band
    # — quality must survive the distributed execution (local negative
    # sampling, delta averaging), not just the driver-parity stage
    "transe_sharded": {
        "name": "transE",
        "parameters": {
            "embedding_dim": 150, "epochs": 5, "seed": 42,
            "trainer": "sharded", "n_partitions": 8,
        },
    },
}

BANDS = {
    "node2vec": (REF_MAP5_MEAN, REF_MAP5_STD, REF_NDCG5_MEAN, REF_NDCG5_STD),
    "transe": (
        REF_TRANSE_MAP5_MEAN,
        REF_TRANSE_MAP5_STD,
        REF_TRANSE_NDCG5_MEAN,
        REF_TRANSE_NDCG5_STD,
    ),
    "transe_sharded": (
        REF_TRANSE_MAP5_MEAN,
        REF_TRANSE_MAP5_STD,
        REF_TRANSE_NDCG5_MEAN,
        REF_TRANSE_NDCG5_STD,
    ),
}


def build_config(clone_dir: str, k_folds: int = 5, model: str = "node2vec") -> dict:
    return {
        "experiment": {
            "dataset": {
                "name": "ml-100k",
                "item": {
                    "path": f"{clone_dir}/item.csv",
                    "extra_features": ["movie_year", "movie_title"],
                },
                "user": {
                    "path": f"{clone_dir}/user.csv",
                    "extra_features": ["gender", "occupation"],
                },
                "ratings": {"path": f"{clone_dir}/rating.csv", "timestamp": True},
                "enrich": {
                    "map_path": f"{REF_PROCESSED}/map.csv",
                    "enrich_path": f"{REF_PROCESSED}/enriched.csv",
                    "remove_unmatched": False,
                    "properties": ["subject", "director"],
                },
            },
            "preprocess": [
                {
                    "method": "filter_kcore",
                    "parameters": {"k": 20, "iterations": 1, "target": "user"},
                }
            ],
            "split": {
                "seed": 42,
                "test": {"method": "k_fold", "k": k_folds, "level": "user"},
            },
            "models": [dict(MODEL_SPECS[model])],
            "evaluation": {
                "k": 5,
                "relevance_threshold": 0,
                "metrics": ["MAP", "nDCG"],
            },
            "report": {
                "file": os.path.join(
                    tempfile.gettempdir(), "ml100k_parity_report.csv"
                )
            },
        }
    }


def ensure_clone(clone_dir: str | None = None) -> str:
    from scripts.make_ml100k_clone import generate, knob_fingerprint

    clone_dir = clone_dir or os.path.join(
        tempfile.gettempdir(), "ml100k_clone_calibrated"
    )
    # cache keyed on the CALIBRATION KNOBS, not bare file existence —
    # a knob edit must never be measured against a stale on-disk clone
    marker = os.path.join(clone_dir, ".clone_knobs")
    want = knob_fingerprint()
    have = open(marker).read() if os.path.exists(marker) else None
    if have != want or not os.path.exists(os.path.join(clone_dir, "rating.csv")):
        stats = generate(
            clone_dir, enriched_csv=f"{REF_PROCESSED}/enriched.csv"
        )
        print("clone:", stats, flush=True)
        with open(marker, "w") as fh:
            fh.write(want)
    return clone_dir


def main(out_path: str | None = None, model: str = "node2vec") -> dict:
    import time

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.experiment import (
        run_experiment,
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import (
        get_spark,
    )

    spark = get_spark()
    clone = ensure_clone()
    cfg = build_config(clone, model=model)
    t0 = time.monotonic()
    res = run_experiment(spark, cfg)
    wall = time.monotonic() - t0
    (model_name, row), = res.items()
    folds_map = [row[f"fold-{i}_MAP@5"] for i in range(1, 6)]
    folds_ndcg = [row[f"fold-{i}_nDCG@5"] for i in range(1, 6)]
    m_mean, m_std, n_mean, n_std = BANDS[model]
    out = {
        "model": model_name,
        "map5_mean": row["MAP@5_mean"],
        "map5_std": row["MAP@5_std"],
        "ndcg5_mean": row["nDCG@5_mean"],
        "ndcg5_std": row["nDCG@5_std"],
        "map5_folds": folds_map,
        "ndcg5_folds": folds_ndcg,
        "sec_per_fold": wall / 5,
        "ref_map5_band": [m_mean - 2 * m_std, m_mean + 2 * m_std],
        "ref_ndcg5_band": [n_mean - 2 * n_std, n_mean + 2 * n_std],
    }
    if model.startswith("transe"):
        out["ref_sec_per_fold_gpu"] = REF_TRANSE_SEC_PER_FOLD
        out["trainer"] = MODEL_SPECS[model]["parameters"].get(
            "trainer", "driver"
        )
    out["map5_in_band"] = (
        out["ref_map5_band"][0] <= out["map5_mean"] <= out["ref_map5_band"][1]
    )
    out["ndcg5_in_band"] = (
        out["ref_ndcg5_band"][0] <= out["ndcg5_mean"] <= out["ref_ndcg5_band"][1]
    )
    out["map5_margin_sigma"] = round(
        margin_sigmas(out["map5_mean"], out["ref_map5_band"]), 4
    )
    out["ndcg5_margin_sigma"] = round(
        margin_sigmas(out["ndcg5_mean"], out["ref_ndcg5_band"]), 4
    )
    m_floor, n_floor = MARGIN_FLOORS[model]
    for metric, got, floor in (
        ("MAP@5", out["map5_margin_sigma"], m_floor),
        ("nDCG@5", out["ndcg5_margin_sigma"], n_floor),
    ):
        assert got >= floor, (
            f"{model} {metric} band margin eroded: {got} sigma < pinned "
            f"floor {floor} sigma. The mean is drifting toward a band "
            "edge — re-center the clone (BETA/TAIL_FLOOR procedure, "
            "scripts/make_ml100k_clone.py) or justify-and-repin the "
            "floor BEFORE the band itself flips red."
        )
    print(json.dumps(out, indent=2))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=2)
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model = "node2vec"
    if "--transe-sharded" in sys.argv:
        model = "transe_sharded"
    elif "--transe" in sys.argv:
        model = "transe"
    main(args[0] if args else None, model=model)
