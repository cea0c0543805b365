#!/usr/bin/env python3
"""CLI mirror of the reference's ``framework.py``
(``/root/reference/framework.py:1-18``): run a YAML experiment.

    python3 scripts/framework.py -c config.yml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.experiment import run_experiment
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark

    p = argparse.ArgumentParser(description="Run a YAML experiment (Spark)")
    p.add_argument("-c", "--config", required=True, help=".yml experiment config")
    args = p.parse_args()

    print("Running experiment...")
    spark = get_spark("framework")
    rows = run_experiment(spark, args.config)
    for model, cols in rows.items():
        print(model, {k: round(v, 4) for k, v in cols.items()})
    spark.stop()


if __name__ == "__main__":
    main()
