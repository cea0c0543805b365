#!/usr/bin/env python3
"""CLI mirror of the reference's ``data_integration.py``
(``/root/reference/data_integration.py:12-44``): same flags, Spark
adapters underneath.

    python3 scripts/data_integration.py -d ml-100k -i raw/ -o out/ \
        -ci -cu -cr [-cs] [-map --labels labels.parquet] \
        [-enrich --properties props.parquet --props subject,director] [-w 8]

Entity linking is offline-first: ``--labels`` points at a (label, uri)
dump (parquet or csv). The live-SPARQL fallback is available
programmatically via ``DatasetAdapter.map_URIs(fetch=...)``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_any(spark, path):
    if path.endswith(".parquet") or os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.read.csv(path, header=True)


def main() -> None:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.datasets import DATASETS

    p = argparse.ArgumentParser(description="DBpedia data integration (Spark)")
    p.add_argument("-d", "--dataset", required=True, choices=sorted(DATASETS))
    p.add_argument("-i", "--input_path", required=True)
    p.add_argument("-o", "--output_path", required=True)
    p.add_argument("-ci", "--convert_item", action="store_true")
    p.add_argument("-cu", "--convert_user", action="store_true")
    p.add_argument("-cr", "--convert_rating", action="store_true")
    p.add_argument("-cs", "--convert_social", action="store_true")
    p.add_argument("-map", "--map_URIs", action="store_true")
    p.add_argument("-enrich", "--enrich_data", action="store_true")
    p.add_argument("-w", "--n_workers", type=int, default=1)
    p.add_argument("--labels", help="offline labels dump (label, uri) for -map")
    p.add_argument("--properties", help="offline properties dump (URI, <prop>...) for -enrich")
    p.add_argument("--props", default="", help="comma-separated property columns for -enrich")
    args = p.parse_args()

    spark = get_spark("data_integration")
    ds = DATASETS[args.dataset](spark, args.input_path, args.output_path,
                                n_workers=args.n_workers)
    if args.convert_item:
        ds.convert_item_data()
    if args.convert_user:
        ds.convert_user_data()
    if args.convert_rating:
        ds.convert_rating_data()
    if args.convert_social:
        ds.convert_social_data()
    if args.map_URIs:
        if not args.labels:
            p.error("-map requires --labels (offline dump)")
        ds.map_URIs(labels=_read_any(spark, args.labels))
    if args.enrich_data:
        if not (args.properties and args.props):
            p.error("-enrich requires --properties and --props")
        ds.enrich_data(_read_any(spark, args.properties), args.props.split(","))
    spark.stop()


if __name__ == "__main__":
    main()
