#!/usr/bin/env python3
"""Training-data pipeline CLI — the greenfield counterpart of the
reference's data_integration CLI, composing the LLM-pipeline
operators behind flags (every stage optional, order fixed to the
canonical cleaning order):

    python3 scripts/pipeline.py -i docs.parquet -o out/ \
        [--exact-dedup] \
        [--benchmark bench.parquet --ngram 3 --min-overlap 2] \
        [--scrub] \
        [--max-top-ngram-frac 0.2 --min-distinct-frac 0.2] \
        [--sample en=0.35,und=1.0 --seed 42] \
        [--quota 1000] \
        [--pack 512 | --chunk 128 --stride 96] \
        [--shards 16] \
        [--cpus 8]

Stages: exact dedup -> benchmark decontamination -> PII scrub ->
repetition filter -> language-stratified sampling -> per-language
quality quota -> packing OR chunking -> deterministic shard/pos
training order (output partitioned by shard). Writes the resulting
parquet to -o and prints one JSON stats line (rows in/out per stage)
to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LLM training-data pipeline")
    p.add_argument("-i", "--input", required=True, help="documents parquet (doc_id, text)")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--exact-dedup", action="store_true")
    p.add_argument("--benchmark", help="eval-set parquet to decontaminate against")
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--min-overlap", type=int, default=2)
    p.add_argument("--scrub", action="store_true", help="redact emails/URLs/IPs")
    p.add_argument("--max-top-ngram-frac", type=float, default=None)
    p.add_argument("--min-distinct-frac", type=float, default=0.0)
    p.add_argument("--sample", help="stratum=rate[,stratum=rate...] on lang-ID")
    p.add_argument(
        "--quota", type=int, default=None, metavar="N",
        help="cap each lang-ID stratum at its N highest-quality docs",
    )
    p.add_argument(
        "--shards", type=int, default=None, metavar="K",
        help="assign deterministic (shard, pos) training order and write partitioned by shard",
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--pack", type=int, default=None, metavar="CAPACITY")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--cpus", type=int, default=None)
    return p


def run(args: argparse.Namespace, spark=None) -> dict:
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import text as TX
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import packing as PK
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import quality as Q
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import stratified_sample
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark

    if args.pack and args.chunk:
        raise SystemExit("--pack and --chunk are mutually exclusive")
    own_spark = spark is None
    if own_spark:
        spark = get_spark("pipeline", cpus=args.cpus)
    stats: dict = {}
    docs = spark.read.parquet(args.input).select("doc_id", "text")
    n_rows = stats["input"] = docs.count()

    if args.exact_dedup:
        keep = DD.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
        docs = docs.join(keep, "doc_id", "left_semi")
        n_rows = stats["exact_dedup"] = docs.count()
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("doc_id", "text")
        docs = DD.decontaminate(
            docs, bench, n=args.ngram, min_overlap=args.min_overlap
        )
        n_rows = stats["decontaminate"] = docs.count()
    if args.scrub:
        docs = docs.select("doc_id", TX.scrub_pii(F.col("text")).alias("text"))
        stats["scrub"] = n_rows  # 1:1 transform
    if args.max_top_ngram_frac is not None:
        docs = Q.filter_by_repetition(
            docs,
            max_top_ngram_char_frac=args.max_top_ngram_frac,
            min_distinct_frac=args.min_distinct_frac,
        )
        stats["repetition_filter"] = docs.count()
    if args.sample:
        rates = {}
        for kv in args.sample.split(","):
            k, _, v = kv.partition("=")
            rates[k.strip()] = float(v)
        langd = docs.select(
            "doc_id", "text", TX.tokens(F.col("text")).alias("_toks")
        ).select("doc_id", "text", TX.lang_id_from_tokens(F.col("_toks")).alias("lang"))
        docs = stratified_sample(
            langd, "lang", rates, key_cols=["doc_id"], seed=args.seed
        ).select("doc_id", "text")
        stats["sample"] = docs.count()
    if args.quota:
        from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import quota_by_score

        scored = docs.select(
            "doc_id", "text", TX.tokens(F.col("text")).alias("_toks")
        ).select(
            "doc_id", "text",
            TX.lang_id_from_tokens(F.col("_toks")).alias("lang"),
            TX.quality_score(F.col("text")).alias("_q"),
        )
        docs = quota_by_score(
            scored, "lang", "_q", n=args.quota, key_cols=["doc_id"]
        ).select("doc_id", "text")
        stats["quota"] = docs.count()

    if args.pack:
        out = PK.pack_sequences(docs, capacity=args.pack, n_buckets=args.n_buckets)
        stats["packed_sequences"] = out.select("bucket", "seq_id").distinct().count()
    elif args.chunk:
        out = PK.chunk_documents(
            docs, chunk=args.chunk, stride=args.stride or args.chunk
        )
        stats["chunks"] = out.count()
    else:
        out = docs
    if args.shards:
        from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.packing import shuffle_shards

        key = "doc_id" if "doc_id" in out.columns else out.columns[0]
        out = shuffle_shards(out, n_shards=args.shards, id_col=key)
        out.write.mode("overwrite").partitionBy("shard").parquet(args.output)
        stats["shards"] = args.shards
    else:
        out.write.mode("overwrite").parquet(args.output)
    stats["output_rows"] = spark.read.parquet(args.output).count()
    if own_spark:
        spark.stop()
    return stats


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    print(json.dumps(run(args)))


if __name__ == "__main__":
    main()
