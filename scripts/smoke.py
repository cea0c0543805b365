#!/usr/bin/env python3
"""End-to-end library smoke on sf0.001: ratings -> k-core -> split ->
popularity recommender -> MAP@5/nDCG@5. Finishes in ~1 min."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources import load_tables
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import (
    graph as G,
    metrics,
    recommend,
    splits,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("smoke")
    t = load_tables(spark, sf_dir)
    ratings = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            F.col("l_quantity").alias("rating"),
            F.unix_timestamp("o_orderdate").cast("double").alias("timestamp"),
        )
    )
    print("ratings:", ratings.count())
    kc = G.filter_kcore(ratings, k=3, target="user", iterations=2)
    print("after kcore:", kc.count())
    sp = splits.split_ratings(kc, "random_by_ratio", seed=42, p=0.2, level="user")
    train, test = splits.train_test(sp)
    print("train/test:", train.count(), test.count())
    recs = recommend.PopularityRecommender(k=5).train(train).get_recommendations(5)
    metrics.evaluate(
        test.select("user_id", "item_id", "rating"),
        recs,
        {
            "MAP@5": {"metric": "map", "k": 5, "relevance_threshold": 30},
            "nDCG@5": {"metric": "ndcg", "k": 5, "relevance_threshold": 30},
        },
    ).show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
