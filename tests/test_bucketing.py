from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources import bucketing as B


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    ratings = spark.range(2000).select(
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") % 53).alias("item_id"),
        (F.col("id") % 5).cast("double").alias("rating"),
    )
    users = spark.range(97).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), "id").alias("name")
    )
    B.write_bucketed(ratings, "t_ratings_b", "user_id", n_buckets=8, sort_col="user_id")
    B.write_bucketed(users, "t_users_b", "user_id", n_buckets=8, sort_col="user_id")
    try:
        r, u = spark.table("t_ratings_b"), spark.table("t_users_b")
        # broadcast would trivially avoid the shuffle — force SMJ to
        # prove the bucketing itself provides co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = r.join(u, "user_id")
        assert not B.plan_has_exchange(joined)
        assert joined.count() == 2000
        # same key, same buckets: groupBy on the bucket key also
        # needs no exchange
        agg = r.groupBy("user_id").agg(F.sum("rating").alias("s"))
        assert not B.plan_has_exchange(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_ratings_b")
        spark.sql("DROP TABLE IF EXISTS t_users_b")


def test_unbucketed_join_does_shuffle(spark):
    a = spark.range(500).select((F.col("id") % 7).alias("k"), "id")
    b = spark.range(500).select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert B.plan_has_exchange(a.join(b, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
