import math

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import multimodal as MM


def test_synth_media_schema_and_determinism(spark):
    m1 = MM.synth_media(spark, 30)
    m2 = MM.synth_media(spark, 30)
    assert m1.schema.simpleString() == m2.schema.simpleString()
    r1 = {r.media_id: bytes(r.payload) for r in m1.collect()}
    r2 = {r.media_id: bytes(r.payload) for r in m2.collect()}
    assert r1 == r2  # md5-derived payloads, no rand()
    kinds = {r.kind for r in m1.collect()}
    assert kinds == {"image", "audio", "video"}
    assert all(len(p) == 32 for p in r1.values())


def test_decode_image_fake_stats(spark):
    media = MM.synth_media(spark, 30)
    out = MM.decode_image(media).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images > 0
    for r in out:
        assert r.width >= 64 and r.height >= 64
        assert 0.0 <= r.mean_byte <= 255.0 and r.std_byte >= 0.0


def test_decode_image_real_seam_raises(spark):
    media = MM.synth_media(spark, 6)
    with pytest.raises(Exception) as e:
        MM.decode_image(media, impl="pil").collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_media_features_shape_and_determinism(spark):
    media = MM.synth_media(spark, 24).repartition(4)  # multi-partition batches
    f1 = {r.media_id: r.embedding for r in MM.media_features(media, dim=8).collect()}
    f2 = {r.media_id: r.embedding for r in MM.media_features(media, dim=8).collect()}
    assert len(f1) == 24
    assert all(len(v) == 8 for v in f1.values())
    assert f1 == f2
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_resize_meta(spark):
    media = MM.synth_media(spark, 9)
    out = MM.resize_meta(media, 224, 224).select("meta.width", "meta.height").collect()
    assert all((r.width, r.height) == (224, 224) for r in out)


def test_sample_frames_counts(spark):
    media = MM.synth_media(spark, 30)
    vids = {r.media_id: r.meta.n_frames for r in media.filter(F.col("kind") == "video").collect()}
    out = MM.sample_frames(media, every_n=2).collect()
    per = {}
    for r in out:
        per[r.media_id] = per.get(r.media_id, 0) + 1
        assert len(bytes(r.frame_key)) == 16
    assert per == {mid: math.ceil(n / 2) for mid, n in vids.items()}
