"""Multimodal plumbing: schemas, determinism, in-UDF explode."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from ragflow_spark.operators.multimodal import build_media_table

    df = build_media_table(spark, SF).cache()
    df.count()
    return df


def test_media_schema_and_types(media):
    kinds = dict(media.groupBy("media_type").count().collect())
    assert set(kinds) == {"image", "audio", "video"}
    f = {x.name: x.dataType.simpleString() for x in media.schema.fields}
    assert f["payload"] == "binary" and f["duration_ms"] == "int"


def test_image_features_deterministic(spark, media):
    from ragflow_spark.operators.multimodal import image_features

    a = {r.url: (r.mean_luma, r.edge_density)
         for r in image_features(media).collect()}
    b = {r.url: (r.mean_luma, r.edge_density)
         for r in image_features(media.repartition(7)).collect()}
    assert a == b
    assert len(a) == media.where(F.col("media_type") == "image").count()
    assert all(0 <= luma <= 255 for luma, _ in a.values())


def test_frame_sample_explodes_in_udf(spark, media):
    from ragflow_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, every_ms=500)
    rows = frames.collect()
    n_videos = media.where(F.col("media_type") == "video").count()
    assert len(rows) > n_videos  # multiple frames per video
    per = {}
    for r in rows:
        per.setdefault(r.url, []).append((r.frame_idx, r.ts_ms))
    for url, fr in per.items():
        fr.sort()
        assert fr[0] == (0, 0)
        assert all(b[1] - a[1] == 500 for a, b in zip(fr, fr[1:]))


def test_audio_features(spark, media):
    from ragflow_spark.operators.multimodal import audio_features

    rows = audio_features(media).collect()
    assert len(rows) == media.where(
        F.col("media_type") == "audio").count()
    assert all(r.rms > 0 and r.zero_crossings >= 0 for r in rows)


def test_decode_stub_is_seeded_by_payload():
    from ragflow_spark.operators.multimodal import decode_image

    a = decode_image(b"same-bytes", 8, 6)
    b = decode_image(b"same-bytes", 8, 6)
    c = decode_image(b"diff-bytes", 8, 6)
    assert a.shape == (6, 8, 3)
    assert (a == b).all()
    assert (a != c).any()
