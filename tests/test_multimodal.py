"""Multimodal column plumbing tests: schemas, Arrow batch shapes, explode
semantics.  The codec is a deterministic stub (container has no PIL); the
Spark-side machinery under test is real."""

import hashlib

import pytest

from cypher_for_apache_flink_spark.functions.multimodal import (
    decode_media,
    media_features,
    media_stats,
    media_table,
    resize_images,
    sample_frames,
)


def blob(seed: str, n: int = 256) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", blob("img1"), {"width": 4, "height": 4, "channels": 3,
                                    "format": "png"}),
        (2, "image", blob("img2"), {"width": 8, "height": 2, "channels": 1,
                                    "format": "jpeg"}),
        (3, "audio", blob("aud1"), {"sample_rate": 16000, "n_frames": 32,
                                    "format": "wav"}),
        (4, "video", blob("vid1", 1024), {"width": 4, "height": 4,
                                          "channels": 1, "n_frames": 6,
                                          "format": "mp4"}),
    ]
    return media_table(spark, rows).repartition(2)


def test_media_table_schema(media):
    assert dict(media.dtypes)["data"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    assert media.count() == 4


def test_decode_shapes(media):
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert got[1]["n_samples"] == 4 * 4 * 3
    assert got[2]["n_samples"] == 8 * 2 * 1
    assert got[3]["n_samples"] == 32 * 16   # frame-expanded audio stub
    assert len(got[1]["samples"]) == got[1]["n_samples"]
    # deterministic: same input -> same samples
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert got[1]["samples"] == again[1]["samples"]


def test_resize_updates_meta_and_data(media):
    imgs = media.where("kind = 'image'")
    out = resize_images(imgs, 2, 2)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["meta"]["width"] == 2 and rows[1]["meta"]["height"] == 2
    assert len(bytes(rows[1]["data"])) == 2 * 2 * 3
    assert len(bytes(rows[2]["data"])) == 2 * 2 * 1
    # output is a valid media table: can be decoded again
    redecoded = {r["media_id"]: r for r in decode_media(out).collect()}
    assert redecoded[1]["n_samples"] == 12


def test_sample_frames_stride(media):
    vid = media.where("kind = 'video'")
    frames = sample_frames(vid, stride=2).collect()
    assert sorted(r["frame"] for r in frames) == [0, 2, 4]
    per_frame = 4 * 4 * 1
    assert all(len(r["samples"]) == per_frame for r in frames)


def test_media_features_feed_similarity(media, spark):
    feats = media_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r["embedding"])
    # plugs into the ANN operator unchanged
    from cypher_for_apache_flink_spark.functions.similarity import (
        ann_topk_bruteforce,
    )
    q = rows[0]["embedding"]
    top = ann_topk_bruteforce(feats, q, k=2, id_col="media_id").collect()
    assert top[0]["media_id"] == rows[0]["media_id"]   # self is nearest
    assert top[0]["cosine"] == pytest.approx(1.0)


def test_media_stats_columnar(media):
    stats = {r["media_id"]: r for r in media_stats(media).collect()}
    assert stats[1]["n_bytes"] == 256
    assert stats[1]["n_pixels"] == 16
    assert stats[3]["width"] is None
    # no Python in this plan
    plan = media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()
