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
        # mp3: a compressed format, so it exercises the deterministic
        # decode STUB (16-bit PCM "wav" decodes for real since round 8)
        (3, "audio", blob("aud1"), {"sample_rate": 16000, "n_frames": 32,
                                    "format": "mp3"}),
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


# --- real uncompressed-format decoders (round 8) --------------------------

def _ppm_bytes(w, h, px):
    """Encode RGB pixel list [(r,g,b), ...] as binary PPM (P6)."""
    return (f"P6\n# test image\n{w} {h}\n255\n".encode()
            + bytes(c for p in px for c in p))


def _bmp_bytes(w, h, px):
    """Encode RGB rows (top-down list of rows of (r,g,b)) as a 24-bit
    uncompressed bottom-up BMP."""
    row_pad = (w * 3 + 3) // 4 * 4 - w * 3
    body = b""
    for row in reversed(px):                   # bottom-up storage
        body += bytes(c for (r, g, b) in row for c in (b, g, r))
        body += b"\0" * row_pad
    pix_off = 14 + 40
    size = pix_off + len(body)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
           + pix_off.to_bytes(4, "little"))
    info = (40).to_bytes(4, "little") + w.to_bytes(4, "little") \
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little") \
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little") \
        + len(body).to_bytes(4, "little") + b"\0" * 16
    return hdr + info + body


def _wav_bytes(samples16):
    """Encode int16 samples as a minimal 16-bit PCM mono WAV."""
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)


@pytest.fixture(scope="module")
def real_media(spark):
    ppm = _ppm_bytes(2, 2, [(255, 0, 0), (0, 255, 0),
                            (0, 0, 255), (9, 8, 7)])
    bmp = _bmp_bytes(3, 2, [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
                            [(10, 11, 12), (13, 14, 15), (16, 17, 18)]])
    wav = _wav_bytes([0, 256, -256, 32767, -32768])
    rows = [
        (1, "image", ppm, {"width": 2, "height": 2, "channels": 3,
                           "format": "ppm"}),
        (2, "image", bmp, {"width": 3, "height": 2, "channels": 3,
                           "format": "bmp"}),
        (3, "audio", wav, {"sample_rate": 8000, "format": "wav"}),
    ]
    return media_table(spark, rows).repartition(2)


def test_ppm_decodes_real_pixels(real_media):
    got = {r["media_id"]: r for r in decode_media(real_media).collect()}
    assert got[1]["samples"] == [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7]
    assert got[1]["n_samples"] == 12


def test_bmp_decodes_topdown_rgb(real_media):
    got = {r["media_id"]: r for r in decode_media(real_media).collect()}
    assert got[2]["samples"] == list(range(1, 19))


def test_wav_decodes_pcm16_to_uint8(real_media):
    got = {r["media_id"]: r for r in decode_media(real_media).collect()}
    # (s >> 8) + 128: 0->128, 256->129, -256->127, 32767->255, -32768->0
    assert got[3]["samples"] == [128, 129, 127, 255, 0]


def test_corrupt_real_format_raises(spark):
    df = media_table(spark, [(9, "image", b"P6 garbage",
                              {"width": 2, "height": 2, "channels": 3,
                               "format": "bmp"})])
    with pytest.raises(Exception, match="not a BMP"):
        decode_media(df).collect()


def test_unknown_format_still_uses_fake(spark):
    # compressed codecs remain stubbed: same bytes -> same fake samples
    df = media_table(spark, [(5, "video", blob("v"),
                              {"n_frames": 4, "format": "mp4"})])
    a = decode_media(df).collect()[0]["samples"]
    b = decode_media(df).collect()[0]["samples"]
    assert a == b and len(a) == 64
