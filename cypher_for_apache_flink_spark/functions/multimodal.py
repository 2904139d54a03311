"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Design for 100 TB media lakes:
 - media rows are (id, kind, data: binary, meta: struct) — the bytes stay
   opaque to Catalyst, metadata is columnar and prunable;
 - decode / resize / frame-sample / feature-extract run as Arrow-batched
   ``mapInPandas`` stages (one Python worker per partition, zero-copy
   batches) — the ONLY Python-side operators in this repo, because codecs
   are genuinely not expressible as column expressions;
 - batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
   callers control partition width with ``repartition`` so a partition's
   in-flight decoded frames fit in worker memory.

CODEC STATUS (round 8): UNCOMPRESSED formats decode FOR REAL with pure
numpy — binary PPM (P6), 24-bit BMP, 16-bit PCM WAV — so the pipeline is
end-to-end genuine for raw media; PNG/JPEG decode via Pillow when
importable.  Compressed codecs (this container has no Pillow/librosa/
ffmpeg) fall back through :func:`_decode_bytes` to a clearly-marked
DETERMINISTIC FAKE (byte-stream digest expanded to the declared shape) so
the Spark-side plumbing — schemas, UDF signatures, batch iteration,
explode shapes — stays fully tested.  Swap in a codec and nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - container has no PIL
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, n_frames:int, format:string>"
)

FEATURE_DIM = 64


def media_table(spark: SparkSession, rows) -> DataFrame:
    """Build a typed media table from (media_id, kind, data, meta_dict)."""
    packed = [
        (mid, kind, bytearray(data),
         (meta.get("width"), meta.get("height"), meta.get("channels"),
          meta.get("sample_rate"), meta.get("n_frames"), meta.get("format")))
        for mid, kind, data, meta in rows
    ]
    return spark.createDataFrame(packed, MEDIA_SCHEMA)


def _m(meta, key, default: int = 0) -> int:
    """Read an int meta field from an Arrow struct dict: nulls arrive as
    None OR NaN (NaN is truthy, so ``value or 0`` is not enough)."""
    v = meta.get(key) if hasattr(meta, "get") else meta[key]
    if v is None or v != v:
        return default
    return int(v)


def _opt(meta, key):
    """Nullable int meta field (None for null/NaN) — safe to write back
    into an int struct field."""
    v = meta.get(key) if hasattr(meta, "get") else meta[key]
    return None if v is None or v != v else int(v)


def _fake_pixels(data: bytes, n: int) -> list:
    """Deterministic stand-in for a real decoder: expand the byte stream's
    digest to ``n`` uint8 samples.  STUB — replace with PIL/librosa."""
    out = bytearray()
    counter = 0
    seed = hashlib.md5(data).digest()
    while len(out) < n:
        out.extend(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return list(out[:n])


def _decode_ppm(data: bytes) -> list:
    """REAL decoder: binary PPM (P6) via pure numpy — header is ASCII
    tokens (width, height, maxval; '#' comments allowed), payload is raw
    RGB rows."""
    import numpy as np
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    i += 1                       # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (need 8-bit)")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.tolist()


def _decode_bmp(data: bytes) -> list:
    """REAL decoder: uncompressed 24-bit BMP via pure numpy — bottom-up
    BGR rows padded to 4 bytes, returned as flat top-down RGB."""
    import numpy as np
    if data[:2] != b"BM":
        raise ValueError("not a BMP")

    def le(off, n):
        return int.from_bytes(data[off:off + n], "little")

    pix_off = le(10, 4)
    w, h = le(18, 4), int.from_bytes(data[22:26], "little", signed=True)
    bpp, compression = le(28, 2), le(30, 4)
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp}/compression={compression} "
                         "unsupported (need uncompressed 24-bit)")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=row * h,
                        offset=pix_off).reshape(h, row)[:, :w * 3]
    rows = raw[::-1] if bottom_up else raw
    rgb = rows.reshape(h, w, 3)[:, :, ::-1]     # BGR -> RGB
    return rgb.ravel().tolist()


def _decode_wav(data: bytes) -> list:
    """REAL decoder: RIFF/WAVE 16-bit PCM via pure numpy, downconverted
    to uint8 samples ((s >> 8) + 128) to match the flat-uint8 contract."""
    import numpy as np
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt_ok, payload = 12, False, None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(data[i + 8:i + 10], "little")
            bits = int.from_bytes(data[i + 22:i + 24], "little")
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"WAV fmt={audio_fmt}/bits={bits} "
                                 "unsupported (need 16-bit PCM)")
            fmt_ok = True
        elif cid == b"data":
            payload = data[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)          # chunks are word-aligned
    if not fmt_ok or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(payload, dtype="<i2")
    return ((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8).tolist()


_REAL_DECODERS = {"ppm": _decode_ppm, "bmp": _decode_bmp,
                  "wav": _decode_wav}


def _decode_bytes(data: bytes, meta) -> list:
    """Decode one media blob to flat uint8 samples (pixels / PCM / frames).

    REAL paths: PPM (P6), uncompressed 24-bit BMP, and 16-bit PCM WAV are
    decoded with pure numpy (round 8 — no codec library needed); PNG/JPEG
    decode via PIL when importable.  Everything else (compressed codecs:
    no Pillow/librosa/ffmpeg in this container) falls back to the
    deterministic fake so the plumbing stays testable."""
    fmt = meta.get("format") if hasattr(meta, "get") else meta["format"]
    fmt = None if fmt is None or fmt != fmt else str(fmt)
    real = _REAL_DECODERS.get(fmt)
    if real is not None:
        return real(bytes(data))
    if _HAS_PIL and fmt in ("png", "jpeg"):  # pragma: no cover
        import io

        import numpy as np
        img = Image.open(io.BytesIO(data))
        return list(np.asarray(img, dtype="uint8").ravel())
    n = _m(meta, "width") * _m(meta, "height") * _m(meta, "channels", 1)
    if not n:
        n = _m(meta, "n_frames", 1) * 16
    return _fake_pixels(data, n)


def decode_media(df: DataFrame) -> DataFrame:
    """(media_id, kind, data, meta) -> (media_id, kind, n_samples, samples).

    Arrow-batched mapInPandas: each batch decodes in one Python call; the
    binary column never round-trips through Python row-at-a-time."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            samples = [
                _decode_bytes(bytes(d), m)
                for d, m in zip(pdf["data"], pdf["meta"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_samples": [len(s) for s in samples],
                "samples": samples,
            })

    return df.mapInPandas(
        run, "media_id bigint, kind string, n_samples bigint, "
             "samples array<smallint>")


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode every image to (width, height): decode, nearest-neighbour
    resample (real arithmetic — only the codec is fake), update meta."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_rows = []
            for mid, kind, data, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["data"], pdf["meta"]):
                ch = _m(meta, "channels", 1)
                src = _decode_bytes(bytes(data), meta)
                sw, sh = _m(meta, "width", 1), _m(meta, "height", 1)
                pix = []
                for y in range(height):
                    sy = min(int(y * sh / height), sh - 1)
                    for x in range(width):
                        sx = min(int(x * sw / width), sw - 1)
                        base = (sy * sw + sx) * ch
                        pix.extend(src[base:base + ch])
                out_rows.append((mid, kind, bytearray(pix),
                                 (width, height, ch, _opt(meta, "sample_rate"),
                                  _opt(meta, "n_frames"), meta["format"])))
            yield pd.DataFrame(out_rows, columns=[
                "media_id", "kind", "data", "meta"])

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame (every
    ``stride``-th), each carrying its frame index and decoded samples."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"],
                                       pdf["meta"]):
                n_frames = _m(meta, "n_frames", 1)
                per_frame = (_m(meta, "width", 4) * _m(meta, "height", 4)
                             * _m(meta, "channels", 1))
                allpix = _fake_pixels(bytes(data), n_frames * per_frame)
                for fi in range(0, n_frames, stride):
                    rows.append((mid, fi,
                                 allpix[fi * per_frame:(fi + 1) * per_frame]))
            yield pd.DataFrame(rows, columns=["media_id", "frame", "samples"])

    return df.mapInPandas(
        run, "media_id bigint, frame int, samples array<smallint>")


def media_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim embedding per media blob (deterministic digest features —
    STUB for a real vision/audio encoder).  Output plugs straight into the
    similarity-search operators (functions/similarity.py)."""
    import pandas as pd

    def embed(data: bytes) -> list:
        seed = hashlib.md5(data).digest()
        vals = []
        counter = 0
        while len(vals) < dim:
            block = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
            for i in range(0, 16, 8):
                u = int.from_bytes(block[i:i + 8], "big")
                vals.append(u / 2.0 ** 63 - 1.0)
            counter += 1
        return vals[:dim]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "embedding": [embed(bytes(d)) for d in pdf["data"]],
            })

    return df.mapInPandas(run, "media_id bigint, embedding array<float>")


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-columnar metadata profiling — no Python, full codegen: the
    binary column's size and the typed meta fields are first-class columns."""
    return df.select(
        F.col("media_id"),
        F.col("kind"),
        F.length(F.col("data")).alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("meta.width") * F.col("meta.height")).alias("n_pixels"),
        F.col("meta.format").alias("format"),
    )
