"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, partition-preserving UDF signatures,
batch shapes, deterministic decoders for tests — is real.  Image decode
is ALSO real for PNG and baseline-JPEG payloads: vendored stdlib+numpy
codecs (:mod:`sparrow_ipc_spark.functions.png`, public PNG spec;
:mod:`sparrow_ipc_spark.functions.jpeg`, public ITU-T T.81 spec) back
``_decode_image_real`` (PIL remains uninstallable in this sandbox — no
network route; when importable it handles the remaining formats).  Other
formats without PIL still raise ``NotImplementedError`` loudly.
Audio/video decode remains a deterministic stand-in (no
stdlib-expressible codec).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.FloatType(), False),
        T.StructField("byte_entropy", T.FloatType(), False),
    ]
)


try:  # pragma: no cover - PIL is absent from this container
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode → grayscale (h, w) uint8.

    PNG and baseline JPEG always go through the vendored codecs — NOT PIL
    even when PIL is importable — so features are bit-deterministic across
    environments (PIL's convert("L") uses >>16 fixed-point luma that
    differs by ±1 from the vendored //1000 formula, and libjpeg's IDCT
    differs per build; a PIL-present machine would silently break the
    image_features oracle otherwise).  PIL handles every other format when
    importable; other formats without PIL raise loudly."""
    from sparrow_ipc_spark.functions import jpeg, png

    if png.is_png(payload):
        return png.luma(png.decode_png(payload))
    if jpeg.is_jpeg(payload):
        arr = jpeg.decode_jpeg(payload)
        return arr if arr.ndim == 2 else png.luma(arr)
    if _PIL_Image is not None:
        import io

        img = _PIL_Image.open(io.BytesIO(payload)).convert("L")  # pragma: no cover
        return np.asarray(img, dtype=np.uint8)  # pragma: no cover
    raise NotImplementedError(
        "non-PNG/JPEG media decode requires PIL/libvips (not installable in "
        "this sandbox); PNG and baseline JPEG decode via the vendored "
        "stdlib codecs")


def _decode_image_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes tiled to (h, w).
    Keeps the full Arrow→numpy→feature pipeline real and testable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = max(1, width) * max(1, height)
    tiled = np.resize(arr if len(arr) else np.zeros(1, np.uint8), need)
    return tiled.reshape(max(1, height), max(1, width))


def _int_or(v, default: int) -> int:
    """Nullable Int columns surface in pandas as float64 NaN — which is
    truthy, so ``int(v or 1)`` raises on NaN instead of defaulting."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return default
    return int(v)


def _entropy(b: np.ndarray) -> float:
    counts = np.bincount(b.reshape(-1), minlength=256)
    p = counts[counts > 0] / b.size
    return float(-(p * np.log2(p)).sum())


def image_features(df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas (one pass, no
    shuffle; batch shape = maxRecordsPerBatch rows of binary payloads).

    ``use_real_decode=True`` routes through :func:`_decode_image_real`
    (raises NotImplementedError where PIL is absent — see module
    docstring); the default fake decoder keeps the full pipeline testable
    on synthetic payloads."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # column-array zip, not iterrows (per-row Series construction is
            # the slowest pandas idiom); per-image decode is inherently
            # per-element Python
            for mid, payload, w, h in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
            ):
                if use_real_decode:
                    img = _decode_image_real(payload)
                else:
                    img = _decode_image_fake(payload, _int_or(w, 1), _int_or(h, 1))
                out.append(
                    (int(mid), img.shape[1], img.shape[0],
                     float(img.mean()), _entropy(img))
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.where(df["kind"] == "image").mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of the (fake-)decoded image, re-encoded as
    raw bytes — demonstrates payload-rewriting UDF shape."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, mime, w, h, dur, payload in zip(
                pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["mime"].to_numpy(), pdf["width"].to_numpy(),
                pdf["height"].to_numpy(), pdf["duration_ms"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                img = _decode_image_fake(payload, _int_or(w, 1), _int_or(h, 1))
                yi = np.linspace(0, img.shape[0] - 1, target_h).astype(np.int64)
                xi = np.linspace(0, img.shape[1] - 1, target_w).astype(np.int64)
                small = img[np.ix_(yi, xi)]
                rows.append(
                    (int(mid), kind, mime, target_w, target_h,
                     None if dur is None or (isinstance(dur, float) and np.isnan(dur)) else int(dur),
                     small.tobytes())
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return df.where(df["kind"] == "image").mapInPandas(rs, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.FloatType(), False),
        T.StructField("peak", T.FloatType(), False),
        T.StructField("zero_cross_rate", T.FloatType(), False),
    ]
)


def _decode_audio_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes viewed as PCM int16
    (a real build swaps in soundfile/ffmpeg, same signature)."""
    n = len(payload) // 2
    if n == 0:
        return np.zeros(1, dtype=np.int16)
    return np.frombuffer(payload, dtype=np.int16, count=n)


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip audio features (RMS, peak, zero-crossing rate) via
    Arrow-batched mapInPandas — completes the image/audio/video triad;
    per-clip decode is inherently per-element Python, vectorized inside."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()
            ):
                pcm = _decode_audio_fake(payload).astype(np.float32) / 32768.0
                zc = float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean()) if len(pcm) > 1 else 0.0
                out.append(
                    (int(mid), len(pcm), float(np.sqrt((pcm ** 2).mean())),
                     float(np.abs(pcm).max()), zc)
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.where(df["kind"] == "audio").mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    timestamp with a deterministic fake frame payload."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, dur, payload in zip(
                pdf["media_id"].to_numpy(), pdf["duration_ms"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                d = 0 if dur is None or (isinstance(dur, float) and np.isnan(dur)) else int(dur)
                for t in range(0, max(d, 1), every_ms):
                    frame = _decode_image_fake(payload, 8, 8)
                    rows.append((int(mid), t, frame.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.where(df["kind"] == "video").mapInPandas(fs, schema=out_schema)


def synthetic_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Pure-numpy deterministic media rows (no Spark) — shared by the
    Spark table builder and the driver-side oracle replay.  Every third
    image row is a baseline JPEG (vendored encoder; mixing 4:4:4, 4:2:0
    and restart intervals) so the real-decode path covers both vendored
    codecs end-to-end; the rest are PNGs."""
    from sparrow_ipc_spark.functions import jpeg, png

    rng = np.random.default_rng([seed, 777])
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
            dur = None
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((yy * 3 + xx * 5) % 251).astype(np.uint8)
            noise = rng.integers(0, 17, size=(h, w), dtype=np.uint8)
            gray = ((base.astype(np.uint16) + noise) % 256).astype(np.uint8)
            if i % 2:
                img = np.stack([gray, gray[::-1, :], gray[:, ::-1]], axis=-1)
            else:
                img = gray
            j = i // 3
            if j % 3 == 2:
                payload = jpeg.encode_jpeg(
                    img, quality=90, subsample=(j % 2 == 1),
                    restart_interval=3 if j % 4 == 3 else 0)
                mime = "image/jpeg"
            else:
                payload = png.encode_png(img)
                mime = "image/png"
        else:
            w = h = None
            dur = int(rng.integers(500, 5000))
            payload = rng.bytes(int(rng.integers(64, 512)))
            mime = f"x/{kind}"
        rows.append((i, kind, mime, w, h, dur, bytearray(payload)))
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (no external data).

    Image rows carry REAL PNG and baseline-JPEG payloads (vendored
    encoders; alternating grayscale/RGB gradients + seeded noise) so both
    real decode paths are exercised end-to-end; audio/video payloads stay
    opaque bytes for the stand-in decoders."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), schema=MEDIA_SCHEMA)
