"""Vendored baseline-JPEG codec: round-trip accuracy, exactness anchors
derived from the spec's math (solid images survive quantization exactly),
restart-marker and 4:2:0 decode equivalence, corruption/unsupported-stream
errors, and the real image_features decode path over JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from sparrow_ipc_spark.functions import jpeg, png


def _gradient(h, w, rgb=True):
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 3 + xx * 5) % 251).astype(np.uint8)
    if not rgb:
        return g
    return np.stack([g, g[::-1, :], g[:, ::-1]], axis=-1)


def _smooth(h, w, rgb=True):
    g = np.clip(np.round(
        96 + 64 * np.sin(np.arange(h)[:, None] / 6.0)
        + 48 * np.cos(np.arange(w)[None, :] / 9.0)), 0, 255).astype(np.uint8)
    if not rgb:
        return g
    return g[..., None].repeat(3, axis=-1)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 23), (33, 47)])
@pytest.mark.parametrize("rgb", [False, True])
def test_roundtrip_bounded_error(shape, rgb):
    img = _smooth(*shape, rgb=rgb)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
    assert err.mean() <= 2.0 and err.max() <= 12


def test_solid_images_roundtrip_exact():
    """Spec-anchored exactness: a solid plane has only a DC coefficient
    (v-128)*8 (orthonormal IDCT: pixels = DC/8); at quality 85 the scaled
    Annex K DC quantizer is 5, so dequantization error < 0.5 and every
    gray value must reconstruct EXACTLY — a two-sided check of DCT
    scaling, quantization, Huffman coding and the decode path."""
    for v in range(0, 256, 1):
        img = np.full((16, 24), v, dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        assert np.array_equal(dec, img), v


def test_restart_markers_decode_identically():
    """DRI/RSTn only re-segments the entropy stream (and resets DC
    predictors) — the quantized coefficients are identical, so decoding
    must be bit-identical with and without restart intervals."""
    img = _gradient(40, 56)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
    for ri in (1, 2, 5, 7):
        withrst = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=80, restart_interval=ri))
        assert np.array_equal(base, withrst), ri


def test_subsample_420_roundtrip():
    """4:2:0: luma grid is 2x2 blocks per MCU, chroma upsampled 2x — the
    decoder's sampling-factor paths.  Chroma-flat input must survive with
    the same luma accuracy as 4:4:4."""
    g = _smooth(24, 40, rgb=False)
    img = g[..., None].repeat(3, axis=-1)  # gray content in RGB: flat chroma
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=True))
    assert dec.shape == img.shape
    err = np.abs(png.luma(dec).astype(np.int64) - g.astype(np.int64))
    assert err.mean() <= 3.0
    # sharp-chroma content still bounded
    img2 = _gradient(33, 47)
    dec2 = jpeg.decode_jpeg(jpeg.encode_jpeg(img2, quality=90, subsample=True))
    assert dec2.shape == img2.shape
    assert np.abs(dec2.astype(np.int64) - img2.astype(np.int64)).mean() <= 12.0


def test_subsample_with_restart():
    img = _gradient(33, 47)
    a = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=True))
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=True,
                                          restart_interval=2))
    assert np.array_equal(a, b)


def test_deterministic_bytes():
    img = _gradient(19, 21)
    assert jpeg.encode_jpeg(img, 85) == jpeg.encode_jpeg(img, 85)
    assert jpeg.encode_jpeg(img, 85, True, 3) == jpeg.encode_jpeg(img, 85, True, 3)
    assert jpeg.encode_jpeg(img, 85) != jpeg.encode_jpeg(img, 95)


def test_quality_monotone_size():
    img = _smooth(48, 48)
    sizes = [len(jpeg.encode_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_errors_and_unsupported():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    enc = bytearray(jpeg.encode_jpeg(_gradient(16, 16), 85))
    # rewrite SOF0 -> SOF2 (progressive): must refuse loudly, not garble
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(enc))
    assert not jpeg.is_jpeg(b"\x89PNG")
    assert jpeg.is_jpeg(jpeg.encode_jpeg(_gradient(8, 8)))


def test_grayscale_single_component():
    img = _smooth(21, 19, rgb=False)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92))
    assert dec.ndim == 2 and dec.shape == img.shape


def test_image_features_jpeg_payloads(spark):
    """synthetic_media now mixes PNG and JPEG payloads; the real-decode
    mapInPandas path must report header dimensions for BOTH (the stand-in
    decoder could not know them from payload bytes alone)."""
    from sparrow_ipc_spark.functions.multimodal import (
        _decode_image_real, image_features, synthetic_media,
        synthetic_media_rows)

    rows = synthetic_media_rows(n=48)
    mimes = {r[0]: r[2] for r in rows if r[1] == "image"}
    assert "image/jpeg" in mimes.values() and "image/png" in mimes.values()
    meta = {r[0]: (r[3], r[4]) for r in rows if r[1] == "image"}
    feats = image_features(synthetic_media(spark, n=48),
                           use_real_decode=True).collect()
    assert len(feats) == len(meta) > 0
    for r in feats:
        assert (r["width"], r["height"]) == meta[r["media_id"]]
    # driver-side replay (the oracle's side) agrees with the Spark side
    for r in rows:
        if r[1] != "image":
            continue
        img = _decode_image_real(bytes(r[6]))
        got = next(f for f in feats if f["media_id"] == r[0])
        assert (got["width"], got["height"]) == (img.shape[1], img.shape[0])
        assert got["mean_luma"] == np.float32(img.mean())


def _patch_sof_sampling(payload: bytes, hv: int) -> bytes:
    """Rewrite the single SOF0 component's sampling-factor byte.  SOF0
    layout: FFC0 len(2) prec(1) h(2) w(2) nc(1) [id hv tq]*."""
    i = payload.index(b"\xff\xc0")
    nc = payload[i + 9]
    assert nc == 1
    b = bytearray(payload)
    b[i + 11] = hv
    return bytes(b)


def test_single_component_scan_is_non_interleaved_any_factors():
    """T.81 A.2.2: a one-component scan is non-interleaved, so the
    sampling factors do not change its block layout — a grayscale file
    keeping 2x2 luma factors (e.g. jpegtran -grayscale output from a
    4:2:0 source) must decode exactly like its 1x1 twin, not be walked
    with 16x16-MCU interleaved geometry."""
    rng = np.random.default_rng(11)
    for shape in ((24, 24), (17, 23)):  # multiple-of-16 and ragged dims
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base_payload = jpeg.encode_jpeg(img, quality=90)
        base = jpeg.decode_jpeg(base_payload)
        for hv in (0x22, 0x21, 0x12):
            dec = jpeg.decode_jpeg(_patch_sof_sampling(base_payload, hv))
            assert np.array_equal(dec, base)


def test_single_component_non_interleaved_with_restart_markers():
    """Non-interleaved restart intervals count MCUs = single blocks; the
    resync path must line up identically for any sampling factors."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=85, restart_interval=3)
    base = jpeg.decode_jpeg(payload)
    dec = jpeg.decode_jpeg(_patch_sof_sampling(payload, 0x22))
    assert np.array_equal(dec, base)
