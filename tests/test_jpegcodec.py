"""Baseline JPEG codec round-trip and multimodal integration tests."""

import numpy as np
import pandas as pd
import pytest

from rasterkit_spark.io import jpegcodec as JC
from rasterkit_spark.operators import multimodal as MM


def test_jpeg_roundtrip_gray_gradient_near_lossless():
    g = (np.linspace(0, 255, 64)[None, :]
         * np.ones((48, 1))).astype(np.uint8)
    px, meta = JC.read_jpeg(JC.write_jpeg(g, quality=90))
    assert (meta["width"], meta["height"], meta["channels"]) == (64, 48, 1)
    assert int(np.abs(px.astype(int) - g.astype(int)).max()) <= 2


def test_jpeg_roundtrip_rgb_and_odd_sizes():
    rng = np.random.default_rng(11)
    rgb = np.zeros((40, 56, 3), np.uint8)
    rgb[..., 0] = np.linspace(0, 255, 56)[None, :]
    rgb[..., 1] = np.linspace(255, 0, 40)[:, None]
    rgb[..., 2] = 128
    px, meta = JC.read_jpeg(JC.write_jpeg(rgb, quality=95))
    assert meta["channels"] == 3 and px.shape == (40, 56, 3)
    assert int(np.abs(px.astype(int) - rgb.astype(int)).max()) <= 3
    odd = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    px, meta = JC.read_jpeg(JC.write_jpeg(odd, 85))
    assert px.shape == (17, 13, 3)       # edge padding cropped back off


def test_jpeg_quality_monotonic_and_noise_q100():
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    e100 = np.abs(JC.read_jpeg(JC.write_jpeg(noisy, 100))[0].astype(int)
                  - noisy.astype(int)).max()
    e30 = np.abs(JC.read_jpeg(JC.write_jpeg(noisy, 30))[0].astype(int)
                 - noisy.astype(int)).max()
    assert e100 <= 2
    assert e30 >= e100                   # lower quality, larger error


def test_jpeg_rejects_out_of_scope():
    with pytest.raises(JC.JpegError):
        JC.read_jpeg(b"\x89PNG not a jpeg....")
    # progressive marker (SOF2) refused, not mis-decoded
    g = np.zeros((8, 8), np.uint8)
    blob = bytearray(JC.write_jpeg(g))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC2
    with pytest.raises(JC.JpegError, match="baseline"):
        JC.read_jpeg(bytes(blob))


def test_multimodal_real_jpeg_decode(spark):
    """JPEG payloads exercise the stdlib+numpy jpegcodec REAL path
    end-to-end: metadata, resize (JPEG-in → JPEG-out), histogram features,
    strict=True NOT raising (baseline JPEG is real now)."""
    g = (np.linspace(0, 255, 64)[None, :]
         * np.ones((48, 1))).astype(np.uint8)
    rgb = np.zeros((20, 30, 3), np.uint8)
    rgb[..., 0] = np.linspace(0, 255, 30)[None, :]
    rgb[..., 2] = np.linspace(0, 255, 20)[:, None]
    media = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["g", "c"],
        "blob": [bytearray(JC.write_jpeg(g)),
                 bytearray(JC.write_jpeg(rgb))]}))

    meta = (MM.decode_image_meta(media, strict=True)
            .toPandas().set_index("media_ref"))
    assert (meta.loc["g", "width"], meta.loc["g", "height"],
            meta.loc["g", "channels"]) == (64, 48, 1)
    assert (meta.loc["c", "width"], meta.loc["c", "channels"]) == (30, 3)
    assert (meta.decode_ok == 1).all()

    rs = (MM.resize_images(media, 16, 12, strict=True)
          .toPandas().set_index("media_ref"))
    got, m = JC.read_jpeg(bytes(rs.loc["c", "blob"]))
    assert (m["width"], m["height"], m["channels"]) == (16, 12, 3)

    feats = MM.image_features(media, dim=16).toPandas().set_index("media_ref")
    decoded, _ = JC.read_jpeg(bytes(bytearray(JC.write_jpeg(g))))
    hist, _ = np.histogram(decoded, bins=16, range=(0, 256))
    np.testing.assert_allclose(np.array(feats.loc["g", "feature"]),
                               hist / hist.sum(), rtol=1e-6)


def _mjpeg_fixture(n_frames=7, w=48, h=32):
    """Deterministic MJPEG AVI from THE shared builder (fixtures/video.py
    — the same one the driver-gate video query and its oracle use)."""
    from rasterkit_spark.fixtures.video import gradient_mjpeg
    return gradient_mjpeg(n_frames, w, h, quality=90, salt=1)


def test_avi_mjpeg_roundtrip():
    """write_mjpeg_avi → read_mjpeg_frames returns the EXACT jpeg
    payloads in stream order (container adds no loss), and each payload
    decodes through the in-repo JPEG codec to the right shape."""
    from rasterkit_spark.io import avicodec as AC
    blob, jpegs = _mjpeg_fixture()
    got = AC.read_mjpeg_frames(blob)
    assert got == jpegs
    px, meta = JC.read_jpeg(got[3])
    assert px.shape == (32, 48)
    assert (meta["width"], meta["height"]) == (48, 32)


def test_avi_rejects_garbage_and_truncation():
    from rasterkit_spark.io import avicodec as AC
    with pytest.raises(AC.AviError):
        AC.read_mjpeg_frames(b"not an avi at all")
    blob, _ = _mjpeg_fixture(3)
    # truncating inside a movi chunk must raise, not return garbage
    with pytest.raises(AC.AviError):
        AC.read_mjpeg_frames(blob[:len(blob) // 2])


def test_sample_video_frames_real_mjpeg(spark):
    """strict mode walks a real MJPEG/AVI: frame-count parity with the
    container (every_n sampling) and byte-exact JPEG payloads."""
    blob, jpegs = _mjpeg_fixture(7)
    video = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["v1"], "blob": [bytearray(blob)]}))
    out = MM.sample_video_frames(video, every_n=2, strict=True) \
        .toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 2, 4, 6]
    assert [bytes(f) for f in out.frame] == [jpegs[i] for i in (0, 2, 4, 6)]
    # non-AVI + strict still raises (only the MJPEG container is real)
    junk = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["vx"], "blob": [bytearray(b"z" * 9000)]}))
    with pytest.raises(Exception, match="MJPEG/AVI"):
        MM.sample_video_frames(junk, every_n=2, strict=True).toPandas()


def test_jpeg_marker_scan_robustness():
    """T.81 oddities the strict scan must survive: 0xFF fill bytes before
    a marker, standalone TEM (0xFF01), and truncation raising JpegError
    (not struct.error/IndexError) per the documented contract."""
    px = (np.arange(16 * 16, dtype=np.uint8).reshape(16, 16))
    blob = JC.write_jpeg(px, quality=80)
    assert blob[:2] == b"\xff\xd8"
    # inject fill bytes + a standalone TEM right after SOI
    padded = blob[:2] + b"\xff\xff\xff" + b"\xff\x01" + blob[2:]
    out, meta = JC.read_jpeg(padded)
    base, _ = JC.read_jpeg(blob)
    assert np.array_equal(out, base)
    # truncations anywhere must raise JpegError, nothing lower-level
    for cut in (3, 5, 9, 21, len(blob) // 2, len(blob) - 3):
        with pytest.raises(JC.JpegError):
            JC.read_jpeg(blob[:cut])
    with pytest.raises(JC.JpegError):
        JC.read_jpeg(b"\xff\xd8\xff\xc0\x00\x03\x08")  # short SOF seg
