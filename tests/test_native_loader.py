"""Native C++ PNG decoder / prefetch loader tests.

Test PNGs are written by the package's minimal pure-Python encoder
(``niftymatch_tpu.data.png``) so no imaging library is required."""

import numpy as np
import pytest

from niftymatch_tpu.data import native_loader
from niftymatch_tpu.data.png import write_png


needs_native = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@needs_native
def test_png_info_and_gray_roundtrip(tmp_path, rng):
    img = (rng.uniform(0, 255, (24, 32))).astype(np.uint8)
    p = str(tmp_path / "gray.png")
    write_png(p, img)
    assert native_loader.png_info(p) == (32, 24, 1, 8)
    out = native_loader.read_gray(p)
    np.testing.assert_allclose(out, img.astype(np.float32), atol=0)


@needs_native
def test_png_rgb_grayscale_weights(tmp_path):
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 100  # R
    rgb[..., 1] = 200  # G
    rgb[..., 2] = 50   # B
    p = str(tmp_path / "rgb.png")
    write_png(p, rgb)
    out = native_loader.read_gray(p)
    # Reference weights 0.21 R + 0.72 G + 0.07 B (bgra_2_gray.cu:16)
    expect = 0.21 * 100 + 0.72 * 200 + 0.07 * 50
    np.testing.assert_allclose(out, expect, atol=0.01)


@needs_native
def test_png_16bit_depth(tmp_path, rng):
    depth = (rng.uniform(0, 65535, (16, 20))).astype(np.uint16)
    p = str(tmp_path / "depth.png")
    write_png(p, depth, bitdepth=16)
    assert native_loader.png_info(p) == (20, 16, 1, 16)
    out = native_loader.read_depth16(p)
    np.testing.assert_array_equal(out, depth)


@needs_native
def test_prefetch_loader_order_and_content(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(6):
        img = (rng.uniform(0, 255, (12, 16))).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        write_png(p, img)
        paths.append(p)
        imgs.append(img)
    loader = native_loader.PrefetchLoader(paths, threads=3)
    got = list(loader)
    loader.close()
    assert len(got) == 6
    for g, img in zip(got, imgs):
        np.testing.assert_allclose(g, img.astype(np.float32), atol=0)


@needs_native
def test_bad_png_rejected(tmp_path):
    p = str(tmp_path / "junk.png")
    with open(p, "wb") as f:
        f.write(b"not a png at all, definitely not")
    assert native_loader.png_info(p) is None


@needs_native
def test_prefetch_loader_mixed_resolutions(tmp_path, rng):
    # Smaller-than-first frames must come back unscrambled (flat-buffer
    # reshape by the RETURNED dims, not a strided view of the first shape).
    big = (rng.uniform(0, 255, (8, 6))).astype(np.uint8)
    small = (rng.uniform(0, 255, (4, 4))).astype(np.uint8)
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    write_png(p1, big)
    write_png(p2, small)
    loader = native_loader.PrefetchLoader([p1, p2], threads=2)
    got = list(loader)
    loader.close()
    np.testing.assert_allclose(got[0], big.astype(np.float32))
    assert got[1].shape == (4, 4)
    np.testing.assert_allclose(got[1], small.astype(np.float32))
