"""Pallas window-kernel equivalence tests (TPU only).

The fused orientation/descriptor window kernels (pallas/windows.py) are
compared against the jnp merged pipeline, which is itself pinned to the
per-octave oracle path (test_sift_e2e.py).  Interpret mode executes the
per-keypoint grid in Python and takes minutes even for tiny inputs, so
these tests only run on a real TPU backend; the CPU CI tier exercises the
jnp path the kernels must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from niftymatch_tpu.config import SiftConfig
from niftymatch_tpu.sift import (
    detect_and_describe,
    detect_and_describe_batch,
    make_detector,
)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas window kernels need a TPU backend (interpret mode is "
    "impractically slow for per-keypoint grids)",
)


def _structured_image(h, w, seed=0, n_blobs=25):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        by, bx = rng.uniform(8, h - 8), rng.uniform(8, w - 8)
        bs = rng.uniform(1.5, 6.0)
        amp = rng.uniform(80, 255) * rng.choice([-1, 1])
        img += amp * np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * bs**2))
    return img + 128.0


def _sorted_valid(f):
    v = np.asarray(f.valid)
    order = np.lexsort((np.asarray(f.y)[v], np.asarray(f.x)[v]))
    return v, order


@requires_tpu
def test_window_kernels_match_jnp_merged_path():
    img = _structured_image(96, 128, seed=2)
    kw = dict(width=128, height=96, max_keypoints_per_level=64, max_features=256)
    f_p = make_detector(SiftConfig(**kw))(jnp.asarray(img))
    f_j = jax.jit(
        lambda x: detect_and_describe(
            x, SiftConfig(use_pallas_windows=False, **kw)
        )
    )(jnp.asarray(img))
    vp, op = _sorted_valid(f_p)
    vj, oj = _sorted_valid(f_j)
    assert vp.sum() == vj.sum() > 10
    for field in ("x", "y", "sigma", "angle", "response"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_p, field))[vp][op],
            np.asarray(getattr(f_j, field))[vj][oj],
            atol=1e-4,
            err_msg=field,
        )
    np.testing.assert_allclose(
        np.asarray(f_p.desc)[vp][op], np.asarray(f_j.desc)[vj][oj], atol=2e-3
    )


@requires_tpu
def test_batched_window_kernels_match_single():
    imgs = [_structured_image(96, 128, seed=s) for s in (3, 9)]
    cfg = SiftConfig(
        width=128, height=96, max_keypoints_per_level=64, max_features=256
    )
    fb = jax.jit(lambda x: detect_and_describe_batch(x, cfg))(
        jnp.stack([jnp.asarray(im) for im in imgs])
    )
    single = make_detector(cfg)
    for b, im in enumerate(imgs):
        f1 = single(jnp.asarray(im))
        f_b = jax.tree.map(lambda a: a[b], fb)
        vb, ob = _sorted_valid(f_b)
        v1, o1 = _sorted_valid(f1)
        assert vb.sum() == v1.sum() > 10
        np.testing.assert_allclose(
            np.asarray(f_b.x)[vb][ob], np.asarray(f1.x)[v1][o1], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f_b.desc)[vb][ob],
            np.asarray(f1.desc)[v1][o1],
            atol=1e-5,
        )
