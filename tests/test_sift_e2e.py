"""End-to-end SIFT detect + describe + match tests (BASELINE config 1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from niftymatch_tpu import (
    Features,
    SiftConfig,
    PipelineConfig,
    detect_and_describe,
    make_detector,
    make_pair_pipeline,
    match_pair,
)
from niftymatch_tpu.features import concat_features, topk_features
from functools import lru_cache


@lru_cache(maxsize=None)
def _detector(c):
    """Process-cached jitted detector per config: tests share compiles
    instead of paying eager per-op dispatch for every call."""
    return make_detector(c)



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


def test_detect_and_describe_runs_and_is_deterministic():
    img = _structured_image(96, 128, seed=1)
    c = SiftConfig(width=128, height=96, max_keypoints_per_level=64, max_features=256)
    f1 = _detector(c)(jnp.asarray(img))
    f2 = _detector(c)(jnp.asarray(img))
    assert isinstance(f1, Features)
    assert int(f1.count()) > 10
    np.testing.assert_array_equal(np.asarray(f1.x), np.asarray(f2.x))
    np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))


@pytest.mark.slow  # the eager half is a per-op dispatch storm (~1 min)
def test_detect_jit_compiles_and_matches_eager():
    img = _structured_image(96, 128, seed=2)
    c = SiftConfig(width=128, height=96, max_keypoints_per_level=64, max_features=256)
    detect = _detector(c)
    fj = detect(jnp.asarray(img))
    fe = detect_and_describe(jnp.asarray(img), c)
    # Compare valid slots only, order-insensitively: the padding tail holds
    # don't-care gather garbage, and equal-response features may be ranked
    # in either order (top-k tie-breaking is compilation-dependent).
    vj, ve = np.asarray(fj.valid), np.asarray(fe.valid)
    assert vj.sum() == ve.sum() > 10
    oj = np.lexsort((np.asarray(fj.y)[vj], np.asarray(fj.x)[vj]))
    oe = np.lexsort((np.asarray(fe.y)[ve], np.asarray(fe.x)[ve]))
    np.testing.assert_allclose(
        np.asarray(fj.x)[vj][oj], np.asarray(fe.x)[ve][oe], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(fj.desc)[vj][oj], np.asarray(fe.desc)[ve][oe], atol=1e-3
    )


def test_merged_pipeline_matches_per_octave_oracle():
    """The merged cross-octave pipeline (global top-k before orientation/
    descriptors, single stacked-gradient gather) must produce the same
    feature set as the reference-shaped per-octave composition."""
    from niftymatch_tpu.sift import detect_and_describe_per_octave

    img = _structured_image(96, 128, seed=7)
    for second in (False, True):
        c = SiftConfig(
            width=128, height=96, max_keypoints_per_level=64, max_features=256,
            use_second_orientation=second,
        )
        fm = _detector(c)(jnp.asarray(img))
        fo = jax.jit(
            lambda x, _c=c: detect_and_describe_per_octave(x, _c)
        )(jnp.asarray(img))
        vm, vo = np.asarray(fm.valid), np.asarray(fo.valid)
        assert vm.sum() == vo.sum() > 10
        om = np.lexsort((np.asarray(fm.angle)[vm], np.asarray(fm.y)[vm], np.asarray(fm.x)[vm]))
        oo = np.lexsort((np.asarray(fo.angle)[vo], np.asarray(fo.y)[vo], np.asarray(fo.x)[vo]))
        for field in ("x", "y", "sigma", "angle", "response"):
            np.testing.assert_allclose(
                np.asarray(getattr(fm, field))[vm][om],
                np.asarray(getattr(fo, field))[vo][oo],
                atol=1e-4,
                err_msg=field,
            )
        np.testing.assert_allclose(
            np.asarray(fm.desc)[vm][om], np.asarray(fo.desc)[vo][oo], atol=1e-4
        )


def test_features_are_ranked_and_masked():
    img = _structured_image(96, 128, seed=3)
    c = SiftConfig(width=128, height=96, max_keypoints_per_level=64, max_features=64)
    f = _detector(c)(jnp.asarray(img))
    v = np.asarray(f.valid)
    r = np.asarray(f.response)
    assert np.all(np.diff(r[v]) <= 1e-6)  # descending response
    # valid features have unit-ish descriptors (normalised by default)
    norms = np.linalg.norm(np.asarray(f.desc)[v], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_shifted_image_matches():
    """An integer-shifted copy must match with near-identical descriptors and
    a consistent coordinate offset — the repeatability sanity from
    SURVEY.md §7 M1."""
    base = _structured_image(128, 160, seed=4, n_blobs=30)
    sh = 6
    img_a = base[:96, :128]
    img_b = base[sh : 96 + sh, sh : 128 + sh]  # shifted content
    c = SiftConfig(width=128, height=96, max_keypoints_per_level=64, max_features=256)
    fa = _detector(c)(jnp.asarray(img_a))
    fb = _detector(c)(jnp.asarray(img_b))
    m = match_pair(fa, fb, ambiguity=0.8)
    idx = np.asarray(m.indices)
    va = np.asarray(fa.valid)
    matched = (idx >= 0) & va
    assert matched.sum() >= 10
    dxs = np.asarray(fb.x)[idx[matched]] - np.asarray(fa.x)[matched]
    dys = np.asarray(fb.y)[idx[matched]] - np.asarray(fa.y)[matched]
    # majority of matches consistent with the true shift (-sh)
    good = (np.abs(dxs + sh) < 1.0) & (np.abs(dys + sh) < 1.0)
    assert good.mean() > 0.7, f"inlier ratio {good.mean()}"


def test_pair_pipeline_jit():
    img_a = _structured_image(96, 128, seed=5)
    img_b = _structured_image(96, 128, seed=5)
    cfg = PipelineConfig(
        sift=SiftConfig(width=128, height=96, max_keypoints_per_level=32, max_features=128)
    )
    run = make_pair_pipeline(cfg)
    fa, fb, m = run(jnp.asarray(img_a), jnp.asarray(img_b))
    idx = np.asarray(m.indices)
    va = np.asarray(fa.valid)
    # identical images: every valid feature should match itself-ish
    matched = (idx >= 0) & va
    assert matched.sum() >= int(0.8 * va.sum())


def test_concat_and_topk_features():
    f1 = Features.empty(8)
    f2 = Features.empty(8)
    f1 = f1._replace(response=jnp.arange(8.0), valid=jnp.ones(8, bool))
    f2 = f2._replace(response=jnp.arange(8.0) + 100, valid=jnp.arange(8) < 4)
    cat = concat_features([f1, f2])
    assert cat.capacity == 16
    top = topk_features(cat, 6)
    r = np.asarray(top.response)
    assert np.all(np.asarray(top.valid))
    np.testing.assert_array_equal(r, [103, 102, 101, 100, 7, 6])


def test_batch_detector_matches_single(test_image):
    import jax.numpy as jnp
    from niftymatch_tpu import SiftConfig, make_batch_detector, make_detector

    cfg = SiftConfig(width=128, height=96, max_keypoints_per_level=64,
                     max_features=128)
    single = make_detector(cfg)
    batch = make_batch_detector(cfg)
    imgs = jnp.stack([jnp.asarray(test_image), jnp.asarray(test_image[::-1, ::-1].copy())])
    out = batch(imgs)
    ref = single(imgs[1])
    import numpy as np
    np.testing.assert_allclose(np.asarray(out.x[1]), np.asarray(ref.x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.valid[1]), np.asarray(ref.valid))


def test_masked_detection_through_driver():
    """Driver-level compute_keypoints_with_mask parity: a masked detector
    only keeps features whose input-image position has mask >= 1, and
    matches the unmasked detector inside the masked region."""
    h, w = 96, 128
    img = _structured_image(h, w, seed=5)
    c = SiftConfig(width=w, height=h, max_keypoints_per_level=64, max_features=256)
    mask = np.zeros((h, w), np.float32)
    mask[:, : w // 2] = 1.0  # left half only

    det = _detector(c)
    det_m = make_detector(c, masked=True)
    f_all = det(jnp.asarray(img))
    f_mask = det_m(jnp.asarray(img), jnp.asarray(mask))

    vm = np.asarray(f_mask.valid)
    assert vm.sum() > 0
    xs = np.asarray(f_mask.x)[vm]
    ys = np.asarray(f_mask.y)[vm]
    # Every masked feature sits where the mask is >= 1 (sampled at the
    # keypoint's integer input-image position, reference semantics).
    assert np.all(mask[np.round(ys).astype(int).clip(0, h - 1),
                       np.round(xs).astype(int).clip(0, w - 1)] >= 1.0)
    # The masked set equals the unmasked set restricted to the mask
    # interior (away from the boundary, where sub-pixel sampling differs).
    va = np.asarray(f_all.valid)
    xa, ya = np.asarray(f_all.x)[va], np.asarray(f_all.y)[va]
    interior = xa < w // 2 - 4
    pts_all = set(zip(np.round(xa[interior], 2), np.round(ya[interior], 2)))
    pts_mask = set(zip(np.round(xs, 2), np.round(ys, 2)))
    assert pts_all <= pts_mask
