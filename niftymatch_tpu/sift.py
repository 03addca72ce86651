"""End-to-end SIFT pipeline driver — the orchestrator the reference lacks.

The reference library ships 7 per-stage functions (``siftfunctions.h:19-101``)
and requires the *client* to loop octaves calling ``convolve`` /
``downsample_by_2`` itself (SURVEY.md §1, §3.1).  This module is that
missing driver, as a single jittable function:

    detect_and_describe(image, config) -> Features

Per octave (static shapes, small unrolled Python loop inside one ``jit``):
Gaussian stack -> DoG -> gradients -> batched extrema + sub-pixel refinement
-> per-level top-k -> orientation histograms -> descriptor GEMMs; features
from all octaves are then merged by a global top-k on |DoG| response into a
fixed ``max_features`` capacity (replacing the reference's first-come
capacity clamp at ``siftfunctions.cu:165-178``).

Matching (``match_pair``) reproduces ``compute_sift_matches``
(``siftfunctions.cu:15-40``) as a distance GEMM + ratio test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import PipelineConfig, SiftConfig
from .features import Features, concat_features, topk_features
from .ops.descriptor import compute_descriptors, compute_descriptors_merged
from .ops.keypoints import detect_keypoints
from .ops.match import MatchResult, match_descriptors
from .ops.orientation import compute_orientations, compute_orientations_merged
from .ops.pyramid import build_pyramid, stack_gradients


def _octave_features(
    octave_idx, octave_data, config: SiftConfig, mask_image=None
) -> Features:
    kpts = detect_keypoints(
        octave_data.dog, octave_idx, config, mask_image=mask_image
    )
    angles, avalid = compute_orientations(kpts, octave_data.grad, octave_idx, config)
    L, K = kpts.x.shape
    flat = lambda a: a.reshape(L * K, *a.shape[2:])

    def block(angle_index: int) -> Features:
        desc, dvalid = compute_descriptors(
            kpts,
            angles,
            avalid,
            octave_data.grad,
            octave_idx,
            config,
            angle_index=angle_index,
        )
        return Features(
            x=flat(kpts.x),
            y=flat(kpts.y),
            sigma=flat(kpts.sigma),
            angle=flat(
                jnp.where(
                    avalid[..., angle_index], angles[..., angle_index], 0.0
                )
            ),
            response=flat(kpts.response),
            octave=jnp.full((L * K,), octave_idx, jnp.int32),
            level=flat(kpts.level),
            desc=flat(desc),
            valid=flat(dvalid),
        )

    out = block(0)
    if config.use_second_orientation:
        # One feature per orientation peak (VLFeat convention); peak-1
        # features only exist where the histogram had a second peak.
        out = concat_features([out, block(1)])
    return out


def _merge_keypoints(kp_list, config: SiftConfig):
    """Global top-``max_features`` selection over all octaves' keypoints.

    Flattens each octave's (L, K) per-level capacity slots into one pool,
    ranks by |DoG| response with -inf on invalid slots, and keeps the top
    M = ``config.max_features``.  Replaces the reference's first-come
    capacity clamp (``siftfunctions.cu:165-178``) *before* the expensive
    orientation/descriptor stages, so those stages touch M real keypoints
    instead of every capacity slot.
    """
    def cat(get):
        return jnp.concatenate([get(kp, o).reshape(-1) for o, kp in enumerate(kp_list)])

    x = cat(lambda kp, o: kp.x)
    y = cat(lambda kp, o: kp.y)
    sigma = cat(lambda kp, o: kp.sigma)
    resp = cat(lambda kp, o: kp.response)
    valid = cat(lambda kp, o: kp.valid)
    level = cat(lambda kp, o: kp.level)
    octave = cat(
        lambda kp, o: jnp.full(kp.x.shape, o, jnp.int32)
    )

    m = config.max_features
    scores = jnp.where(valid, resp, -jnp.inf)
    if scores.shape[0] < m:
        pad = m - scores.shape[0]
        scores = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
        x, y, sigma, resp = (jnp.pad(a, (0, pad)) for a in (x, y, sigma, resp))
        level, octave = (jnp.pad(a, (0, pad)) for a in (level, octave))
    top_scores, idx = jax.lax.top_k(scores, m)
    sel_valid = jnp.isfinite(top_scores)
    take = lambda a: jnp.take(a, idx, axis=0)
    return dict(
        x=take(x),
        y=take(y),
        sigma=take(sigma),
        response=jnp.where(sel_valid, top_scores, 0.0),
        level=take(level),
        octave=take(octave),
        valid=sel_valid,
    )


def detect_and_describe(
    image: jnp.ndarray,
    config: SiftConfig,
    mask: jnp.ndarray | None = None,
) -> Features:
    """Full SIFT detection on a float32 grayscale (H, W) image.

    ``mask`` (optional, (H, W) float/bool) restricts detection to pixels
    where the mask sampled at the keypoint's input-image position is >= 1 —
    driver-level parity with ``compute_keypoints_with_mask``
    (``siftfunctions.h:19-101``, ``siftfunctions.cu:65-98``).

    Merged pipeline: per-octave extrema detection feeds a *global*
    top-``max_features`` selection, and orientation + descriptors then run
    once over that merged set (single stacked-gradient gather) instead of
    per octave over capacity padding — ~3x fewer gather/tent FLOPs at the
    default config.  Semantically this matches the per-octave path except
    when a selected keypoint yields no orientation peak (its slot stays
    invalid rather than being backfilled by a lower-response keypoint).

    Jit this (config is static via closure / partial) once per image size.
    """
    octaves = build_pyramid(image, config)
    if mask is not None:
        mask = mask.astype(jnp.float32)
    kp_list = [
        detect_keypoints(data.dog, o, config, mask_image=mask)
        for o, data in enumerate(octaves)
    ]
    mk = _merge_keypoints(kp_list, config)

    use_windows = (
        config.use_pallas_windows and jax.default_backend() == "tpu"
    )
    if use_windows:
        from .pallas.windows import (
            build_grad_planes,
            compute_descriptors_merged_pallas,
            compute_orientations_merged_pallas,
        )

        planes = build_grad_planes(octaves, config)
        angles, avalid = compute_orientations_merged_pallas(
            planes, mk["x"], mk["y"], mk["sigma"], mk["octave"], mk["level"],
            mk["valid"], config,
        )
    else:
        gstack = stack_gradients(octaves)
        angles, avalid = compute_orientations_merged(
            gstack, mk["x"], mk["y"], mk["sigma"], mk["octave"], mk["level"],
            mk["valid"], config,
        )

    def block(angle_index: int) -> Features:
        bvalid = mk["valid"] & avalid[:, angle_index]
        if use_windows:
            desc, dvalid = compute_descriptors_merged_pallas(
                planes, mk["x"], mk["y"], mk["sigma"], mk["octave"],
                mk["level"], angles[:, angle_index], bvalid, config,
            )
        else:
            desc, dvalid = compute_descriptors_merged(
                gstack, mk["x"], mk["y"], mk["sigma"], mk["octave"],
                mk["level"], angles[:, angle_index], bvalid, config,
            )
        return Features(
            x=mk["x"],
            y=mk["y"],
            sigma=mk["sigma"],
            angle=jnp.where(bvalid, angles[:, angle_index], 0.0),
            response=mk["response"],
            octave=mk["octave"],
            level=mk["level"],
            desc=desc,
            valid=dvalid,
        )

    out = block(0)
    if config.use_second_orientation:
        # One feature per orientation peak (VLFeat convention); peak-1
        # features only exist where the histogram had a second peak.
        out = concat_features([out, block(1)])
    return topk_features(out, config.max_features)


def detect_and_describe_batch(
    images: jnp.ndarray,
    config: SiftConfig,
) -> Features:
    """Batched detection: (B, H, W) -> Features with a leading batch axis.

    On TPU the Pallas window kernels are natively batch-capable: the B
    images' gradient planes concatenate along rows and their merged
    keypoint sets along the keypoint axis (per-keypoint ``slab_base`` row
    offsets route each window DMA to its own image), so orientation +
    descriptors for the whole batch run as ONE kernel launch each — B*M
    grid programs, still skipping invalid slots.  Elsewhere this is a
    plain ``vmap`` of ``detect_and_describe``.
    """
    if not (config.use_pallas_windows and jax.default_backend() == "tpu"):
        return jax.vmap(lambda im: detect_and_describe(im, config))(images)

    from .pallas.windows import (
        build_grad_planes,
        compute_descriptors_merged_pallas,
        compute_orientations_merged_pallas,
    )

    def front(im):
        octaves = build_pyramid(im, config)
        kp_list = [
            detect_keypoints(data.dog, o, config)
            for o, data in enumerate(octaves)
        ]
        return _merge_keypoints(kp_list, config), build_grad_planes(
            octaves, config
        )

    mk, planes = jax.vmap(front)(images)
    b = images.shape[0]
    m = config.max_features
    rows_per_image = planes.mag.shape[1]
    planes = type(planes)(
        planes.mag.reshape(b * rows_per_image, -1),
        planes.ang.reshape(b * rows_per_image, -1),
        planes.radius,
        planes.slab_h,
        planes.num_levels,
    )
    slab_base = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32) * rows_per_image, m
    )
    fl = {k: v.reshape((b * m,) + v.shape[2:]) for k, v in mk.items()}

    angles, avalid = compute_orientations_merged_pallas(
        planes, fl["x"], fl["y"], fl["sigma"], fl["octave"], fl["level"],
        fl["valid"], config, slab_base=slab_base,
    )

    def block(angle_index: int) -> Features:
        bvalid = fl["valid"] & avalid[:, angle_index]
        desc, dvalid = compute_descriptors_merged_pallas(
            planes, fl["x"], fl["y"], fl["sigma"], fl["octave"], fl["level"],
            angles[:, angle_index], bvalid, config, slab_base=slab_base,
        )
        unb = lambda a: a.reshape((b, m) + a.shape[1:])
        return Features(
            x=unb(fl["x"]),
            y=unb(fl["y"]),
            sigma=unb(fl["sigma"]),
            angle=unb(jnp.where(bvalid, angles[:, angle_index], 0.0)),
            response=unb(fl["response"]),
            octave=unb(fl["octave"]),
            level=unb(fl["level"]),
            desc=unb(desc),
            valid=unb(dvalid),
        )

    out = block(0)
    if config.use_second_orientation:
        out = jax.vmap(lambda f1, f2: concat_features([f1, f2]))(
            out, block(1)
        )
    return jax.vmap(lambda f: topk_features(f, config.max_features))(out)


def detect_and_describe_per_octave(
    image: jnp.ndarray,
    config: SiftConfig,
    mask: jnp.ndarray | None = None,
) -> Features:
    """Reference-shaped per-octave pipeline (oracle for the merged path):
    orientation/descriptors computed for every capacity slot of every
    octave, then one global top-k — the exact composition of the
    per-octave stage functions that mirror ``siftfunctions.cu``."""
    octaves = build_pyramid(image, config)
    if mask is not None:
        mask = mask.astype(jnp.float32)
    parts = [
        _octave_features(o, data, config, mask_image=mask)
        for o, data in enumerate(octaves)
    ]
    return topk_features(concat_features(parts), config.max_features)


def match_pair(
    feats_a: Features,
    feats_b: Features,
    ambiguity: float = 0.8,
    precision: str = "fp32",
    use_pallas: bool | None = None,
) -> MatchResult:
    """Match features of two images (``compute_sift_matches`` equivalent).

    ``use_pallas=None`` auto-selects the fused Pallas kernel on TPU backends
    (identical semantics, no materialised distance matrix) and the jnp path
    elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas.match import match_descriptors_pallas

        return match_descriptors_pallas(
            feats_a.desc,
            feats_b.desc,
            ambiguity=ambiguity,
            a_valid=feats_a.valid,
            b_valid=feats_b.valid,
            precision=precision,
        )
    return match_descriptors(
        feats_a.desc,
        feats_b.desc,
        ambiguity=ambiguity,
        a_valid=feats_a.valid,
        b_valid=feats_b.valid,
        precision=precision,
    )


def make_detector(config: SiftConfig, masked: bool = False):
    """Returns a jitted detector closure for a fixed image size:
    ``image -> Features``, or ``(image, mask) -> Features`` with
    ``masked=True`` (the ``compute_keypoints_with_mask`` driver)."""

    if masked:

        @jax.jit
        def detect_masked(image, mask):
            return detect_and_describe(image, config, mask=mask)

        return detect_masked

    @jax.jit
    def detect(image):
        return detect_and_describe(image, config)

    return detect


def make_batch_detector(config: SiftConfig):
    """Returns a jitted ``(B, H, W) -> Features`` closure (leading batch
    axis on every Features field).  Single-device batching; for multi-device
    data parallelism shard the batch with ``parallel.shard_detect``."""

    @jax.jit
    def detect(images):
        return detect_and_describe_batch(images, config)

    return detect


def make_pair_pipeline(config: PipelineConfig):
    """Returns a jitted ``(img_a, img_b) -> (Features, Features, MatchResult)``
    for the flagship detect+match forward step (BASELINE config 1)."""

    @jax.jit
    def run(img_a, img_b):
        fa = detect_and_describe(img_a, config.sift)
        fb = detect_and_describe(img_b, config.sift)
        m = match_pair(
            fa,
            fb,
            config.match.ambiguity,
            config.match.precision,
            use_pallas=config.runtime.use_pallas
            and jax.default_backend() == "tpu",
        )
        return fa, fb, m

    return run
