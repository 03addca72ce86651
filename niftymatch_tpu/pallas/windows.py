"""Fused per-keypoint window kernels: orientation histograms + descriptors.

The merged jnp pipeline (``ops.orientation.compute_orientations_merged`` /
``ops.descriptor.compute_descriptors_merged``) pays for

  * an XLA gather of (M, P, P, 2) patches (~14 GB/s effective — gathers do
    not ride the DMA engines well), and
  * materialising the (M, P^2, 16) tent-product tensor in HBM for the
    descriptor GEMM,

and both costs scale with the *capacity* M, not the number of real
keypoints.  These kernels fix all three at once, the way the hardware
wants (SURVEY.md §7 hard parts 2-3):

  * gradients live in two zero-padded flat planes (mag, ang) in HBM; each
    grid step DMAs one keypoint's (rows, 128) window straight into VMEM
    scratch, double-buffered so the next keypoint's window loads while the
    current one computes;
  * histograms/tents/reductions happen entirely in VMEM on the VPU — no
    intermediate ever touches HBM;
  * keypoints are sorted valid-first (the merged top-k guarantees it), the
    valid count rides in as a scalar-prefetch argument, and programs past
    it skip their DMA + compute (`pl.when`) — work scales with *actual*
    keypoints, which no static-shape XLA formulation can do.

Semantics are identical to the jnp merged path (same window tests, flipped
-sign compat flags, tent binning — ``orientation.cu:11-129``,
``descriptor.cu:32-145``); tests compare against it directly.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (
    DESC_MAGNIF,
    MACHINE_EPS,
    NUM_DESC_ORI_BINS,
    NUM_DESC_SPATIAL_BINS,
    NUM_ORI_BINS,
    SiftConfig,
)
from ..ops.descriptor import normalize_descriptors, static_radius_for_level
from ..ops.gradients import TWO_PI
from ..ops.orientation import pick_peaks, smooth_histogram

NBO = NUM_DESC_ORI_BINS
NBP = NUM_DESC_SPATIAL_BINS
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class GradPlanes:
    """Flat zero-padded gradient planes + the geometry needed to index them.

    Layout: per (octave, level) slab of ``slab_h`` rows; octave ``o``'s
    level ``l`` gradients sit at ``[(o*L + l)*slab_h + R + y, R + x]``
    (R = ``radius``).  A window fetch of 128 columns starting at data
    column ``xi`` covers offsets ``[-R, 127-R]`` about the keypoint's
    integer column — every window test radius is <= R <= 63, so the static
    column centre R always covers the true window, and zero padding means
    out-of-window samples carry zero gradient magnitude.
    """

    def __init__(self, mag, ang, radius, slab_h, num_levels):
        self.mag = mag          # (O*L*slab_h, Wc) fp32
        self.ang = ang
        self.radius = radius    # column/row padding R
        self.slab_h = slab_h
        self.num_levels = num_levels


jax.tree_util.register_pytree_node(
    GradPlanes,
    lambda p: ((p.mag, p.ang), (p.radius, p.slab_h, p.num_levels)),
    lambda aux, ch: GradPlanes(ch[0], ch[1], *aux),
)


def build_grad_planes(octaves, config: SiftConfig) -> GradPlanes:
    """Pack every octave's gradient stack into the flat (mag, ang) planes."""
    radius = static_radius_for_level(config.num_dog_levels - 1, config)
    assert radius <= 63, "column window of 128 lanes must cover [-R, R]"
    num_levels, h, w, _ = octaves[0].grad.shape
    # +16 bottom margin: window row fetches are 8-row-aligned (HBM tiling)
    # and rounded up, so the deepest fetch can run past R rows below the
    # last data row.
    slab_h = h + 2 * radius + 16
    # Column fetches are 2 aligned 128-lane tiles starting at
    # floor(data_col / 128) * 128; the widest start is for xi = W-1.
    wc = max(
        _round_up(w + 2 * radius, _LANES),
        ((w - 1) // _LANES) * _LANES + 2 * _LANES,
    )
    # Each slab is its level's gradient plane padded into place, and the
    # full planes are one concat along rows — every output byte is written
    # exactly once (a zeros-init + dynamic_update_slice chain writes the
    # 2x padded area first and then overwrites the interior; measured ~8 ms
    # of copy/pad fusions per batch-8 dispatch).
    def plane(ch):
        slabs = []
        for o, data in enumerate(octaves):
            lo, ho, wo = (
                data.grad.shape[0], data.grad.shape[1], data.grad.shape[2]
            )
            g = data.grad[..., ch]                       # (L, ho, wo)
            g = jnp.pad(
                g,
                (
                    (0, 0),
                    (radius, slab_h - ho - radius),
                    (radius, wc - wo - radius),
                ),
            )
            slabs.append(g.reshape(lo * slab_h, wc))
        return jnp.concatenate(slabs, axis=0)

    return GradPlanes(plane(0), plane(1), radius, slab_h, num_levels)


def _window_starts(
    planes: GradPlanes, octave, level, yi, xi, row_lead: int, slab_base=None
):
    """Tile-aligned DMA starts + in-window residuals for each keypoint.

    HBM memrefs are (8, 128)-tiled, so DMA slices must start on tile
    boundaries: the exact window start is rounded down and the keypoint's
    centre moves to ``(row_resid + row_lead, col_resid + radius)`` inside
    the fetched window (the kernel fetches one extra row/column tile to
    keep the true window covered)."""
    slab = (octave * planes.num_levels + level) * planes.slab_h
    if slab_base is not None:
        slab = slab + slab_base
    row0 = slab + planes.radius + yi - row_lead
    col0 = xi                                   # data col xi = padded R+xi-R
    row0a = (row0 // 8) * 8
    col0a = (col0 // _LANES) * _LANES
    return (
        row0a.astype(jnp.int32),
        col0a.astype(jnp.int32),
        (row0 - row0a).astype(jnp.float32),
        (col0 - col0a).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Orientation histogram kernel
# ---------------------------------------------------------------------------


def _ori_kernel(
    row0_ref, col0_ref, vf_ref,                # scalar prefetch (SMEM)
    fp_ref,                                    # (1, 1, NF) VMEM param block
    mag_hbm, ang_hbm,                          # flat planes (HBM)
    out_ref,                                   # (1, 1, NUM_ORI_BINS) VMEM
    mag_s, ang_s, sems,                        # scratch
    *,
    rows: int,
    row_lead: int,
    col_lead: int,
    sign: float,
):
    i = pl.program_id(0)
    k_total = pl.num_programs(0)

    def copies(slot, k):
        r0 = pl.multiple_of(row0_ref[k], 8)
        c0 = pl.multiple_of(col0_ref[k], _LANES)
        return (
            pltpu.make_async_copy(
                mag_hbm.at[pl.ds(r0, rows), pl.ds(c0, 2 * _LANES)],
                mag_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ang_hbm.at[pl.ds(r0, rows), pl.ds(c0, 2 * _LANES)],
                ang_s.at[slot],
                sems.at[slot, 1],
            ),
        )

    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when((i == 0) & (vf_ref[0] > 0))
    def _warmup():
        cm, ca = copies(0, 0)
        cm.start()
        ca.start()

    @pl.when((i + 1 < k_total) & (vf_ref[jnp.minimum(i + 1, k_total - 1)] > 0))
    def _prefetch():
        cm, ca = copies(nslot, i + 1)
        cm.start()
        ca.start()

    @pl.when(vf_ref[i] > 0)
    def _compute():
        cm, ca = copies(slot, i)
        cm.wait()
        ca.wait()
        rx = fp_ref[0, 0, 0]          # xi - x (sub-pixel residual)
        ry = fp_ref[0, 0, 1]
        sigma_w = fp_ref[0, 0, 2]
        w_r = fp_ref[0, 0, 3]
        rr = fp_ref[0, 0, 4]          # tile-alignment row residual
        cr = fp_ref[0, 0, 5]

        # Re-centre the keypoint's column (cr + col_lead, an integer in
        # [col_lead, 127 + col_lead]) onto static lane CENTER with a
        # dynamic lane roll, then compute on a single 128-lane tile — the
        # fetched span is 2 tiles only because DMA starts are 128-aligned,
        # so this halves every downstream VPU op.  Wrapped lanes are
        # garbage but satisfy |off_x| > w_r (the true +-w_r window always
        # fits around CENTER), so the `inside` mask zeroes them.
        CENTER = 64   # >= any window radius (<= 63) and <= 127 - radius
        c = jnp.int32(cr) + col_lead
        mag = pltpu.roll(mag_s[slot], CENTER - c, axis=1)[:, :_LANES]
        ang = pltpu.roll(ang_s[slot], CENTER - c, axis=1)[:, :_LANES]

        off_x = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1).astype(
                jnp.float32
            )
            - CENTER
        )
        off_y = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0).astype(
                jnp.float32
            )
            - (rr + row_lead)
        )
        dx = off_x + rx
        dy = off_y + ry
        r2 = dx * dx + dy * dy
        inside = (
            (jnp.abs(off_x) <= w_r)
            & (jnp.abs(off_y) <= w_r)
            & (r2 < w_r * w_r + 0.6)
        )
        wgt = jnp.exp(sign * r2 / (2.0 * sigma_w * sigma_w))
        w = jnp.where(inside, mag * wgt, 0.0)
        bins = jnp.floor(NUM_ORI_BINS * ang / TWO_PI).astype(jnp.int32)
        bins = jax.lax.rem(jax.lax.rem(bins, NUM_ORI_BINS) + NUM_ORI_BINS,
                           NUM_ORI_BINS)
        hist = []
        for b in range(NUM_ORI_BINS):
            hist.append(jnp.sum(jnp.where(bins == b, w, 0.0)))
        out_ref[0, 0, :] = jnp.stack(hist)

    @pl.when(vf_ref[i] == 0)
    def _skip():
        out_ref[:] = jnp.zeros_like(out_ref)


@partial(jax.jit, static_argnames=("config", "interpret"))
def orientation_hists_pallas(
    planes: GradPlanes,
    x, y, sigma, octave, level, valid,
    config: SiftConfig,
    slab_base=None,
    interpret: bool = False,
):
    """Raw 36-bin orientation histograms for the merged keypoint set.

    ``valid`` (bool (M,)) gates each program: invalid slots skip their DMA
    and compute entirely.  ``slab_base`` (optional int32 (M,)) offsets each
    keypoint's plane rows — the batched driver flattens B images' planes
    along rows and keypoints along M.  Returns (M, 36) float32 —
    smoothing/peak-picking stay outside (they are (M, 36)-shaped and fuse
    fine in XLA).
    """
    r_o = config.max_orientation_radius
    rows = _round_up(2 * r_o + 1, 8) + 8   # +8: tile-aligned start residual
    xper = jnp.exp2(octave.astype(jnp.float32))
    xo = x / xper
    yo = y / xper
    so = sigma / xper
    xi = jnp.floor(xo + 0.5).astype(jnp.int32)
    yi = jnp.floor(yo + 0.5).astype(jnp.int32)
    h0 = planes.slab_h - 2 * planes.radius - 8
    w0 = planes.mag.shape[1] - 2 * planes.radius
    yi = jnp.clip(yi, 0, jnp.maximum(jnp.right_shift(jnp.int32(h0), octave), 1) - 1)
    xi = jnp.clip(xi, 0, jnp.maximum(jnp.right_shift(jnp.int32(w0), octave), 1) - 1)
    row0, col0, row_r, col_r = _window_starts(
        planes, octave, level, yi, xi, r_o, slab_base
    )

    sigma_w = 1.5 * so
    w_r = jnp.minimum(jnp.maximum(jnp.floor(3.0 * sigma_w), 1.0), float(r_o))
    # (M, 1, NF) in VMEM, one (1, 1, NF) block per program: per-keypoint
    # float params don't fit SMEM at batched keypoint counts (SMEM is 1 MB
    # and pads the last dim to 128 lanes).
    fparams = jnp.stack(
        [
            xi.astype(jnp.float32) - xo,
            yi.astype(jnp.float32) - yo,
            sigma_w,
            w_r,
            row_r,
            col_r,
        ],
        axis=-1,
    )[:, None, :]

    m = x.shape[0]
    sign = 1.0 if config.compat.flipped_gaussian_sign else -1.0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, fparams.shape[-1]),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Pinned to HBM: DMA window starts are pixel-granular, and a
            # VMEM-resident source would require 8-row-aligned slices.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NUM_ORI_BINS), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 2 * _LANES), jnp.float32),
            pltpu.VMEM((2, rows, 2 * _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    hists = pl.pallas_call(
        partial(
            _ori_kernel,
            rows=rows,
            row_lead=r_o,
            col_lead=planes.radius,
            sign=sign,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, 1, NUM_ORI_BINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row0, col0, valid.astype(jnp.int32), fparams, planes.mag, planes.ang)
    return hists[:, 0, :]


# ---------------------------------------------------------------------------
# Descriptor kernel
# ---------------------------------------------------------------------------


def _desc_kernel(
    row0_ref, col0_ref, vf_ref,
    fp_ref,                                    # (1, 1, NF) VMEM param block
    mag_hbm, ang_hbm,
    out_ref,                                   # (1, NBP*NBP, NBO) VMEM
    mag_s, ang_s, sems,
    *,
    rows: int,
    radius: int,
    sign: float,
):
    i = pl.program_id(0)
    k_total = pl.num_programs(0)

    def copies(slot, k):
        r0 = pl.multiple_of(row0_ref[k], 8)
        c0 = pl.multiple_of(col0_ref[k], _LANES)
        return (
            pltpu.make_async_copy(
                mag_hbm.at[pl.ds(r0, rows), pl.ds(c0, 2 * _LANES)],
                mag_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ang_hbm.at[pl.ds(r0, rows), pl.ds(c0, 2 * _LANES)],
                ang_s.at[slot],
                sems.at[slot, 1],
            ),
        )

    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when((i == 0) & (vf_ref[0] > 0))
    def _warmup():
        cm, ca = copies(0, 0)
        cm.start()
        ca.start()

    @pl.when((i + 1 < k_total) & (vf_ref[jnp.minimum(i + 1, k_total - 1)] > 0))
    def _prefetch():
        cm, ca = copies(nslot, i + 1)
        cm.start()
        ca.start()

    @pl.when(vf_ref[i] > 0)
    def _compute():
        cm, ca = copies(slot, i)
        cm.wait()
        ca.wait()
        rx = fp_ref[0, 0, 0]
        ry = fp_ref[0, 0, 1]
        sbp = fp_ref[0, 0, 2]
        w_r = fp_ref[0, 0, 3]
        st = fp_ref[0, 0, 4]
        ct = fp_ref[0, 0, 5]
        angle0 = fp_ref[0, 0, 6]
        rr = fp_ref[0, 0, 7]          # tile-alignment residuals
        cr = fp_ref[0, 0, 8]

        # Single-tile compute via dynamic lane roll (see _ori_kernel): the
        # keypoint's integer column cr + radius lands on static lane 64,
        # and the tent math runs on (rows, 128) instead of (rows, 256) —
        # the 128 bin reductions below dominate this kernel, so this is a
        # ~2x kernel-time cut.  Wrapped lanes satisfy |off_x| > w_r and
        # are zeroed by `inside`.
        CENTER = 64   # >= any window radius (<= 63) and <= 127 - radius
        c = jnp.int32(cr) + radius
        mag = pltpu.roll(mag_s[slot], CENTER - c, axis=1)[:, :_LANES]
        ang = pltpu.roll(ang_s[slot], CENTER - c, axis=1)[:, :_LANES]

        off_x = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1).astype(
                jnp.float32
            )
            - CENTER
        )
        off_y = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0).astype(
                jnp.float32
            )
            - (rr + radius)
        )
        dx = off_x + rx
        dy = off_y + ry
        inv_sbp = 1.0 / sbp
        nx = (ct * dx + st * dy) * inv_sbp
        ny = (-st * dx + ct * dy) * inv_sbp

        wsigma = NBP / 2.0
        win = jnp.exp(sign * (nx * nx + ny * ny) / (2.0 * wsigma * wsigma))
        inside = (jnp.abs(off_x) <= w_r) & (jnp.abs(off_y) <= w_r)
        w = jnp.where(inside, win * mag, 0.0)

        theta = ang - angle0
        theta = theta - TWO_PI * jnp.floor(theta / TWO_PI)
        nt = NBO * theta / TWO_PI

        # circular theta tents, one (rows, 128) plane per bin
        wt = []
        for t in range(NBO):
            d = nt - t
            d = d - NBO * jnp.round(d / NBO)
            wt.append(jnp.maximum(0.0, 1.0 - jnp.abs(d)))

        # spatial tents
        wx = [
            jnp.maximum(0.0, 1.0 - jnp.abs(nx - (b - (NBP / 2 - 0.5))))
            for b in range(NBP)
        ]
        wy = [
            jnp.maximum(0.0, 1.0 - jnp.abs(ny - (b - (NBP / 2 - 0.5))))
            for b in range(NBP)
        ]

        for yb in range(NBP):
            wyy = w * wy[yb]
            for xb in range(NBP):
                row = wyy * wx[xb]
                vals = []
                for t in range(NBO):
                    vals.append(jnp.sum(row * wt[t]))
                out_ref[0, yb * NBP + xb, :] = jnp.stack(vals)

    @pl.when(vf_ref[i] == 0)
    def _skip():
        out_ref[:] = jnp.zeros_like(out_ref)


@partial(jax.jit, static_argnames=("config", "interpret"))
def descriptors_pallas(
    planes: GradPlanes,
    x, y, sigma, octave, level, angle0, valid,
    config: SiftConfig,
    slab_base=None,
    interpret: bool = False,
):
    """Raw (unnormalised) 128-D descriptors for the merged keypoint set.

    ``valid`` (bool (M,)) gates each program (keypoint-and-angle validity);
    skipped slots write zeros.  ``slab_base`` as in
    ``orientation_hists_pallas``.
    """
    radius = planes.radius
    # 2R+1 window rows + up to 7 residual rows from the tile-aligned start
    rows = _round_up(2 * radius + 1 + 7, 8)
    xper = jnp.exp2(octave.astype(jnp.float32))
    xo = x / xper
    yo = y / xper
    so = sigma / xper
    xi = jnp.floor(xo + 0.5).astype(jnp.int32)
    yi = jnp.floor(yo + 0.5).astype(jnp.int32)
    h0 = planes.slab_h - 2 * radius - 8
    w0 = planes.mag.shape[1] - 2 * radius
    yi = jnp.clip(yi, 0, jnp.maximum(jnp.right_shift(jnp.int32(h0), octave), 1) - 1)
    xi = jnp.clip(xi, 0, jnp.maximum(jnp.right_shift(jnp.int32(w0), octave), 1) - 1)
    row0, col0, row_r, col_r = _window_starts(
        planes, octave, level, yi, xi, radius, slab_base
    )

    sbp = DESC_MAGNIF * so + MACHINE_EPS
    w_r = jnp.floor(math.sqrt(2.0) * sbp * (NBP + 1) / 2.0 + 0.5)
    fparams = jnp.stack(
        [
            xi.astype(jnp.float32) - xo,
            yi.astype(jnp.float32) - yo,
            sbp,
            w_r,
            jnp.sin(angle0),
            jnp.cos(angle0),
            angle0,
            row_r,
            col_r,
        ],
        axis=-1,
    )[:, None, :]

    m = x.shape[0]
    sign = 1.0 if config.compat.flipped_gaussian_sign else -1.0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, fparams.shape[-1]),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Pinned to HBM: DMA window starts are pixel-granular, and a
            # VMEM-resident source would require 8-row-aligned slices.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, NBP * NBP, NBO), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 2 * _LANES), jnp.float32),
            pltpu.VMEM((2, rows, 2 * _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    hist = pl.pallas_call(
        partial(_desc_kernel, rows=rows, radius=radius, sign=sign),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, NBP * NBP, NBO), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row0, col0, valid.astype(jnp.int32), fparams, planes.mag, planes.ang)
    return hist.reshape(m, NBP * NBP * NBO)


# ---------------------------------------------------------------------------
# Drop-in merged-stage wrappers (same contract as the jnp merged path)
# ---------------------------------------------------------------------------


def compute_orientations_merged_pallas(
    planes: GradPlanes, x, y, sigma, octave, level, valid, config: SiftConfig,
    slab_base=None, interpret: bool = False,
):
    hists = orientation_hists_pallas(
        planes, x, y, sigma, octave, level, valid, config,
        slab_base=slab_base, interpret=interpret,
    )
    hists = smooth_histogram(hists)
    angles, avalid = pick_peaks(hists)
    avalid = avalid & valid[..., None]
    angles = jnp.where(avalid, angles, -1.0)
    return angles, avalid


def compute_descriptors_merged_pallas(
    planes: GradPlanes, x, y, sigma, octave, level, angle0, valid,
    config: SiftConfig, slab_base=None, interpret: bool = False,
):
    desc = descriptors_pallas(
        planes, x, y, sigma, octave, level, angle0, valid, config,
        slab_base=slab_base, interpret=interpret,
    )
    if not config.compat.unnormalized_descriptors:
        desc = jnp.where(valid[..., None], normalize_descriptors(desc), 0.0)
    else:
        desc = jnp.where(valid[..., None], desc, 0.0)
    return desc, valid
