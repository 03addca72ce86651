"""Typed configuration tree for the NiftyMatch-TPU framework.

This replaces the reference's two-tier config system (CMake build options +
``SiftParams`` runtime derivation, see ``src/gpu/sift/siftparams.h:14-99``)
with a single tree of frozen dataclasses.  All numeric defaults reproduce the
reference's derivation rules exactly:

* scale-space hyperparameters  — ``siftparams.h:30-51``
* compile-time constants        — ``siftdata.h:9,15`` (128-D descriptors,
  2048 capacity), ``siftparams.h:9`` (min octave size 32),
  ``orientation.cu:8`` (36 bins), ``descriptor.cu:6-9`` (4x4x8 bins, MAG 3)
* per-call defaults             — ratio-test ambiguity 0.8
  (``siftfunctions.h:20``), RANSAC iterations/threshold (``ransac.h:12-14``)

The ``compat`` block gates bug-for-bug fidelity with two known quirks of the
reference (flipped Gaussian-window signs ``orientation.cu:56`` /
``descriptor.cu:108`` and the never-called descriptor normalisation
``descriptor.cu:14-29``); defaults are the *correct* VLFeat-convention forms.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

# ---------------------------------------------------------------------------
# Compile-time constants of the reference, kept as module constants.
# ---------------------------------------------------------------------------

SIFT_VECTOR_SIZE = 128          # siftdata.h:9
MAX_DESCRIPTORS = 2048          # siftdata.h:15
MINIMUM_OCTAVE_SIZE = 32        # siftparams.h:9
NUM_ORI_BINS = 36               # orientation.cu:8  (NBINS)
NUM_DESC_ORI_BINS = 8           # descriptor.cu:6   (NBO)
NUM_DESC_SPATIAL_BINS = 4       # descriptor.cu:7   (NBP)
DESC_MAGNIF = 3.0               # descriptor.cu:9   (MAG)
MACHINE_EPS = 1.0e-7            # descriptor.cu:12


@dataclasses.dataclass(frozen=True)
class CompatFlags:
    """Bug-for-bug compatibility switches vs. the reference CUDA kernels.

    All default to False => correct (VLFeat-convention) behaviour.
    """

    # Reference uses exp(+r^2 / 2 sigma^2) as the orientation-histogram window
    # (orientation.cu:56) and exp(+(nx^2+ny^2)/2 wsigma^2) for the descriptor
    # window (descriptor.cu:108).  True reproduces those flipped signs.
    flipped_gaussian_sign: bool = False

    # Reference defines but never calls normalize_histogram
    # (descriptor.cu:14-29), so its descriptors are unnormalised.  True
    # reproduces that; False applies the standard SIFT normalise -> clamp at
    # 0.2 -> renormalise sequence.
    unnormalized_descriptors: bool = False

    # Reference's edge test (keypoint.cu:166-169) accepts keypoints whose 2x2
    # Hessian determinant is <= 0 (the score goes negative and trivially
    # passes "< threshold").  True reproduces that; False additionally rejects
    # non-positive determinants (VLFeat behaviour).
    accept_negative_edge_score: bool = False


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """Scale-space + detector configuration.

    Derivations follow ``siftparams.h:30-51``:

    * ``num_dog_levels = 3``; levels run from ``level_min = -1`` to
      ``level_max = num_dog_levels + 1``.
    * ``num_octaves = floor(log2(min(w, h) * 2 / 32))``, at least 1.
    * ``sigma_k = 2**(1/3)``, ``sigma_0 = 1.6 * sigma_k``,
      ``sigma_d0 = sigma_0 * sqrt(1 - 1/sigma_k^2)``.
    * base smoothing ``sqrt(sigma_a^2 - sigma_n^2)`` with
      ``sigma_a = sigma_0 * sigma_k**level_min`` and ``sigma_n = 0.5``.
    * incremental per-level sigmas ``sigma_d0 * sigma_k**i``.
    """

    width: int
    height: int
    num_dog_levels: int = 3                  # siftparams.h:31
    sigma_n: float = 0.5                     # siftparams.h:32
    peak_threshold: float = 0.0              # siftparams.h:32
    edge_threshold: float = 10.0             # siftparams.h:32

    # --- capacity / static-shape knobs (TPU-native; no reference analogue
    # beyond MAX_DESCRIPTORS truncation at siftfunctions.cu:166-169) ---
    max_keypoints_per_level: int = 512       # dense->top-k per (octave, level)
    max_features: int = MAX_DESCRIPTORS      # final global top-k capacity

    # orientation window clamp: reference's optimised kernel uses a 22x22
    # block => W <= blockDim/2 - 1 = 10 (orientation.cu:29,224)
    max_orientation_radius: int = 10

    # Emit a second feature per keypoint at the second orientation peak
    # (VLFeat behaviour; the reference computes two peaks but only ever
    # describes the first, descriptor.cu:89).  Doubles per-octave feature
    # capacity and raises match density on rotation-rich scenes.
    use_second_orientation: bool = False

    # Fused per-keypoint window kernels (pallas/windows.py) for the
    # orientation + descriptor stages on TPU backends: double-buffered DMA
    # windows, VMEM-resident tent math, and valid-prefix skipping (work
    # scales with detected keypoints, not capacity).  Non-TPU backends
    # always use the jnp merged path.
    use_pallas_windows: bool = True

    compat: CompatFlags = dataclasses.field(default_factory=CompatFlags)

    # ------------------------------------------------------------------
    # Derived quantities (all pure host math, mirrors SiftParams ctor)
    # ------------------------------------------------------------------
    @property
    def level_max(self) -> int:
        return self.num_dog_levels + 1       # siftparams.h:34

    @property
    def level_min(self) -> int:
        return -1                            # siftparams.h:35

    @property
    def num_octaves(self) -> int:
        n = int(
            math.floor(
                math.log(min(self.width, self.height) * 2.0 / MINIMUM_OCTAVE_SIZE)
                / math.log(2.0)
            )
        )
        return max(n, 1)                     # siftparams.h:36-37

    @property
    def num_gauss_levels(self) -> int:
        """Gaussian levels per octave (= 6 with defaults).

        PyramidData allocates ``level_max - level_min + 1`` octave buffers
        (``pyramidata.cu:28``)."""
        return self.level_max - self.level_min + 1

    @property
    def num_dogs(self) -> int:
        """DoG levels per octave (= 5 with defaults), ``pyramidata.cu:35``."""
        return self.level_max - self.level_min

    @property
    def sigma_k(self) -> float:
        return 2.0 ** (1.0 / self.num_dog_levels)       # siftparams.h:39

    @property
    def sigma_0(self) -> float:
        return 1.6 * self.sigma_k                       # siftparams.h:40

    @property
    def sigma_d0(self) -> float:
        k = self.sigma_k
        return self.sigma_0 * math.sqrt(1.0 - 1.0 / (k * k))  # siftparams.h:41

    @property
    def base_smooth(self) -> float:
        sa = self.sigma_0 * (self.sigma_k ** self.level_min)   # siftparams.h:43
        sb = self.sigma_n
        if sa > sb:
            return math.sqrt(sa * sa - sb * sb)                # siftparams.h:47
        return 0.0

    @property
    def sigmas(self) -> Tuple[float, ...]:
        """Incremental smoothing per level transition, ``siftparams.h:50``.

        ``sigmas[j]`` takes Gaussian level ``j`` to level ``j + 1`` of an
        octave (levels are indexed 0..num_gauss_levels-1; level ``j`` holds
        scale index ``j + level_min``)."""
        return tuple(
            self.sigma_d0 * (self.sigma_k ** i)
            for i in range(self.level_min + 1, self.level_max + 1)
        )

    def octave_shape(self, octave: int) -> Tuple[int, int]:
        """(height, width) of a given octave; halved (floor) per octave as in
        the client-side ``downsample_by_2`` loop (``downsample.cu:14-16``)."""
        return self.height >> octave, self.width >> octave


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Brute-force descriptor matching configuration.

    ``ambiguity`` is the Lowe ratio-test threshold on *squared* L2 distances,
    default 0.8 (``siftfunctions.h:20``, ``match.h:45``)."""

    ambiguity: float = 0.8
    # MXU precision for the distance GEMM: "fp32" (exact) or "bf16" (fast).
    precision: str = "fp32"


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """RANSAC configuration (``ransac.h:12-34``).

    ``inlier_threshold`` is compared against the *squared* reprojection
    distance (``ransac.cu:74-77``)."""

    iterations: int = 2048
    inlier_threshold: float = 9.0
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Bundle-adjustment configuration (new; no reference analogue)."""

    max_iterations: int = 10
    damping: float = 1e-4          # Levenberg-Marquardt lambda
    huber_delta: float = 2.0       # pixels, robust loss scale
    cg_iterations: int = 50        # matrix-free Schur PCG
    cg_tol: float = 1e-6
    # Observation-chunk size for the PCG solver's block reductions: the
    # (O, 6, 6)-class per-observation temporaries pad ~30x under the TPU
    # (8, 128) tile, so at global scale (millions of observations) they are
    # accumulated over chunks of this many observations instead of in one
    # shot.  Problems with O <= obs_chunk take the unchunked path.
    obs_chunk: int = 131072


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution-level knobs (new)."""

    use_pallas: bool = True        # fall back to pure-jnp paths when False
    profile: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level config tree."""

    sift: SiftConfig
    match: MatchConfig = dataclasses.field(default_factory=MatchConfig)
    ransac: RansacConfig = dataclasses.field(default_factory=RansacConfig)
    ba: BAConfig = dataclasses.field(default_factory=BAConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)

    @staticmethod
    def for_image(width: int, height: int, **kwargs) -> "PipelineConfig":
        return PipelineConfig(sift=SiftConfig(width=width, height=height), **kwargs)
