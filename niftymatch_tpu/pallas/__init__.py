"""Hand-tiled Pallas TPU kernels for the hot ops (SURVEY.md §7.6).

Every kernel here has a pure-jnp oracle in ``niftymatch_tpu.ops`` (the role
the reference's ``_naive`` CUDA kernels play, ``orientation.cu:132-216`` /
``descriptor.cu:148-241``); tests compare against those under
``interpret=True`` on CPU and compiled on TPU."""

from .match import fused_match_topk, match_descriptors_pallas

__all__ = [
    "fused_match_topk",
    "match_descriptors_pallas",
]
