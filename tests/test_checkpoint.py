"""Checkpoint/resume round-trip tests (orbax or npz fallback)."""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.utils.checkpoint import load_pytree, save_pytree


def test_pytree_roundtrip(tmp_path, rng):
    tree = {
        "poses": jnp.asarray(rng.normal(size=(5, 3, 4)).astype(np.float32)),
        "landmarks": jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)),
        "meta": {
            "count": jnp.asarray(7, jnp.int32),
            "mask": jnp.asarray(rng.uniform(size=12) > 0.5),
        },
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    like = {
        "poses": np.zeros((5, 3, 4), np.float32),
        "landmarks": np.zeros((64, 3), np.float32),
        "meta": {
            "count": np.zeros((), np.int32),
            "mask": np.zeros(12, bool),
        },
    }
    back = load_pytree(path, like)
    np.testing.assert_allclose(np.asarray(back["poses"]), np.asarray(tree["poses"]))
    np.testing.assert_allclose(
        np.asarray(back["landmarks"]), np.asarray(tree["landmarks"])
    )
    assert int(back["meta"]["count"]) == 7
    np.testing.assert_array_equal(
        np.asarray(back["meta"]["mask"]), np.asarray(tree["meta"]["mask"])
    )
