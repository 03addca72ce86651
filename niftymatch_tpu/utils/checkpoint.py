"""Checkpoint / resume for SLAM map state (SURVEY.md §5).

The reference has no serialization of any kind (SiftData/PyramidData are
transient device buffers).  Here the map state — keyframe poses, track
positions, feature descriptors, config — checkpoints to disk so SLAM
sessions and distributed BA jobs can resume.

Uses orbax-checkpoint when available (async, multi-host aware); falls back
to a plain ``np.savez`` container with identical semantics for environments
without orbax.  Both paths round-trip arbitrary pytrees of arrays.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax

try:  # orbax is baked into the image, but stay import-safe
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    _HAVE_ORBAX = False


def save_pytree(path: str, tree: Any, *, force: bool = True) -> None:
    """Save a pytree of arrays to ``path`` (directory for orbax, .npz else)."""
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path),
            jax.tree.map(np.asarray, tree),
            force=force,
        )
        ckptr.wait_until_finished()
        return
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (and dtypes/shapes for orbax restore)."""
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, like)
        restored = ckptr.restore(os.path.abspath(path), target)
        return restored
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def save_slam_state(path: str, slam) -> None:
    """Checkpoint a ``SlamSystem``: keyframe poses/features/tracks + global
    track store.  ``path`` is a directory."""
    if hasattr(slam, "flush_ba"):
        slam.flush_ba()  # harvest any in-flight windowed-BA update
    os.makedirs(path, exist_ok=True)
    meta = {
        "num_keyframes": len(slam.keyframes),
        "next_track": slam._next_track,
        "config": {
            "width": slam.config.width,
            "height": slam.config.height,
            "intrinsics": list(slam.config.intrinsics),
        },
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    np.savez(
        os.path.join(path, "tracks.npz"),
        positions=slam.track_positions,
        alive=slam.track_alive,
    )
    for kf in slam.keyframes:
        np.savez(
            os.path.join(path, f"kf_{kf.index:05d}.npz"),
            pose=np.asarray(kf.pose),
            track_ids=kf.track_ids,
            **{
                f"feat_{name}": np.asarray(getattr(kf.feats, name))
                for name in kf.feats._fields
            },
        )


def load_slam_state(path: str, slam) -> None:
    """Restore a ``SlamSystem`` checkpointed by :func:`save_slam_state`
    into ``slam`` (which must be constructed with a compatible config)."""
    import jax.numpy as jnp

    from ..features import Features
    from ..slam.system import Keyframe

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    tracks = np.load(os.path.join(path, "tracks.npz"))
    slam.track_positions = tracks["positions"]
    slam.track_alive = tracks["alive"]
    slam._next_track = int(meta["next_track"])
    slam.keyframes = []
    for i in range(meta["num_keyframes"]):
        data = np.load(os.path.join(path, f"kf_{i:05d}.npz"))
        feats = Features(
            **{
                name: jnp.asarray(data[f"feat_{name}"])
                for name in Features._fields
            }
        )
        slam.keyframes.append(
            Keyframe(
                index=i,
                feats=feats,
                pose=jnp.asarray(data["pose"]),
                track_ids=data["track_ids"],
            )
        )
