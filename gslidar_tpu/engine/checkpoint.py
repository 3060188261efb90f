"""Checkpoint save/restore.

Reference: tuple-pickle checkpoints via GaussianModel.capture()/restore()
(scene/gaussian_model.py:84-137, train.py:459-462) with the sidecar files
scale_factor.txt / transform_poses_pca.npz.

Here the whole TrainState (params, aux, Adam moments, ray-drop prior and
its moments) is one pytree, saved as a compressed npz of numpy leaves —
restart-safe and framework-agnostic. The reference path layout is kept:
``ckpt/chkpnt{iter}.npz``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gslidar_tpu.engine.train import TrainState


def save_checkpoint(path: str, state: TrainState, iteration: int) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["iteration"] = np.asarray(iteration)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, template: TrainState):
    """Restore into the structure of `template` (defines the treedef)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    n = len(leaves)
    new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    state = jax.tree.unflatten(treedef, new_leaves)
    return state, int(data["iteration"])


def checkpoint_path(model_path: str, iteration: int) -> str:
    return os.path.join(model_path, "ckpt", f"chkpnt{iteration}.npz")


def latest_checkpoint(model_path: str, iterations: list[int]) -> str | None:
    found = None
    for it in iterations:
        p = checkpoint_path(model_path, it)
        if os.path.exists(p):
            found = p
    return found
