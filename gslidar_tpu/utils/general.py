"""General utilities: seeding, LR schedules, depth colormaps, pair shuffle.

Reference: utils/general_utils.py. The LR schedules are pure functions of the
step so they can be evaluated inside a jitted train step via
optax.inject_hyperparams-style wiring.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def inverse_sigmoid_np(x):
    return np.log(x / (1 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1000000):
    """Log-linear LR decay (reference: utils/general_utils.py:61-94).

    Returns a python-float function of step; a jnp twin is in
    `expon_lr_jnp` for use inside jit.
    """

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def expon_lr_jnp(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                 max_steps=1000000):
    import jax.numpy as jnp
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return delay_rate * log_lerp


def get_step_lr_func(lr_init, lr_final, start_step):
    def helper(step):
        return lr_init if step < start_step else lr_final
    return helper


def shuffle_by_pairs(lst) -> None:
    """In-place shuffle preserving (front, back) camera adjacency
    (reference: utils/general_utils.py:160-164)."""
    paired = [(lst[i], lst[i + 1]) for i in range(0, len(lst), 2)]
    random.shuffle(paired)
    lst[:] = [item for pair in paired for item in pair]


def visualize_depth(depth, near=2, far=50, linear=False, scale_factor=None,
                    cmap="turbo"):
    """Depth -> turbo-colormapped uint-range float RGB [3, H, W] numpy.

    Reference: utils/general_utils.py:15-35 (log-depth curve).
    """
    import matplotlib
    depth = np.asarray(depth)
    if scale_factor is not None:
        depth = depth / scale_factor
    depth = depth[0] if depth.ndim == 3 else depth
    colormap = matplotlib.colormaps.get_cmap(cmap)
    eps = np.finfo(np.float32).eps
    curve = (lambda x: -x) if linear else (lambda x: -np.log(np.maximum(x, 0) + eps))
    near = (near if near else depth.min()) - eps
    far = (far if far else depth.max()) + eps
    near_c, far_c, depth_c = curve(near), curve(far), curve(depth)
    t = np.nan_to_num(
        np.clip((depth_c - np.minimum(near_c, far_c)) / np.abs(far_c - near_c), 0, 1))
    vis = colormap(t)[:, :, :3]
    return np.clip(np.nan_to_num(vis), 0.0, 1.0).transpose(2, 0, 1).astype(np.float32)


def make_image_grid(images, nrow=4, pad=2):
    """Tile [3, H, W] images into one grid image (replaces torchvision
    make_grid for visualization dumps)."""
    images = [np.asarray(im) for im in images]
    c, h, w = images[0].shape
    n = len(images)
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((c, nrows * (h + pad) + pad, ncol * (w + pad) + pad),
                    dtype=np.float32)
    for i, im in enumerate(images):
        r, cidx = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + cidx * (w + pad)
        grid[:, y:y + h, x:x + w] = im
    return grid


def save_image(img, path) -> None:
    """Save a [3, H, W] float image in [0,1] as PNG."""
    from PIL import Image
    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)
