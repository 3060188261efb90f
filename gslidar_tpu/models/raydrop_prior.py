"""Learned per-pixel ray-drop prior (environment map).

Reference: scene/raydrop_prior.py — a learnable logit panorama [1, H, 2W]
initialized at sigmoid^-1(0.1); the forward slices the front/back half and
applies sigmoid; its own Adam; bilinear upscale on coarse-to-fine steps.

TPU-native: the parameter is a single array in a dict pytree; the optimizer
shares the manual Adam in models/optim.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ADAM_EPS = 1e-15


def init_raydrop_prior(h: int, w: int) -> jnp.ndarray:
    init = float(np.log(0.1 / 0.9))
    return jnp.full((1, h, 2 * w), init, jnp.float32)


def raydrop_prior_forward(param: jnp.ndarray, towards: str) -> jnp.ndarray:
    """Front/back half in [0, 1] (reference raydrop_prior.py:29-37)."""
    w = param.shape[-1] // 2
    if towards == "forward":
        sl = param[:, :, :w]
    elif towards == "backward":
        sl = param[:, :, w:]
    else:
        raise NotImplementedError(towards)
    return jax.nn.sigmoid(sl)


def raydrop_prior_upscale(param: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize on resolution-schedule changes
    (reference raydrop_prior.py:39-42, align_corners=True)."""
    src = np.asarray(param)[0]
    sh, sw = src.shape
    th, tw = h, 2 * w
    # align_corners=True bilinear
    yi = np.linspace(0, sh - 1, th)
    xi = np.linspace(0, sw - 1, tw)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (yi - y0)[:, None]
    wx = (xi - x0)[None, :]
    out = (src[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
           + src[np.ix_(y1, x0)] * wy * (1 - wx)
           + src[np.ix_(y0, x1)] * (1 - wy) * wx
           + src[np.ix_(y1, x1)] * wy * wx)
    return jnp.asarray(out[None].astype(np.float32))


class PriorAdam:
    """Tiny single-array Adam matching torch.optim.Adam(lr, eps=1e-15)."""

    @staticmethod
    def init(param):
        return (jnp.zeros_like(param), jnp.zeros_like(param),
                jnp.zeros((), jnp.int32))

    @staticmethod
    def step(param, grad, state, lr, b1=0.9, b2=0.999):
        mu, nu, count = state
        count = count + 1
        mu = b1 * mu + (1 - b1) * grad
        nu = b2 * nu + (1 - b2) * grad * grad
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        new = param - lr * (mu / c1) / (jnp.sqrt(nu / c2) + ADAM_EPS)
        return new, (mu, nu, count)
