"""Chamfer distance + F-score, replacing the reference CUDA extension.

Reference: chamfer/chamfer3D/chamfer3D.cu (brute-force NN in 512-point
shared-memory batches) and chamfer/fscore.py.

TPU-native: the pairwise squared-distance matrix is computed in [chunk, M]
blocks via |a|^2+|b|^2-2ab (MXU matmul) and min-reduced — no atomics, no
index round-trip; gradients come from jax autodiff of the min (which routes
to the argmin, matching the CUDA backward's 2*(x1-x2) scatter).

Point counts here are panorama-sized (~34k at 66x1030), so masked fixed-shape
inputs are used to stay jit-friendly: invalid points get +inf distance on
their own side and are excluded from reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _one_sided_min_sqdist(a, a_mask, b, b_mask, chunk: int,
                          precision=None):
    """For each a[i]: min_j ||a_i - b_j||^2 over valid b. Invalid a -> 0.

    The |a|^2+|b|^2-2ab expansion only picks the ARGMIN (so it can run at
    fast/bf16 matmul precision); the distance itself is recomputed exactly
    from coordinate differences — which also gives exact 2(a-b) gradients
    (the CUDA backward's formula, chamfer3D.cu:167-196).
    """
    precision = precision or jax.lax.Precision.DEFAULT
    bsq = jnp.sum(b * b, axis=-1)
    bsq = jnp.where(b_mask, bsq, jnp.inf)  # invalid b never selected

    P = a.shape[0]
    pad = (-P) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    n_chunks = a_p.shape[0] // chunk

    def body(_, idx):
        blk = jax.lax.dynamic_slice_in_dim(a_p, idx * chunk, chunk)
        d2 = (jnp.sum(blk * blk, axis=-1)[:, None] + bsq[None, :]
              - 2.0 * jnp.dot(blk, b.T, preferred_element_type=jnp.float32,
                              precision=precision))
        nn = jnp.argmin(d2, axis=1)
        exact = jnp.sum((blk - b[nn]) ** 2, axis=-1)
        return _, exact

    _, mins = jax.lax.scan(body, None, jnp.arange(n_chunks))
    mins = mins.reshape(-1)[:P]
    return jnp.where(a_mask, mins, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "precision"))
def chamfer_distance(x1, x2, mask1=None, mask2=None, chunk: int = 1024,
                     precision=None):
    """Two-sided squared chamfer terms.

    Args:
        x1: [N, 3], x2: [M, 3]; mask*: boolean validity (None = all valid).
    Returns:
        (dist1 [N], dist2 [M], mean1, mean2) — squared distances; means are
        over valid points only, matching chamfer_3DDist + .mean()
        (reference: train.py:256-267).
    """
    if mask1 is None:
        mask1 = jnp.ones(x1.shape[0], dtype=bool)
    if mask2 is None:
        mask2 = jnp.ones(x2.shape[0], dtype=bool)
    d1 = _one_sided_min_sqdist(x1, mask1, x2, mask2, chunk, precision)
    d2 = _one_sided_min_sqdist(x2, mask2, x1, mask1, chunk, precision)
    n1 = jnp.maximum(jnp.sum(mask1), 1)
    n2 = jnp.maximum(jnp.sum(mask2), 1)
    return d1, d2, jnp.sum(d1) / n1, jnp.sum(d2) / n2


def fscore(dist1, dist2, mask1=None, mask2=None, threshold: float = 0.05):
    """F-score at threshold from squared chamfer distances
    (reference: chamfer/fscore.py:4-18)."""
    if mask1 is None:
        mask1 = jnp.ones(dist1.shape[0], dtype=bool)
    if mask2 is None:
        mask2 = jnp.ones(dist2.shape[0], dtype=bool)
    n1 = jnp.maximum(jnp.sum(mask1), 1)
    n2 = jnp.maximum(jnp.sum(mask2), 1)
    precision_1 = jnp.sum((dist1 < threshold) & mask1) / n1
    precision_2 = jnp.sum((dist2 < threshold) & mask2) / n2
    f = 2 * precision_1 * precision_2 / (precision_1 + precision_2)
    return jnp.where(precision_1 + precision_2 > 0, f, 0.0), precision_1, precision_2
