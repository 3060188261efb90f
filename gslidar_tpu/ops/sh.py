"""Real spherical-harmonics evaluation for 4-channel (RGB + raydrop) features.

TPU-native notes: evaluated as one fused einsum over the SH basis so the
per-gaussian work is a [P, K] x [P, K, C] contraction that XLA maps onto the
MXU, instead of the per-degree branch ladder the reference CUDA kernel uses
(reference: diff-gaussian-rasterization-2d/cuda_rasterizer/forward.cu:17-69).
The active degree is a *dynamic* scalar: bands above it are masked to zero,
which avoids one recompile per SH ramp step
(reference: train.py:159-160 ramps the degree every sh_increase_interval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

# band index (degree) of each of the 16 coefficients
_BAND = jnp.array([0] + [1] * 3 + [2] * 5 + [3] * 7, dtype=jnp.int32)


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values for unit directions.

    Args:
        dirs: [..., 3] unit view directions.
    Returns:
        [..., 16] basis values (degree 0..3), matching the reference kernel's
        hardcoded polynomial (forward.cu:27-60).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    basis = [
        SH_C0 * one,
        -SH_C1 * y, SH_C1 * z, -SH_C1 * x,
        SH_C2[0] * xy, SH_C2[1] * yz, SH_C2[2] * (2.0 * zz - xx - yy),
        SH_C2[3] * xz, SH_C2[4] * (xx - yy),
        SH_C3[0] * y * (3.0 * xx - yy), SH_C3[1] * xy * z,
        SH_C3[2] * y * (4.0 * zz - xx - yy),
        SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        SH_C3[4] * x * (4.0 * zz - xx - yy), SH_C3[5] * z * (xx - yy),
        SH_C3[6] * x * (xx - 3.0 * yy),
    ]
    return jnp.stack(basis, axis=-1)


def eval_sh(degree, sh_coeffs: jnp.ndarray, dirs: jnp.ndarray,
            clamp: bool = True):
    """Evaluate SH -> per-channel value ( + 0.5, clamped at 0 ).

    Args:
        degree: active SH degree, scalar (may be traced).
        sh_coeffs: [P, K, C] coefficients, K <= 16.
        dirs: [P, 3] unit directions (gaussian center - camera center).
        clamp: apply the reference's max(v, 0) clamp.
    Returns:
        (values [P, C], clamped_mask [P, C]) — the mask replicates the
        backward clamp rule (backward.cu:28-32) for gradient parity; with
        jax autodiff the clamp handles it automatically, the mask is
        diagnostic.
    """
    K = sh_coeffs.shape[-2]
    basis = sh_basis(dirs)[..., :K]                       # [P, K]
    band_ok = (_BAND[:K][None, :] <= degree).astype(basis.dtype)
    basis = basis * band_ok
    vals = jnp.einsum("pk,pkc->pc", basis, sh_coeffs,
                  precision=jax.lax.Precision.HIGHEST) + 0.5
    clamped = vals < 0
    if clamp:
        vals = jnp.maximum(vals, 0.0)
    return vals, clamped


def rgb2sh(rgb):
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh):
    return sh * SH_C0 + 0.5
