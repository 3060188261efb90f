"""Per-gaussian preprocessing: projection, splat frame, AABB, culling.

Vectorized over the full capacity-padded gaussian axis; invalid/culled
gaussians simply carry valid=False and zero tiles. All math matches the
reference preprocess kernel
(diff-gaussian-rasterization-2d/cuda_rasterizer/forward.cu:174-287).

Frame convention: ``T`` is [P, 3, 3] with ROWS (u_cam, v_cam, p_cam) —
the two scaled tangent axes of the splat and its center, all in camera
coordinates. The CUDA kernel's Tu/Tv/Tw vectors are the COLUMNS of this
matrix (the x/y/z component triples); see forward.cu:73-113 and the
pure-torch oracle scripts/compare_2dgs_3dgs.py:161-179 which uses the
same row layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.ops.sh import eval_sh
from gslidar_tpu.raster.settings import (FILTER_INV_SQUARE, FRUSTUM_MARGIN,
                                         NEAR_N, RasterSettings)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[P, 4] (w, x, y, z) quaternions -> [P, 3, 3] rotation matrices.

    Normalizes internally (reference auxiliary.h:206-228; quaternion scalar
    part is stored first, scene/gaussian_model.py uses the same layout).
    """
    # norm clamp: capacity-padded dead slots carry zero quaternions; they
    # must stay finite (0 * NaN poisons masked compositing sums)
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def build_transmat(means3D, scales, quats, viewmat, scale_modifier=1.0):
    """Splat-to-camera frame and camera-space normal.

    Args:
        means3D: [P, 3] world positions.
        scales: [P, >=2]; only the first two are tangent extents (the third
            is carried by the model but unused by the 2D splat, reference
            auxiliary.h:276-283).
        quats: [P, 4] (w, x, y, z).
        viewmat: [4, 4] world->camera, row-major (p_cam = M[:3,:3] @ p + M[:3,3]).
    Returns:
        T [P, 3, 3] rows (u_cam, v_cam, p_cam); normal [P, 3] camera-space,
        sign-flipped towards the camera (dual-visible, forward.cu:108-112).
    """
    R = quat_to_rotmat(quats)                       # [P,3,3] columns = axes
    Rw2c = viewmat[:3, :3]
    u_world = R[..., :, 0] * (scales[..., 0:1] * scale_modifier)
    v_world = R[..., :, 1] * (scales[..., 1:2] * scale_modifier)
    n_world = R[..., :, 2]                           # unit (S[2][2] == 1)
    # geometry must be exact f32 — the default TPU matmul precision is
    # bf16-ish and shifts positions by ~1e-3 relative
    hp = jax.lax.Precision.HIGHEST
    u_cam = jnp.matmul(u_world, Rw2c.T, precision=hp)
    v_cam = jnp.matmul(v_world, Rw2c.T, precision=hp)
    p_cam = jnp.matmul(means3D, Rw2c.T, precision=hp) + viewmat[:3, 3]
    normal = jnp.matmul(n_world, Rw2c.T, precision=hp)
    # flip so the normal faces the camera (dot(normal, p_cam) < 0 keeps +1)
    flip = jnp.where(jnp.sum(normal * p_cam, axis=-1, keepdims=True) < 0, 1.0, -1.0)
    normal = normal * flip
    T = jnp.stack([u_cam, v_cam, p_cam], axis=-2)
    return T, normal


def wrap_col_rect(cx_pix, rad_lo, rad_hi, W, tw, gx):
    """Tile-column rect of a circular-pano splat: first covered column and
    modular width (binning walks ``col_a .. col_a + wt - 1 (mod gx)``).

    The covered pixel span is [cx - rad_lo, cx + rad_hi] wrapped at W
    while the tile grid wraps at gx (the two periods differ when the last
    tile is partial, gx*tw > W). The span wraps the seam iff
    a + rad_lo + rad_hi >= W with a = mod(cx - rad_lo, W); then the
    covered set is [a, W) u [0, b] -> columns col(a)..gx-1 plus 0..col(b),
    i.e. (gx - col_a) + col_b + 1 clamped to one revolution. (A single
    mod(col_b - col_a, gx) + 1 is WRONG when the span wraps but
    col_b >= col_a still holds: near-full-revolution spans in (W - tw, W)
    would collapse to a sliver and silently drop the splat from most
    tiles in both render and gradients.)
    """
    span = rad_lo + rad_hi
    a = jnp.mod(cx_pix - rad_lo, W)
    b = jnp.mod(cx_pix + rad_hi, W)
    col_a = jnp.clip((a / tw).astype(jnp.int32), 0, gx - 1)
    col_b = jnp.clip((b / tw).astype(jnp.int32), 0, gx - 1)
    wrapped = (a + span) >= W
    wt = jnp.where(wrapped,
                   jnp.minimum(gx, gx - col_a + col_b + 1),
                   col_b - col_a + 1)
    # spans of a full revolution or more cover everything (the wrapped
    # union formula above assumes the span stops before closing the loop)
    wt = jnp.where(span >= W, gx, wt)
    return col_a, col_a + wt


def _pano_angles(p_cam):
    """(phi, theta, r) of camera-space points, with the atan2(0,0)/sqrt(0)
    NaN-gradient guard for points exactly at the camera origin (dead
    capacity slots under an identity viewmat)."""
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    degen = (x * x + z * z) < 1e-20
    x_s = jnp.where(degen, 0.0, x)
    z_s = jnp.where(degen, 1.0, z)
    phi = jnp.arctan2(x_s, z_s)
    theta = jnp.arctan2(jnp.sqrt(x_s * x_s + z_s * z_s), -y)
    r = jnp.sqrt(jnp.sum(p_cam * p_cam, axis=-1) + 1e-24)
    return phi, theta, r


def center_projection(T, bounds, settings: RasterSettings):
    """Pixel coordinates and spherical range of the splat centers from the
    frame's p_cam row: (xy [P, 2], r [P]).

    ``rasterize`` re-applies this to the TAPPED T so the compositors'
    center-pixel (rho2d low-pass branch) and center-range gradients chain
    into dL/dT through autodiff — exactly the reference's semantics, where
    the render backward routes the 2d-branch dL/dmean2D through the
    spherical Jacobian into dL_dT[*].z (backward.cu:578-595) and the
    2d-branch depth gradient directly as dL_dr * p_cam / r
    (backward.cu:505-508) BEFORE the densification gradient is read off
    dL_dT (backward.cu:684-711).
    """
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = bounds
    phi, theta, r = _pano_angles(T[:, 2, :])
    cx = (phi - HFOV_min) * settings.width / (HFOV_max - HFOV_min)
    cy = (theta - VFOV_min) * settings.height / (VFOV_max - VFOV_min)
    return jnp.stack([cx, cy], -1), r


def _frustum_ok(phi, theta, r, bounds, scale_factor):
    """Panoramic frustum cull with a fixed 1.3x margin
    (auxiliary.h:182-204): near-plane reject + angular window. Shared by
    ``preprocess`` and ``mark_visible`` so the two can never drift."""
    vmin, vmax, hmin, hmax = bounds
    center_v = 0.5 * (vmax + vmin)
    half_v = 0.5 * (vmax - vmin)
    center_h = 0.5 * (hmax + hmin)
    half_h = 0.5 * (hmax - hmin)
    return ((r > NEAR_N * scale_factor)
            & (jnp.abs((theta - center_v) / half_v) <= FRUSTUM_MARGIN)
            & (jnp.abs((phi - center_h) / half_h) <= FRUSTUM_MARGIN))


def mark_visible(means3D, viewmat, scale_factor,
                 settings: RasterSettings, angle_bounds=None):
    """Frustum visibility test without a render — the reference's
    ``GaussianRasterizer.markVisible``
    (diff_gaussian_rasterization_2d.py:217-224, rasterizer_impl.cu:
    145-157): the same panoramic cull window ``preprocess`` applies
    (near-plane reject + 1.3x-margin angular window). Returns [P] bool.
    """
    bounds = (angle_bounds if angle_bounds is not None
              else settings.angle_bounds)
    # HIGHEST precision, like build_transmat's world->camera transform —
    # the default TPU matmul shifts positions by ~1e-3 relative, which
    # would make this cull disagree with preprocess at frustum margins
    p_cam = jnp.matmul(means3D, viewmat[:3, :3].T,
                       precision=jax.lax.Precision.HIGHEST) + viewmat[:3, 3]
    phi, theta, r = _pano_angles(p_cam)
    return _frustum_ok(phi, theta, r, bounds, scale_factor)


class PreprocessOut(NamedTuple):
    T: jnp.ndarray            # [P, 3, 3]
    xy: jnp.ndarray           # [P, 2] pixel coords of the center (x=width)
    depth: jnp.ndarray        # [P] spherical range of the center
    normal: jnp.ndarray       # [P, 3]
    color: jnp.ndarray        # [P, C] SH-evaluated channels
    radius: jnp.ndarray       # [P] float conservative pixel radius
    rect_min: jnp.ndarray     # [P, 2] int32 (tx, ty) inclusive
    rect_max: jnp.ndarray     # [P, 2] int32 exclusive
    tiles_touched: jnp.ndarray  # [P] int32
    valid: jnp.ndarray        # [P] bool


_AABB_SAMPLES = 12


def preprocess(means3D, scales, quats, opacity, shs, mask, viewmat, campos,
               sh_degree, scale_factor, settings: RasterSettings,
               scale_modifier=1.0, colors_precomp=None,
               angle_bounds=None, cull_bounds=None) -> PreprocessOut:
    """Full preprocess pass (reference forward.cu:174-287).

    opacity: [P] activated opacity (possibly already multiplied by the
    temporal marginal); shs: [P, K, C] or None when colors_precomp given;
    mask: [P] bool prefilter (alive & opacity cut, gaussian_renderer/
    __init__.py:113-115). angle_bounds optionally overrides the static
    settings bounds with traced scalars (vmin, vmax, hmin, hmax) — used by
    the hfov-sliced multi-chip renderer (parallel/pano_shard.py) where each
    device renders a different angular slice from one traced program.
    cull_bounds optionally decouples the frustum-cull window from the
    pixel-mapping window (a slice renderer culls against the FULL view so
    edge behaviour matches an unsliced render exactly).
    """
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = (
        angle_bounds if angle_bounds is not None else settings.angle_bounds)
    cVmin, cVmax, cHmin, cHmax = (
        cull_bounds if cull_bounds is not None
        else (angle_bounds if angle_bounds is not None
              else settings.angle_bounds))
    H, W = settings.height, settings.width

    T, normal = build_transmat(means3D, scales, quats, viewmat, scale_modifier)
    p_cam = T[:, 2, :]
    phi, theta, r = _pano_angles(p_cam)

    # panoramic frustum cull (shared with mark_visible). The cull window
    # is the cull_bounds (= the full view for a slice renderer, so a
    # slice keeps/drops exactly the splats an unsliced render would);
    # the pixel mapping below uses angle_bounds.
    in_frustum = _frustum_ok(phi, theta, r, (cVmin, cVmax, cHmin, cHmax),
                             scale_factor)
    valid = mask & in_frustum

    # AABB by sampling the cutoff ellipse (forward.cu:129-171,243)
    cutoff = jnp.sqrt(jnp.maximum(9.0 + 2.0 * jnp.log(jnp.maximum(opacity, 1e-30)),
                                  1e-6))
    ang = 2.0 * jnp.pi * jnp.arange(_AABB_SAMPLES) / _AABB_SAMPLES
    sa, ca = jnp.sin(ang), jnp.cos(ang)
    # sample point in camera space: cutoff*(sin a)*u + cutoff*(cos a)*v + p
    sample = (cutoff[:, None, None] * (sa[None, :, None] * T[:, None, 0, :]
                                       + ca[None, :, None] * T[:, None, 1, :])
              + p_cam[:, None, :])                       # [P, 12, 3]
    s_degen = (sample[..., 0] ** 2 + sample[..., 2] ** 2) < 1e-20
    s_x = jnp.where(s_degen, 0.0, sample[..., 0])
    s_z = jnp.where(s_degen, 1.0, sample[..., 2])
    s_phi = jnp.arctan2(s_x, s_z)
    if settings.wrap_x:
        # circular pano: unwrap the sample angles around the center phi so
        # a splat straddling the +-pi seam gets a LOCAL (possibly
        # out-of-[0,W)) pixel AABB instead of a full-width one
        dphi = s_phi - phi[:, None]
        dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
        s_phi = phi[:, None] + dphi
    s_theta = jnp.arctan2(jnp.sqrt(s_x * s_x + s_z * s_z), -sample[..., 1])
    sx_pix = (s_phi - HFOV_min) * W / (HFOV_max - HFOV_min)
    sy_pix = (s_theta - VFOV_min) * H / (VFOV_max - VFOV_min)

    cx_pix = (phi - HFOV_min) * W / (HFOV_max - HFOV_min)
    cy_pix = (theta - VFOV_min) * H / (VFOV_max - VFOV_min)
    ex_hi = jnp.max(sx_pix, 1) - cx_pix              # per-axis ring extents
    ex_lo = cx_pix - jnp.min(sx_pix, 1)
    ey_hi = jnp.max(sy_pix, 1) - cy_pix
    ey_lo = cy_pix - jnp.min(sy_pix, 1)
    radius = jnp.maximum(jnp.maximum(ex_hi, ex_lo),
                         jnp.maximum(ey_hi, ey_lo))
    valid = valid & (radius >= 0.3)                      # forward.cu:257-258
    rad_i = jnp.ceil(radius)

    if settings.tight_rects:
        # Output-preserving per-axis rect (measured: ~0.88x instances at
        # the bench shape, scripts/measure_tight_rects.py). A pixel can
        # only contribute if alpha = min(.99, op*exp(-rho/2)) >= 1/255,
        # i.e. rho <= rho_eps = 2*ln(255*op); the kernel masks everything
        # else (forward.cu:441-446), so culling tiles that lie wholly
        # outside the rho_eps support changes NO composited output or
        # gradient. The reference instead rasterizes the full SQUARE of
        # the rho = 9+2*ln(op) ring's max extent (forward.cu:129-171,243)
        # — the square is wasteful on both axes for anisotropic splats.
        # Per-axis extents of the rho_eps support are estimated by
        # scaling the sampled ring's extents with the cutoff ratio
        # (exact up to projection nonlinearity, so: a 1.10 margin, a
        # 1 px pad, and a fallback to the square for radius > 48 px
        # where linearization degrades), then UNIONED with the rho2d
        # low-pass disk (pixels within sqrt(rho_eps/FilterInvSquare) of
        # the center stay alive regardless of the 3D ellipse) and
        # INTERSECTED with the reference square so coverage only ever
        # shrinks — tiles we keep are exactly the reference's minus
        # provably-zero ones. Exactness is regression-tested by
        # tight-vs-square render equality on random scenes
        # (tests/test_raster.py::test_tight_rects_output_preserving).
        rho_eps = jnp.maximum(
            2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-30)), 1e-6)
        ratio = jnp.sqrt(rho_eps) / cutoff * 1.10
        disk = jnp.sqrt(rho_eps / FILTER_INV_SQUARE) + 1.0
        small = radius <= 48.0

        def _side(ext):
            tight = jnp.ceil(jnp.maximum(ratio * ext, disk) + 1.0)
            return jnp.minimum(rad_i, jnp.where(small, tight, rad_i))

        rx_lo, rx_hi = _side(ex_lo), _side(ex_hi)
        ry_lo, ry_hi = _side(ey_lo), _side(ey_hi)
    else:
        rx_lo = rx_hi = ry_lo = ry_hi = rad_i

    # tile rect: center - lo .. center + hi, clamped to the grid
    # (reference: center +- radius, auxiliary.h:47-55)
    gx, gy = settings.tiles_x, settings.tiles_y
    tw, th = settings.tile_w, settings.tile_h
    rect_min_y = jnp.clip(((cy_pix - ry_lo) / th).astype(jnp.int32), 0, gy)
    rect_max_y = jnp.clip(((cy_pix + ry_hi + th - 1) / th).astype(jnp.int32), 0, gy)
    if settings.wrap_x:
        # circular x: the pixel axis wraps at W (phi = +-pi seam) while the
        # tile grid wraps at tiles_x — the two periods differ when the last
        # tile is partial (gx*tw > W). Compute the first/last covered
        # column in WRAPPED pixel space; the covered set is the modular
        # column run col_a..col_a+wt-1 (binning walks it mod gx). Capped at
        # one full revolution.
        rect_min_x, rect_max_x = wrap_col_rect(cx_pix, rx_lo, rx_hi, W, tw, gx)
    else:
        rect_min_x = jnp.clip(((cx_pix - rx_lo) / tw).astype(jnp.int32), 0, gx)
        rect_max_x = jnp.clip(((cx_pix + rx_hi + tw - 1) / tw).astype(jnp.int32), 0, gx)
    area = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    valid = valid & (area > 0)
    tiles_touched = jnp.where(valid, area, 0).astype(jnp.int32)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3D - campos[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True)
                               + 1e-24)
        color, _ = eval_sh(sh_degree, shs, dirs)

    return PreprocessOut(
        T=T,
        xy=jnp.stack([cx_pix, cy_pix], -1),
        depth=r,
        normal=normal,
        color=color,
        radius=jnp.where(valid, rad_i, 0.0),
        rect_min=jnp.stack([rect_min_x, rect_min_y], -1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], -1),
        tiles_touched=tiles_touched,
        valid=valid,
    )
