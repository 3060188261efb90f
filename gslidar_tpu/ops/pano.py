"""Panorama <-> LiDAR geometry: projection, backprojection, normals.

Conventions (identical to the reference):
  camera frame: +z forward, +x right, -y up (LiDAR-style);
  phi   = atan2(x, z)                 (azimuth, 0 = forward)
  theta = atan2(sqrt(x^2+z^2), -y)    (polar from "up")
  pixel u (width)  = (phi   - HFOV_min) * W / (HFOV_max - HFOV_min)
  pixel v (height) = (theta - VFOV_min) * H / (VFOV_max - VFOV_min)
with angle bounds derived from vfov/hfov in degrees
(reference: cuda_rasterizer/forward.cu:116-125,221-226 and
utils/camera_utils.py:185-195).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def fov_bounds(vfov, hfov):
    """Degrees -> radian angle bounds (VFOV_min, VFOV_max, HFOV_min, HFOV_max).

    Note the vertical bounds swap: theta is measured from 'up', so a larger
    elevation angle maps to a smaller theta (forward.cu:221-226).
    """
    vfov_min_deg, vfov_max_deg = float(vfov[0]), float(vfov[1])
    hfov_min_deg, hfov_max_deg = float(hfov[0]), float(hfov[1])
    VFOV_max = math.pi / 2 - vfov_min_deg * math.pi / 180
    VFOV_min = math.pi / 2 - vfov_max_deg * math.pi / 180
    HFOV_max = hfov_max_deg * math.pi / 180
    HFOV_min = hfov_min_deg * math.pi / 180
    return VFOV_min, VFOV_max, HFOV_min, HFOV_max


def spherical_from_cam(p_cam: jnp.ndarray):
    """[..., 3] camera-frame points -> (theta, phi, r)."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    phi = jnp.arctan2(x, z)
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), -y)
    r = jnp.linalg.norm(p_cam, axis=-1)
    return theta, phi, r


def pixel_dirs(H: int, W: int, vfov, hfov, xp=jnp, jitter=None):
    """Unit ray directions for every pixel center, [3, H, W].

    Matches utils/graphics_utils.py:96-118 / scene/cameras.py:84-106: the
    pixel (i, j) angle is taken at the *left-top corner convention used by
    the reference* (theta = 90 - vfov_max + i/H * range in degrees).
    """
    theta_i = xp.arange(H, dtype=xp.float32)
    phi_j = xp.arange(W, dtype=xp.float32)
    if jitter is not None:
        theta_i = theta_i + jitter[0]
        phi_j = phi_j + jitter[1]
    theta, phi = xp.meshgrid(theta_i, phi_j, indexing="ij")
    v_range = vfov[1] - vfov[0]
    theta = (90 - vfov[1] + theta / H * v_range) * xp.pi / 180
    h_range = hfov[1] - hfov[0]
    phi = (hfov[0] + phi / W * h_range) * xp.pi / 180
    dx = xp.sin(theta) * xp.sin(phi)
    dz = xp.sin(theta) * xp.cos(phi)
    dy = -xp.cos(theta)
    d = xp.stack([dx, dy, dz], axis=0)
    return d / xp.linalg.norm(d, axis=0, keepdims=True)


def pano_to_lidar(range_image: jnp.ndarray, vfov, hfov):
    """Range panorama [1, H, W] -> point cloud [H*W, 3] with a validity mask.

    TPU-native: returns a fixed-shape array plus mask instead of the
    reference's boolean-indexed ragged output (utils/graphics_utils.py:96-118)
    so it can live inside jit; callers outside jit can compress with the mask.
    """
    H, W = range_image.shape[-2:]
    dirs = pixel_dirs(H, W, vfov, hfov)
    pts = (dirs * range_image).reshape(3, -1).T
    mask = (range_image > 0).reshape(-1)
    return pts, mask


def pano_to_lidar_np(range_image: np.ndarray, vfov, hfov) -> np.ndarray:
    """Ragged numpy variant for IO paths (ply export etc.)."""
    pts, mask = pano_to_lidar(jnp.asarray(range_image), vfov, hfov)
    return np.asarray(pts)[np.asarray(mask)]


def depth_to_normal(range_image: jnp.ndarray, vfov, hfov) -> jnp.ndarray:
    """Central-difference normals from a range panorama, [3, H, W].

    Border ring is zero, matching utils/graphics_utils.py:121-149.
    """
    H, W = range_image.shape[-2:]
    dirs = pixel_dirs(H, W, vfov, hfov)
    points = dirs * range_image
    dxv = points[:, 2:, 1:-1] - points[:, :-2, 1:-1]
    dyv = points[:, 1:-1, 2:] - points[:, 1:-1, :-2]
    n = jnp.cross(dxv, dyv, axis=0)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True) + 1e-24)
    out = jnp.zeros_like(points)
    return out.at[:, 1:-1, 1:-1].set(n)


def project_points_to_pano(points_cam: np.ndarray, intensity: np.ndarray,
                           H: int, W: int, vfov, hfov):
    """Vectorized z-buffer of camera-frame points into range/intensity panos.

    Replaces the reference's per-point python loop
    (utils/camera_utils.py:176-212) with a lexsort + first-hit scatter:
    sort by (pixel, range), keep the nearest return per pixel.

    Returns (pts_depth [1,H,W], pts_intensity [1,H,W]) float32 numpy.

    Uses the native C++ z-buffer when available (native/gslidar_native.cpp);
    the numpy lexsort path below is the portable fallback.
    """
    from gslidar_tpu.native import get_native
    nat = get_native()
    if nat is not None:
        return nat.project_pano(
            np.ascontiguousarray(points_cam[:, :3], np.float32),
            np.ascontiguousarray(intensity, np.float32),
            int(H), int(W), float(vfov[0]), float(vfov[1]),
            float(hfov[0]), float(hfov[1]))

    x, y, z = points_cam[:, 0], points_cam[:, 1], points_cam[:, 2]
    phi = np.arctan2(x, z)
    theta = np.arctan2(np.sqrt(x ** 2 + z ** 2), -y)
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)

    VFOV_max = np.pi / 2 - vfov[0] * np.pi / 180
    VFOV_min = np.pi / 2 - vfov[1] * np.pi / 180
    HFOV_max = hfov[1] * np.pi / 180
    HFOV_min = hfov[0] * np.pi / 180

    ti = (theta - VFOV_min) * H / (VFOV_max - VFOV_min)
    pj = (phi - HFOV_min) * W / (HFOV_max - HFOV_min)

    keep = (ti >= -0.5) & (ti < H - 0.5) & (pj >= -0.5) & (pj < W - 0.5)
    ti, pj, r, inten = ti[keep], pj[keep], r[keep], intensity[keep]
    ui = np.around(ti).astype(np.int64)
    uj = np.around(pj).astype(np.int64)
    flat = ui * W + uj

    order = np.lexsort((r, flat))
    flat, r, inten = flat[order], r[order], inten[order]
    first = np.ones(flat.shape[0], dtype=bool)
    first[1:] = flat[1:] != flat[:-1]

    depth = np.zeros(H * W, dtype=np.float32)
    inten_img = np.zeros(H * W, dtype=np.float32)
    depth[flat[first]] = r[first]
    inten_img[flat[first]] = inten[first]
    return depth.reshape(1, H, W), inten_img.reshape(1, H, W)
