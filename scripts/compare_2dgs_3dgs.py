#!/usr/bin/env python
"""Panoramic 2DGS (surface) vs 3DGS (volume) splatting comparison.

Reference: scripts/compare_2dgs_3dgs.py — the repo's analytic oracle: a
dense pure-tensor renderer on a deterministic synthetic scene, used to
validate/visualize the splatting math (README.md:126-129, SURVEY.md §4).

This version is pure jnp and runs on CPU or TPU:
* 2DGS surface splatting reuses the framework's dense oracle math
  (ray-disk intersection via homogeneous planes, exact depth);
* 3DGS volume splatting projects full 3-D covariances through the
  first-order panorama Jacobian (reference compare_2dgs_3dgs.py:116-148)
  and blends with constant per-splat depth.

Outputs comparison grids under eval_output/compare_2dgs_3dgs/.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax.numpy as jnp

from gslidar_tpu.raster.preprocess import build_transmat, quat_to_rotmat
from gslidar_tpu.utils.general import (make_image_grid, save_image,
                                       visualize_depth)

VFOV = (-20.0, 20.0)
HFOV = (-90.0, 90.0)


def angle_bounds():
    VFOV_max = np.pi / 2 - VFOV[0] * np.pi / 180
    VFOV_min = np.pi / 2 - VFOV[1] * np.pi / 180
    HFOV_max = HFOV[1] * np.pi / 180
    HFOV_min = HFOV[0] * np.pi / 180
    return VFOV_min, VFOV_max, HFOV_min, HFOV_max


def pixel_angles(H, W):
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = angle_bounds()
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    phi = px.reshape(-1) * (HFOV_max - HFOV_min) / W + HFOV_min
    theta = py.reshape(-1) * (VFOV_max - VFOV_min) / H + VFOV_min
    return phi, theta


def blend_weights(alpha):
    """Front-to-back weights w_i = alpha_i * prod_{j<i}(1-alpha_j)."""
    T = jnp.concatenate([jnp.ones_like(alpha[:1]),
                         jnp.cumprod(1 - alpha, axis=0)[:-1]], axis=0)
    return T * alpha


def alpha_blend(alpha, colors):
    """colors: per-gaussian [P, C] constants."""
    w = blend_weights(alpha)
    return jnp.einsum("pk,pc->kc", w, colors), jnp.sum(w, 0)


def surface_splatting(means3D, scales, quats, colors, opacity, viewmat, H, W):
    """2DGS: exact ray-disk intersection per pixel (dense)."""
    T, _ = build_transmat(means3D, scales, quats, viewmat)
    order = jnp.argsort(jnp.linalg.norm(T[:, 2], axis=-1))
    T, colors, opacity = T[order], colors[order], opacity[order]

    phi, theta = pixel_angles(H, W)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)

    # component triples across (u_cam, v_cam, p_cam): Tx = T[:, :, 0] etc.
    Tx = T[:, None, :, 0]
    Ty = T[:, None, :, 1]
    Tz = T[:, None, :, 2]
    k = cp[None, :, None] * Tx - sp[None, :, None] * Tz
    l = (sp[None, :, None] * ct[None, :, None] * Tx
         + st[None, :, None] * Ty
         + cp[None, :, None] * ct[None, :, None] * Tz)
    p = jnp.cross(k, l)
    s = p[..., :2] / jnp.where(p[..., 2:] == 0, 1.0, p[..., 2:])
    dist2 = jnp.sum(s * s, axis=-1)                       # [P, pix]
    sh = jnp.concatenate([s, jnp.ones_like(s[..., :1])], -1)
    depth = (jnp.sum(sh * Tx, -1) * st * sp
             - jnp.sum(sh * Ty, -1) * ct
             + jnp.sum(sh * Tz, -1) * st * cp)
    gauss = jnp.exp(-0.5 * dist2) * (dist2 < 1.0)
    alpha = opacity[:, None] * gauss
    img, _ = alpha_blend(alpha, colors)
    w = blend_weights(alpha)
    dmap = jnp.sum(w * depth, axis=0)        # per-pixel exact ray depth
    return img.reshape(H, W, -1), dmap.reshape(H, W)


def volume_splatting(means3D, scales, quats, colors, opacity, viewmat, H, W):
    """3DGS: full covariance through the panorama Jacobian
    (reference compare_2dgs_3dgs.py:116-148,283-320)."""
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = angle_bounds()
    R = quat_to_rotmat(quats)
    L = R * scales[:, None, :]
    cov3d = L @ L.transpose(0, 2, 1)

    Rw2c = viewmat[:3, :3]
    t = means3D @ Rw2c.T + viewmat[:3, 3]
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
    r_xz = jnp.sqrt(tx * tx + tz * tz)
    r2 = tx * tx + ty * ty + tz * tz
    r_xyz = jnp.sqrt(r2)
    Wpi = W / (HFOV_max - HFOV_min)
    Hrange = H / (VFOV_max - VFOV_min)

    J = jnp.zeros((means3D.shape[0], 2, 3))
    J = J.at[:, 1, 0].set(-Hrange * tx * ty / (r_xz * r2))
    J = J.at[:, 1, 1].set(Hrange * r_xz / r2)
    J = J.at[:, 1, 2].set(-Hrange * ty * tz / (r_xz * r2))
    J = J.at[:, 0, 0].set(Wpi * tz / (r_xz * r_xz))
    J = J.at[:, 0, 2].set(-Wpi * tx / (r_xz * r_xz))

    cov_cam = Rw2c[None] @ cov3d @ Rw2c.T[None]
    cov2d = J @ cov_cam @ J.transpose(0, 2, 1)            # [P, 2, 2]

    phi = jnp.arctan2(tx, tz)
    theta = jnp.arctan2(r_xz, -ty)
    mean2d = jnp.stack([(phi - HFOV_min) * W / (HFOV_max - HFOV_min),
                        (theta - VFOV_min) * H / (VFOV_max - VFOV_min)], -1)
    depth = r_xyz

    order = jnp.argsort(depth)
    cov2d, mean2d, depth = cov2d[order], mean2d[order], depth[order]
    colors, opacity = colors[order], opacity[order]

    conic = jnp.linalg.inv(cov2d)
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], -1)
    d = pix[None] - mean2d[:, None]                       # [P, pix, 2]
    dist2 = (d[..., 0] ** 2 * conic[:, None, 0, 0]
             + d[..., 1] ** 2 * conic[:, None, 1, 1]
             + 2 * d[..., 0] * d[..., 1] * conic[:, None, 0, 1])
    gauss = jnp.exp(-0.5 * dist2) * (dist2 < 1.0)
    alpha = opacity[:, None] * gauss
    img, _ = alpha_blend(alpha, colors)
    w = blend_weights(alpha)
    dmap = jnp.sum(w * depth[:, None], axis=0)   # constant per-splat depth
    return img.reshape(H, W, -1), dmap.reshape(H, W)


def make_scene(num_points=8, seed=2023):
    """Planar grid of disks with a shared random orientation
    (reference compare_2dgs_3dgs.py:357-371)."""
    rng = np.random.default_rng(seed)
    length = 1.5
    xs = np.linspace(-1, 1, num_points) * length
    x, y = np.meshgrid(xs, xs)
    means = np.stack([x, y, np.zeros_like(x)], -1).reshape(-1, 3)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    R = np.asarray(quat_to_rotmat(jnp.asarray(quat[None]))[0])
    means = means @ R.T
    means[:, 2] += 4.0                                   # push in front
    scale = length / (num_points - 1)
    scales = np.full((len(means), 3), scale, np.float32)
    scales[:, 2] = 1e-6
    quats = np.tile(quat, (len(means), 1)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, (len(means), 3)).astype(np.float32)
    opacity = np.ones(len(means), np.float32)
    return (jnp.asarray(means, jnp.float32), jnp.asarray(scales),
            jnp.asarray(quats), jnp.asarray(colors), jnp.asarray(opacity))


def main():
    out_dir = "eval_output/compare_2dgs_3dgs"
    os.makedirs(out_dir, exist_ok=True)
    H, W = 150, 625
    viewmat = jnp.eye(4)

    for case, n in (("case1", 8), ("case2", 2)):
        means, scales, quats, colors, opacity = make_scene(n)
        img1, d1 = surface_splatting(means, scales, quats, colors, opacity,
                                     viewmat, H, W)
        img2, d2 = volume_splatting(means, scales, quats, colors, opacity,
                                    viewmat, H, W)
        grid = make_image_grid([
            np.asarray(img1).transpose(2, 0, 1),
            np.asarray(img2).transpose(2, 0, 1),
            visualize_depth(np.asarray(d1)[None], 1.0, 6.0),
            visualize_depth(np.asarray(d2)[None], 1.0, 6.0)], nrow=2)
        save_image(grid, os.path.join(out_dir, f"{case}.png"))
        print(f"saved {case}.png  (2DGS exact depth vs 3DGS constant depth)")


if __name__ == "__main__":
    main()
