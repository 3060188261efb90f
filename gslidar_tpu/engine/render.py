"""High-level render API: gaussian model + camera -> panorama package.

Reference: gaussian_renderer/__init__.py:16-155 (render). Differences are
jit-shaped, not semantic:

* the camera arrives as arrays (viewmat, campos, timestamp, towards index)
  so one compiled function serves every camera at a given resolution;
* ``time_shift`` is always a scalar; 0.0 reproduces the no-shift path
  exactly (x_SHM(t-0) + v*0 == x_SHM(t));
* the ray-drop prior is sliced inside the traced function with a dynamic
  start index so its gradient flows (reference slices a module parameter,
  scene/raydrop_prior.py:29-37).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.models import gaussians as G
from gslidar_tpu.raster.rasterize import RasterOut, rasterize
from gslidar_tpu.raster.settings import RasterSettings


class RenderPkg(NamedTuple):
    depth: jnp.ndarray          # [1, H, W] (mean or median per args.median_depth)
    depth_mean: jnp.ndarray
    depth_median: jnp.ndarray
    distortion: jnp.ndarray
    depth_square: jnp.ndarray
    alpha: jnp.ndarray
    feature: jnp.ndarray        # [S, H, W] extra channels
    normal: jnp.ndarray         # [3, H, W] normalized
    intensity_sh: jnp.ndarray   # [1, H, W]
    raydrop: jnp.ndarray        # [1, H, W] prior-composed, clamped
    radii: jnp.ndarray          # [P]
    visibility: jnp.ndarray     # [P] bool
    contrib: jnp.ndarray
    num_dropped: jnp.ndarray
    num_pairs: jnp.ndarray
    tile_need: jnp.ndarray      # [] XLA-backend exact tile_list_cap need


def render(params: G.Params, alive: jnp.ndarray, viewmat, campos, timestamp,
           towards_idx, prior_param, bg, sh_degree, scale_factor,
           cfg: G.GaussianConfig, settings: RasterSettings, *,
           dynamic: bool, median_depth: bool = False, time_shift=0.0,
           T_tap=None, use_prior: bool = True,
           full360: bool = False) -> RenderPkg:
    """One panorama render.

    Args:
        towards_idx: 0 = forward, 1 = backward (selects the prior half).
        prior_param: [1, h, 2w] raydrop prior logits (or None).
        time_shift: scalar self-supervision shift (train.py:171-174).
        full360: the render covers the full stitched 360 panorama in one
            pass (settings must be the wrap_x full-width config); the prior
            is re-laid-out to the stitched break order (0, w/2, 3w/2, 2w —
            gaussian_renderer/__init__.py:164) instead of half-sliced, and
            towards_idx is ignored.
    """
    opacity = G.get_opacity(params)[:, 0]
    ts = timestamp - time_shift
    means3D = G.get_xyz_shm(params, ts, cfg)
    means3D = means3D + G.get_inst_velocity(params, cfg) * time_shift
    marginal = G.get_marginal_t(params, ts)[:, 0]
    if dynamic:
        opacity = opacity * marginal

    scales = G.get_scaling(params)
    rotations = params["rotation"]
    shs = G.get_features(params)

    t_scale = jnp.minimum(G.get_scaling_t(params), 2.0)
    v = G.get_inst_velocity(params, cfg)
    features = jnp.concatenate([t_scale, v], axis=1)       # S = 4

    mask = alive & (opacity > 1.0 / 255.0)
    if dynamic:
        mask = mask & (marginal > 0.05)

    out: RasterOut = rasterize(
        means3D, scales, rotations, opacity, shs, features, mask,
        viewmat, campos, bg, sh_degree, scale_factor, settings,
        T_tap=T_tap)

    intensity_sh = out.color[2:3]
    raydrop = out.color[3:4]
    S = features.shape[-1]
    rendered_other = out.feature[:S]
    normal = out.feature[S:S + 3]
    # sqrt(sum+eps) keeps the gradient finite on zero-coverage pixels
    normal = normal / jnp.sqrt(
        jnp.sum(normal * normal, axis=0, keepdims=True) + 1e-16)

    if use_prior and prior_param is not None:
        w = prior_param.shape[-1] // 2
        if full360:
            # stitched layout (breaks 0, w//2, w//2 + w, 2w): back image
            # col j lands at pano col 3w//2 + j for j < w - w//2, else at
            # j - (w - w//2) — so the back half splits at w - w//2 (NOT
            # w//2: for odd w, e.g. KITTI's 515, the two differ and the
            # naive split yields a 2w+1-wide pano)
            front = prior_param[..., :w]
            back = prior_param[..., w:]
            split = w - w // 2
            prior = jax.nn.sigmoid(jnp.concatenate(
                [back[..., split:], front, back[..., :split]], axis=-1))
        else:
            # dynamic half-slice keeps one compiled fn for both directions
            start = towards_idx * w
            prior = jax.lax.dynamic_slice(prior_param, (0, 0, start),
                                          (1, prior_param.shape[1], w))
            prior = jax.nn.sigmoid(prior)
        raydrop = prior + (1.0 - prior) * raydrop

    depth_mean = out.depth[0:1]
    depth_median = out.depth[1:2]
    depth = depth_median if median_depth else depth_mean

    return RenderPkg(
        depth=depth, depth_mean=depth_mean, depth_median=depth_median,
        distortion=out.depth[2:3], depth_square=out.depth[3:4],
        alpha=out.alpha, feature=rendered_other, normal=normal,
        intensity_sh=intensity_sh, raydrop=jnp.clip(raydrop, 0.0, 1.0),
        radii=out.radii, visibility=out.radii > 0, contrib=out.contrib,
        num_dropped=out.num_dropped, num_pairs=out.num_pairs,
        tile_need=out.tile_need)
