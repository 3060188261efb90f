"""Top-level differentiable panoramic rasterizer.

Pipeline: preprocess -> bin -> composite, the TPU equivalent of
CudaRasterizer::Rasterizer::forward (rasterizer_impl.cu:212-385). The whole
thing is ordinary traced JAX, so jax.grad provides the backward pass
(replacing rasterizer_impl.cu:389-514 + backward.cu) deterministically.

Gradient taps: pass ``T_tap`` (zeros [P, 3, 3]) to receive dL/dT for the
densification statistics — the reference exposes the same information via
the retained screenspace_points gradient
(gaussian_renderer/__init__.py:25-29, backward.cu:684-711); see
``densify_grads_from_T_tap`` for the exact phi/theta-space conversion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gslidar_tpu.raster.binning import bin_gaussians
from gslidar_tpu.raster.composite import composite
from gslidar_tpu.raster.preprocess import preprocess
from gslidar_tpu.raster.settings import RasterSettings


class RasterOut(NamedTuple):
    color: jnp.ndarray        # [C, H, W]
    feature: jnp.ndarray      # [S+3, H, W]
    depth: jnp.ndarray        # [4, H, W]
    alpha: jnp.ndarray        # [1, H, W]
    contrib: jnp.ndarray      # [2, H, W]
    final_T: jnp.ndarray      # [1, H, W]
    radii: jnp.ndarray        # [P]
    num_pairs: jnp.ndarray    # [] instances before the cap
    num_dropped: jnp.ndarray  # [] instances dropped by the cap
    tile_need: jnp.ndarray    # [] largest per-tile instance count (the
                              # exact tile_list_cap that clips nothing);
                              # 0 on the cap-free pallas backend


def rasterize(means3D, scales, rotations, opacity, shs, features, mask,
              viewmat, campos, bg, sh_degree, scale_factor,
              settings: RasterSettings, scale_modifier=1.0,
              colors_precomp=None, T_tap=None,
              angle_bounds=None, cull_bounds=None) -> RasterOut:
    """Render one panorama.

    Args:
        means3D: [P, 3]; scales: [P, >=2] activated; rotations: [P, 4] raw
            quats; opacity: [P] activated (optionally * marginal_t);
        shs: [P, K, C] SH coefficients (or None with colors_precomp [P, C]);
        features: [P, S] extra channels; mask: [P] bool prefilter;
        viewmat: [4, 4] world->camera row-major; campos: [3] world camera
            center; bg: [C]; sh_degree: dynamic scalar; scale_factor: scalar.
    """
    prep = preprocess(means3D, scales, rotations, opacity, shs, mask,
                      viewmat, campos, sh_degree, scale_factor, settings,
                      scale_modifier, colors_precomp, angle_bounds,
                      cull_bounds)
    if T_tap is not None:
        prep = prep._replace(T=prep.T + T_tap)
        # Re-derive the compositors' center pixel/range THROUGH the tapped
        # frame: with a zero tap the values are bitwise-identical to
        # preprocess's own (same expression on the same inputs), but the
        # rho2d low-pass branch's pixel gradient and the 2d-branch
        # center-range gradient now chain into dL/dT — the reference does
        # exactly this before reading the densification gradient off dL_dT
        # (backward.cu:578-595,505-508,684-711). Without it the T-tap
        # densify stats silently miss every 2d-branch contribution.
        from gslidar_tpu.raster.preprocess import center_projection
        bounds = (angle_bounds if angle_bounds is not None
                  else settings.angle_bounds)
        xy, r_center = center_projection(prep.T, bounds, settings)
        prep = prep._replace(xy=xy, depth=r_center)

    if features is None or features.shape[-1] == 0:
        features = jnp.zeros((means3D.shape[0], 0), means3D.dtype)

    if settings.backend == "pallas":
        from gslidar_tpu.raster.pallas_op import rasterize_pallas
        tiles, num_pairs, num_dropped = rasterize_pallas(
            prep, features, opacity, bg, scale_factor, settings,
            angle_bounds)
        tile_need = jnp.zeros((), jnp.int32)
    else:
        binning = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                                prep.tiles_touched, scale_factor, settings)
        tiles = composite(binning, prep, features, opacity, bg, scale_factor,
                          settings, angle_bounds)
        # surface the XLA path's per-tile list cap as dropped instances
        # (the pallas path is cap-free; the CUDA reference has no cap)
        from gslidar_tpu.raster.composite import (tile_list_need,
                                                  tile_list_overflow)
        num_pairs = binning.num_pairs
        num_dropped = binning.num_dropped + tile_list_overflow(binning,
                                                               settings)
        tile_need = tile_list_need(binning)
    return RasterOut(
        color=tiles.color, feature=tiles.feature, depth=tiles.depth,
        alpha=tiles.alpha, contrib=tiles.contrib, final_T=tiles.final_T,
        radii=prep.radius, num_pairs=num_pairs,
        num_dropped=num_dropped, tile_need=tile_need)


def densify_grads_from_T_tap(dL_dT, T, settings: RasterSettings):
    """Convert dL/dT into the reference's phi/theta-space viewspace gradient
    used for densification stats (backward.cu:684-711).

    Args:
        dL_dT: [P, 3, 3] gradient wrt the splat frame (rows u_cam/v_cam/p_cam).
        T: [P, 3, 3] the frame itself.
    Returns:
        [P, 2] gradient whose norm feeds xyz_gradient_accum
        (scene/gaussian_model.py:608-614).
    """
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = settings.angle_bounds
    u, v, w = T[:, 2, 0], T[:, 2, 1], T[:, 2, 2]          # p_cam
    dL_du = dL_dT[:, 2, 0]
    dL_dv = dL_dT[:, 2, 1]
    dL_dw = dL_dT[:, 2, 2]
    phi = jnp.arctan2(u, w)
    # du/dphi = w, dw/dphi = -u
    gx = (dL_du * w - dL_dw * u) * 0.5 * (HFOV_max - HFOV_min)
    r_uw = jnp.sqrt(u * u + w * w)
    gy = ((dL_du * (-v * jnp.sin(phi)) + dL_dv * r_uw
           + dL_dw * (-v * jnp.cos(phi)))
          * 0.5 * (VFOV_max - VFOV_min) * settings.width / settings.height)
    return jnp.stack([gx, gy], axis=-1)
