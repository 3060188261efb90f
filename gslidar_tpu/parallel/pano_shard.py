"""Multi-chip single-frame rendering: hfov-sliced panorama over a mesh.

The panorama is separable in azimuth: pixels in different φ-columns never
share a compositing order, so a 360° (or any) panorama can be rendered as
N independent angular slices — one per chip — with NO communication except
the final width-axis concatenation that XLA lays out for free via the
output sharding. Each device runs the full preprocess→bin→composite
pipeline on the (replicated) gaussian cloud, frustum-culling to its own
slice; per-device work shrinks ~linearly because cull, binning pairs and
tile count all scale with the slice's angular extent.

There is no reference analog (the CUDA rasterizer is single-GPU,
SURVEY.md §2.3); this is the TPU-native scale-out for inference /
evaluation rendering (the training scale-out is camera-data-parallel,
parallel/shard.py).

Mechanically this uses ONE traced program for all devices: the raster
stack takes dynamic ``angle_bounds`` overrides (traced scalars derived
from ``lax.axis_index``) while the static RasterSettings carry the
per-slice width. Requires ``settings.width % n_devices == 0``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from gslidar_tpu.raster.rasterize import rasterize
from gslidar_tpu.raster.settings import RasterSettings


def render_pano_sharded(means3D, scales, rotations, opacity, shs, features,
                        mask, viewmat, campos, bg, sh_degree, scale_factor,
                        settings: RasterSettings, mesh: Mesh,
                        axis: str = "data"):
    """Render one panorama with its width sharded across ``mesh[axis]``.

    All gaussian arrays are replicated; returns (color, feature, depth,
    alpha, contrib, final_T) with full [*, H, W] shapes (width axis
    sharded across the mesh, transparent to the caller).
    """
    n = mesh.shape[axis]
    W = settings.width
    if W % n != 0:
        raise ValueError(f"width {W} not divisible by mesh axis size {n}")
    sub = dataclasses.replace(settings, width=W // n)
    vmin, vmax, hmin, hmax = settings.angle_bounds
    step = (hmax - hmin) / n

    def slice_fn(means3D, scales, rotations, opacity, shs, features, mask,
                 viewmat, campos, bg):
        d = jax.lax.axis_index(axis).astype(jnp.float32)
        # Render in a camera yawed so this slice is centred at phi=0: keeps
        # the slice's angular window away from the atan2 branch cut at
        # +-pi, so wrap-around splats (which the full render catches via
        # their wrapped AABBs) are still seen by edge slices.
        center = hmin + (d + 0.5) * step
        a = -center                                    # phi' = phi - center
        ca, sa = jnp.cos(a), jnp.sin(a)
        zero = jnp.zeros(())
        one = jnp.ones(())
        R = jnp.stack([jnp.stack([ca, zero, sa]),
                       jnp.stack([zero, one, zero]),
                       jnp.stack([-sa, zero, ca])])
        vm = viewmat.at[:3, :].set(R @ viewmat[:3, :])
        bounds = (jnp.asarray(vmin, jnp.float32),
                  jnp.asarray(vmax, jnp.float32),
                  -0.5 * step * jnp.ones(()), 0.5 * step * jnp.ones(()))
        cull = (bounds[0], bounds[1], hmin - center, hmax - center)
        out = rasterize(means3D, scales, rotations, opacity, shs, features,
                        mask, vm, campos, bg, sh_degree, scale_factor,
                        settings=sub, angle_bounds=bounds, cull_bounds=cull)
        # normals were rendered in the yawed camera frame; rotate the last
        # 3 feature channels back to the caller's camera frame
        feat = out.feature
        n = jnp.einsum("ij,ihw->jhw", R, feat[-3:])
        feat = jnp.concatenate([feat[:-3], n], axis=0)
        return (out.color, feat, out.depth, out.alpha, out.contrib,
                out.final_T)

    rep = P()
    img = P(None, None, axis)     # [C, H, W] sharded on width
    # check_vma=False: the compositor's scan carries start replicated and
    # become device-varying through the axis_index-derived bounds; the
    # varying-axis checker would demand explicit pcasts inside the shared
    # raster code for no runtime benefit.
    fn = shard_map(slice_fn, mesh=mesh,
                   in_specs=(rep,) * 10,
                   out_specs=(img,) * 6,
                   check_vma=False)
    return fn(means3D, scales, rotations, opacity, shs, features, mask,
              viewmat, campos, bg)


def render_pano_sharded_jit(settings: RasterSettings, mesh: Mesh,
                            sh_degree: int, scale_factor: float,
                            axis: str = "data"):
    """jit-wrapped closure of render_pano_sharded over static settings."""
    @jax.jit
    def run(means3D, scales, rotations, opacity, shs, features, mask,
            viewmat, campos, bg):
        return render_pano_sharded(means3D, scales, rotations, opacity, shs,
                                   features, mask, viewmat, campos, bg,
                                   sh_degree, scale_factor, settings, mesh,
                                   axis)
    return run
