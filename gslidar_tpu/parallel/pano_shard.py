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
                        axis: str = "data", colors_precomp=None):
    """Render one panorama with its width sharded across ``mesh[axis]``.

    All gaussian arrays are replicated; returns (color, feature, depth,
    alpha, contrib, final_T) with full [*, H, W] shapes (width axis
    sharded across the mesh, transparent to the caller). With
    ``colors_precomp`` [P, C] the SH stage is skipped (shs may be None —
    see render_pano_sh_sharded).
    """
    n = mesh.shape[axis]
    W = settings.width
    if W % n != 0:
        raise ValueError(f"width {W} not divisible by mesh axis size {n}")
    sub = dataclasses.replace(settings, width=W // n)
    vmin, vmax, hmin, hmax = settings.angle_bounds
    step = (hmax - hmin) / n
    use_colors = colors_precomp is not None
    sh_or_col = colors_precomp if use_colors else shs

    def slice_fn(means3D, scales, rotations, opacity, sh_or_col, features,
                 mask, viewmat, campos, bg):
        shs_, colors_ = ((None, sh_or_col) if use_colors
                         else (sh_or_col, None))
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
        out = rasterize(means3D, scales, rotations, opacity, shs_, features,
                        mask, vm, campos, bg, sh_degree, scale_factor,
                        settings=sub, angle_bounds=bounds, cull_bounds=cull,
                        colors_precomp=colors_)
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
    return fn(means3D, scales, rotations, opacity, sh_or_col, features,
              mask, viewmat, campos, bg)


def render_pano_sh_sharded(means3D, scales, rotations, opacity, shs,
                           features, mask, viewmat, campos, bg, sh_degree,
                           scale_factor, settings: RasterSettings,
                           mesh: Mesh, axis: str = "data"):
    """hfov-sliced render with the SH color stage GAUSSIAN-SHARDED.

    SURVEY §2.3 item (2): the per-gaussian preprocess is sharded over the
    P axis where it pays — the [P, 16, C] SH coefficient table is the
    dominant per-gaussian array (~256 B/gaussian; 2.5 GB at an OPV2V-scale
    10M points) and its evaluation the dominant per-gaussian FLOPs. The
    table arrives SHARDED over ``mesh[axis]`` and never materializes
    replicated: each device evaluates view colors for its P/n shard (the
    view direction depends only on the shared camera POSITION, not on the
    per-slice yaw, so one evaluation serves every slice), ONE small
    all_gather moves [P, C] colors (16 B/gaussian) over ICI, and the
    geometry preprocess + binning + compositing run per hfov slice as in
    render_pano_sharded.

    Args are as render_pano_sharded except ``shs`` must be sharded
    [P, K, C] with P divisible by the mesh axis size.
    """
    from gslidar_tpu.ops.sh import eval_sh

    n = mesh.shape[axis]
    P_total = means3D.shape[0]
    if P_total % n != 0:
        raise ValueError(f"P {P_total} not divisible by mesh axis size {n}")
    shard = P_total // n

    def colors_fn(means3D, campos, shs_local):
        d = jax.lax.axis_index(axis)
        local_means = jax.lax.dynamic_slice_in_dim(means3D, d * shard,
                                                   shard, 0)
        dirs = local_means - campos[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True)
                               + 1e-24)
        col, _ = eval_sh(sh_degree, shs_local, dirs)
        # gather the small color table over ICI; shs stays sharded
        return jax.lax.all_gather(col, axis, tiled=True)

    colors = shard_map(colors_fn, mesh=mesh,
                       in_specs=(P(), P(), P(axis)),
                       out_specs=P(),
                       check_vma=False)(means3D, campos, shs)
    return render_pano_sharded(means3D, scales, rotations, opacity, None,
                               features, mask, viewmat, campos, bg,
                               sh_degree, scale_factor, settings, mesh,
                               axis, colors_precomp=colors)


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
