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


def render_pano_gaussian_sharded(means3D, scales, rotations, opacity, shs,
                                 features, mask, viewmat, campos, bg,
                                 sh_degree, scale_factor,
                                 settings: RasterSettings, mesh: Mesh,
                                 axis: str = "data",
                                 edge_cap: int | None = None):
    """Fully gaussian-sharded panorama render with an instance exchange.

    SURVEY §2.3 item (2) completed (round-2 verdict item 4): EVERY
    per-gaussian stage — projection/transmat/AABB geometry preprocess, SH
    evaluation, payload packing — runs on a P/n shard per device (the
    hfov-sliced `render_pano_sharded` replicates the O(P) geometry work
    on every chip). Pipeline per device:

    1. full-view wrap-aware ``preprocess`` + ``pack_payload`` on the local
       P/n gaussians, in the shared FRONT camera frame (the atan2 branch
       cut only affects preprocess, whose wrap path already handles it —
       so slices need no per-device yaw and the compositing kernels run
       with per-slice ``angle_bounds`` offsets of one global frame);
    2. route compact instance records {payload, column run, row range} to
       the devices owning the overlapped panorama slices: a dense
       ``all_to_all`` over ICI with a STATIC per-edge capacity
       ``edge_cap`` and an exact psum'd drop counter (the TPU-native
       ragged all-to-all: ragged payloads ride a rectangular buffer,
       overflow is counted, never silent). Wrap-crossing column runs are
       split into <=2 linear runs before routing so every routed record
       covers one contiguous local column range;
    3. each device bins + composites ONLY its slice: ``bin_gaussians``
       over the received records (their payload rows ride as
       ``data_rows``) and ``composite_rows`` with slice angle_bounds. The
       2D low-pass pixel distance still wraps at the GLOBAL width via
       ``settings.wrap_period``.

    Requires ``settings.wrap_x`` (full-360 panorama), ``width %
    (n * tile_w) == 0`` (slices own whole tile columns) and ``P % n == 0``.

    Returns (color, feature, depth, alpha, contrib, final_T, num_dropped)
    with image width sharded over the mesh and ``num_dropped`` counting
    exchange-cap plus pair-cap plus tile-list losses, all in (gaussian,
    tile) INSTANCES (0 in a sound run).
    """
    from gslidar_tpu.raster.binning import bin_gaussians
    from gslidar_tpu.raster.composite import (composite_rows,
                                              tile_list_overflow)
    from gslidar_tpu.raster.pallas_fwd import PAYLOAD_BASE, pack_payload
    from gslidar_tpu.raster.preprocess import preprocess

    n = mesh.shape[axis]
    W = settings.width
    tw = settings.tile_w
    if not settings.wrap_x:
        raise ValueError("gaussian-sharded render needs a circular pano "
                         "(settings.wrap_x)")
    if W % (n * tw) != 0:
        raise ValueError(f"width {W} not divisible by {n} slices of whole "
                         f"{tw}-pixel tile columns")
    P_total = means3D.shape[0]
    if P_total % n != 0:
        raise ValueError(f"P {P_total} not divisible by mesh axis size {n}")
    gx = settings.tiles_x
    gxl = gx // n                     # tile columns per slice
    Wl = W // n
    if edge_cap is None:
        edge_cap = max(settings.pair_cap // (2 * n), 1024)
    # the local slice grid is NOT circular; the dxp low-pass distance
    # still wraps at the global width. Pinning the global sort depth
    # bucket edges keeps per-slice compositing order equal to the
    # unsliced render's across depth buckets; WITHIN a bucket the order
    # is gaussian-stable except for wrap-split records (a seam-crossing
    # splat's second arc enqueues after run-1 records), so same-bucket
    # blend swaps there are bounded exactly like the documented
    # depth_bits quantization ambiguity.
    sub = dataclasses.replace(settings, width=Wl, wrap_x=False,
                              wrap_period=float(W),
                              sort_depth_bits=settings.depth_bits,
                              pair_cap=-(-settings.pair_cap // n // 128)
                              * 128)
    vmin, vmax, hmin, hmax = settings.angle_bounds
    step = (hmax - hmin) / n
    S = features.shape[-1] if features is not None else 0
    C = bg.shape[-1]
    R = PAYLOAD_BASE + C + S          # payload row width (pack_payload)
    sf = scale_factor

    def body(means3D, scales, rotations, opacity, shs, features, mask,
             viewmat, campos, bg):
        d = jax.lax.axis_index(axis)
        # ---- 1. local preprocess + payload (P/n rows, full view) --------
        prep = preprocess(means3D, scales, rotations, opacity, shs, mask,
                          viewmat, campos, sh_degree, sf, settings)
        payload = pack_payload(prep, opacity, features)        # [Pl, R]
        live = prep.tiles_touched > 0
        lo = prep.rect_min[:, 0]                 # modular column run start
        hi = prep.rect_max[:, 0]                 # lo + wt (may exceed gx)
        y0 = prep.rect_min[:, 1]
        y1 = prep.rect_max[:, 1]
        # split the modular run into <= 2 linear runs in [0, gx)
        runs = ((lo, jnp.minimum(hi, gx)),
                (jnp.zeros_like(lo), jnp.maximum(hi - gx, 0)))

        # ---- 2. route records to slice owners ---------------------------
        # the record matrix only varies per RUN (the stored valid flag is
        # constantly 1.0 for rows the scatter actually keeps), so build it
        # once per run, not once per (run, slice)
        ones = jnp.ones((payload.shape[0], 1), jnp.float32)
        # sideband: the sort depth rides the record (the slim payload
        # carries no center-range column; compositors recompute it)
        recs = [jnp.concatenate(
                    [payload, prep.depth[:, None],
                     y0[:, None].astype(jnp.float32),
                     y1[:, None].astype(jnp.float32),
                     rlo[:, None].astype(jnp.float32),
                     rhi[:, None].astype(jnp.float32), ones], axis=1)
                for rlo, rhi in runs]             # per-run [Pl, R + 6]
        rows_y = (y1 - y0).astype(jnp.int32)
        send = []
        n_dropped = jnp.zeros((), jnp.int32)
        for s in range(n):
            w0c, w1c = s * gxl, (s + 1) * gxl
            base = jnp.zeros((), jnp.int32)
            buf = jnp.zeros((edge_cap, R + 6), jnp.float32)
            for (rlo, rhi), rec in zip(runs, recs):
                m = live & (rhi > rlo) & (rlo < w1c) & (rhi > w0c)
                rank = jnp.cumsum(m.astype(jnp.int32)) - 1 + base
                pos = jnp.where(m, rank, edge_cap)
                buf = buf.at[pos].set(jnp.where(m[:, None], rec, 0.0),
                                      mode="drop")
                # overflowed records count the INSTANCES they would have
                # composited on this slice, so num_dropped shares units
                # with the pair-cap / tile-list drop counters
                lost = m & (pos >= edge_cap)
                inst = ((jnp.minimum(rhi, w1c) - jnp.maximum(rlo, w0c))
                        * rows_y)
                n_dropped = n_dropped + jnp.sum(jnp.where(lost, inst, 0))
                base = base + jnp.sum(m.astype(jnp.int32))
            send.append(buf)
        send = jnp.concatenate(send, axis=0)     # [n * edge_cap, R + 6]
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=True)    # [n * edge_cap, R + 6]

        # ---- 3. local binning + compositing on the received records -----
        pay_r = recv[:, :R]
        depth_r = recv[:, R]
        ry0 = recv[:, R + 1].astype(jnp.int32)
        ry1 = recv[:, R + 2].astype(jnp.int32)
        rlo = recv[:, R + 3].astype(jnp.int32)
        rhi = recv[:, R + 4].astype(jnp.int32)
        rvalid = recv[:, R + 5] > 0.5
        w0c = d * gxl
        lo_l = jnp.clip(rlo - w0c, 0, gxl)
        hi_l = jnp.clip(rhi - w0c, 0, gxl)
        tt = jnp.where(rvalid, (hi_l - lo_l) * (ry1 - ry0), 0)
        # no center-x shift is needed: composite_rows recomputes the
        # center pixel from p_cam under the SLICE angle_bounds, which
        # yields slice-local x directly (cx_local = cx_global - d*Wl)
        binning = bin_gaussians(
            jnp.stack([lo_l, ry0], -1), jnp.stack([hi_l, ry1], -1),
            depth_r, tt.astype(jnp.int32), sf, sub, payload=pay_r)
        bounds = (jnp.asarray(vmin, jnp.float32),
                  jnp.asarray(vmax, jnp.float32),
                  hmin + d.astype(jnp.float32) * step,
                  hmin + (d.astype(jnp.float32) + 1.0) * step)
        tiles = composite_rows(binning.data_rows, binning.tile_starts,
                               C, S, bg, sf, sub, angle_bounds=bounds)
        n_dropped = (jax.lax.psum(n_dropped, axis)
                     + jax.lax.psum(binning.num_dropped
                                    + tile_list_overflow(binning, sub),
                                    axis))
        return (tiles.color, tiles.feature, tiles.depth, tiles.alpha,
                tiles.contrib, tiles.final_T, n_dropped)

    gshard = P(axis)
    rep = P()
    img = P(None, None, axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(gshard, gshard, gshard, gshard, gshard, gshard, gshard,
                  rep, rep, rep),
        out_specs=(img, img, img, img, img, img, rep),
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
