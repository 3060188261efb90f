"""Per-tile front-to-back compositing as a parallel prefix scan.

TPU-native reformulation of the sequential alpha-blending loop in the CUDA
render kernel (cuda_rasterizer/forward.cu:292-505): instead of walking each
tile's sorted instance list one gaussian at a time, a chunk of instances is
evaluated against all tile pixels at once, transmittance inside the chunk is
an (exclusive) cumprod along the instance axis, and channel accumulation is
a batched [chunk, pix]^T x [chunk, C] matmul that lands on the MXU. The
chunk loop is a lax.scan with a rematerialized body, so reverse-mode
autodiff reproduces the hand-derived CUDA backward (backward.cu:137-515)
exactly for this forward — deterministically and without atomics.

Semantic deviation from CUDA (documented): the reference hard-stops a pixel
once test_T < 1e-4 and freezes T; here contributions are masked by
(T_before * (1 - alpha) >= 1e-4) but T keeps decaying. Differences are
bounded by the 1e-4 transmittance floor.

Parity detail: the S extra feature channels are blended with
stop_gradient(w) so they do not backprop into alpha/geometry — the CUDA
backward deliberately skips their dL_dalpha term (backward.cu:393-400).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.raster.binning import Binning
from gslidar_tpu.raster.preprocess import PreprocessOut
from gslidar_tpu.raster.settings import (ALPHA_EPS, FAR_N, FILTER_INV_SQUARE,
                                         MAX_ALPHA, NEAR_N, RasterSettings,
                                         T_STOP)


class TileImages(NamedTuple):
    color: jnp.ndarray        # [C, H, W]   (includes T_final * bg)
    feature: jnp.ndarray      # [S + 3, H, W]
    depth: jnp.ndarray        # [4, H, W]   mean / median / distortion / D^2
    alpha: jnp.ndarray        # [1, H, W]   1 - T_final
    contrib: jnp.ndarray      # [2, H, W]   n_contrib / median_contributor
    final_T: jnp.ndarray      # [1, H, W]


def _tile_pixel_grids(settings: RasterSettings, angle_bounds=None):
    """Per-tile flattened pixel coordinates and ray trig, [n_tiles, pix]."""
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = (
        angle_bounds if angle_bounds is not None else settings.angle_bounds)
    H, W = settings.height, settings.width
    ty = jnp.arange(settings.tiles_y)
    tx = jnp.arange(settings.tiles_x)
    ii = jnp.arange(settings.tile_h)
    jj = jnp.arange(settings.tile_w)
    # global pixel coords per (tile_y, tile_x, i, j)
    py = (ty[:, None, None, None] * settings.tile_h + ii[None, None, :, None])
    px = (tx[None, :, None, None] * settings.tile_w + jj[None, None, None, :])
    py = jnp.broadcast_to(py, (settings.tiles_y, settings.tiles_x,
                               settings.tile_h, settings.tile_w))
    px = jnp.broadcast_to(px, py.shape)
    py = py.reshape(settings.num_tiles, settings.tile_pixels).astype(jnp.float32)
    px = px.reshape(settings.num_tiles, settings.tile_pixels).astype(jnp.float32)
    phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
    theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
    inside = (px < W) & (py < H)
    return px, py, jnp.sin(phi), jnp.cos(phi), jnp.sin(theta), jnp.cos(theta), inside


def _untile(img_tp: jnp.ndarray, settings: RasterSettings) -> jnp.ndarray:
    """[n_tiles, C, pix] -> [C, H, W] (cropping tile padding)."""
    C = img_tp.shape[1]
    x = img_tp.reshape(settings.tiles_y, settings.tiles_x, C,
                       settings.tile_h, settings.tile_w)
    x = x.transpose(2, 0, 3, 1, 4).reshape(
        C, settings.tiles_y * settings.tile_h,
        settings.tiles_x * settings.tile_w)
    return x[:, :settings.height, :settings.width]


def tile_list_overflow(binning: Binning, settings: RasterSettings):
    """Instances the XLA scan compositor actually clipped per tile (the
    CUDA kernel has no such cap, rasterizer_impl.cu:308-354), so any
    positive value here means the render silently clipped. Callers fold
    this into ``num_dropped``. The scan processes whole ``tile_chunk``
    blocks, so the EFFECTIVE cap is tile_list_cap rounded up to the
    chunk — counting against the raw cap would report drops for
    instances that were fully composited."""
    chunk = settings.tile_chunk
    eff_cap = -(-settings.tile_list_cap // chunk) * chunk
    counts = binning.tile_starts[1:] - binning.tile_starts[:-1]
    return jnp.sum(jnp.maximum(counts - eff_cap, 0))


def tile_list_need(binning: Binning) -> jnp.ndarray:
    """Largest per-tile instance count — the exact ``tile_list_cap`` that
    would clip nothing on this (pair-cap-clipped) stream. The training
    loop sizes the cap from this in one step; summed drops would
    overshoot by up to the number of overflowing tiles."""
    return jnp.max(binning.tile_starts[1:] - binning.tile_starts[:-1])


def composite(binning: Binning, prep: PreprocessOut, features: jnp.ndarray,
              opacity: jnp.ndarray, bg: jnp.ndarray, scale_factor,
              settings: RasterSettings, angle_bounds=None) -> TileImages:
    """Blend sorted tile instance lists into panorama images.

    Args:
        features: [P, S] extra channels blended with detached weights.
        opacity: [P] activated opacity (possibly * marginal_t).
        bg: [C] background color, weighted by final transmittance.
    """
    C = prep.color.shape[-1]

    # Pre-gather all per-instance data into sorted order ONCE — the scan
    # body then reads contiguous 64-row runs instead of doing a random
    # [tiles, chunk] gather per chunk (random gathers are ~18ms/2M on v5e).
    # The row layout is pack_payload's (single definition — composite_rows
    # decodes it by the pallas kernels' _F_* column indices).
    from gslidar_tpu.raster.pallas_fwd import pack_payload
    packed = pack_payload(prep, opacity, features)            # [P, 10+C+S]
    sorted_data = packed[binning.gid_sorted]                  # [K, D]
    return composite_rows(sorted_data, binning.tile_starts, C,
                          features.shape[-1], bg, scale_factor, settings,
                          angle_bounds)


def composite_rows(sorted_data: jnp.ndarray, tile_starts_full: jnp.ndarray,
                   C: int, S: int, bg: jnp.ndarray, scale_factor,
                   settings: RasterSettings, angle_bounds=None) -> TileImages:
    """Blend instance rows already in tile-depth order.

    ``sorted_data`` is [K, 10 + C + S] in the pack_payload layout (9 T
    column-triples, opacity, C colors, S features — the center
    pixel/range and the camera-facing normal are recomputed per instance
    from the T columns, so they cost no gather/exchange width);
    ``tile_starts_full`` is the [num_tiles + 1] range table. Used directly
    by the gaussian-sharded renderer whose instances arrive pre-routed
    (parallel/pano_shard.py) — `composite` packs and delegates here."""
    n_tiles = settings.num_tiles
    pix = settings.tile_pixels
    chunk = settings.tile_chunk
    n_chunks = (settings.tile_list_cap + chunk - 1) // chunk
    K = sorted_data.shape[0]

    px, py, sphi, cphi, stheta, ctheta, _inside = _tile_pixel_grids(
        settings, angle_bounds)
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = (
        angle_bounds if angle_bounds is not None else settings.angle_bounds)
    near = NEAR_N * scale_factor
    far = FAR_N * scale_factor

    tile_starts = tile_starts_full[:-1]
    tile_ends = tile_starts_full[1:]
    carange = jnp.arange(chunk, dtype=jnp.int32)

    def chunk_body(carry, c):
        (T_run, C_acc, F_acc, D_acc, D2_acc, dist_acc, M1, M2,
         med_depth, med_pos, n_contrib) = carry

        pos = tile_starts[:, None] + c * chunk + carange[None, :]  # [t, ch]
        in_range = pos < tile_ends[:, None]
        pos_c = jnp.clip(pos, 0, K - 1)
        data = sorted_data[pos_c]                                  # [t, ch, D]

        Tux, Tuy, Tuz = data[..., 0], data[..., 1], data[..., 2]
        Tvx, Tvy, Tvz = data[..., 3], data[..., 4], data[..., 5]
        Twx, Twy, Twz = data[..., 6], data[..., 7], data[..., 8]
        opa = data[..., 9]
        col = data[..., 10:10 + C]                                 # [t, ch, C]
        fea = data[..., 10 + C:10 + C + S]                         # [t, ch, S]
        # camera-facing normal recomputed as flip-signed
        # normalize(u_cam x v_cam) — same function of (quat, scales) as
        # build_transmat's Rw2c R[:,2] route, so autodiff model gradients
        # agree (the reference's separate dL_dnormal route,
        # backward.cu:600-608, composes to the same total)
        c1 = Tvx * Twy - Twx * Tvy
        c2 = Twx * Tuy - Tux * Twy
        c3 = Tux * Tvy - Tvx * Tuy
        nsign = jnp.where(c1 * Tuz + c2 * Tvz + c3 * Twz < 0, 1.0, -1.0)
        n_si = nsign * jax.lax.rsqrt(c1 * c1 + c2 * c2 + c3 * c3 + 1e-30)
        nrm = jnp.stack([c1 * n_si, c2 * n_si, c3 * n_si], axis=-1)
        # center pixel/range recomputed from p_cam = (Tuz, Tvz, Twz) with
        # preprocess.center_projection's guarded formulas (identical
        # values; the payload carries no xy/depth columns). Gradients
        # chain into the T columns through the spherical Jacobian exactly
        # as the reference folds dL_dmean2D into dL_dT
        # (backward.cu:578-595,505-508). Under slice angle_bounds the
        # same expression directly yields slice-LOCAL pixel x.
        degen = (Tuz * Tuz + Twz * Twz) < 1e-20
        u_s = jnp.where(degen, 0.0, Tuz)
        w_s = jnp.where(degen, 1.0, Twz)
        phi_c = jnp.arctan2(u_s, w_s)
        theta_c = jnp.arctan2(jnp.sqrt(u_s * u_s + w_s * w_s), -Tvz)
        r_center = jnp.sqrt(Tuz * Tuz + Tvz * Tvz + Twz * Twz + 1e-24)
        cx = (phi_c - HFOV_min) * settings.width / (HFOV_max - HFOV_min)
        cy = (theta_c - VFOV_min) * settings.height / (VFOV_max - VFOV_min)

        # expand per-pixel: a = [t, ch, 1], b = [t, 1, pix]
        def bc(a):
            return a[:, :, None]
        cp, sp = cphi[:, None, :], sphi[:, None, :]
        ct, st = ctheta[:, None, :], stheta[:, None, :]

        # ray-splat intersection via two homogeneous planes
        # (forward.cu:404-424, 2DGS Eq. 8 adapted to spherical rays).
        # p = cross(k, l) with k = cp*Tu - sp*Tw and
        # l = sp*ct*Tu + st*Tv + cp*ct*Tw expands exactly (cp^2 + sp^2
        # collapses) to p = st*cp*(Tu x Tv) + ct*(Tu x Tw)
        # - st*sp*(Tw x Tv): the crosses are per-instance, off the pixel
        # axis (same hoist as pallas_fwd.py).
        Ax = Tuy * Tvz - Tuz * Tvy
        Ay = Tuz * Tvx - Tux * Tvz
        Az = Tux * Tvy - Tuy * Tvx
        Bx = Tuy * Twz - Tuz * Twy
        By = Tuz * Twx - Tux * Twz
        Bz = Tux * Twy - Tuy * Twx
        Gx = Twy * Tvz - Twz * Tvy
        Gy = Twz * Tvx - Twx * Tvz
        Gz = Twx * Tvy - Twy * Tvx
        ca = st * cp
        cg = -(st * sp)
        p1 = ca * bc(Ax) + ct * bc(Bx) + cg * bc(Gx)
        p2 = ca * bc(Ay) + ct * bc(By) + cg * bc(Gy)
        p3 = ca * bc(Az) + ct * bc(Bz) + cg * bc(Gz)
        p3_ok = p3 != 0.0
        # degenerate-lane guard: for |p3| near the bottom of the f32
        # range the division overflows to +-inf AND its autodiff VJP
        # (-ct * p1 / p3^2) hits a 0/0 = NaN when p3^2 underflows —
        # with ct = 0, so the NaN appears on lanes every select already
        # masks and poisons the gradient segment-sums anyway. Route such
        # lanes through a safe denominator and force s to 1e18 (rho3d =
        # 2e36, past any acceptance — same reject decision as the raw
        # inf/NaN, and the same 2d-branch fallback the pallas kernel
        # takes). A splat this degenerate needs |p1|,|p2| <= 4.5e-15 to
        # have been accepted before, which no physical scene produces.
        # CUDA is immune by control flow (backward.cu:431-493 runs only
        # on the rho3d <= rho2d branch).
        degen3 = jnp.abs(p3) <= 1e-15
        p3_safe = jnp.where(degen3, 1.0, p3)
        s1 = jnp.where(degen3, 1e18, p1 / p3_safe)
        s2 = jnp.where(degen3, 1e18, p2 / p3_safe)
        rho3d = s1 * s1 + s2 * s2

        dxp = bc(cx) - px[:, None, :]
        if settings.dxp_wrap_period:
            # circular pano: pixel distance wraps at the phi = +-pi seam
            Wf = settings.dxp_wrap_period
            dxp = dxp - Wf * jnp.round(dxp * (1.0 / Wf))
        dyp = bc(cy) - py[:, None, :]
        rho2d = FILTER_INV_SQUARE * (dxp * dxp + dyp * dyp)
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)

        sTu = s1 * bc(Tux) + s2 * bc(Tuy) + bc(Tuz)
        sTv = s1 * bc(Tvx) + s2 * bc(Tvy) + bc(Tvz)
        sTw = s1 * bc(Twx) + s2 * bc(Twy) + bc(Twz)
        depth3d = sTu * st * sp - sTv * ct + sTw * st * cp
        depth = jnp.where(use3d, depth3d, bc(r_center))

        alpha = jnp.minimum(MAX_ALPHA, bc(opa) * jnp.exp(-0.5 * rho))
        ok = (in_range[:, :, None] & p3_ok & (depth >= near) & (depth <= far)
              & (alpha >= ALPHA_EPS))
        a = jnp.where(ok, alpha, 0.0)
        depth_safe = jnp.where(ok, depth, far)

        one_m = 1.0 - a
        cprod = jnp.cumprod(one_m, axis=1)                         # inclusive
        T_before = T_run[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cprod[:, :1]), cprod[:, :-1]], axis=1)
        test_T = T_before * one_m
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_before, 0.0)

        # channel accumulation on the MXU
        C_acc = C_acc + jnp.einsum("tkp,tkc->tcp", w, col,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        w_sg = jax.lax.stop_gradient(w)
        F_acc = F_acc + jnp.concatenate([
            jnp.einsum("tkp,tks->tsp", w_sg, fea,
                       preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST),
            jnp.einsum("tkp,tkn->tnp", w, nrm,
                       preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)], axis=1)
        D_acc = D_acc + jnp.sum(depth_safe * w, axis=1)
        D2_acc = D2_acc + jnp.sum(depth_safe * depth_safe * w, axis=1)

        # distortion (2DGS appendix; forward.cu:450-456)
        m = far / (far - near) * (1.0 - near / depth_safe)
        mw = m * w
        m2w = m * m * w
        M1_before = M1[:, None, :] + jnp.cumsum(mw, axis=1) - mw
        M2_before = M2[:, None, :] + jnp.cumsum(m2w, axis=1) - m2w
        A_before = 1.0 - T_before
        dist_acc = dist_acc + jnp.sum(
            (m * m * A_before + M2_before - 2.0 * m * M1_before) * w, axis=1)
        M1 = M1 + jnp.sum(mw, axis=1)
        M2 = M2 + jnp.sum(m2w, axis=1)

        # median depth: last accepted contribution with T_before > 0.5
        # (forward.cu:458-462); contributor index counts every in-range
        # instance, matching the CUDA contributor++ (forward.cu:395)
        # contributor index counts within the tile's range (1-based),
        # matching the CUDA contributor++ (forward.cu:395)
        pos1 = (pos - tile_starts[:, None] + 1).astype(dt)[:, :, None]
        med_mask = accept & (T_before > 0.5)
        med_score = jnp.where(med_mask, pos1, 0.0)
        best = jnp.argmax(med_score, axis=1)                       # [t, pix]
        best_score = jnp.max(med_score, axis=1)
        best_depth = jnp.take_along_axis(
            depth_safe, best[:, None, :], axis=1)[:, 0, :]
        upd = best_score > med_pos
        med_depth = jnp.where(upd, best_depth, med_depth)
        med_pos = jnp.maximum(med_pos, best_score)

        nc_score = jnp.where(accept, pos1, 0.0)
        n_contrib = jnp.maximum(n_contrib, jnp.max(nc_score, axis=1))

        T_run = T_run * cprod[:, -1, :]
        return (T_run, C_acc, F_acc, D_acc, D2_acc, dist_acc, M1, M2,
                med_depth, med_pos, n_contrib), None

    dt = sorted_data.dtype
    z_tp = jnp.zeros((n_tiles, pix), dt)
    init = (jnp.ones((n_tiles, pix), dt),                 # T
            jnp.zeros((n_tiles, C, pix), dt),             # color
            jnp.zeros((n_tiles, S + 3, pix), dt),         # feature
            z_tp, z_tp, z_tp, z_tp, z_tp,                 # D, D2, dist, M1, M2
            z_tp, z_tp, z_tp)                             # med_d, med_pos, n_contrib

    body = jax.checkpoint(chunk_body, prevent_cse=False)
    (T_fin, C_acc, F_acc, D_acc, D2_acc, dist_acc, _M1, _M2,
     med_depth, med_pos, n_contrib), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32))

    C_out = C_acc + T_fin[:, None, :] * bg[None, :, None]
    depth_out = jnp.stack([D_acc, med_depth, dist_acc, D2_acc], axis=1)
    contrib = jnp.stack([n_contrib, med_pos], axis=1)

    return TileImages(
        color=_untile(C_out, settings),
        feature=_untile(F_acc, settings),
        depth=_untile(depth_out, settings),
        alpha=_untile((1.0 - T_fin)[:, None, :], settings),
        contrib=_untile(contrib, settings),
        final_T=_untile(T_fin[:, None, :], settings),
    )
