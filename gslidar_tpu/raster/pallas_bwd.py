"""Pallas TPU backward compositing kernel.

Replaces the CUDA backward render kernel (cuda_rasterizer/backward.cu:137-515)
with the same loop-free structure as the forward (pallas_fwd.py): the
(tile, chunk) walk is the 2-D grid — chunks visited in REVERSE — and every
sequential recurrence of the CUDA kernel becomes a prefix/suffix sum:

* transmittance is reconstructed in LOG space (prefix sums of log(1-a)),
  which is stabler than the CUDA back-to-front division chain
  (backward.cu:341) for deeply-occluded pixels;
* the suffix blends accum_rec / accum_depth_rec (backward.cu:353,409) are
  suffix sums S_k = sum_{i>k} w_i x_i combined with a carry across chunks:
  (x_k - accum_rec_k) * T_k == T_k x_k - S_k / (1 - a_k);
* the distortion chain last_dL_dT (backward.cu:372-380) unrolls to
  X_{k+1} = (sum_{i>k} a_i b_i T_i) / (T_k u_k) — one more suffix sum;
* per-instance gradients are written to this instance's OWN slot in a
  [n_rows, D_PAD, CHUNK] gradient table — no atomics; the per-gaussian
  reduction is a deterministic segment_sum outside the kernel.

Gradient semantics follow the XLA compositor (and hence jax.grad): the
alpha clamp at 0.99 stops gradients (the CUDA backward ignores the clamp);
the S extra feature channels do not backprop into alpha
(backward.cu:393-400).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslidar_tpu.raster.pallas_fwd import CHUNK, D_PAD, _prefix_sum
from gslidar_tpu.raster.settings import (ALPHA_EPS, FILTER_INV_SQUARE,
                                         MAX_ALPHA, RasterSettings, T_STOP)

_F_CX, _F_CY, _F_RC, _F_N0, _F_OPA, _F_COL = 9, 10, 11, 12, 15, 16


def _suffix_from_prefix(incl, n=CHUNK):
    """S_k = sum_{i>k} given INCLUSIVE prefix sums along sublanes."""
    total = incl[n - 1:n, :]
    return total - incl


def _bwd_kernel(start_chunks_ref, counts_ref, done_ref,  # scalar prefetch
                chunk_ref,                    # [1, D_PAD, CHUNK] fwd data
                params_ref,                   # SMEM [8]
                gC_ref, gF_ref, gD4_ref, misc_ref,   # cotangents + residuals
                grad_ref,                     # OUT [1, D_PAD, CHUNK]
                state_ref,                    # VMEM scratch [NSB, 1, pix]
                *, settings: RasterSettings, C: int, S: int, n_chunks: int):
    t = pl.program_id(0)
    cr = pl.program_id(1)                      # reverse step index
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    # state rows: 0 logT_end, 1 SabT, 2 Sd, 3 Sd2, 4.. Sc[C], 4+C.. Sn[3]
    NSB = 4 + C + 3

    near = params_ref[0]
    far = params_ref[1]
    VFOV_min, VFOV_max = params_ref[2], params_ref[3]
    HFOV_min, HFOV_max = params_ref[4], params_ref[5]
    H, W = settings.height, settings.width

    count = counts_ref[t]
    done = done_ref[t]
    c = done - 1 - cr                          # forward chunk index
    active = c >= 0

    ty = t // settings.tiles_x
    tx = jax.lax.rem(t, settings.tiles_x)
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    py = (ty * th + pix_i // tw).astype(jnp.float32)
    px = (tx * tw + jax.lax.rem(pix_i, tw)).astype(jnp.float32)
    phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
    theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)

    T_fin = misc_ref[0, 0]
    med_pos = misc_ref[0, 2]
    M1_tot = misc_ref[0, 3]
    M2_tot = misc_ref[0, 4]

    @pl.when(cr == 0)
    def _():
        state_ref[0] = jnp.log(jnp.maximum(T_fin, 1e-37))
        for i in range(1, NSB):
            state_ref[i] = jnp.zeros((1, pix), jnp.float32)

    @pl.when(jnp.logical_not(active))
    def _():
        grad_ref[0] = jnp.zeros((D_PAD, CHUNK), jnp.float32)

    @pl.when(active)
    def _():
        data = chunk_ref[0].T                  # [CHUNK, D_PAD]

        def row(f):
            return data[:, f:f + 1]            # [CHUNK, 1]

        Tux, Tuy, Tuz = row(0), row(1), row(2)
        Tvx, Tvy, Tvz = row(3), row(4), row(5)
        Twx, Twy, Twz = row(6), row(7), row(8)
        cx, cy = row(_F_CX), row(_F_CY)
        r_c = row(_F_RC)
        opa = row(_F_OPA)

        # ---- recompute the forward per-instance quantities --------------
        kx = cp * Tux - sp * Twx
        ky = cp * Tuy - sp * Twy
        kz = cp * Tuz - sp * Twz
        lx = sp * ct * Tux + st * Tvx + cp * ct * Twx
        ly = sp * ct * Tuy + st * Tvy + cp * ct * Twy
        lz = sp * ct * Tuz + st * Tvz + cp * ct * Twz
        p1 = ky * lz - kz * ly
        p2 = kz * lx - kx * lz
        p3 = kx * ly - ky * lx
        p3ok = p3 != 0.0
        p3s = jnp.where(p3ok, p3, 1.0)
        s1 = p1 / p3s
        s2 = p2 / p3s
        rho3d = s1 * s1 + s2 * s2
        dxp = cx - px
        # circular-pano wrap, same as the forward (params[6]/[7] = W, 1/W)
        dxp = dxp - params_ref[6] * jnp.round(dxp * params_ref[7])
        dyp = cy - py
        rho2d = FILTER_INV_SQUARE * (dxp * dxp + dyp * dyp)
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        sTu = s1 * Tux + s2 * Tuy + Tuz
        sTv = s1 * Tvx + s2 * Tvy + Tvz
        sTw = s1 * Twx + s2 * Twy + Twz
        depth3d = sTu * st * sp - sTv * ct + sTw * st * cp
        depth = jnp.where(use3d, depth3d, r_c)
        G = jnp.exp(-0.5 * rho)
        alpha_raw = opa * G
        alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
        inst = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 0)
        in_cnt = inst < (count - c * CHUNK)
        ok = (in_cnt & p3ok & (depth >= near) & (depth <= far)
              & (alpha >= ALPHA_EPS))
        a = jnp.where(ok, alpha, 0.0)
        d_safe = jnp.where(ok, depth, far)
        u = 1.0 - a
        logu = jnp.log(u)

        # log-space transmittance reconstruction: carry holds log T at the
        # END of this chunk (walk is reverse)
        incl_logu = _prefix_sum(logu, CHUNK)
        chunk_log = incl_logu[CHUNK - 1:CHUNK, :]
        logT_entry = state_ref[0] - chunk_log
        logT_k = logT_entry + (incl_logu - logu)   # exclusive prefix
        T_k = jnp.exp(logT_k)
        test_T = T_k * u
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_k, 0.0)
        u_safe = jnp.where(accept, u, 1.0)

        # ---- cotangents (per pixel rows) --------------------------------
        gD = gD4_ref[0, 0]
        gMed = gD4_ref[0, 1]
        gDist = gD4_ref[0, 2]
        gD2 = gD4_ref[0, 3]
        gTfin = misc_ref[0, 5]     # passed through misc slot 5 (see op)

        # ---- core = sum over outputs of g * (x_k - suffix/(T_k u_k)) ----
        inv_Tu = jnp.where(accept, jnp.exp(-(logT_k + logu)), 0.0)
        core = jnp.zeros_like(a)

        for ci in range(C):
            gc = gC_ref[0, ci]
            c_val = row(_F_COL + ci)
            incl = _prefix_sum(w * c_val, CHUNK)
            Sc = _suffix_from_prefix(incl) + state_ref[4 + ci]
            core = core + gc * (c_val - Sc * inv_Tu)
            state_ref[4 + ci] = state_ref[4 + ci] + incl[CHUNK - 1:CHUNK, :]
        for ni in range(3):
            gn = gF_ref[0, S + ni]
            n_val = row(_F_N0 + ni)
            incl = _prefix_sum(w * n_val, CHUNK)
            Sn = _suffix_from_prefix(incl) + state_ref[4 + C + ni]
            core = core + gn * (n_val - Sn * inv_Tu)
            state_ref[4 + C + ni] = state_ref[4 + C + ni] + incl[CHUNK - 1:CHUNK, :]
        incl_d = _prefix_sum(w * d_safe, CHUNK)
        Sd = _suffix_from_prefix(incl_d) + state_ref[2]
        core = core + gD * (d_safe - Sd * inv_Tu)
        state_ref[2] = state_ref[2] + incl_d[CHUNK - 1:CHUNK, :]
        incl_d2 = _prefix_sum(w * d_safe * d_safe, CHUNK)
        Sd2 = _suffix_from_prefix(incl_d2) + state_ref[3]
        core = core + gD2 * (d_safe * d_safe - Sd2 * inv_Tu)
        state_ref[3] = state_ref[3] + incl_d2[CHUNK - 1:CHUNK, :]

        # distortion (backward.cu:372-380): b_k from totals; the last_dL_dT
        # chain X_{k+1} = SabT_k * inv(T_k u_k)
        m = far / (far - near) * (1.0 - near / d_safe)
        A_fin = 1.0 - T_fin
        b = gDist * (M2_tot + m * m * A_fin - 2.0 * m * M1_tot)
        abT = jnp.where(accept, a * b * T_k, 0.0)
        incl_ab = _prefix_sum(abT, CHUNK)
        SabT = _suffix_from_prefix(incl_ab) + state_ref[1]
        X_next = SabT * inv_Tu
        core = core + (b - X_next)
        state_ref[1] = state_ref[1] + incl_ab[CHUNK - 1:CHUNK, :]

        # the T_fin path applies to every OK instance (T keeps decaying
        # past the 1e-4 floor in the forward), not only accepted ones
        u_ok = jnp.where(ok, u, 1.0)
        dL_da = jnp.where(accept, T_k * core, 0.0) \
            - gTfin * jnp.where(ok, T_fin / u_ok, 0.0)

        # ---- depth cotangent per instance -------------------------------
        dmd_dd = (far * near) / ((far - near) * d_safe * d_safe)
        dL_dmd = 2.0 * w * (m * A_fin - M1_tot) * gDist
        pos1 = (c * CHUNK + 1 + inst).astype(jnp.float32)
        med_hit = accept & (pos1 == med_pos)
        dL_dd = (w * (gD + 2.0 * d_safe * gD2)
                 + jnp.where(med_hit, gMed, 0.0)
                 + dL_dmd * dmd_dd)

        # ---- chain alpha -> G/opa, rho, geometry ------------------------
        clamp_ok = alpha_raw < MAX_ALPHA
        dL_dG = jnp.where(clamp_ok, opa * dL_da, 0.0)
        dL_dopa_pix = jnp.where(clamp_ok, G * dL_da, 0.0)
        dL_drho = -0.5 * G * dL_dG

        # 3d branch: rho3d + exact depth
        u3 = accept & use3d
        dd3 = jnp.where(u3, dL_dd, 0.0)
        dL_ds1 = (jnp.where(u3, dL_drho, 0.0) * 2.0 * s1
                  + dd3 * (Tux * st * sp - Tvx * ct + Twx * st * cp))
        dL_ds2 = (jnp.where(u3, dL_drho, 0.0) * 2.0 * s2
                  + dd3 * (Tuy * st * sp - Tvy * ct + Twy * st * cp))
        dp1 = dL_ds1 / p3s
        dp2 = dL_ds2 / p3s
        dp3 = -(dL_ds1 * s1 + dL_ds2 * s2) / p3s
        # dL_dk = cross(l, dL_dp); dL_dl = cross(dL_dp, k)
        dkx = ly * dp3 - lz * dp2
        dky = lz * dp1 - lx * dp3
        dkz = lx * dp2 - ly * dp1
        dlx = dp2 * kz - dp3 * ky
        dly = dp3 * kx - dp1 * kz
        dlz = dp1 * ky - dp2 * kx

        gTux = cp * dkx + sp * ct * dlx + dd3 * s1 * st * sp
        gTuy = cp * dky + sp * ct * dly + dd3 * s2 * st * sp
        gTuz = cp * dkz + sp * ct * dlz + dd3 * st * sp
        gTvx = st * dlx - dd3 * s1 * ct
        gTvy = st * dly - dd3 * s2 * ct
        gTvz = st * dlz - dd3 * ct
        gTwx = -sp * dkx + cp * ct * dlx + dd3 * s1 * st * cp
        gTwy = -sp * dky + cp * ct * dly + dd3 * s2 * st * cp
        gTwz = -sp * dkz + cp * ct * dlz + dd3 * st * cp

        # 2d branch: low-pass position + center-range depth
        u2 = accept & jnp.logical_not(use3d)
        drho2 = jnp.where(u2, dL_drho, 0.0)
        gcx = drho2 * 2.0 * FILTER_INV_SQUARE * dxp
        gcy = drho2 * 2.0 * FILTER_INV_SQUARE * dyp
        g_rc = jnp.where(u2, dL_dd, 0.0)

        # ---- per-instance reductions over pixels (lane axis) ------------
        def red(x):
            return jnp.sum(x, axis=1, keepdims=True)       # [CHUNK, 1]

        cols = [red(gTux), red(gTuy), red(gTuz),
                red(gTvx), red(gTvy), red(gTvz),
                red(gTwx), red(gTwy), red(gTwz),
                red(gcx), red(gcy), red(g_rc)]
        # normal grads: w * gN reduced
        for ni in range(3):
            cols.append(red(w * gF_ref[0, S + ni]))
        cols.append(red(dL_dopa_pix))
        for ci in range(C):
            cols.append(red(w * gC_ref[0, ci]))
        for si in range(S):
            cols.append(red(w * gF_ref[0, si]))
        while len(cols) < D_PAD:
            cols.append(jnp.zeros_like(cols[0]))
        grad_rows = jnp.concatenate(cols, axis=1)          # [CHUNK, D_PAD]
        grad_ref[0] = grad_rows.T

        state_ref[0] = logT_entry                           # walk backward


def run_backward(data, start_chunks, counts, done, params, cts,
                 misc_resid, settings: RasterSettings, C: int, S: int):
    """Launch the backward kernel.

    Args:
        data: [n_rows, D_PAD, CHUNK] forward chunk table (+ its padding).
        cts: (gC [n_tiles,C,1,pix], gF [n_tiles,S+3,1,pix],
              gD4 [n_tiles,4,1,pix]).
        misc_resid: [n_tiles, 6, 1, pix] rows (T_fin, ncon, med_pos, M1,
            M2, gTfin) — note slot 5 carries the T_fin COTANGENT.
    Returns:
        grad table [n_rows + 1, D_PAD, CHUNK] (last row = inactive dummy).
    """
    n_tiles = settings.num_tiles
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    n_chunks = max(settings.tile_list_cap // CHUNK, 1)
    n_rows = data.shape[0]
    data_ext = jnp.concatenate(
        [data, jnp.zeros((1,) + data.shape[1:], data.dtype)], axis=0)

    gC, gF, gD4 = cts
    NSB = 4 + C + 3
    kernel = functools.partial(_bwd_kernel, settings=settings, C=C, S=S,
                               n_chunks=n_chunks)

    def in_row(t, c, starts, cnts, dn):
        cc = dn[t] - 1 - c
        return jnp.where(cc >= 0,
                         jnp.minimum(starts[t] + cc, n_rows - 1),
                         n_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, D_PAD, CHUNK),
                         lambda t, c, s_, n_, d_: (in_row(t, c, s_, n_, d_),
                                                   0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, S + 3, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 4, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 6, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, D_PAD, CHUNK),
            lambda t, c, s_, n_, d_: (in_row(t, c, s_, n_, d_), 0, 0)),
        scratch_shapes=[pltpu.VMEM((NSB, 1, pix), jnp.float32)],
    )
    grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows + 1, D_PAD, CHUNK),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(start_chunks, counts, done, data_ext, params, gC, gF, gD4, misc_resid)
    return grad
