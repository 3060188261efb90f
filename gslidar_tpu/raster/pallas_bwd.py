"""Pallas TPU backward compositing kernel (forward-walking).

Replaces the CUDA backward render kernel (cuda_rasterizer/backward.cu:137-515).
Unlike the CUDA kernel (and the round-1 version), the walk direction is
FORWARD — the same compacted 1-D grid as pallas_fwd — because every
back-to-front suffix the CUDA kernel accumulates can be rewritten as
``total - inclusive_prefix`` using the tile totals the forward pass
already produced (its output accumulators: per-channel sums, depth sums,
distortion moments M1/M2, and the accepted-weight total):

* accum_rec (backward.cu:353,409): dL contribution per instance is
  g * (x_k - S_k / (T_k u_k)) with S_k = sum_{i>k} w_i x_i
  = TOTAL_x - prefix_incl_k;
* the distortion chain last_dL_dT (backward.cu:372-380) unrolls to
  X_{k+1} = SabT_k / (T_k u_k) with SabT_k = sum_{i>k} a_i b_i T_i
  = TOT_abT - prefix_incl_k, and
  TOT_abT = gDist * (M2_tot * W_tot + A_fin * M2_tot - 2 * M1_tot^2);
* transmittance T_k is reconstructed by the SAME forward prefix products
  as the forward kernel — bitwise-identical rounding, no log-space
  approximation.

Forward-walking makes the gradient table write trivially race-free: the
step -> data-row map is globally non-decreasing, so all steps touching
one row are consecutive and the kernel ACCUMULATES into its output block
(reset on the first touch) — pallas keeps the block in VMEM across
consecutive same-index steps and flushes it when the index moves on. The
per-gaussian reduction then happens outside (pallas_op.py) without any
scatter: sort the grads back to gaussian-major slot order (payload-
carrying sorts are ~free on TPU) and segment-sum contiguous runs with a
blocked MXU matmul — replacing both CUDA atomicAdds (backward.cu:361,
451-512) and XLA's per-element-priced scatter-add, deterministically.

Gradient semantics follow the XLA compositor (and hence jax.grad): the
alpha clamp at 0.99 stops gradients (the CUDA backward ignores the
clamp); the S extra feature channels do not backprop into alpha
(backward.cu:393-400).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslidar_tpu.raster.pallas_fwd import (CHUNK, D_PAD, _prefix_mul,
                                           _prefix_sum, center_from_pcam,
                                           normal_from_T, step_layout)
from gslidar_tpu.raster.settings import (ALPHA_EPS, FILTER_INV_SQUARE,
                                         MAX_ALPHA, RasterSettings, T_STOP)

_F_OPA, _F_COL = 9, 10


def _bwd_kernel(chunk_tile_ref, step_starts_ref, tile_starts_ref, row0_ref,
                first_touch_ref, done_ref,    # scalar prefetch
                chunk_ref,                    # [1, D_PAD, CHUNK] fwd data
                params_ref,                   # SMEM [8]
                gC_ref, gF_ref, gD4_ref,      # cotangent blocks
                colT_ref, featT_ref, depT_ref, misc_ref,   # fwd totals
                grad_ref,                     # OUT [1, D_PAD, CHUNK]
                state_ref,                    # VMEM scratch [NSB, 1, pix]
                *, settings: RasterSettings, C: int, S: int, n_tiles: int):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    valid_step = t < n_tiles
    ts = jnp.minimum(t, n_tiles - 1)
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    # state rows: 0 T_carry, 1 PabT, 2 Pd, 3 Pd2, 4.. Pc[C], 4+C.. Pn[3]
    NSB = 4 + C + 3

    near = params_ref[0]
    far = params_ref[1]
    VFOV_min, VFOV_max = params_ref[2], params_ref[3]
    HFOV_min, HFOV_max = params_ref[4], params_ref[5]
    H, W = settings.height, settings.width

    c = i - step_starts_ref[ts]
    first = (c == 0) & valid_step
    start = tile_starts_ref[ts]
    end = tile_starts_ref[ts + 1]
    slot0 = (row0_ref[ts] + c) * CHUNK
    done = done_ref[ts]
    first_touch = first_touch_ref[i] != 0

    ty = ts // settings.tiles_x
    tx = jax.lax.rem(ts, settings.tiles_x)
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    py = (ty * th + pix_i // tw).astype(jnp.float32)
    px = (tx * tw + jax.lax.rem(pix_i, tw)).astype(jnp.float32)
    inside = (px < W) & (py < H)
    phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
    theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)

    @pl.when(first)
    def _():
        state_ref[0] = jnp.where(inside, 1.0, 0.0)
        for i_ in range(1, NSB):
            state_ref[i_] = jnp.zeros((1, pix), jnp.float32)

    T_carry = state_ref[0]
    active = valid_step & (c < done) & (slot0 < end)

    @pl.when(first_touch)
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
        # same recompute (and op order) as the forward kernel: the alpha /
        # transmittance reconstruction below must see bitwise-equal rho2d
        cx, cy, r_c = center_from_pcam(Tuz, Tvz, Twz, params_ref, H, W)
        opa = row(_F_OPA)

        # ---- recompute the forward per-instance quantities --------------
        # linear intersection form, SAME op order as pallas_fwd.py (the
        # T reconstruction below depends on reproducing the forward's
        # alpha rounding bitwise): p = ca*(Tu x Tv) + ct*(Tu x Tw)
        # + cg*(Tw x Tv), ca = st*cp, cg = -st*sp
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
        p1 = ca * Ax + ct * Bx + cg * Gx
        p2 = ca * Ay + ct * By + cg * Gy
        p3 = ca * Az + ct * Bz + cg * Gz
        p3ok = p3 != 0.0
        p3s = jnp.where(p3ok, p3, 1.0)
        # same reciprocal-multiply op order as pallas_fwd (bitwise T)
        rp3 = 1.0 / p3s
        s1 = p1 * rp3
        s2 = p2 * rp3
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
        slot = slot0 + inst
        in_cnt = (slot >= start) & (slot < end)
        ok = (in_cnt & p3ok & (depth >= near) & (depth <= far)
              & (alpha >= ALPHA_EPS))
        a = jnp.where(ok, alpha, 0.0)
        d_safe = jnp.where(ok, depth, far)
        u = 1.0 - a

        # exact forward transmittance reconstruction (prefix products,
        # identical rounding to pallas_fwd)
        incl = _prefix_mul(u, CHUNK)
        T_k = T_carry * (incl / u)             # exclusive prefix * carry
        test_T = T_k * u
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_k, 0.0)
        inv_Tu = jnp.where(accept, 1.0 / (T_k * u), 0.0)

        # ---- totals & cotangents (per pixel rows) ------------------------
        T_fin = misc_ref[0, 0]
        med_pos = misc_ref[0, 2]
        M1_tot = misc_ref[0, 3]
        M2_tot = misc_ref[0, 4]
        W_tot = misc_ref[0, 6]
        gTfin = misc_ref[0, 7]     # T_fin cotangent (slot 7, see pallas_op)
        gD = gD4_ref[0, 0]
        gMed = gD4_ref[0, 1]
        gDist = gD4_ref[0, 2]
        gD2 = gD4_ref[0, 3]

        # ---- core = sum over outputs of g * (x_k - suffix * inv_Tu) -----
        core = jnp.zeros_like(a)

        for ci in range(C):
            gc = gC_ref[0, ci]
            c_val = row(_F_COL + ci)
            P_inc = state_ref[4 + ci] + _prefix_sum(w * c_val, CHUNK)
            Sc = colT_ref[0, ci] - P_inc
            core = core + gc * (c_val - Sc * inv_Tu)
            state_ref[4 + ci] = P_inc[CHUNK - 1:CHUNK, :]
        n1, n2, n3, _c1, _c2, _c3, inv_n, nsign = normal_from_T(
            Tux, Tuy, Tuz, Tvx, Tvy, Tvz, Twx, Twy, Twz)
        for ni, n_val in enumerate((n1, n2, n3)):
            gn = gF_ref[0, S + ni]
            P_inc = state_ref[4 + C + ni] + _prefix_sum(w * n_val, CHUNK)
            Sn = featT_ref[0, S + ni] - P_inc
            core = core + gn * (n_val - Sn * inv_Tu)
            state_ref[4 + C + ni] = P_inc[CHUNK - 1:CHUNK, :]
        P_inc = state_ref[2] + _prefix_sum(w * d_safe, CHUNK)
        Sd = depT_ref[0, 0] - P_inc
        core = core + gD * (d_safe - Sd * inv_Tu)
        state_ref[2] = P_inc[CHUNK - 1:CHUNK, :]
        P_inc = state_ref[3] + _prefix_sum(w * d_safe * d_safe, CHUNK)
        Sd2 = depT_ref[0, 3] - P_inc
        core = core + gD2 * (d_safe * d_safe - Sd2 * inv_Tu)
        state_ref[3] = P_inc[CHUNK - 1:CHUNK, :]

        # distortion (backward.cu:372-380): b_k from totals; the last_dL_dT
        # chain X_{k+1} = SabT_k * inv(T_k u_k), SabT_k = TOT_abT - prefix.
        # Statically gated on compute_distortion to match the forward's
        # zeroed dist/M1/M2 outputs — otherwise a (bogus) cotangent on the
        # zero distortion channel would emit b = gDist*m^2*A_fin gradients.
        if settings.compute_distortion:
            m = far / (far - near) * (1.0 - near / d_safe)
            A_fin = 1.0 - T_fin
            b = gDist * (M2_tot + m * m * A_fin - 2.0 * m * M1_tot)
            TOT_abT = gDist * (M2_tot * W_tot + A_fin * M2_tot
                               - 2.0 * M1_tot * M1_tot)
            P_inc = state_ref[1] + _prefix_sum(jnp.where(accept, w * b, 0.0),
                                               CHUNK)
            SabT = TOT_abT - P_inc
            core = core + (b - SabT * inv_Tu)
            state_ref[1] = P_inc[CHUNK - 1:CHUNK, :]

        # the T_fin path applies to every OK instance (T keeps decaying
        # past the 1e-4 floor in the forward), not only accepted ones
        u_ok = jnp.where(ok, u, 1.0)
        dL_da = jnp.where(accept, T_k * core, 0.0) \
            - gTfin * jnp.where(ok, T_fin / u_ok, 0.0)

        # ---- depth cotangent per instance -------------------------------
        pos1 = (slot - start + 1).astype(jnp.float32)
        med_hit = accept & (pos1 == med_pos)
        dL_dd = (w * (gD + 2.0 * d_safe * gD2)
                 + jnp.where(med_hit, gMed, 0.0))
        if settings.compute_distortion:
            dmd_dd = (far * near) / ((far - near) * d_safe * d_safe)
            dL_dmd = 2.0 * w * (m * A_fin - M1_tot) * gDist
            dL_dd = dL_dd + dL_dmd * dmd_dd

        # ---- chain alpha -> G/opa, rho, geometry ------------------------
        clamp_ok = alpha_raw < MAX_ALPHA
        dL_dG = jnp.where(clamp_ok, opa * dL_da, 0.0)
        dL_dopa_pix = jnp.where(clamp_ok, G * dL_da, 0.0)
        dL_drho = -0.5 * G * dL_dG

        # 3d branch: rho3d + exact depth. s1/s2/rp3 can be inf or NaN on
        # lanes with |p3| in the subnormal range (the reciprocal
        # overflows); those lanes are never accepted into the 3d branch
        # (rho3d is inf/NaN there), but multiply-masking alone would
        # still produce 0 * inf = NaN and poison the per-instance
        # reductions below — so mask the VALUES, not just the
        # cotangents. On u3 lanes s1/s2/rp3 are provably finite
        # (accept requires rho3d <= rho2d finite, and a finite
        # s1 = p1 * rp3 forces rp3 finite), so live gradients are
        # bit-identical. The CUDA backward is immune by control flow:
        # the `rho3d <= rho2d` branch never executes on such lanes.
        u3 = accept & use3d
        dd3 = jnp.where(u3, dL_dd, 0.0)
        dr3 = jnp.where(u3, dL_drho, 0.0)
        s1g = jnp.where(u3, s1, 0.0)
        s2g = jnp.where(u3, s2, 0.0)
        rp3g = jnp.where(u3, rp3, 0.0)
        dL_ds1 = (dr3 * 2.0 * s1g
                  + dd3 * (Tux * st * sp - Tvx * ct + Twx * st * cp))
        dL_ds2 = (dr3 * 2.0 * s2g
                  + dd3 * (Tuy * st * sp - Tvy * ct + Twy * st * cp))
        dp1 = dL_ds1 * rp3g
        dp2 = dL_ds2 * rp3g
        dp3 = -(dL_ds1 * s1g + dL_ds2 * s2g) * rp3g
        # dL/dT through the linear form (for c = u x v: dL/du = v x g,
        # dL/dv = g x u with g = dL/dc):
        #   gTu = ca*(Tv x dp) + ct*(Tw x dp)
        #   gTv = ca*(dp x Tu) - cg*(Tw x dp)
        #   gTw = ct*(dp x Tu) + cg*(Tv x dp)
        X1x = Tvy * dp3 - Tvz * dp2            # Tv x dp
        X1y = Tvz * dp1 - Tvx * dp3
        X1z = Tvx * dp2 - Tvy * dp1
        X2x = Twy * dp3 - Twz * dp2            # Tw x dp
        X2y = Twz * dp1 - Twx * dp3
        X2z = Twx * dp2 - Twy * dp1
        Y1x = dp2 * Tuz - dp3 * Tuy            # dp x Tu
        Y1y = dp3 * Tux - dp1 * Tuz
        Y1z = dp1 * Tuy - dp2 * Tux

        gTux = ca * X1x + ct * X2x + dd3 * s1g * st * sp
        gTuy = ca * X1y + ct * X2y + dd3 * s2g * st * sp
        gTuz = ca * X1z + ct * X2z + dd3 * st * sp
        gTvx = ca * Y1x - cg * X2x - dd3 * s1g * ct
        gTvy = ca * Y1y - cg * X2y - dd3 * s2g * ct
        gTvz = ca * Y1z - cg * X2z - dd3 * ct
        gTwx = ct * Y1x + cg * X1x + dd3 * s1g * st * cp
        gTwy = ct * Y1y + cg * X1y + dd3 * s2g * st * cp
        gTwz = ct * Y1z + cg * X1z + dd3 * st * cp

        # 2d branch: low-pass position + center-range depth
        u2 = accept & jnp.logical_not(use3d)
        drho2 = jnp.where(u2, dL_drho, 0.0)
        gcx = drho2 * 2.0 * FILTER_INV_SQUARE * dxp
        gcy = drho2 * 2.0 * FILTER_INV_SQUARE * dyp
        g_rc = jnp.where(u2, dL_dd, 0.0)

        # ---- per-instance reductions over pixels (lane axis) ------------
        def red(x):
            return jnp.sum(x, axis=1, keepdims=True)       # [CHUNK, 1]

        # chain the (reduced) center pixel/range gradients into the p_cam
        # T-columns through the spherical Jacobian — the reference does
        # the identical fold before its preprocess backward reads dL_dT
        # (backward.cu:578-595 for dL_dmean2D, :505-508 for the 2d-branch
        # depth term dL_dr * p_cam / r). Guarded like center_from_pcam:
        # degenerate lanes (center at the camera origin) are depth-culled,
        # so their gcx/gcy/g_rc are zero and only need finite factors.
        gxi, gyi, gri = red(gcx), red(gcy), red(g_rc)      # [CHUNK, 1]
        u_p, v_p, w_p = Tuz, Tvz, Twz
        degen = (u_p * u_p + w_p * w_p) < 1e-20
        u_s = jnp.where(degen, 0.0, u_p)
        w_s = jnp.where(degen, 1.0, w_p)
        ruw2 = u_s * u_s + w_s * w_s
        ruw = jnp.sqrt(ruw2)
        q = ruw2 + v_p * v_p                               # = r^2
        inv_ruw2 = 1.0 / ruw2
        inv_rq = 1.0 / (ruw * q)
        inv_r = 1.0 / jnp.sqrt(u_p * u_p + v_p * v_p + w_p * w_p + 1e-24)
        kx = jnp.float32(W) / (params_ref[5] - params_ref[4])
        ky = jnp.float32(H) / (params_ref[3] - params_ref[2])
        gU_c = (gxi * (kx * w_s * inv_ruw2)
                - gyi * (ky * u_s * v_p * inv_rq) + gri * (u_p * inv_r))
        gV_c = gyi * (ky * ruw / q) + gri * (v_p * inv_r)
        gW_c = (-gxi * (kx * u_s * inv_ruw2)
                - gyi * (ky * v_p * w_s * inv_rq) + gri * (w_p * inv_r))

        # chain the (reduced) normal cotangents through the flip-signed
        # normalize(u_cam x v_cam) recompute into the T columns. The
        # reference routes dL_dnormal separately into R via the world2cam
        # transpose (compute_transmat_aabb, backward.cu:600-608) — the
        # two routes are the same function of (quat, scales), so model
        # gradients agree; the T-tap's p_cam ROW (the only row densify
        # stats read) stays untouched either way.
        gN1 = red(w * gF_ref[0, S + 0])
        gN2 = red(w * gF_ref[0, S + 1])
        gN3 = red(w * gF_ref[0, S + 2])
        gdot = n1 * gN1 + n2 * gN2 + n3 * gN3
        h_s = nsign * inv_n
        h1 = h_s * (gN1 - n1 * gdot)
        h2 = h_s * (gN2 - n2 * gdot)
        h3 = h_s * (gN3 - n3 * gdot)
        # dL/du_cam = v_cam x h -> packed cols (0, 3, 6);
        # dL/dv_cam = h x u_cam -> packed cols (1, 4, 7)
        gu_x = Tvy * h3 - Twy * h2
        gu_y = Twy * h1 - Tuy * h3
        gu_z = Tuy * h2 - Tvy * h1
        gv_x = h2 * Twx - h3 * Tvx
        gv_y = h3 * Tux - h1 * Twx
        gv_z = h1 * Tvx - h2 * Tux

        cols = [red(gTux) + gu_x, red(gTuy) + gv_x, red(gTuz) + gU_c,
                red(gTvx) + gu_y, red(gTvy) + gv_y, red(gTvz) + gV_c,
                red(gTwx) + gu_z, red(gTwy) + gv_z, red(gTwz) + gW_c]
        cols.append(red(dL_dopa_pix))
        for ci in range(C):
            cols.append(red(w * gC_ref[0, ci]))
        for si in range(S):
            cols.append(red(w * gF_ref[0, si]))
        while len(cols) < D_PAD:
            cols.append(jnp.zeros_like(cols[0]))
        grad_rows = jnp.concatenate(cols, axis=1)          # [CHUNK, D_PAD]
        grad_ref[0] = grad_ref[0] + grad_rows.T

        state_ref[0] = T_carry * incl[CHUNK - 1:CHUNK, :]


def run_backward(data, tile_starts, done, params, cts, totals,
                 settings: RasterSettings, C: int, S: int):
    """Launch the backward kernel.

    Args:
        data: [n_rows, D_PAD, CHUNK] forward chunk table.
        done: [n_tiles] int32 chunks the forward actually processed.
        cts: (gC [n_tiles,C,1,pix], gF [n_tiles,S+3,1,pix],
              gD4 [n_tiles,4,1,pix]).
        totals: (colorT, featT, depthT, misc8) forward outputs; misc8
            slot 7 must carry the T_fin COTANGENT (see pallas_op).
    Returns:
        grad table [n_rows + 1, D_PAD, CHUNK] (last row = tail dummy).
    """
    n_tiles = settings.num_tiles
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    n_rows = data.shape[0]
    K = n_rows * CHUNK

    chunk_tile, step_starts, row0 = step_layout(tile_starts, K, n_tiles)
    n_steps_cap = chunk_tile.shape[0]
    ct_c = jnp.minimum(chunk_tile, n_tiles - 1)
    step_row = jnp.where(chunk_tile < n_tiles,
                         row0[ct_c] + (jnp.arange(n_steps_cap, dtype=jnp.int32)
                                       - step_starts[ct_c]),
                         n_rows)
    first_touch = jnp.concatenate(
        [jnp.ones(1, jnp.int32),
         (step_row[1:] != step_row[:-1]).astype(jnp.int32)])

    gC, gF, gD4 = cts
    colT, featT, depT, misc8 = totals
    NSB = 4 + C + 3
    kernel = functools.partial(_bwd_kernel, settings=settings, C=C, S=S,
                               n_tiles=n_tiles)

    def in_row(i, ct, ss, _tstarts, r0, _ft, _dn):
        t = jnp.minimum(ct[i], n_tiles - 1)
        return (jnp.clip(r0[t] + (i - ss[t]), 0, n_rows - 1), 0, 0)

    def tile_idx(i, ct, *_):
        return (jnp.minimum(ct[i], n_tiles - 1), 0, 0, 0)

    def out_row(i, ct, ss, _tstarts, r0, _ft, _dn):
        t = ct[i]
        tc = jnp.minimum(t, n_tiles - 1)
        return (jnp.where(t < n_tiles,
                          jnp.clip(r0[tc] + (i - ss[tc]), 0, n_rows - 1),
                          n_rows), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps_cap,),
        in_specs=[
            pl.BlockSpec((1, D_PAD, CHUNK), in_row),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1, pix), tile_idx),
            pl.BlockSpec((1, S + 3, 1, pix), tile_idx),
            pl.BlockSpec((1, 4, 1, pix), tile_idx),
            pl.BlockSpec((1, C, 1, pix), tile_idx),
            pl.BlockSpec((1, S + 3, 1, pix), tile_idx),
            pl.BlockSpec((1, 4, 1, pix), tile_idx),
            pl.BlockSpec((1, 8, 1, pix), tile_idx),
        ],
        out_specs=pl.BlockSpec((1, D_PAD, CHUNK), out_row),
        scratch_shapes=[pltpu.VMEM((NSB, 1, pix), jnp.float32)],
    )
    grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows + 1, D_PAD, CHUNK),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(chunk_tile, step_starts, tile_starts, row0, first_touch, done,
      data, params, gC, gF, gD4, colT, featT, depT, misc8)
    return grad
