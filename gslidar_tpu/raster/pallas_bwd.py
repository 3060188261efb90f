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
  approximation;
* because every output's cotangent is CONSTANT over a tile, the sum over
  outputs commutes with the prefix sums: all of the above collapse into
  ONE running prefix q_k = sum_outputs g * x_k (see the core comment in
  the kernel) — one prefix-sum ladder and one carry row instead of
  C + 3 + 2 + 1 of each;
* per-instance pixel reductions ride the MXU: red(coef * (V x dp)) =
  V x red(coef * dp) turns the nine dL/dT reductions into three
  512-deep matmuls, and the channel cotangent rows into one more.

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

from gslidar_tpu.raster.pallas_fwd import (CHUNK, D_PAD, _excl_of,
                                           _prefix_mul, _prefix_sum,
                                           center_from_pcam, decode_payload,
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
    # state rows: 0 T_carry, 1 Pq (the single collapsed prefix carry)
    NSB = 2

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

    def pixel_rows():
        """[1, pix] pixel coordinate rows, computed INSIDE the predicated
        blocks: most grid steps are inactive (beyond the forward's done
        count — measured 80% at the bench shape) and must not pay
        per-pixel trig (see pallas_fwd)."""
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        py = (ty * th + pix_i // tw).astype(jnp.float32)
        px = (tx * tw + jax.lax.rem(pix_i, tw)).astype(jnp.float32)
        return px, py, (px < W) & (py < H)

    @pl.when(first)
    def _():
        _, _, inside = pixel_rows()
        state_ref[0] = jnp.where(inside, 1.0, 0.0)
        for i_ in range(1, NSB):
            state_ref[i_] = jnp.zeros((1, pix), jnp.float32)

    active = valid_step & (c < done) & (slot0 < end)

    @pl.when(first_touch)
    def _():
        # the grad table is ALWAYS the f32 layout (D_PAD rows), whatever
        # the payload mode: gradients flow straight-through to the f32
        # logical rows (the bf16 quantization's cotangent is identity)
        grad_ref[0] = jnp.zeros((D_PAD, CHUNK), jnp.float32)

    @pl.when(active)
    def _():
        px, py, _ = pixel_rows()
        phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
        theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        T_carry = state_ref[0]
        data = chunk_ref[0]                    # [D_PAD_IN, CHUNK]
        rowl, blend = decode_payload(data, C, S, settings)

        # ---- per-instance recompute on the LANE axis ---------------------
        # Identical expressions (and op order) to the forward kernel: the
        # alpha / transmittance reconstruction below must see bitwise-equal
        # rho2d / rho3d / depth.
        Tux, Tuy, Tuz = rowl(0), rowl(1), rowl(2)
        Tvx, Tvy, Tvz = rowl(3), rowl(4), rowl(5)
        Twx, Twy, Twz = rowl(6), rowl(7), rowl(8)
        cx_l, cy_l, r_c_l = center_from_pcam(Tuz, Tvz, Twz, params_ref, H, W)
        # per-instance seam wrap around the tile center (see pallas_fwd)
        tcx = (tx * tw).astype(jnp.float32) + 0.5 * (tw - 1)
        cx_l = cx_l - params_ref[6] * jnp.round((cx_l - tcx) * params_ref[7])
        Ax = Tuy * Tvz - Tuz * Tvy
        Ay = Tuz * Tvx - Tux * Tvz
        Az = Tux * Tvy - Tuy * Tvx
        Bx = Tuy * Twz - Tuz * Twy
        By = Tuz * Twx - Tux * Twz
        Bz = Tux * Twy - Tuy * Twx
        Gx = Twy * Tvz - Twz * Tvy
        Gy = Twz * Tvx - Twx * Tvz
        Gz = Twx * Tvy - Twy * Tvx
        n1, n2, n3, c1, c2, c3, inv_n, nsign = normal_from_T(
            Tux, Tuy, Tuz, Tvx, Tvy, Tvz, Twx, Twy, Twz)
        npc_l = c1 * Tuz + c2 * Tvz + c3 * Twz
        inst_rows = jnp.concatenate(
            [Ax, Ay, Az, Bx, By, Bz, Gx, Gy, Gz,
             npc_l, cx_l, cy_l, r_c_l, blend[0],
             jnp.zeros((2, CHUNK), jnp.float32)], axis=0)  # [16, CHUNK]
        im = inst_rows.T

        def col(f):
            return im[:, f:f + 1]              # [CHUNK, 1]

        # ---- pixel-axis recompute (bitwise-equal to pallas_fwd) ----------
        ca = st * cp
        cg = -(st * sp)
        p1 = ca * col(0) + ct * col(3) + cg * col(6)
        p2 = ca * col(1) + ct * col(4) + cg * col(7)
        p3 = ca * col(2) + ct * col(5) + cg * col(8)
        p3ok = p3 != 0.0
        p3s = jnp.where(p3ok, p3, 1.0)
        rp3 = 1.0 / p3s
        s1 = p1 * rp3
        s2 = p2 * rp3
        rho3d = s1 * s1 + s2 * s2
        dxp = col(10) - px
        dyp = col(11) - py
        rho2d = FILTER_INV_SQUARE * (dxp * dxp + dyp * dyp)
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        depth = jnp.where(use3d, col(9) * rp3, col(12))
        G = jnp.exp(-0.5 * rho)
        alpha_raw = col(13) * G
        alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot = slot0 + iota_s                  # [CHUNK, 1]
        in_cnt = (slot >= start) & (slot < end)
        ok = (in_cnt & p3ok & (depth >= near) & (depth <= far)
              & (alpha >= ALPHA_EPS))
        a = jnp.where(ok, alpha, 0.0)
        d_safe = jnp.where(ok, depth, far)
        u = 1.0 - a

        incl = _prefix_mul(u, CHUNK)
        T_k = T_carry * _excl_of(incl, iota_s)
        test_T = T_k * u
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_k, 0.0)
        inv_Tu = jnp.where(accept, 1.0 / test_T, 0.0)

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

        # ---- core = q - (qtot - prefix(w*q)) * inv_Tu --------------------
        # Every CUDA back-to-front recurrence is sum_outputs g*(x_k -
        # S_k*inv_Tu) with S_k = X_tot - prefix_k(w*x). Because the
        # cotangents g are constant over a tile, the sum over outputs
        # commutes with the prefix: defining q_k = sum_g g*x_k and
        # qtot = sum_g g*X_tot, ONE prefix sum of w*q replaces the
        # per-channel prefix sums (C+3 channels + depth + d^2 + the
        # distortion chain), and ONE carry row replaces their carries.
        # The per-instance channels (colors, normals) enter q through one
        # MXU matmul against their cotangent rows.
        cf = jnp.concatenate(
            blend[1:1 + C] + [n1, n2, n3], axis=0)         # [C+3, CHUNK]
        gcn = jnp.concatenate(
            [gC_ref[0, ci] for ci in range(C)]
            + [gF_ref[0, S + ni] for ni in range(3)], axis=0)   # [C+3, pix]
        q = jax.lax.dot_general(
            cf, gcn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # [CHUNK, pix]
        q = q + gD * d_safe + gD2 * (d_safe * d_safe)
        qtot = jnp.zeros((1, pix), jnp.float32)
        for ci in range(C):
            qtot = qtot + gC_ref[0, ci] * colT_ref[0, ci]
        for ni in range(3):
            qtot = qtot + gF_ref[0, S + ni] * featT_ref[0, S + ni]
        qtot = qtot + gD * depT_ref[0, 0] + gD2 * depT_ref[0, 3]

        # distortion (backward.cu:372-380): b_k from totals; the last_dL_dT
        # chain X_{k+1} = SabT_k * inv(T_k u_k), SabT_k = TOT_abT - prefix,
        # folds into the same q/qtot pair. Statically gated on
        # compute_distortion to match the forward's zeroed dist/M1/M2
        # outputs — otherwise a (bogus) cotangent on the zero distortion
        # channel would emit b = gDist*m^2*A_fin gradients.
        if settings.compute_distortion:
            m = far / (far - near) * (1.0 - near / d_safe)
            A_fin = 1.0 - T_fin
            b = gDist * (M2_tot + m * m * A_fin - 2.0 * m * M1_tot)
            TOT_abT = gDist * (M2_tot * W_tot + A_fin * M2_tot
                               - 2.0 * M1_tot * M1_tot)
            q = q + b
            qtot = qtot + TOT_abT

        Pq = state_ref[1] + _prefix_sum(w * q, CHUNK)
        core = q - (qtot - Pq) * inv_Tu
        state_ref[1] = Pq[CHUNK - 1:CHUNK, :]

        # the T_fin path applies to every OK instance (T keeps decaying
        # past the 1e-4 floor in the forward), not only accepted ones
        u_ok = jnp.where(ok, u, 1.0)
        dL_da = jnp.where(accept, T_k * core, 0.0) \
            - gTfin * jnp.where(ok, T_fin / u_ok, 0.0)

        # ---- depth cotangent per instance -------------------------------
        pos1 = (slot - start + 1).astype(jnp.float32)      # [CHUNK, 1]
        med_hit = accept & (pos1 == med_pos)
        dL_dd = (w * (gD + 2.0 * d_safe * gD2)
                 + jnp.where(med_hit, gMed, 0.0))
        if settings.compute_distortion:
            dmd_dd = (far * near) / ((far - near) * d_safe * d_safe)
            dL_dmd = 2.0 * w * (m * A_fin - M1_tot) * gDist
            dL_dd = dL_dd + dL_dmd * dmd_dd

        # ---- chain alpha -> G/opa, rho, geometry ------------------------
        clamp_ok = alpha_raw < MAX_ALPHA
        dL_dG = jnp.where(clamp_ok, col(13) * dL_da, 0.0)
        dL_dopa_pix = jnp.where(clamp_ok, G * dL_da, 0.0)
        dL_drho = -0.5 * G * dL_dG

        # 3d branch: rho3d + exact depth npc*rp3. s1/s2/rp3 can be inf or
        # NaN on lanes with |p3| in the subnormal range (the reciprocal
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
        dL_ds1 = dr3 * 2.0 * s1g
        dL_ds2 = dr3 * 2.0 * s2g
        dp1 = dL_ds1 * rp3g
        dp2 = dL_ds2 * rp3g
        # depth = npc * rp3 routes dL_dd into p3 and (per instance) npc
        dp3 = (-(dL_ds1 * s1g + dL_ds2 * s2g) * rp3g
               - dd3 * (col(9) * rp3g) * rp3g)
        dnpc_pix = dd3 * rp3g

        # 2d branch: low-pass position + center-range depth
        u2 = accept & jnp.logical_not(use3d)
        drho2 = jnp.where(u2, dL_drho, 0.0)
        g_rc = jnp.where(u2, dL_dd, 0.0)

        # ---- per-instance reductions over the pixel (lane) axis ----------
        # Instead of reducing each [CHUNK, pix] gradient matrix, exploit
        # bilinearity: red(coef * (V x dp)) = V x red(coef * dp) for the
        # per-instance vectors V, so only the NINE basis reductions
        # R[coef][dp] (coef in {ca, ct, cg}) are needed — three MXU
        # matmuls with a 512-deep contraction — and the dL/dT assembly
        # happens per instance on the lane axis. The w-weighted channel
        # cotangent rows ride one more matmul, and the 2d-branch center
        # reductions factor the same way through dxp = cx - px.
        def pixred(lhs, rhs):
            return jax.lax.dot_general(
                lhs, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [CHUNK, nR]

        coefs = jnp.concatenate([ca, ct, cg], axis=0)      # [3, pix]
        R1 = pixred(dp1, coefs)                            # [CHUNK, 3]
        R2 = pixred(dp2, coefs)
        R3 = pixred(dp3, coefs)
        cen_rhs = jnp.concatenate(
            [jnp.ones((1, pix), jnp.float32), px, py], axis=0)
        Cc = pixred(drho2, cen_rhs)                        # [CHUNK, 3]
        gall = jnp.concatenate(
            [gC_ref[0, ci] for ci in range(C)]
            + [gF_ref[0, si] for si in range(S + 3)], axis=0)   # [C+S+3, pix]
        Wg = pixred(w, gall)                               # [CHUNK, C+S+3]

        def sumrow(x):
            return jnp.sum(x, axis=1, keepdims=True)       # [CHUNK, 1]

        scalars = jnp.concatenate(
            [sumrow(g_rc), sumrow(dnpc_pix), sumrow(dL_dopa_pix)], axis=1)

        red_mat = jnp.concatenate([R1, R2, R3, Cc, Wg, scalars],
                                  axis=1).T                # [nR, CHUNK]

        def rr(k):
            return red_mat[k:k + 1, :]                     # [1, CHUNK]

        # R[coef] as per-instance lane 3-vectors over (dp1, dp2, dp3)
        R_ca = (rr(0), rr(3), rr(6))
        R_ct = (rr(1), rr(4), rr(7))
        R_cg = (rr(2), rr(5), rr(8))
        CcI, CcX, CcY = rr(9), rr(10), rr(11)
        WG0 = 12                                           # Wg base index
        gri = rr(WG0 + C + S + 3)
        dnpc = rr(WG0 + C + S + 4)
        g_opa = rr(WG0 + C + S + 5)

        def cross3(x, y):
            return (x[1] * y[2] - x[2] * y[1],
                    x[2] * y[0] - x[0] * y[2],
                    x[0] * y[1] - x[1] * y[0])

        Tu_v = (Tux, Tuy, Tuz)
        Tv_v = (Tvx, Tvy, Tvz)
        Tw_v = (Twx, Twy, Twz)
        # red(gTu) = Tv x R_ca + Tw x R_ct etc (the linear-form VJP
        # gTu = ca*(Tv x dp) + ct*(Tw x dp), gTv = ca*(dp x Tu)
        # - cg*(Tw x dp), gTw = ct*(dp x Tu) + cg*(Tv x dp), reduced)
        A1 = cross3(Tv_v, R_ca)
        A2 = cross3(Tw_v, R_ct)
        B1 = cross3(R_ca, Tu_v)
        B2 = cross3(Tw_v, R_cg)
        C1 = cross3(R_ct, Tu_v)
        C2 = cross3(Tv_v, R_cg)
        rgTu = tuple(A1[i_] + A2[i_] for i_ in range(3))
        rgTv = tuple(B1[i_] - B2[i_] for i_ in range(3))
        rgTw = tuple(C1[i_] + C2[i_] for i_ in range(3))

        # 2d-branch center-pixel reductions: red(drho2 * 2F * (cx - px))
        gxi = 2.0 * FILTER_INV_SQUARE * (cx_l * CcI - CcX)
        gyi = 2.0 * FILTER_INV_SQUARE * (cy_l * CcI - CcY)

        # chain the (reduced) center pixel/range gradients into the p_cam
        # T-columns through the spherical Jacobian — the reference does
        # the identical fold before its preprocess backward reads dL_dT
        # (backward.cu:578-595 for dL_dmean2D, :505-508 for the 2d-branch
        # depth term dL_dr * p_cam / r). Guarded like center_from_pcam:
        # degenerate lanes (center at the camera origin) are depth-culled,
        # so their gcx/gcy/g_rc are zero and only need finite factors.
        u_p, v_p, w_p = Tuz, Tvz, Twz
        degen = (u_p * u_p + w_p * w_p) < 1e-20
        u_s = jnp.where(degen, 0.0, u_p)
        w_s = jnp.where(degen, 1.0, w_p)
        ruw2 = u_s * u_s + w_s * w_s
        ruw = jnp.sqrt(ruw2)
        r2q = ruw2 + v_p * v_p                             # = r^2
        inv_ruw2 = 1.0 / ruw2
        inv_rq = 1.0 / (ruw * r2q)
        inv_r = 1.0 / jnp.sqrt(u_p * u_p + v_p * v_p + w_p * w_p + 1e-24)
        kx = jnp.float32(W) / (params_ref[5] - params_ref[4])
        ky = jnp.float32(H) / (params_ref[3] - params_ref[2])
        gU_c = (gxi * (kx * w_s * inv_ruw2)
                - gyi * (ky * u_s * v_p * inv_rq) + gri * (u_p * inv_r))
        gV_c = gyi * (ky * ruw / r2q) + gri * (v_p * inv_r)
        gW_c = (-gxi * (kx * u_s * inv_ruw2)
                - gyi * (ky * v_p * w_s * inv_rq) + gri * (w_p * inv_r))

        # depth = npc * rp3 chain, per instance: npc = det(u_cam, v_cam,
        # p_cam), so dnpc routes v_cam x p_cam -> u_cam, p_cam x u_cam ->
        # v_cam and (c1, c2, c3) -> p_cam
        u_cam = (Tux, Tvx, Twx)
        v_cam = (Tuy, Tvy, Twy)
        p_cam = (Tuz, Tvz, Twz)
        vxp = cross3(v_cam, p_cam)
        pxu = cross3(p_cam, u_cam)

        # chain the (reduced) normal cotangents through the flip-signed
        # normalize(u_cam x v_cam) recompute into the T columns. The
        # reference routes dL_dnormal separately into R via the world2cam
        # transpose (compute_transmat_aabb, backward.cu:600-608) — the
        # two routes are the same function of (quat, scales), so model
        # gradients agree; the T-tap's p_cam ROW (the only row densify
        # stats read) stays untouched either way.
        gN1 = rr(WG0 + C + S + 0)
        gN2 = rr(WG0 + C + S + 1)
        gN3 = rr(WG0 + C + S + 2)
        gdot = n1 * gN1 + n2 * gN2 + n3 * gN3
        h_s = nsign * inv_n
        h = (h_s * (gN1 - n1 * gdot), h_s * (gN2 - n2 * gdot),
             h_s * (gN3 - n3 * gdot))
        gu = cross3(v_cam, h)          # dL/du_cam -> packed rows (0, 3, 6)
        gv = cross3(h, u_cam)          # dL/dv_cam -> packed rows (1, 4, 7)

        rows = [rgTu[0] + gu[0] + dnpc * vxp[0],
                rgTu[1] + gv[0] + dnpc * pxu[0],
                rgTu[2] + gU_c + dnpc * c1,
                rgTv[0] + gu[1] + dnpc * vxp[1],
                rgTv[1] + gv[1] + dnpc * pxu[1],
                rgTv[2] + gV_c + dnpc * c2,
                rgTw[0] + gu[2] + dnpc * vxp[2],
                rgTw[1] + gv[2] + dnpc * pxu[2],
                rgTw[2] + gW_c + dnpc * c3]
        rows.append(g_opa)
        for ci in range(C + S):
            rows.append(rr(WG0 + ci))
        if len(rows) < D_PAD:
            rows.append(jnp.zeros((D_PAD - len(rows), CHUNK), jnp.float32))
        grad_ref[0] = grad_ref[0] + jnp.concatenate(rows, axis=0)

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
    NSB = 2
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
            pl.BlockSpec((1, data.shape[1], CHUNK), in_row),
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
            dimension_semantics=("arbitrary",),
            # raised from the 16 MB default like the forward: the bwd's
            # doubled per-pair-pixel intermediates hit the scoped-vmem
            # stack limit at 1024-px tiles (ROOFLINE.md)
            vmem_limit_bytes=64 * 1024 * 1024),
    )(chunk_tile, step_starts, tile_starts, row0, first_touch, done,
      data, params, gC, gF, gD4, colT, featT, depT, misc8)
    return grad
