"""Dense (untiled) oracle renderer for parity testing.

Brute-force evaluation of every gaussian against every pixel with the same
math as the tiled path, in depth order, replicating the reference's
pure-torch sanity renderer (scripts/compare_2dgs_3dgs.py:152-263) extended
to the full training-feature set. The candidate set per pixel is masked by
the same tile-rect rule the binned renderer uses, so on scenes that fit the
caps the two must agree to float tolerance — this is the primary test
fixture (SURVEY.md §4 calls it the parity oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslidar_tpu.raster.preprocess import preprocess
from gslidar_tpu.raster.settings import (ALPHA_EPS, FAR_N, FILTER_INV_SQUARE,
                                         MAX_ALPHA, NEAR_N, RasterSettings,
                                         T_STOP)


def rasterize_dense(means3D, scales, rotations, opacity, shs, features, mask,
                    viewmat, campos, bg, sh_degree, scale_factor,
                    settings: RasterSettings, colors_precomp=None,
                    respect_tile_rect=True):
    """Render by evaluating all P gaussians on all H*W pixels at once."""
    prep = preprocess(means3D, scales, rotations, opacity, shs, mask,
                      viewmat, campos, sh_degree, scale_factor, settings,
                      1.0, colors_precomp)
    H, W = settings.height, settings.width
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = settings.angle_bounds
    near, far = NEAR_N * scale_factor, FAR_N * scale_factor
    P = means3D.shape[0]
    npix = H * W

    # depth sort all gaussians (invalid last). In parity mode
    # (respect_tile_rect) replicate the binned path's QUANTIZED depth
    # order: equal-bucket instances keep gaussian-index order there
    # (stable sort over gaussian-major slots), which argsort's stable
    # tie-breaking reproduces exactly.
    if respect_tile_rect:
        dq_max = (1 << settings.depth_bits) - 1
        dnorm = jnp.clip((prep.depth - near)
                         / jnp.maximum(far - near, 1e-12), 0.0, 1.0)
        dq = jnp.minimum((dnorm * float(dq_max)).astype(jnp.int32), dq_max)
        order = jnp.argsort(jnp.where(prep.valid, dq, jnp.iinfo(jnp.int32).max))
    else:
        order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    T = prep.T[order]
    xy = prep.xy[order]
    r_center = prep.depth[order]
    col = prep.color[order]
    nrm = prep.normal[order]
    opa = opacity[order]
    fea = features[order]
    valid = prep.valid[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    px = xx.reshape(-1)
    py = yy.reshape(-1)
    phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
    theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    tile_of_pix_x = (px // settings.tile_w).astype(jnp.int32)
    tile_of_pix_y = (py // settings.tile_h).astype(jnp.int32)

    Tcols = T.transpose(0, 2, 1)  # [P, col(x,y,z), row(u,v,p)]

    def alpha_of(g):
        Tc = Tcols[g]
        Tu, Tv, Tw = Tc[0], Tc[1], Tc[2]   # component triples (x, y, z)
        kx = cp * Tu[0] - sp * Tw[0]
        ky = cp * Tu[1] - sp * Tw[1]
        kz = cp * Tu[2] - sp * Tw[2]
        lx = sp * ct * Tu[0] + st * Tv[0] + cp * ct * Tw[0]
        ly = sp * ct * Tu[1] + st * Tv[1] + cp * ct * Tw[1]
        lz = sp * ct * Tu[2] + st * Tv[2] + cp * ct * Tw[2]
        p1 = ky * lz - kz * ly
        p2 = kz * lx - kx * lz
        p3 = kx * ly - ky * lx
        ok3 = p3 != 0
        p3s = jnp.where(ok3, p3, 1.0)
        s1, s2 = p1 / p3s, p2 / p3s
        rho3d = s1 * s1 + s2 * s2
        dx = xy[g, 0] - px
        if settings.wrap_x:
            # circular panorama: 2D pixel distance wraps at the phi seam
            # (same rule as composite.py / pallas_fwd.py)
            dx = jnp.mod(dx + W / 2.0, float(W)) - W / 2.0
        dy = xy[g, 1] - py
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        sTu = s1 * Tu[0] + s2 * Tu[1] + Tu[2]
        sTv = s1 * Tv[0] + s2 * Tv[1] + Tv[2]
        sTw = s1 * Tw[0] + s2 * Tw[1] + Tw[2]
        depth3d = sTu * st * sp - sTv * ct + sTw * st * cp
        depth = jnp.where(use3d, depth3d, r_center[g])
        alpha = jnp.minimum(MAX_ALPHA, opa[g] * jnp.exp(-0.5 * rho))
        ok = valid[g] & ok3 & (depth >= near) & (depth <= far) & (alpha >= ALPHA_EPS)
        if respect_tile_rect:
            if settings.wrap_x:
                # circular rect: covered columns are the modular run
                # rect_min_x .. rect_min_x + width - 1 (binning.py)
                gx = settings.tiles_x
                wt = rect_max[g, 0] - rect_min[g, 0]
                in_x = jnp.mod(tile_of_pix_x - rect_min[g, 0], gx) < wt
            else:
                in_x = ((tile_of_pix_x >= rect_min[g, 0])
                        & (tile_of_pix_x < rect_max[g, 0]))
            in_rect = (in_x
                       & (tile_of_pix_y >= rect_min[g, 1])
                       & (tile_of_pix_y < rect_max[g, 1]))
            ok = ok & in_rect
        return jnp.where(ok, alpha, 0.0), jnp.where(ok, depth, far), ok

    def step(carry, g):
        (T_run, C_acc, F_acc, D, D2, dist, M1, M2, med_d, med_pos, ncon) = carry
        a, depth, ok = alpha_of(g)
        test_T = T_run * (1 - a)
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_run, 0.0)
        C_acc = C_acc + w[None, :] * col[g][:, None]
        fn = jnp.concatenate([fea[g], nrm[g]])
        w_mix = jnp.concatenate([
            jnp.broadcast_to(jax.lax.stop_gradient(w)[None],
                             (fea.shape[1], w.shape[0])),
            jnp.broadcast_to(w[None], (3, w.shape[0]))])
        F_acc = F_acc + w_mix * fn[:, None]
        D = D + depth * w
        D2 = D2 + depth * depth * w
        m = far / (far - near) * (1 - near / depth)
        dist = dist + (m * m * (1 - T_run) + M2 - 2 * m * M1) * w
        M1 = M1 + m * w
        M2 = M2 + m * m * w
        med_mask = accept & (T_run > 0.5)
        med_d = jnp.where(med_mask, depth, med_d)
        med_pos = jnp.where(med_mask, g.astype(dt) + 1, med_pos)
        ncon = jnp.where(accept, g.astype(dt) + 1, ncon)
        # T decays for every passing instance (same rule as composite.py)
        T_run = T_run * (1 - a)
        return (T_run, C_acc, F_acc, D, D2, dist, M1, M2, med_d, med_pos, ncon), None

    C = col.shape[-1]
    S = fea.shape[-1]
    dt = T.dtype
    z = jnp.zeros(npix, dt)
    init = (jnp.ones(npix, dt), jnp.zeros((C, npix), dt),
            jnp.zeros((S + 3, npix), dt), z, z, z, z, z, z, z, z)
    (T_fin, C_acc, F_acc, D, D2, dist, _M1, _M2, med_d, med_pos, ncon), _ = \
        jax.lax.scan(step, init, jnp.arange(P))

    C_out = (C_acc + T_fin[None] * bg[:, None]).reshape(C, H, W)
    return {
        "color": C_out,
        "feature": F_acc.reshape(S + 3, H, W),
        "depth": jnp.stack([D, med_d, dist, D2]).reshape(4, H, W),
        "alpha": (1 - T_fin).reshape(1, H, W),
        "final_T": T_fin.reshape(1, H, W),
        "radii": prep.radius,
    }
