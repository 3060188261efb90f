#!/usr/bin/env python
"""Measure instance-count savings of tighter (output-preserving) rects.

Variants, all intersected with the reference square rect so coverage can
only shrink, and all based on the rho_eps = 2*ln(255*op) ellipse (pixels
outside it fail the kernel's alpha >= 1/255 mask, so culling them cannot
change any composited output):

  A. per-axis rect: [cx +- rx_eps] x [cy +- ry_eps]
  B. per-row tight: per grid-row x-ranges of the eps ellipse polygon

The rho2d low-pass branch keeps pixels within sqrt(rho_eps/2) of the
center alive regardless of the 3D ellipse; both variants union that disk.

    python scripts/measure_tight_rects.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings
    from gslidar_tpu.raster.preprocess import preprocess

    sf = 0.1
    # tight_rects=False: the script's "current" column is the REFERENCE
    # square rect (the tight variants are measured against it below;
    # since round 4 the per-axis variant is the production default)
    settings = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                              hfov=(-180, 180), num_extra_features=4,
                              pair_cap=17664 * 128, tile_h=16, tile_w=32,
                              wrap_x=True, tight_rects=False)
    sc = build_scene()
    vm = jnp.eye(4, dtype=jnp.float32)

    prep = jax.jit(lambda s: preprocess(
        s["means3D"], s["scales"], s["rotations"], s["opacity"], s["shs"],
        s["mask"], vm, jnp.zeros(3), 3, sf, settings))(sc)

    H, W = settings.height, settings.width
    gx, gy = settings.tiles_x, settings.tiles_y
    tw, th = settings.tile_w, settings.tile_h
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = settings.angle_bounds

    @jax.jit
    def tight(prepT, opacity, valid, rect_min, rect_max, cxy):
        N = 64   # dense sampling: measures the IDEAL tight bound
        rho_eps = jnp.maximum(2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-30)),
                              1e-6)
        cut = jnp.sqrt(rho_eps)
        ang = 2.0 * jnp.pi * jnp.arange(N) / N
        sa, ca = jnp.sin(ang), jnp.cos(ang)
        p_cam = prepT[:, 2, :]
        sample = (cut[:, None, None] * (sa[None, :, None] * prepT[:, None, 0, :]
                                        + ca[None, :, None] * prepT[:, None, 1, :])
                  + p_cam[:, None, :])
        s_deg = (sample[..., 0] ** 2 + sample[..., 2] ** 2) < 1e-20
        s_x = jnp.where(s_deg, 0.0, sample[..., 0])
        s_z = jnp.where(s_deg, 1.0, sample[..., 2])
        s_phi = jnp.arctan2(s_x, s_z)
        x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
        deg = (x * x + z * z) < 1e-20
        phi = jnp.arctan2(jnp.where(deg, 0.0, x), jnp.where(deg, 1.0, z))
        dphi = s_phi - phi[:, None]
        dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
        s_phi = phi[:, None] + dphi
        s_theta = jnp.arctan2(jnp.sqrt(s_x * s_x + s_z * s_z), -sample[..., 1])
        sx = (s_phi - HFOV_min) * W / (HFOV_max - HFOV_min)
        sy = (s_theta - VFOV_min) * H / (VFOV_max - VFOV_min)
        cx, cy = cxy[:, 0], cxy[:, 1]
        disk = jnp.sqrt(rho_eps / 2.0)

        # reference square rect (current behaviour), as row/col spans
        rx0, ry0 = rect_min[:, 0], rect_min[:, 1]
        rx1, ry1 = rect_max[:, 0], rect_max[:, 1]     # x exclusive-modular, y exclusive
        ref_w = rx1 - rx0                              # modular width
        ref_h = ry1 - ry0
        K_now = jnp.sum(jnp.where(valid, ref_w * ref_h, 0))

        # ---- variant A: per-axis ----
        ex_min = jnp.minimum(jnp.min(sx, 1), cx - disk)
        ex_max = jnp.maximum(jnp.max(sx, 1), cx + disk)
        ey_min = jnp.minimum(jnp.min(sy, 1), cy - disk)
        ey_max = jnp.maximum(jnp.max(sy, 1), cy + disk)
        ax_w = jnp.clip((jnp.floor(ex_max / tw) - jnp.floor(ex_min / tw) + 1
                         ).astype(jnp.int32), 0, gx)
        ay0 = jnp.clip(jnp.floor(ey_min / th).astype(jnp.int32), 0, gy)
        ay1 = jnp.clip((jnp.floor(ey_max / th) + 1).astype(jnp.int32), 0, gy)
        a_w = jnp.minimum(ax_w, ref_w)
        a_h = jnp.minimum(jnp.maximum(ay1 - ay0, 0), ref_h)
        K_axis = jnp.sum(jnp.where(valid, a_w * a_h, 0))

        # ---- variant B: per-row (x-range of the polygon within each band,
        # via edge sampling: consecutive pairs define edges; a band's range
        # covers vertices in band and edge/band crossings — approximate
        # with dense N so edges are short) ----
        # per sample, its band row (unclamped); per gaussian row r: min/max
        # sx over samples whose sy lies in [r*th, (r+1)*th) (plus neighbor
        # sample to cover the crossing edge)
        rows = jnp.arange(gy)
        band_lo = rows[None, None, :] * th
        band_hi = band_lo + th
        sy_e = sy[:, :, None]
        sx_e = sx[:, :, None]
        sy_nxt = jnp.roll(sy, -1, axis=1)[:, :, None]
        sx_nxt = jnp.roll(sx, -1, axis=1)[:, :, None]
        # edge from s to next: does it overlap band?
        elo = jnp.minimum(sy_e, sy_nxt)
        ehi = jnp.maximum(sy_e, sy_nxt)
        in_band = (ehi >= band_lo) & (elo < band_hi)      # [P, N, gy]
        exlo = jnp.minimum(sx_e, sx_nxt)
        exhi = jnp.maximum(sx_e, sx_nxt)
        big = 1e9
        bx_min = jnp.min(jnp.where(in_band, exlo, big), axis=1)   # [P, gy]
        bx_max = jnp.max(jnp.where(in_band, exhi, -big), axis=1)
        # interior bands fully inside the polygon vertically: if the band is
        # between the polygon's y-extent but no edge crosses it... cannot
        # happen for a closed curve (left & right boundary cross every band
        # the region overlaps). Union the center disk band.
        dlo, dhi = cy - disk, cy + disk
        d_in = (dhi[:, None] >= band_lo[0]) & (dlo[:, None] < band_hi[0])
        bx_min = jnp.where(d_in, jnp.minimum(bx_min, (cx - disk)[:, None]), bx_min)
        bx_max = jnp.where(d_in, jnp.maximum(bx_max, (cx + disk)[:, None]), bx_max)
        has = bx_max > -big
        b_w = jnp.where(
            has,
            jnp.clip((jnp.floor(bx_max / tw) - jnp.floor(bx_min / tw) + 1
                      ).astype(jnp.int32), 0, gx), 0)
        b_w = jnp.minimum(b_w, ref_w[:, None])
        # clip rows to the reference rect rows
        row_ok = (rows[None, :] >= ay0[:, None]) & (rows[None, :] < ay1[:, None])
        row_ok = row_ok & (rows[None, :] >= ry0[:, None]) & (rows[None, :] < ry1[:, None])
        K_row = jnp.sum(jnp.where(valid[:, None] & row_ok, b_w, 0))
        return K_now, K_axis, K_row

    # subsample: the ratio is statistical; [P, N, gy] at 1M is too big
    sub = slice(0, 200_000)
    K_now, K_axis, K_row = tight(prep.T[sub], sc["opacity"][sub],
                                 prep.valid[sub], prep.rect_min[sub],
                                 prep.rect_max[sub], prep.xy[sub])
    K_now, K_axis, K_row = int(K_now), int(K_axis), int(K_row)
    print(f"K current (square rect):      {K_now:>10,}")
    print(f"K per-axis eps-rect:          {K_axis:>10,}  ({K_axis / K_now:.3f}x)")
    print(f"K per-row  eps-ranges (ideal):{K_row:>10,}  ({K_row / K_now:.3f}x)")


if __name__ == "__main__":
    main()
