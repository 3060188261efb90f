"""Pallas TPU forward compositing kernel (loop-free formulation).

Replaces the XLA scan compositor (composite.py) on the hot path. Design
constraints discovered on this TPU stack: in-kernel ``lax.fori_loop`` /
``while_loop`` make the Mosaic compiler pathologically slow, and dynamic
lane indexing is unsupported — so the kernel contains NO loops at all:

* the grid is ONE dimension over the COMPACTED global chunk list: tile
  t's sorted instance range [start_t, end_t) is covered by the data rows
  floor(start_t/CHUNK) .. ceil(end_t/CHUNK)-1 read UNALIGNED (instances
  outside the range are masked off; a boundary row shared by two tiles is
  simply read twice). Scalar-prefetched arrays map grid step -> (tile,
  data row). Unlike a (tiles, max_chunks) grid there are no wasted steps
  for short tiles and NO per-tile list cap — every instance that
  survives ``pair_cap`` is composited, exactly like the CUDA kernel
  (rasterizer_impl.cu:308-354 sizes exactly);
* per-tile compositing state (transmittance, channel accumulators,
  distortion moments, median bookkeeping) lives in VMEM scratch that
  persists across grid steps; it is reset on the tile's first step and
  flushed to the output blocks on its last;
* within a chunk the CUDA per-instance walk (forward.cu:392-484) is
  vectorized: for the [CHUNK, pix] intersection math instances live on
  the SUBLANE axis and pixels on lanes, and the front-to-back
  transmittance is an inclusive prefix-product computed with log2(CHUNK)
  masked sublane rolls — the alpha-compositing recurrence is
  associative, so this is exact, not an approximation. Per-INSTANCE
  derivations (cross products, polynomial atan2, normal) run with
  instances on the LANE axis ([1, CHUNK] rows = 1 vreg/op instead of a
  [CHUNK, 1] column's 16) and only the ~14 pixel-consumed values cross
  layouts, in one [16, CHUNK] transpose; the blended channels never
  do — they feed a single [F, CHUNK] @ [CHUNK, pix] MXU matmul that
  replaces all per-channel broadcast-multiply + sublane-reduce pairs;
* chunks whose tile is already opaque (all pixels below the 1e-4
  transmittance floor, forward.cu:441-446) skip all compute behind a
  single predicate — the early-out the CUDA kernel gets from
  __syncthreads_count.

Data layout: one post-sort row gather lands the per-gaussian payload in
instance order (binning.py), and the chunk table is one streaming
transpose [K, D] -> [K/CHUNK, D_PAD, CHUNK] (fields on sublanes,
instances on lanes) so a block fetch is aligned rows with no in-kernel
transposes. The payload is slim: the splat center's pixel coordinates
and range are recomputed per instance from the p_cam triple in the T
columns (see PAYLOAD_BASE), not gathered.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslidar_tpu.raster.binning import Binning, data_chunks
from gslidar_tpu.raster.settings import (ALPHA_EPS, FAR_N, FILTER_INV_SQUARE,
                                         MAX_ALPHA, NEAR_N, RasterSettings,
                                         T_STOP)

# Instances per grid step (lane-width multiples). Default 256: halving
# the grid-step count beats 128 on the bench (18.5 vs 17.3 renders/s
# measured round 4 — the per-step fixed cost is a real slice of the
# kernel wall time) at the price of 2x the live [CHUNK, pix]
# intermediates in VMEM (~5 MB at 512-pixel tiles, well under budget).
# GSLIDAR_CHUNK stays an env A/B knob, read once at import; pair_cap
# must be a CHUNK multiple on the pallas backend (data_chunks asserts).
CHUNK = int(os.environ.get("GSLIDAR_CHUNK", "256"))
assert CHUNK >= 128 and CHUNK % 128 == 0 and (CHUNK & (CHUNK - 1)) == 0
D_PAD = 24           # padded field count (D = 13 + C + S; pads to the f32
                     # sublane granule; 21 -> 24 for C=4, S=4)

# field indices in the packed row (see pack_payload). The splat center's
# pixel coordinates/range AND the camera-facing normal are NOT stored:
# every compositor recomputes them from the T columns — the center from
# the p_cam triple (rows 2/5/8, two atan2 + one rsqrt per INSTANCE) and
# the normal as flip-signed normalize(u_cam x v_cam) (9 mul + rsqrt per
# instance), all amortized over the tile's pixels — which deletes six
# K-row gather columns from binning (engine price ~0.45 ms per f32
# column per M rows, see binning.py's cost model) and five net columns
# of ICI traffic from the gaussian-sharded exchange.
PAYLOAD_BASE = 10    # 9 T + 1 opacity
_F_OPA = 9
_F_COL = 10          # 10..10+C colors, then S features


def pack_payload(prep, opacity, features):
    """[P, 10 + C + S] per-gaussian payload rows for the binning sort.

    Columns of T are component triples (forward.cu:385-387)."""
    Tcols = prep.T.transpose(0, 2, 1).reshape(-1, 9)
    return jnp.concatenate([
        Tcols, opacity[:, None], prep.color, features], axis=1)


def pack_rows(payload_f32, settings: RasterSettings):
    """Physical payload table from the logical f32 rows.

    payload_bf16 prod mode: the 9 conic-side T columns stay f32
    (bitcast to int32 so EVERY downstream move — gather, reshape,
    transpose — runs in the integer domain, where bit patterns are
    guaranteed; f32-typed moves of non-float bit patterns were measured
    flushing denormals on this chip, see binning.py) and the 1 + C + S
    blend-side columns (opacity, colors, extra features) are packed as
    bf16 PAIRS, two per int32 word. This trims the post-sort K-row
    gather and the chunk-table transpose — the only binning costs that
    scale with width. Blend values quantize to bf16 (~0.4 % relative);
    parity tests keep the f32 mode, prod/bench opt in."""
    if not settings.payload_bf16:
        return payload_f32
    T_i = jax.lax.bitcast_convert_type(payload_f32[:, :9], jnp.int32)
    b16 = payload_f32[:, 9:].astype(jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(b16, jnp.uint16).astype(jnp.uint32)
    if u.shape[1] % 2:
        u = jnp.pad(u, ((0, 0), (0, 1)))
    words = u[:, 0::2] | (u[:, 1::2] << jnp.uint32(16))
    return jnp.concatenate(
        [T_i, jax.lax.bitcast_convert_type(words, jnp.int32)], axis=1)


def payload_width(C: int, S: int, settings: RasterSettings) -> int:
    nb = 1 + C + S
    return 9 + (nb + 1) // 2 if settings.payload_bf16 else 10 + C + S


def d_pad_for(C: int, S: int, settings: RasterSettings) -> int:
    """Padded chunk-table field count (f32 sublane granule of 8)."""
    return -(-payload_width(C, S, settings) // 8) * 8


def decode_payload(data, C: int, S: int, settings: RasterSettings):
    """Kernel-side payload view: (rowT(f) -> [1, CHUNK] f32 T column f,
    blend list [opacity, colors..., features...] of [1, CHUNK] f32 rows).
    Shared by the forward and backward kernels so their alpha /
    transmittance reconstruction stays bitwise-identical in both payload
    modes."""
    if not settings.payload_bf16:
        def rowT(f):
            return data[f:f + 1, :]
        blend = [data[_F_OPA:_F_OPA + 1, :]] + [
            data[_F_COL + i:_F_COL + i + 1, :] for i in range(C + S)]
        return rowT, blend

    def rowT(f):
        return pltpu.bitcast(data[f:f + 1, :], jnp.float32)

    blend = []
    for j in range((1 + C + S + 1) // 2):
        u = pltpu.bitcast(data[9 + j:10 + j, :], jnp.uint32)
        blend.append(pltpu.bitcast(
            (u & jnp.uint32(0xffff)) << jnp.uint32(16), jnp.float32))
        blend.append(pltpu.bitcast(u & jnp.uint32(0xffff0000), jnp.float32))
    return rowT, blend[:1 + C + S]


_PI = 3.14159265358979323846


def _atan(x):
    """Cephes atanf: two-stage range reduction + degree-4 minimax in z=t^2
    (~1 ulp f32). Mosaic has no atan/atan2 lowering, so the kernels carry
    their own; branchless selects replace the Cephes branches."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095     # tan(3pi/8)
    mid = ax > 0.4142135623730950    # tan(pi/8)
    safe = jnp.where(big, ax, 1.0)
    t = jnp.where(big, -1.0 / safe,
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    off = jnp.where(big, 0.5 * _PI, jnp.where(mid, 0.25 * _PI, 0.0))
    z = t * t
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1)
    r = off + t + t * z * p
    return jnp.where(x < 0, -r, r)


def _atan2(y, x):
    """atan2 from _atan with quadrant fixup. Callers guard the (0, 0)
    pole (the center-projection degen guard routes it to atan2(0, 1))."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = _atan(y / safe_x)
    at_pi = jnp.where(y < 0, -_PI, _PI)
    on_axis = jnp.where(y > 0, 0.5 * _PI,
                        jnp.where(y < 0, -0.5 * _PI, 0.0))
    return jnp.where(x > 0, base,
                     jnp.where(x < 0, base + at_pi, on_axis))


def normal_from_T(Tux, Tuy, Tuz, Tvx, Tvy, Tvz, Twx, Twy, Twz):
    """Camera-facing splat normal from the T columns: flip-signed
    normalize(u_cam x v_cam) with u_cam = (Tux, Tvx, Twx), v_cam =
    (Tuy, Tvy, Twy). Equals build_transmat's normal (Rw2c R[:,2] with the
    dual-visible flip, forward.cu:108-112) because scales are positive
    and rotations orthonormal; fp differences are transcendental-ulp.
    Returns (n1, n2, n3, c1, c2, c3, inv_n, sign) — the raw cross, its
    inverse norm, and the flip sign feed the backward chain. The 1e-30
    guard only engages for |u x v| below any physical splat area."""
    c1 = Tvx * Twy - Twx * Tvy
    c2 = Twx * Tuy - Tux * Twy
    c3 = Tux * Tvy - Tvx * Tuy
    dot = c1 * Tuz + c2 * Tvz + c3 * Twz
    sign = jnp.where(dot < 0, 1.0, -1.0)
    inv_n = jax.lax.rsqrt(c1 * c1 + c2 * c2 + c3 * c3 + 1e-30)
    si = sign * inv_n
    return c1 * si, c2 * si, c3 * si, c1, c2, c3, inv_n, sign


def center_from_pcam(u, v, w, params_ref, H, W):
    """(cx, cy, r_c) of the splat centers from the p_cam triple (the
    T-column rows 2/5/8), matching preprocess.center_projection's guarded
    formulas. Shared by the forward and backward kernels so the backward's
    alpha/T reconstruction stays bitwise-identical."""
    degen = (u * u + w * w) < 1e-20
    u_s = jnp.where(degen, 0.0, u)
    w_s = jnp.where(degen, 1.0, w)
    phi = _atan2(u_s, w_s)
    theta = _atan2(jnp.sqrt(u_s * u_s + w_s * w_s), -v)
    r_c = jnp.sqrt(u * u + v * v + w * w + 1e-24)
    VFOV_min, VFOV_max = params_ref[2], params_ref[3]
    HFOV_min, HFOV_max = params_ref[4], params_ref[5]
    cx = (phi - HFOV_min) * W / (HFOV_max - HFOV_min)
    cy = (theta - VFOV_min) * H / (VFOV_max - VFOV_min)
    return cx, cy, r_c


def _prefix_mul(x, n):
    """Inclusive prefix product along the sublane (instance) axis."""
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = 1
    while sh < n:
        rolled = pltpu.roll(x, sh, 0)
        x = x * jnp.where(sub >= sh, rolled, 1.0)
        sh *= 2
    return x


def _excl_of(incl, iota_s):
    """Exclusive prefix from an inclusive one: one sublane roll + select
    (replaces the old ``incl / one_m`` divide; the forward and backward
    kernels share this so their transmittance reconstruction stays
    bitwise-identical)."""
    return jnp.where(iota_s >= 1, pltpu.roll(incl, 1, 0), 1.0)


def _prefix_sum(x, n):
    """Inclusive prefix sum along the sublane (instance) axis."""
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = 1
    while sh < n:
        rolled = pltpu.roll(x, sh, 0)
        x = x + jnp.where(sub >= sh, rolled, 0.0)
        sh *= 2
    return x


def step_layout(tile_starts: jnp.ndarray, K: int, n_tiles: int):
    """Compacted grid bookkeeping (all int32, static shapes).

    Returns (chunk_tile [n_steps_cap], step_starts [n_tiles + 1],
    row0 [n_tiles + 1]) where n_steps_cap = K // CHUNK + n_tiles. Every
    tile gets >= 1 step (so its output block is always written); tail
    steps carry tile id n_tiles.
    """
    starts = tile_starts[:-1]
    ends = tile_starts[1:]
    row0 = starts // CHUNK
    last_row = jnp.maximum((ends - 1) // CHUNK, row0)   # >= row0 when empty
    n_steps = jnp.where(ends > starts, last_row - row0 + 1, 1)
    step_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_steps).astype(jnp.int32)])
    n_steps_cap = K // CHUNK + n_tiles
    sidx = jnp.arange(n_steps_cap, dtype=jnp.int32)
    # tile of step i: #{t : step_starts[t+1] <= i} (compare-sum)
    chunk_tile = jnp.sum(step_starts[1:][None, :] <= sidx[:, None],
                         axis=1).astype(jnp.int32)
    row0 = jnp.concatenate([row0, jnp.zeros(1, jnp.int32)])
    return chunk_tile, step_starts, row0


def _kernel(chunk_tile_ref, step_starts_ref, tile_starts_ref, row0_ref,
            chunk_ref,                      # VMEM block [1, D_PAD, CHUNK]
            params_ref,                     # SMEM [8]
            color_ref, feat_ref, depth_ref, misc_ref,   # out blocks
            state_ref,                      # VMEM scratch [NSC, 1, pix]
            flags_ref,                      # SMEM scratch [2] int32
            *, settings: RasterSettings, C: int, S: int, n_tiles: int):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    valid_step = t < n_tiles
    ts = jnp.minimum(t, n_tiles - 1)
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    NSC = 11 + C + S + 3

    near = params_ref[0]
    far = params_ref[1]
    VFOV_min, VFOV_max = params_ref[2], params_ref[3]
    HFOV_min, HFOV_max = params_ref[4], params_ref[5]
    H, W = settings.height, settings.width

    c = i - step_starts_ref[ts]
    first = (c == 0) & valid_step
    last = (i == step_starts_ref[ts + 1] - 1) & valid_step
    start = tile_starts_ref[ts]
    end = tile_starts_ref[ts + 1]
    slot0 = (row0_ref[ts] + c) * CHUNK

    ty = ts // settings.tiles_x
    tx = jax.lax.rem(ts, settings.tiles_x)

    def pixel_rows():
        """[1, pix] pixel coordinate rows (pixels on lanes). Computed
        INSIDE the predicated blocks that need them: 80% of grid steps
        on dense scenes are skipped by the saturation flag (measured
        19.4% active at the bench shape) and must not pay per-pixel
        trig or any vector op at all."""
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        py = (ty * th + pix_i // tw).astype(jnp.float32)
        px = (tx * tw + jax.lax.rem(pix_i, tw)).astype(jnp.float32)
        return px, py, (px < W) & (py < H)

    @pl.when(first)
    def _():
        _, _, inside = pixel_rows()
        state_ref[0] = jnp.where(inside, 1.0, 0.0)       # T
        for i_ in range(1, NSC):
            state_ref[i_] = jnp.zeros((1, pix), jnp.float32)
        # flags: [0] any pixel still above T_STOP, [1] any above 0.5
        # (median bookkeeping). SMEM scalars so SKIPPED steps test a
        # scalar instead of max-reducing the T row every step.
        flags_ref[0] = 1
        flags_ref[1] = 1

    active = valid_step & (flags_ref[0] != 0) & (slot0 < end)

    @pl.when(active)
    def _():
        px, py, _ = pixel_rows()
        phi = px * (HFOV_max - HFOV_min) / W + HFOV_min
        theta = py * (VFOV_max - VFOV_min) / H + VFOV_min
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        T_carry = state_ref[0]
        state_ref[9] = state_ref[9] + 1.0                # chunks processed
        data = chunk_ref[0]                              # [D_PAD, CHUNK]
        rowl, blend = decode_payload(data, C, S, settings)

        # ---- per-instance math on the LANE axis --------------------------
        # A [1, CHUNK] row costs ONE vreg per op; the old [CHUNK, 1]
        # column layout cost 16 (127/128 lanes idle), which made the
        # ~130-op per-instance stage (crosses, polynomial atan2, normal)
        # a quarter of the kernel. Only the ~14 values the pixel axis
        # actually consumes are transposed, once, as a single block.
        Tux, Tuy, Tuz = rowl(0), rowl(1), rowl(2)
        Tvx, Tvy, Tvz = rowl(3), rowl(4), rowl(5)
        Twx, Twy, Twz = rowl(6), rowl(7), rowl(8)
        # center pixel/range recomputed from p_cam = (Tuz, Tvz, Twz) —
        # not payload columns (see PAYLOAD_BASE)
        cx_l, cy_l, r_c_l = center_from_pcam(Tuz, Tvz, Twz, params_ref, H, W)
        # circular-pano seam wrap of the center pixel, applied once PER
        # INSTANCE around the tile center instead of per pixel: the two
        # round() choices differ only when the true pixel distance is
        # within tile_w/2 of W/2, where rho2d >= 2*(W/2 - tile_w)^2 makes
        # alpha underflow 1/255 for any real pano width — the selected
        # contribution set is identical. params[6]/[7] = (W, 1/W) when
        # circular, else (0, 0) (round(0) == 0 makes it a no-op).
        tcx = (tx * tw).astype(jnp.float32) + 0.5 * (tw - 1)
        cx_l = cx_l - params_ref[6] * jnp.round((cx_l - tcx) * params_ref[7])
        # The CUDA per-pixel chain p = cross(k, l) with k = cp*Tu - sp*Tw,
        # l = sp*ct*Tu + st*Tv + cp*ct*Tw expands (cp^2 + sp^2 collapses)
        # to the exact linear form
        #   p = st*cp*(Tu x Tv) + ct*(Tu x Tw) - st*sp*(Tw x Tv)
        # whose three cross products are per-instance vectors.
        Ax = Tuy * Tvz - Tuz * Tvy
        Ay = Tuz * Tvx - Tux * Tvz
        Az = Tux * Tvy - Tuy * Tvx
        Bx = Tuy * Twz - Tuz * Twy
        By = Tuz * Twx - Tux * Twz
        Bz = Tux * Twy - Tuy * Twx
        Gx = Twy * Tvz - Twz * Tvy
        Gy = Twz * Tvx - Twx * Tvz
        Gz = Twx * Tvy - Twy * Tvx
        n1, n2, n3, c1, c2, c3, _inv_n, _sign = normal_from_T(
            Tux, Tuy, Tuz, Tvx, Tvy, Tvz, Twx, Twy, Twz)
        # depth of the ray-plane intersection x = depth * ray: dotting
        # x = s1*u_cam + s2*v_cam + p_cam with n = u_cam x v_cam gives
        # depth = (n . p_cam) / (n . ray), and n . ray == p3 exactly
        # (verified identity of the linear form) — so the CUDA depth
        # chain s^T T r (forward.cu:420-424) collapses to npc * rp3.
        npc_l = c1 * Tuz + c2 * Tvz + c3 * Twz
        inst_rows = jnp.concatenate(
            [Ax, Ay, Az, Bx, By, Bz, Gx, Gy, Gz,
             npc_l, cx_l, cy_l, r_c_l, blend[0],
             jnp.zeros((2, CHUNK), jnp.float32)], axis=0)  # [16, CHUNK]
        im = inst_rows.T            # ONE [16, CHUNK] -> [CHUNK, 16] transpose

        def col(f):
            return im[:, f:f + 1]                        # [CHUNK, 1]

        # the blended per-instance channels never leave the lane layout:
        # they feed the MXU matmul below as [F, CHUNK] rows directly
        fields = jnp.concatenate(
            [jnp.ones((1, CHUNK), jnp.float32)]
            + blend[1:1 + C + S]
            + [n1, n2, n3], axis=0)                      # [F, CHUNK]

        # ---- ray-splat intersection on the pixel axis --------------------
        # (forward.cu:404-424): [CHUNK, pix] broadcast products of
        # per-instance columns and per-pixel rows. These stay on the VPU
        # deliberately: as matmuls the contraction dims are 2-3 wide, and
        # a [CHUNK, 3] @ [3, pix] MXU pass at the f32 precision the conic
        # math needs (6-pass) is ~5x slower than the broadcast multiplies.
        ca = st * cp
        cg = -(st * sp)
        p1 = ca * col(0) + ct * col(3) + cg * col(6)
        p2 = ca * col(1) + ct * col(4) + cg * col(7)
        p3 = ca * col(2) + ct * col(5) + cg * col(8)
        p3ok = p3 != 0.0
        p3s = jnp.where(p3ok, p3, 1.0)
        # one reciprocal feeds the coordinates AND the depth (the backward
        # multiplies by the SAME rp3 so its T reconstruction stays
        # bitwise-equal)
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
        alpha = jnp.minimum(MAX_ALPHA, col(13) * jnp.exp(-0.5 * rho))
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot = slot0 + iota_s                            # [CHUNK, 1]
        in_cnt = (slot >= start) & (slot < end)
        ok = (in_cnt & p3ok & (depth >= near) & (depth <= far)
              & (alpha >= ALPHA_EPS))
        a = jnp.where(ok, alpha, 0.0)
        d_safe = jnp.where(ok, depth, far)

        one_m = 1.0 - a
        incl = _prefix_mul(one_m, CHUNK)                 # [CHUNK, pix]
        T_before = T_carry * _excl_of(incl, iota_s)
        test_T = T_before * one_m
        accept = ok & (test_T >= T_STOP)
        w = jnp.where(accept, a * T_before, 0.0)

        # ---- accumulate: one MXU matmul for every per-instance channel ---
        # row 0 (ones) is the accepted-weight total (sum w != 1 - T_fin
        # because rejected-by-floor instances still decay T; the backward
        # needs it for the distortion suffix total), rows 1.. are the
        # C + S blended channels and the 3 normal components. Replaces
        # 12 broadcast-multiplies + 12 sublane reductions per chunk.
        mm = jax.lax.dot_general(
            fields, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [F, pix]
        F = fields.shape[0]
        state_ref[10:10 + F] = state_ref[10:10 + F] + mm[:, None, :]

        # depth moments sum(w*d), sum(w*d^2) ride the MXU too: one
        # [1, CHUNK] @ [CHUNK, 2*pix] contraction instead of two
        # 256-deep sublane tree reductions on the VPU
        dw = d_safe * w
        dsum = jax.lax.dot_general(
            jnp.ones((1, CHUNK), jnp.float32),
            jnp.concatenate([dw, dw * d_safe], axis=1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [1, 2*pix]
        state_ref[1] = state_ref[1] + dsum[:, :pix]
        state_ref[2] = state_ref[2] + dsum[:, pix:]

        if settings.compute_distortion:
            # distortion running moments (forward.cu:450-456); the three
            # instance-axis reductions ride ONE MXU contraction like the
            # depth moments above
            m = far / (far - near) * (1.0 - near / d_safe)
            mw = m * w
            m2w = m * m * w
            M1_b = state_ref[4] + _prefix_sum(mw, CHUNK) - mw
            M2_b = state_ref[5] + _prefix_sum(m2w, CHUNK) - m2w
            A_b = 1.0 - T_before
            dsum3 = jax.lax.dot_general(
                jnp.ones((1, CHUNK), jnp.float32),
                jnp.concatenate(
                    [(m * m * A_b + M2_b - 2.0 * m * M1_b) * w, mw, m2w],
                    axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # [1, 3*pix]
            state_ref[3] = state_ref[3] + dsum3[:, :pix]
            state_ref[4] = state_ref[4] + dsum3[:, pix:2 * pix]
            state_ref[5] = state_ref[5] + dsum3[:, 2 * pix:]

        # median depth: LAST accepted contribution with T_before > 0.5
        # (forward.cu:458-462); positions are exact in f32 (< 2^24).
        # Once every pixel of the tile is below T = 0.5 no further update
        # is possible (T_before <= T_carry elementwise), so the whole
        # block is skipped via the SMEM flag — on dense scenes most
        # chunks run past the median crossing.
        pos1 = (slot - start + 1).astype(jnp.float32)    # [CHUNK, 1]

        @pl.when(flags_ref[1] != 0)
        def _():
            med_mask = accept & (T_before > 0.5)
            score = jnp.where(med_mask, pos1, 0.0)
            best = jnp.max(score, axis=0, keepdims=True)
            best_d = jnp.max(jnp.where(score == best, d_safe, -jnp.inf),
                             axis=0, keepdims=True)
            upd = (best > state_ref[7]) & (best > 0)
            state_ref[6] = jnp.where(upd, best_d, state_ref[6])
            state_ref[7] = jnp.maximum(state_ref[7], best)

        if settings.compute_contrib:
            # n_contrib (last accepted contributor index) is a reference
            # output nothing downstream consumes (parity tests only); the
            # CUDA kernel gets it free from its serial loop counter
            # (forward.cu:434-448) but here it costs a 256-deep max
            # reduction per chunk, so prod/bench configs turn it off
            nc = jnp.where(accept, pos1, 0.0)
            state_ref[8] = jnp.maximum(state_ref[8],
                                       jnp.max(nc, 0, keepdims=True))

        new_T = T_carry * incl[CHUNK - 1:CHUNK, :]
        state_ref[0] = new_T
        mx = jnp.max(new_T)
        flags_ref[0] = (mx >= T_STOP).astype(jnp.int32)
        flags_ref[1] = (mx > 0.5).astype(jnp.int32)

    @pl.when(last)
    def _():
        _, _, inside = pixel_rows()
        for ci in range(C):
            color_ref[0, ci] = state_ref[11 + ci]
        for i_ in range(S + 3):
            feat_ref[0, i_] = state_ref[11 + C + i_]
        depth_ref[0, 0] = state_ref[1]
        depth_ref[0, 1] = state_ref[6]
        depth_ref[0, 2] = state_ref[3]
        depth_ref[0, 3] = state_ref[2]
        misc_ref[0, 0] = jnp.where(inside, state_ref[0], 1.0)
        misc_ref[0, 1] = state_ref[8]
        misc_ref[0, 2] = state_ref[7]
        misc_ref[0, 3] = state_ref[4]    # M1 total (distortion residual)
        misc_ref[0, 4] = state_ref[5]    # M2 total
        misc_ref[0, 5] = state_ref[9]    # chunks processed
        misc_ref[0, 6] = state_ref[10]   # total accepted weight sum(w)
        misc_ref[0, 7] = jnp.zeros((1, pix), jnp.float32)


class PallasTiles(NamedTuple):
    color: jnp.ndarray    # [n_tiles, C, 1, pix]
    feature: jnp.ndarray
    depth: jnp.ndarray
    misc: jnp.ndarray     # final_T, n_contrib, med_pos, M1, M2, chunks_done


def run_forward(data, tile_starts, params, settings: RasterSettings,
                C: int, S: int):
    """Launch the forward kernel on a chunk table.

    Args:
        data: [K // CHUNK, D_PAD, CHUNK] sorted payload chunk table.
        tile_starts: [n_tiles + 1] int32 sorted instance range bounds.
    """
    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    n_tiles = settings.num_tiles
    n_rows = data.shape[0]
    K = n_rows * CHUNK

    chunk_tile, step_starts, row0 = step_layout(tile_starts, K, n_tiles)
    n_steps_cap = chunk_tile.shape[0]

    kernel = functools.partial(_kernel, settings=settings, C=C, S=S,
                               n_tiles=n_tiles)

    def in_row(i, ct, ss, _tstarts, r0):
        t = jnp.minimum(ct[i], n_tiles - 1)
        row = r0[t] + (i - ss[t])
        return (jnp.clip(row, 0, n_rows - 1), 0, 0)

    def out_idx(i, ct, *_):
        return (jnp.minimum(ct[i], n_tiles - 1), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps_cap,),
        in_specs=[
            pl.BlockSpec((1, data.shape[1], CHUNK), in_row),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, pix), out_idx),
            pl.BlockSpec((1, S + 3, 1, pix), out_idx),
            pl.BlockSpec((1, 4, 1, pix), out_idx),
            pl.BlockSpec((1, 8, 1, pix), out_idx),
        ],
        scratch_shapes=[pltpu.VMEM((11 + C + S + 3, 1, pix), jnp.float32),
                        pltpu.SMEM((2,), jnp.int32)],
    )
    color, feat, depth, misc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, C, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, S + 3, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 4, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 1, pix), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default scoped-vmem budget is 16 MB; the kernel's
            # [CHUNK, pix] intermediates hit it at CHUNK=512 or
            # 1536-px tiles ('Scoped allocation with size 19.60M and
            # limit 16.00M', ROOFLINE.md). v5e has 128 MB of VMEM; 64
            # leaves the XLA pipeline around the call its usual half
            vmem_limit_bytes=64 * 1024 * 1024),
    )(chunk_tile, step_starts, tile_starts, row0, data, params)
    return PallasTiles(color=color, feature=feat, depth=depth, misc=misc)


def make_params(scale_factor, settings: RasterSettings, angle_bounds=None):
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = (
        angle_bounds if angle_bounds is not None else settings.angle_bounds)
    wrap_w = settings.dxp_wrap_period
    wrap_inv = 1.0 / wrap_w if wrap_w else 0.0
    return jnp.stack([
        jnp.asarray(NEAR_N * scale_factor, jnp.float32),
        jnp.asarray(FAR_N * scale_factor, jnp.float32),
        jnp.asarray(VFOV_min, jnp.float32), jnp.asarray(VFOV_max, jnp.float32),
        jnp.asarray(HFOV_min, jnp.float32), jnp.asarray(HFOV_max, jnp.float32),
        jnp.asarray(wrap_w, jnp.float32), jnp.asarray(wrap_inv, jnp.float32)])


def composite_pallas_tiles(binning: Binning, scale_factor,
                           settings: RasterSettings, S: int, C: int = 4,
                           angle_bounds=None) -> PallasTiles:
    """Composite a payload-bearing binning (fast, non-diff path)."""
    data = data_chunks(binning, CHUNK,
                       -(-binning.data_rows.shape[1] // 8) * 8)
    params = make_params(scale_factor, settings, angle_bounds)
    return run_forward(data, binning.tile_starts, params, settings, C, S)


def _untile4(x: jnp.ndarray, settings: RasterSettings) -> jnp.ndarray:
    """[n_tiles, C, 1, pix] -> [C, H, W]."""
    C = x.shape[1]
    x = x.reshape(settings.tiles_y, settings.tiles_x, C,
                  settings.tile_h, settings.tile_w)
    x = x.transpose(2, 0, 3, 1, 4).reshape(
        C, settings.tiles_y * settings.tile_h,
        settings.tiles_x * settings.tile_w)
    return x[:, :settings.height, :settings.width]


def composite_pallas(binning: Binning, prep, features, opacity, bg,
                     scale_factor, settings: RasterSettings,
                     angle_bounds=None):
    """Drop-in forward replacement for composite.composite (no grad).

    Requires ``binning.data_rows`` (bin_gaussians called with
    payload=pack_payload(...)).
    """
    from gslidar_tpu.raster.composite import TileImages
    S = features.shape[-1]
    C = prep.color.shape[-1]
    tiles = composite_pallas_tiles(binning, scale_factor, settings,
                                   S=S, C=C, angle_bounds=angle_bounds)
    T_fin = tiles.misc[:, 0:1]
    color = tiles.color + T_fin * bg[None, :, None, None]
    return TileImages(
        color=_untile4(color, settings),
        feature=_untile4(tiles.feature, settings),
        depth=_untile4(tiles.depth, settings),
        alpha=_untile4(1.0 - T_fin, settings),
        contrib=_untile4(tiles.misc[:, 1:3], settings),
        final_T=_untile4(T_fin, settings),
    )
