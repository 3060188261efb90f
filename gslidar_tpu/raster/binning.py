"""Tile binning: scatter/cumsum duplication + one uint32 key sort.

TPU-native replacement for the CUDA pipeline of prefix-sum ->
duplicateWithKeys scatter -> 64-bit radix sort -> identifyTileRanges
(reference: cuda_rasterizer/rasterizer_impl.cu:66-142,308-354).

Performance notes (measured on v5e, P=1M, K=512k): jax.lax.sort of the
K uint32 keys is ~2 ms; the memory engines are the cost. Scatters price
by UPDATE count (~10 ns each, ~7.5 ns for collision-free SET) and
gathers by ROW (~7.5 ms for K rows regardless of small width). So the
slot->gaussian map g(k) — a non-decreasing step function — is built
with ONE masked scatter-SET of gid-gaps at non-empty segment starts
plus a cumsum (P updates), and every other per-slot quantity comes from
ONE K-row gather ``per_g[gid]`` instead of further P-update scatters.
The (tile, depth) key is a single uint32 ``tile << depth_bits |
depth_q``; per-tile ranges come from a compare-sum (searchsorted's
binary-search gathers are ~5x slower for the same [n_tiles+1] result).

Static shapes: the instance list is padded to ``settings.pair_cap``;
overflow is dropped and counted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.raster.settings import FAR_N, NEAR_N, RasterSettings


class Binning(NamedTuple):
    gid_sorted: jnp.ndarray     # [K] int32 gaussian index per instance
    tile_sorted: jnp.ndarray    # [K] int32 tile id (num_tiles = invalid pad)
    tile_starts: jnp.ndarray    # [num_tiles + 1] int32 range starts
    num_pairs: jnp.ndarray      # [] int32 actual instances (pre-clip)
    num_dropped: jnp.ndarray    # [] int32 instances dropped by the cap


def _segment_broadcast_i32(vals: jnp.ndarray, starts: jnp.ndarray,
                           K: int) -> jnp.ndarray:
    """out[k] = vals[g(k)] where segment i spans [starts[i], starts[i+1]).

    starts[0] must be 0. Gather-free: scatter the first-difference of vals
    at the segment starts, then cumsum. Exact for integers; collisions
    from empty segments accumulate correctly via scatter-add.
    """
    d = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
    seeded = jnp.zeros(K, vals.dtype).at[starts].add(d, mode="drop")
    return jnp.cumsum(seeded)


def bin_gaussians(rect_min, rect_max, depth, tiles_touched,
                  scale_factor, settings: RasterSettings) -> Binning:
    P = depth.shape[0]
    K = settings.pair_cap
    n_tiles = settings.num_tiles
    depth_bits = settings.depth_bits

    tiles_touched = tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(tiles_touched)
    total = jnp.minimum(cum[-1], K)
    offsets = cum - tiles_touched                     # segment starts, [P]

    near = NEAR_N * scale_factor
    far = FAR_N * scale_factor
    dq_max = (1 << depth_bits) - 1
    dnorm = jnp.clip((depth - near) / jnp.maximum(far - near, 1e-12), 0.0, 1.0)
    dq = jnp.minimum((dnorm * float(dq_max)).astype(jnp.int32), dq_max)

    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(jnp.int32)
    rmin_tile = (rect_min[:, 1] * settings.tiles_x + rect_min[:, 0]).astype(jnp.int32)
    # w0 = offs * 128 + rw: needs K <= 2^24 and <= 127 tile columns
    assert K <= (1 << 24) and settings.tiles_x <= 127, \
        "pair_cap/grid too large for packed binning words"

    # slot -> gaussian id, via ONE masked scatter-SET + cumsum: scatter the
    # gid-gap to the previous *visible* gaussian at each non-empty segment
    # start (starts of non-empty segments are strictly increasing, so SET
    # has no collisions, unlike the naive diff trick which needs ADD to
    # absorb empty segments). Measured: scatter-set of P updates 7.5 ms vs
    # scatter-add 10.2 ms; everything else per-slot comes from a single
    # K-row gather (7.5 ms) instead of two more P-update scatters (20 ms).
    vis = tiles_touched > 0
    gidx = jnp.arange(P, dtype=jnp.int32)
    last_vis = jax.lax.associative_scan(jnp.maximum,
                                        jnp.where(vis, gidx, -1))
    prev_vis = jnp.concatenate([jnp.full(1, -1, jnp.int32), last_vis[:-1]])
    gap = jnp.where(prev_vis < 0, gidx, gidx - prev_vis)
    starts_m = jnp.where(vis, offsets, K + 1)
    seeded = jnp.zeros(K, jnp.int32).at[starts_m].set(gap, mode="drop")
    gid = jnp.cumsum(seeded)

    slots = jnp.arange(K, dtype=jnp.int32)
    w0 = offsets * 128 + jnp.minimum(rw, 127)
    per_g = jnp.stack([w0, rmin_tile, dq], axis=1)          # [P, 3]
    ws = per_g[gid]                                         # one row gather
    w0_s, rmin_tile_s, dq_s = ws[:, 0], ws[:, 1], ws[:, 2]
    offs_s = w0_s // 128
    rw_s = w0_s - offs_s * 128

    j = slots - offs_s
    dy = j // rw_s
    if settings.wrap_x:
        # circular x: rect columns wrap modulo tiles_x (preprocess stores
        # rect_min_x normalized into [0, tiles_x) and width <= tiles_x, so
        # one conditional subtract replaces the mod)
        gx = settings.tiles_x
        y0 = rmin_tile_s // gx
        x0 = rmin_tile_s - y0 * gx
        xcol = x0 + (j - dy * rw_s)
        xcol = jnp.where(xcol >= gx, xcol - gx, xcol)
        tile = (y0 + dy) * gx + xcol
    else:
        tile = rmin_tile_s + dy * settings.tiles_x + (j - dy * rw_s)
    pair_valid = slots < total
    tile = jnp.where(pair_valid, tile, n_tiles)
    key = ((tile.astype(jnp.uint32) << jnp.uint32(depth_bits))
           | dq_s.astype(jnp.uint32))

    key_s, gid_s = jax.lax.sort((key, gid), dimension=0, num_keys=1)
    tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
    # per-tile range starts: starts[t] = #(tile_s < t). A compare-sum over
    # the [n_tiles+1, K] broadcast is ~2 ms where jnp.searchsorted's
    # binary-search gathers cost ~9 ms for the same result.
    tile_starts = jnp.sum(
        tile_s[None, :] < jnp.arange(n_tiles + 1, dtype=jnp.int32)[:, None],
        axis=1).astype(jnp.int32)

    return Binning(
        gid_sorted=gid_s,
        tile_sorted=tile_s,
        tile_starts=tile_starts,
        num_pairs=cum[-1],
        num_dropped=jnp.maximum(cum[-1] - K, 0),
    )
