"""Tile binning: scatter/cumsum duplication + one uint32 key sort.

TPU-native replacement for the CUDA pipeline of prefix-sum ->
duplicateWithKeys scatter -> 64-bit radix sort -> identifyTileRanges
(reference: cuda_rasterizer/rasterizer_impl.cu:66-142,308-354).

Performance notes (measured on v5e): jax.lax.sort of 2M uint32 keys is
~3 ms, but *gathers* are the enemy — a single 2M-element gather costs
~18 ms and jnp.searchsorted is 20 binary-search gathers. So duplication
uses no gathers at all: the slot->gaussian map g(k) is a non-decreasing
step function, so g = cumsum(ones scattered at segment boundaries), and
every per-gaussian integer quantity q[g(k)] is materialized the same way
(cumsum of q-diffs scattered at boundaries — exact for ints). The
(tile, depth) key is a single uint32 ``tile << depth_bits | depth_q``;
per-tile ranges come from one small searchsorted over n_tiles values.

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

    # per-gaussian integer payloads broadcast to slots without gathers.
    # TPU scatter-add costs ~12ns/ELEMENT, so the six per-slot values are
    # bit-packed into as few broadcast words as possible:
    #   w0 = offs * 64 + rw          (offs < 2^24 with rw < 64)
    #   w1 = gid * grid + rmin_tile  (gid < 2^24, rmin_tile < grid)
    #   w2 = dq                      (quantized depth, up to 2^depth_bits)
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
    # w2 = rmin_tile << dq_pack_bits | dq (reduced-precision depth)
    tile_bits = max(1, n_tiles.bit_length() if isinstance(n_tiles, int)
                    else 0)
    dq_pack_bits = 31 - tile_bits
    dq_p = jnp.minimum(dq >> jnp.maximum(depth_bits - dq_pack_bits, 0),
                       (1 << min(dq_pack_bits, depth_bits)) - 1)
    w0 = offsets * 128 + jnp.minimum(rw, 127)
    w2 = rmin_tile * (1 << dq_pack_bits) + dq_p

    slots = jnp.arange(K, dtype=jnp.int32)
    w0_s = _segment_broadcast_i32(w0, offsets, K)
    gid = _segment_broadcast_i32(jnp.arange(P, dtype=jnp.int32), offsets, K)
    w2_s = _segment_broadcast_i32(w2, offsets, K)
    offs_s = w0_s // 128
    rw_s = w0_s - offs_s * 128
    rmin_tile_s = w2_s >> dq_pack_bits
    dq_s = w2_s - (rmin_tile_s << dq_pack_bits)
    # re-scale the packed depth to the key's full depth_bits range
    dq_s = dq_s << jnp.maximum(depth_bits - dq_pack_bits, 0)

    j = slots - offs_s
    dy = j // rw_s
    tile = rmin_tile_s + dy * settings.tiles_x + (j - dy * rw_s)
    pair_valid = slots < total
    tile = jnp.where(pair_valid, tile, n_tiles)
    key = ((tile.astype(jnp.uint32) << jnp.uint32(depth_bits))
           | dq_s.astype(jnp.uint32))

    key_s, gid_s = jax.lax.sort((key, gid), dimension=0, num_keys=1)
    tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Binning(
        gid_sorted=gid_s,
        tile_sorted=tile_s,
        tile_starts=tile_starts,
        num_pairs=cum[-1],
        num_dropped=jnp.maximum(cum[-1] - K, 0),
    )
