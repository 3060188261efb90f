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

    # per-gaussian integer payloads broadcast to slots without gathers
    near = NEAR_N * scale_factor
    far = FAR_N * scale_factor
    dq_max = (1 << depth_bits) - 1
    dnorm = jnp.clip((depth - near) / jnp.maximum(far - near, 1e-12), 0.0, 1.0)
    dq = jnp.minimum((dnorm * float(dq_max)).astype(jnp.int32), dq_max)

    slots = jnp.arange(K, dtype=jnp.int32)
    gid = _segment_broadcast_i32(jnp.arange(P, dtype=jnp.int32), offsets, K)
    offs_s = _segment_broadcast_i32(offsets, offsets, K)
    rminx_s = _segment_broadcast_i32(rect_min[:, 0], offsets, K)
    rminy_s = _segment_broadcast_i32(rect_min[:, 1], offsets, K)
    rw_s = _segment_broadcast_i32(
        jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1), offsets, K)
    dq_s = _segment_broadcast_i32(dq, offsets, K)

    j = slots - offs_s
    ty = rminy_s + j // rw_s
    tx = rminx_s + j % rw_s
    pair_valid = slots < total
    tile = jnp.where(pair_valid, (ty * settings.tiles_x + tx), n_tiles)
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
