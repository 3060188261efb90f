"""Tile binning: gather-based duplication + one uint32 key sort.

TPU-native replacement for the CUDA pipeline of prefix-sum ->
duplicateWithKeys scatter -> 64-bit radix sort -> identifyTileRanges
(reference: cuda_rasterizer/rasterizer_impl.cu:66-142,308-354):

* duplication is a GATHER: slot k finds its source gaussian with a
  searchsorted into the cumulative tiles_touched (no scatter, no atomics);
* the (tile, depth) key is a single uint32 ``tile << depth_bits | depth_q``
  with depth quantized against the near/far range, sorted once with
  jax.lax.sort (deterministic);
* per-tile ranges come from a searchsorted over the sorted keys.

Everything is static-shape: the instance list is padded to
``settings.pair_cap``; overflow beyond the cap is dropped (the number of
dropped instances is returned for observability — the CUDA version never
overflows because it allocates dynamically, rasterize_points.cu:25-33).
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


def bin_gaussians(rect_min, rect_max, depth, tiles_touched,
                  scale_factor, settings: RasterSettings) -> Binning:
    P = depth.shape[0]
    K = settings.pair_cap
    n_tiles = settings.num_tiles
    depth_bits = settings.depth_bits

    cum = jnp.cumsum(tiles_touched)
    total = cum[-1]
    offsets = cum - tiles_touched

    # gather-based duplication: slot k belongs to gaussian g(k)
    slots = jnp.arange(K, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    g = jnp.minimum(g, P - 1)
    j = slots - offsets[g]
    rw = (rect_max[g, 0] - rect_min[g, 0]).astype(jnp.int32)
    rw = jnp.maximum(rw, 1)
    ty = rect_min[g, 1] + j // rw
    tx = rect_min[g, 0] + j % rw
    tile = (ty * settings.tiles_x + tx).astype(jnp.uint32)
    pair_valid = slots < total
    tile = jnp.where(pair_valid, tile, jnp.uint32(n_tiles))

    # quantized depth (monotone in [near, far]) packed under the tile id
    near = NEAR_N * scale_factor
    far = FAR_N * scale_factor
    dq_max = jnp.uint32((1 << depth_bits) - 1)
    dnorm = jnp.clip((depth[g] - near) / jnp.maximum(far - near, 1e-12), 0.0, 1.0)
    dq = jnp.minimum((dnorm * float((1 << depth_bits) - 1)).astype(jnp.uint32),
                     dq_max)
    key = (tile << jnp.uint32(depth_bits)) | dq

    key_s, gid_s = jax.lax.sort((key, g), dimension=0, num_keys=1)
    tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Binning(
        gid_sorted=gid_s,
        tile_sorted=tile_s,
        tile_starts=tile_starts,
        num_pairs=total,
        num_dropped=jnp.maximum(total - K, 0),
    )
