"""Tile binning: scatter/cumsum duplication + a 2/3-operand sort + gather.

TPU-native replacement for the CUDA pipeline of prefix-sum ->
duplicateWithKeys scatter -> 64-bit radix sort -> identifyTileRanges
(reference: cuda_rasterizer/rasterizer_impl.cu:66-142,308-354).

Performance model (slope-measured on v5e through dependent-chain
microbenchmarks, scripts/microbench_engines.py — round-1 numbers
measured via non-blocking dispatch were unreliable):

  * row GATHERS price per row (~8.6 ms / 1M rows) and are nearly
    width-free up to ~24 f32 columns (K=2.26M, microbench_stages: width
    4 = 13.7 ms, width 18 = 18.3 ms) — but fall off a CLIFF at width 28
    (86.5 ms: the row no longer fits whatever slice granule the engine
    uses). Keep D_PAD <= 24. Sorted indices and bf16 do not help;
  * SCATTERS price per element (~5 ns/elem), so multi-column scatters
    and wide segment_sums are ruinous;
  * narrow SORTS run fast (2-3 operands at K=2.26M: 5.5-5.8 ms), but
    payload-carrying sorts are NOT width-free at this scale: the full
    render with 21 int32 payload operands riding the sort measured
    binning at 55.4 ms vs the narrow path's 38.2 — ~1.5 ms/operand,
    which LOSES to the 18.3 ms post-sort row gather it replaces. (An
    earlier "1M keys + 28 cols ~ 1 ms" reading was a dead-code artifact;
    trust the end-to-end number.) Sort COMPILE is ~10-19 s per operand
    (4 ops 22 s, 12 ops 113 s, 30 ops 637 s) — amortized: the
    persistent compilation cache (JAX_COMPILATION_CACHE_DIR) DOES
    round-trip TPU executables on this relay (verified cross-process:
    123 s -> 0.17 s, scripts/probe_compile_cache.py — earlier "no
    cache" readings were false negatives from the AOT
    .lower().compile() path bypassing the cache and from exiting before
    the async write finished). payload_in_sort therefore stays a
    non-default mode; the compile-cache discovery stands on its own
    (train/eval/bench warm-start in seconds instead of minutes);
  * cumsums / compare-sums are ~free (0.07-0.2 ms / 1M).

Round-3 alternatives measured AND REFUTED at the bench shape (P=1M,
K=2.26M; scripts/microbench_segbcast.py, scripts/microbench_dma_gather.py)
— do not retry without new evidence:

  * replacing the word gather with segment-broadcast scatter+cumsum of
    the words: a stacked [P, 2] row scatter costs 97 ms (!), two 1-col
    scatter-ADDs 17.3 ms, and the arbitrary-value gap trick needs a
    [P]-row gather of its own — every variant >= the 16.4 ms incumbent
    (scatter-SET 6.0 + cumsum 0.3 + [K,3] word gather 10.1);
  * moving the post-sort payload reorder into the Pallas kernel as
    per-row DMA (``payload[gid]`` from HBM, 128 descriptors in flight,
    one-chunk lookahead): 62 ns/row vs the XLA gather's 8.6 ns/row at
    D<=32 — descriptor issue rate is the bottleneck, and Mosaic also
    requires 128-lane-aligned row slices (so the table must be padded
    [P, 128], 5x the traffic). The XLA gather IS the engine floor:
    ~7.6 ms + ~0.45 ms/f32-column per M rows;
  * (late round 3) replacing the word gather with packed scatter+cumsum
    segment broadcasts of (gid|rw) and (rmin|dq): the runtime math only
    breaks even (scatter-ADD is 8.7 ms/M updates, and the within-segment
    index then needs a third broadcast for offsets). Compile costs
    (associative_scan(max) at P=1M: 55 s; at K=2.26M: 66 s lower + 282 s
    compile; a 2-tuple-combine scan at P=1M: >9 min, never finished) are
    amortized by the persistent cache but the runtime still only breaks
    even, so the design stays on the gather.

IMPLEMENTED from that cost model (re-measure on a chip): the payload
carries no xy / r_c columns — every compositor recomputes them from
the p_cam triple already present in the T columns (kernel-space
(Tuz, Tvz, Twz)): two atan2 + one rsqrt per INSTANCE (amortized over
the tile's pixels) deletes 3 of the D gathered columns, ~0.45 ms/col
per M rows off the post-sort gather on both backends (and 2 net
columns of ICI traffic in the gaussian-sharded exchange). The
gradients of the recomputed center chain into the T columns through
the spherical Jacobian, which is exactly the reference's fold
(backward.cu:578-595,505-508). Parity caveat: the Pallas kernels use
a Cephes-style polynomial atan2 (Mosaic has no atan lowering), so
pallas-vs-XLA comparisons stay tolerance-based (they already are).

REMAINING recorded candidate (not taken): bf16-pair-packing the 9
blend-only columns (opacity, C colors, S features) into 5 words would
shave ~4 more gather columns (~3 ms at the bench K), but the T columns
must stay f32 (the conic/alpha math), and bf16 color/feature rows relax
the oracle-parity tolerance from ulp-level to ~1e-2 relative across the
whole test pyramid — a test-strength price not worth 5% of the render.

Hence the design: the slot->gaussian map g(k) — a non-decreasing step
function — is built with ONE masked scatter-SET of gid-gaps at non-empty
segment starts plus a cumsum (P updates); the per-slot binning words
come from ONE [K, 2] row gather (w0 = offs*128+rw and key0 = the first
tile's full sort key — rmin_tile/dq packed into the key's own 32-bit
budget); the (tile, depth) uint32 keys are rebuilt from key0 and the
decoded tile delta; ONE 2-operand (3 when the caller
needs the inverse permutation for the backward) ``lax.sort`` orders
(key, gid); and the render payload lands in tile-depth order with ONE
row gather ``payload[gid_sorted]`` straight from the [P, D] table.
Per-tile ranges come from a compare-sum (searchsorted's binary-search
gathers are ~5x slower for the same [n_tiles+1] result).

Static shapes: the instance list is padded to ``settings.pair_cap``;
overflow is dropped and counted (num_dropped).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gslidar_tpu.raster.settings import FAR_N, NEAR_N, RasterSettings


class Binning(NamedTuple):
    gid_sorted: jnp.ndarray     # [K] int32 gaussian index per instance
    tile_sorted: jnp.ndarray    # [K] int32 tile id (num_tiles = invalid pad)
    tile_starts: jnp.ndarray    # [num_tiles + 1] int32 range starts
    num_pairs: jnp.ndarray      # [] int32 actual instances (pre-clip)
    num_dropped: jnp.ndarray    # [] int32 instances dropped by the cap
    data_rows: Optional[jnp.ndarray] = None     # [K, D] payload rows in
                                # tile-depth order (one post-sort row
                                # gather from the [P, D] table)
    gid_slot: Optional[jnp.ndarray] = None      # [K] int32 pre-sort
                                # slot -> gaussian map (gaussian-major
                                # expansion order; run ids for the
                                # backward's contiguous-run reduction)
    inv_perm: Optional[jnp.ndarray] = None      # [K] int32 inverse sort
                                # permutation: inv_perm[s] = sorted
                                # position of pre-sort slot s (the
                                # backward gathers its per-instance grad
                                # rows back to gaussian-major order with
                                # it — a 1-column scatter + row gather
                                # instead of a wide grad re-sort)


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
                  scale_factor, settings: RasterSettings,
                  payload: Optional[jnp.ndarray] = None,
                  with_slots: bool = False) -> Binning:
    """Duplicate gaussians into per-tile instance lists, sorted by
    (tile, quantized depth).

    Args:
        payload: optional [P, D] f32 per-gaussian rows; returned
            reordered into instance order as ``data_rows`` [K, D] via a
            post-sort row gather.
        with_slots: also return the pre-sort gid map and the inverse
            sort permutation (the backward's reduction needs both).
    """
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
    # absorb empty segments).
    vis = tiles_touched > 0
    gidx = jnp.arange(P, dtype=jnp.int32)
    last_vis = jax.lax.associative_scan(jnp.maximum,
                                        jnp.where(vis, gidx, -1))
    prev_vis = jnp.concatenate([jnp.full(1, -1, jnp.int32), last_vis[:-1]])
    gap = jnp.where(prev_vis < 0, gidx, gidx - prev_vis)
    starts_m = jnp.where(vis, offsets, K + 1)
    seeded = jnp.zeros(K, jnp.int32).at[starts_m].set(gap, mode="drop")
    gid = jnp.cumsum(seeded)

    # ONE row gather brings the binning words to slots (width-free). In
    # payload_in_sort mode the SAME gather also carries the render
    # payload so the wide sort below can order it directly.
    # Two words per gaussian: w0 = offs*128 + rw, and key0 = the sort key
    # of the rect's FIRST tile (rmin_tile << depth_bits | dq) — the same
    # 32-bit budget the key itself lives in, so the pack is always exact;
    # the per-slot key is rebuilt from key0 and the decoded tile delta.
    # (Packing saves one gathered column, ~0.33 ms/M rows.)
    w0 = offsets * 128 + jnp.minimum(rw, 127)
    key0 = ((rmin_tile.astype(jnp.uint32) << jnp.uint32(depth_bits))
            | dq.astype(jnp.uint32))
    words_i = jnp.stack(
        [w0, jax.lax.bitcast_convert_type(key0, jnp.int32)], axis=1)  # [P, 2]
    wide = settings.payload_in_sort and payload is not None
    if wide:
        # The whole gathered table stays in the INT domain: binning words
        # bitcast to f32 are denormal/NaN bit patterns, and the TPU
        # flushes them to zero in any compute between bitcasts (measured
        # on-chip: wrong sort keys; CPU tests never caught it). Payload
        # f32 bits ride the sort as D separate int32 operands — moves
        # only, bit-exact by construction. (int64 pairing would halve the
        # operand count but is x64-gated; complex64 pairing re-enters
        # float semantics. The ~10-19 s/operand compile price is paid
        # once per shape and served from the persistent compilation
        # cache thereafter — see scripts/probe_compile_cache.py.)
        D = payload.shape[1]
        pay_i = (payload if payload.dtype == jnp.int32
                 else jax.lax.bitcast_convert_type(payload, jnp.int32))
        rows = jnp.concatenate([words_i, pay_i], axis=1)[gid]  # [K, 2+D]
        ws = rows[:, :2]
        wpay = rows[:, 2:]                                     # [K, D] i32
    else:
        ws = words_i[gid]                                      # [K, 2]
    w0_s = ws[:, 0]
    key0_s = jax.lax.bitcast_convert_type(ws[:, 1], jnp.uint32)
    rmin_tile_s = (key0_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
    offs_s = w0_s // 128
    rw_s = w0_s - offs_s * 128

    slots = jnp.arange(K, dtype=jnp.int32)
    j = slots - offs_s
    dy = j // rw_s
    if settings.wrap_x:
        # circular x: rect columns wrap modulo tiles_x (preprocess stores
        # rect_min_x in [0, tiles_x) and width <= tiles_x, so one
        # conditional subtract replaces the mod)
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
           | (key0_s & jnp.uint32((1 << depth_bits) - 1)))

    # ONE sort. Narrow (2-3 operands) by default — the XLA:TPU sort
    # compiles at ~10 s/operand (module docstring) — or wide when
    # payload_in_sort carries the c64-packed payload through the sort
    # (deletes the post-sort row gather at the price of the compile).
    operands = [key, gid]
    if with_slots:
        operands.append(slots)
    if wide:
        operands.extend(wpay[:, i] for i in range(D))
    out = jax.lax.sort(tuple(operands), dimension=0, num_keys=1,
                       is_stable=True)
    key_s, gid_s = out[0], out[1]
    if with_slots:
        # slot_s is a permutation of [0, K) (pad slots ride the sort too),
        # so the inverting scatter-SET is collision-free
        inv_perm = jnp.zeros(K, jnp.int32).at[out[2]].set(slots)
    else:
        inv_perm = None
    if wide:
        bits = jnp.stack(out[-D:], axis=1)                     # [K, D] i32
        data_rows_s = (bits if payload.dtype == jnp.int32
                       else jax.lax.bitcast_convert_type(bits, jnp.float32))
    elif payload is not None:
        # payload lands in sorted instance order with ONE row gather from
        # the [P, D] table (pad slots carry a clamped-but-valid gid; the
        # kernel masks them off via tile_starts)
        data_rows_s = payload[gid_s]
    else:
        data_rows_s = None

    tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
    # per-tile range starts: starts[t] = #(tile_s < t). A compare-sum over
    # the [n_tiles+1, K] broadcast beats jnp.searchsorted's binary-search
    # gathers ~5x for the same result.
    tile_starts = jnp.sum(
        tile_s[None, :] < jnp.arange(n_tiles + 1, dtype=jnp.int32)[:, None],
        axis=1).astype(jnp.int32)

    return Binning(
        gid_sorted=gid_s,
        tile_sorted=tile_s,
        tile_starts=tile_starts,
        num_pairs=cum[-1],
        num_dropped=jnp.maximum(cum[-1] - K, 0),
        data_rows=data_rows_s,
        gid_slot=gid if with_slots else None,
        inv_perm=inv_perm,
    )


def data_chunks(binning: Binning, chunk: int, d_pad: int) -> jnp.ndarray:
    """[K // chunk, d_pad, chunk] sorted payload in the pallas kernel's
    chunk-table layout (fields on sublanes, instances on lanes).

    The host-side transpose costs a measured ~2.2 ms/render of HBM
    round-trip at the bench shape, but it is the CHEAPEST option:
    shipping row-major [chunk, d_pad] blocks and transposing in-kernel
    (both Mosaic's vreg-shuffle .T and an exact MXU X^T@I) measured
    ~4-5 ms SLOWER per render, because a [128, 24] f32 block has a
    24-lane minor dimension — every vreg is 5x padded through the DMA
    and the relayout, while [24, 128] blocks are lane-dense.
    """
    rows = binning.data_rows
    K, D = rows.shape
    assert K % chunk == 0 and D <= d_pad
    if D < d_pad:
        rows = jnp.pad(rows, ((0, 0), (0, d_pad - D)))
    return rows.reshape(K // chunk, chunk, d_pad).transpose(0, 2, 1)
