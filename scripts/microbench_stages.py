#!/usr/bin/env python
"""Fine-grained stage slopes of the render hot path at the bench shape.

Splits binning into its engine passes (gid scatter+cumsum, word gather,
key math, sort, payload gather, tile_starts compare-sum) and separates
the chunk-table transpose from the pallas kernel proper. Same
dependent-chain slope timing as scripts/profile_render.py.

    python scripts/microbench_stages.py [--tile 16x32] [--chunk 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 10
REPS = 3


def slope(fn, args_list, label=""):
    import jax
    times = {}
    for n in (N_LO, N_HI):
        out = fn(*args_list[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        best = float("inf")
        for _r in range(REPS):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(*args_list[i % len(args_list)])
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="16x32")
    ap.add_argument("--cap", type=int, default=17664 * 128)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings, NEAR_N, FAR_N
    from gslidar_tpu.raster.preprocess import preprocess
    from gslidar_tpu.raster.binning import bin_gaussians, data_chunks
    from gslidar_tpu.raster.pallas_fwd import (CHUNK, D_PAD, make_params,
                                               pack_payload, run_forward)

    th, tw = (int(v) for v in args_cli.tile.split("x"))
    settings = RasterSettings(
        height=66, width=1030, vfov=(-24.9, 2.0), hfov=(-180, 180),
        num_extra_features=4, pair_cap=args_cli.cap,
        tile_h=th, tile_w=tw, wrap_x=True, backend="pallas",
        compute_distortion=False)
    print(f"tile {th}x{tw} grid {settings.tiles_y}x{settings.tiles_x} "
          f"cap {settings.pair_cap} CHUNK {CHUNK}")

    sf = 0.1
    vm = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3)
    scenes = [build_scene(seed=s) for s in (0, 1)]

    @jax.jit
    def run_pre(sc):
        prep = preprocess(sc["means3D"], sc["scales"], sc["rotations"],
                          sc["opacity"], sc["shs"], sc["mask"], vm,
                          campos, 3, sf, settings)
        packed = pack_payload(prep, sc["opacity"], sc["features"])
        return prep, packed

    pp = [run_pre(sc) for sc in scenes]
    n_pairs = [int(jnp.sum(p.tiles_touched)) for p, _ in pp]
    print(f"pairs={n_pairs}")

    K = settings.pair_cap
    P = scenes[0]["means3D"].shape[0]

    # --- stage 1: gid map (scatter-SET + cumsum) ---
    @jax.jit
    def s_gid(prep):
        tt = prep.tiles_touched.astype(jnp.int32)
        cum = jnp.cumsum(tt)
        offsets = cum - tt
        vis = tt > 0
        gidx = jnp.arange(P, dtype=jnp.int32)
        last_vis = jax.lax.associative_scan(jnp.maximum,
                                            jnp.where(vis, gidx, -1))
        prev_vis = jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                    last_vis[:-1]])
        gap = jnp.where(prev_vis < 0, gidx, gidx - prev_vis)
        starts_m = jnp.where(vis, offsets, K + 1)
        seeded = jnp.zeros(K, jnp.int32).at[starts_m].set(gap, mode="drop")
        return jnp.cumsum(seeded)

    gids = [s_gid(p) for p, _ in pp]
    slope(s_gid, [(p,) for p, _ in pp], "gid map (scan+scatterSET+cumsum)")

    # --- stage 2: word gather [K, 3] ---
    @jax.jit
    def s_wgather(prep, gid):
        rw = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1
                         ).astype(jnp.int32)
        rmin_tile = (prep.rect_min[:, 1] * settings.tiles_x
                     + prep.rect_min[:, 0]).astype(jnp.int32)
        tt = prep.tiles_touched.astype(jnp.int32)
        offsets = jnp.cumsum(tt) - tt
        w0 = offsets * 128 + jnp.minimum(rw, 127)
        near = NEAR_N * sf
        far = FAR_N * sf
        dq_max = (1 << settings.depth_bits) - 1
        dnorm = jnp.clip((prep.depth - near) / (far - near), 0.0, 1.0)
        dq = jnp.minimum((dnorm * float(dq_max)).astype(jnp.int32), dq_max)
        words = jnp.stack([w0, rmin_tile, dq], axis=1)
        return words[gid]

    ws = [s_wgather(p, g) for (p, _), g in zip(pp, gids)]
    slope(s_wgather, [(p, g) for (p, _), g in zip(pp, gids)],
          "word gather [K,3]")

    # --- stage 3: key math (tile expansion) ---
    @jax.jit
    def s_keys(wsv):
        w0_s, rmin_tile_s, dq_s = wsv[:, 0], wsv[:, 1], wsv[:, 2]
        offs_s = w0_s // 128
        rw_s = w0_s - offs_s * 128
        slots = jnp.arange(K, dtype=jnp.int32)
        j = slots - offs_s
        dy = j // rw_s
        gx = settings.tiles_x
        y0 = rmin_tile_s // gx
        x0 = rmin_tile_s - y0 * gx
        xcol = x0 + (j - dy * rw_s)
        xcol = jnp.where(xcol >= gx, xcol - gx, xcol)
        tile = (y0 + dy) * gx + xcol
        tile = jnp.where(slots < K, tile, settings.num_tiles)
        return ((tile.astype(jnp.uint32) << jnp.uint32(settings.depth_bits))
                | dq_s.astype(jnp.uint32))

    keys = [s_keys(w) for w in ws]
    slope(s_keys, [(w,) for w in ws], "key math")

    # --- stage 4: the sort (2 operands) ---
    @jax.jit
    def s_sort(key, gid):
        return jax.lax.sort((key, gid), dimension=0, num_keys=1,
                            is_stable=True)

    sorted_ = [s_sort(k, g) for k, g in zip(keys, gids)]
    slope(s_sort, list(zip(keys, gids)), "sort (key, gid)")

    # --- stage 4b: the sort (3 operands, training) ---
    @jax.jit
    def s_sort3(key, gid):
        slots = jnp.arange(K, dtype=jnp.int32)
        return jax.lax.sort((key, gid, slots), dimension=0, num_keys=1,
                            is_stable=True)

    _ = [s_sort3(k, g) for k, g in zip(keys, gids)]
    slope(s_sort3, list(zip(keys, gids)), "sort (key, gid, slot)")

    # --- stage 5: payload row gather [K, D] ---
    @jax.jit
    def s_pgather(packed, gid_s):
        return packed[gid_s]

    pgs = [s_pgather(pk, s[1]) for (_, pk), s in zip(pp, sorted_)]
    D = pgs[0].shape[1]
    slope(s_pgather, [(pk, s[1]) for (_, pk), s in zip(pp, sorted_)],
          f"payload gather [K,{D}]")

    # narrower / wider gathers for the width slope
    for Dw in (4, 10, 28):
        pkw = [jnp.pad(pk, ((0, 0), (0, max(0, Dw - D))))[:, :Dw]
               for _, pk in pp]

        @jax.jit
        def s_pg(pkv, gid_s):
            return pkv[gid_s]

        _ = [s_pg(pk, s[1]) for pk, s in zip(pkw, sorted_)]
        slope(s_pg, [(pk, s[1]) for pk, s in zip(pkw, sorted_)],
              f"  gather width {Dw}")

    # --- stage 6: tile_starts compare-sum ---
    @jax.jit
    def s_starts(key_s):
        tile_s = (key_s >> jnp.uint32(settings.depth_bits)).astype(jnp.int32)
        n_tiles = settings.num_tiles
        return jnp.sum(
            tile_s[None, :] < jnp.arange(n_tiles + 1,
                                         dtype=jnp.int32)[:, None],
            axis=1).astype(jnp.int32)

    starts = [s_starts(s[0]) for s in sorted_]
    slope(s_starts, [(s[0],) for s in sorted_], "tile_starts compare-sum")

    # --- stage 7: chunk table transpose ---
    class FakeBinning:
        pass

    @jax.jit
    def s_chunks(rows):
        Kv, Dv = rows.shape
        if Dv < D_PAD:
            rows = jnp.pad(rows, ((0, 0), (0, D_PAD - Dv)))
        return rows.reshape(Kv // CHUNK, CHUNK, D_PAD)

    chunks = [s_chunks(r) for r in pgs]
    slope(s_chunks, [(r,) for r in pgs], "chunk table pad+transpose")

    # --- stage 8: kernel proper ---
    params = make_params(sf, settings)

    @jax.jit
    def s_kernel(data, tstarts):
        return run_forward(data, tstarts, params, settings, 4, 4)

    _ = [s_kernel(c, st) for c, st in zip(chunks, starts)]
    slope(s_kernel, list(zip(chunks, starts)), "pallas fwd kernel only")

    # --- full binning + full render for reference ---
    @jax.jit
    def s_bin(prep, packed):
        return bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                             prep.tiles_touched, sf, settings,
                             payload=packed)

    _ = [s_bin(p, pk) for p, pk in pp]
    slope(s_bin, pp, "bin_gaussians total")


if __name__ == "__main__":
    main()
