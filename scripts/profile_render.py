#!/usr/bin/env python
"""Stage-level breakdown of the render hot path on the bench workload.

Measurement through the axon relay: dispatch is async and
block_until_ready does NOT block; only host fetches do (with a ~30 ms
fixed RPC overhead). Every stage is therefore timed as a dependent
python-loop chain ending in a scalar fetch, at two iteration counts, and
the per-iteration cost is the slope (fixed overheads cancel).

    python scripts/profile_render.py [--tiles 32x32 ...]
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

N_LO, N_HI = 2, 8
REPS = 3


def slope(fn, args_list, label=""):
    """fn(*args) -> pytree; dependent chain via python loop + fetch."""
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
    print(f"{label:40s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", nargs="*", default=["32x32"],
                    help="tile shapes to profile, e.g. 8x128 32x32")
    ap.add_argument("--pair-cap-bits", type=int, default=21)
    ap.add_argument("--pair-cap", type=int, default=0,
                    help="exact pair cap (overrides --pair-cap-bits); "
                    "17664*128 = the bench cap")
    ap.add_argument("--wide", action="store_true",
                    help="payload_in_sort=True (serving mode; slow compile)")
    ap.add_argument("--dist", action="store_true",
                    help="compute_distortion=True (training kernel)")
    ap.add_argument("--bf16", action="store_true",
                    help="payload_bf16=True (packed blend columns)")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings
    from gslidar_tpu.raster.preprocess import preprocess
    from gslidar_tpu.raster.binning import bin_gaussians, data_chunks
    from gslidar_tpu.raster.pallas_fwd import (CHUNK, d_pad_for, make_params,
                                               pack_payload, pack_rows,
                                               run_forward)
    from gslidar_tpu.raster import rasterize

    sf = 0.1
    bg = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    scenes = [build_scene(seed=s) for s in (0, 1)]
    vm = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3)
    deg = 3

    for tile in args_cli.tiles:
        th, tw = (int(v) for v in tile.split("x"))
        settings = RasterSettings(
            height=66, width=1030, vfov=(-24.9, 2.0), hfov=(-180, 180),
            num_extra_features=4,
            pair_cap=args_cli.pair_cap or (1 << args_cli.pair_cap_bits),
            tile_h=th, tile_w=tw, wrap_x=True, backend="pallas",
            payload_in_sort=args_cli.wide,
            compute_distortion=args_cli.dist,
            compute_contrib=args_cli.dist,      # bench mode: off like bench.py
            payload_bf16=args_cli.bf16)
        print(f"--- tile {th}x{tw}  grid {settings.tiles_y}x{settings.tiles_x}"
              f"  pair_cap {settings.pair_cap}")

        @jax.jit
        def run_pre(sc):
            return preprocess(sc["means3D"], sc["scales"], sc["rotations"],
                              sc["opacity"], sc["shs"], sc["mask"], vm,
                              campos, deg, sf, settings)

        preps = [run_pre(sc) for sc in scenes]
        n_pairs = [int(jnp.sum(p.tiles_touched)) for p in preps]
        print(f"pairs={n_pairs} cap={settings.pair_cap} "
              f"dropped={[max(0, n - settings.pair_cap) for n in n_pairs]}")
        slope(run_pre, [(sc,) for sc in scenes], "preprocess (full 360)")

        @jax.jit
        def run_bin(prep, sc):
            packed = pack_rows(
                pack_payload(prep, sc["opacity"], sc["features"]), settings)
            return bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                                 prep.tiles_touched, sf, settings,
                                 payload=packed)

        binnings = [run_bin(p, sc) for p, sc in zip(preps, scenes)]
        slope(run_bin, list(zip(preps, scenes)),
              "binning (scatter+gather+sort)")

        params = make_params(sf, settings)

        @jax.jit
        def run_kernel(binning):
            data = data_chunks(binning, CHUNK, d_pad_for(4, 4, settings))
            return run_forward(data, binning.tile_starts, params,
                               settings, 4, 4)

        slope(run_kernel, [(b,) for b in binnings],
              "chunk table + pallas fwd kernel")

        @jax.jit
        def run_full(sc):
            out = rasterize(sc["means3D"], sc["scales"], sc["rotations"],
                            sc["opacity"], sc["shs"], sc["features"],
                            sc["mask"], vm, campos, bg, deg, sf,
                            settings=settings)
            return out.color, out.depth, out.alpha

        dt = slope(run_full, [(sc,) for sc in scenes],
                   "FULL 360 single-pass render")
        print(f"=> {1000.0 / dt:.2f} renders/s")


if __name__ == "__main__":
    main()
