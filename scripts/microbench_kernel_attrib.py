#!/usr/bin/env python
"""Attribute the Pallas forward kernel's wall time to its stages.

Times run_forward on the bench workload with pieces surgically disabled
(monkeypatched module globals — outputs are WRONG in those variants;
only the timing is meaningful):

  * full           — the real kernel (baseline)
  * no-prefix      — _prefix_mul = identity: removes the 8-level
                     roll/mul/select transmittance ladder
  * no-prefix-excl — additionally _excl_of = identity (1 roll + select)

Usage: python scripts/microbench_kernel_attrib.py [--tiles 16x32]
       [--chunk 256] [--pair-cap 2105344]
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
    import jax
    times = {}
    for n in (N_LO, N_HI):
        out = fn(*args_list[0])
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = float("inf")
        for _r in range(REPS):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(*args_list[i % len(args_list)])
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:40s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="16x32")
    ap.add_argument("--pair-cap", type=int, default=2105344)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings
    from gslidar_tpu.raster.preprocess import preprocess
    from gslidar_tpu.raster.binning import bin_gaussians, data_chunks
    from gslidar_tpu.raster import pallas_fwd as PF

    th, tw = (int(v) for v in args_cli.tiles.split("x"))
    settings = RasterSettings(
        height=66, width=1030, vfov=(-24.9, 2.0), hfov=(-180, 180),
        num_extra_features=4, pair_cap=args_cli.pair_cap,
        tile_h=th, tile_w=tw, wrap_x=True, backend="pallas",
        compute_distortion=False)
    sf = 0.1
    scenes = [build_scene(seed=s) for s in (0, 1)]
    vm = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3)

    @jax.jit
    def prep_and_bin(sc):
        prep = preprocess(sc["means3D"], sc["scales"], sc["rotations"],
                          sc["opacity"], sc["shs"], sc["mask"], vm,
                          campos, 3, sf, settings)
        packed = PF.pack_payload(prep, sc["opacity"], sc["features"])
        b = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                          prep.tiles_touched, sf, settings, payload=packed)
        return data_chunks(b, PF.CHUNK, PF.D_PAD), b.tile_starts

    tables = [prep_and_bin(sc) for sc in scenes]
    params = PF.make_params(sf, settings)

    def timed_variant(label):
        @jax.jit
        def run(data, tile_starts):
            return PF.run_forward(data, tile_starts, params, settings, 4, 4)
        slope(run, tables, label)

    timed_variant(f"full kernel (CHUNK={PF.CHUNK})")

    orig_pm, orig_ex = PF._prefix_mul, PF._excl_of
    try:
        PF._prefix_mul = lambda x, n: x
        timed_variant("no prefix ladder")
        PF._excl_of = lambda incl, iota: incl
        timed_variant("no prefix ladder, no excl roll")
    finally:
        PF._prefix_mul, PF._excl_of = orig_pm, orig_ex


if __name__ == "__main__":
    main()
