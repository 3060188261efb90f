#!/usr/bin/env python
"""Stage-level breakdown of the render hot path on the bench workload.

Times (each as its own jitted program, inputs varied per call so the axon
relay can't memoize): preprocess / binning / chunk layout+gather / pallas
kernel / full render. Run on the real chip:

    PYTHONPATH=. python scripts/profile_render.py [--single]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def timeit(fn, args_list, n=10, label=""):
    import jax
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:34s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings
    from gslidar_tpu.raster.preprocess import preprocess
    from gslidar_tpu.raster.binning import bin_gaussians
    from gslidar_tpu.raster import rasterize

    settings = RasterSettings(height=66, width=515, vfov=(-24.9, 2.0),
                              hfov=(-90, 90), num_extra_features=4,
                              pair_cap=1 << 19, tile_chunk=64,
                              tile_list_cap=16384, tile_h=8, tile_w=128,
                              backend="pallas")
    sf = 0.1
    bg = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    # two scenes to defeat relay memoization
    scenes = [build_scene(seed=s) for s in (0, 1)]
    vm = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3)
    deg = 3

    @jax.jit
    def run_pre(sc):
        return preprocess(sc["means3D"], sc["scales"], sc["rotations"],
                          sc["opacity"], sc["shs"], sc["mask"], vm, campos,
                          deg, sf, settings)

    preps = [run_pre(sc) for sc in scenes]
    jax.block_until_ready(preps)
    n_valid = [int(jnp.sum(p.valid)) for p in preps]
    n_pairs = [int(jnp.sum(p.tiles_touched)) for p in preps]
    print(f"P=1M  valid={n_valid}  pairs={n_pairs}  cap={settings.pair_cap}")

    timeit(run_pre, [(sc,) for sc in scenes], args_cli.iters,
           "preprocess (half pano)")

    @jax.jit
    def run_bin(prep):
        return bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                             prep.tiles_touched, sf, settings)

    binnings = [run_bin(p) for p in preps]
    jax.block_until_ready(binnings)
    timeit(run_bin, [(p,) for p in preps], args_cli.iters,
           "binning (scatter+sort+ranges)")

    from gslidar_tpu.raster.pallas_op import (layout_indices, _build_data,
                                              _run_fwd)

    @jax.jit
    def run_layout(binning, prep, sc):
        Tcols = prep.T.transpose(0, 2, 1).reshape(-1, 9)
        packed = jnp.concatenate([
            Tcols, prep.xy, prep.depth[:, None], prep.normal,
            sc["opacity"][:, None], prep.color, sc["features"]], axis=1)
        gid_padded, start_chunks, counts = layout_indices(
            binning, packed.shape[0], settings)
        return _build_data(packed, gid_padded), start_chunks, counts

    layouts = [run_layout(b, p, sc)
               for b, p, sc in zip(binnings, preps, scenes)]
    jax.block_until_ready(layouts)
    print(f"layout rows: {[l[0].shape[0] for l in layouts]}")
    timeit(run_layout, list(zip(binnings, preps, scenes)), args_cli.iters,
           "chunk layout + payload gather")

    params = jnp.asarray([2.0 * sf, 300.0 * sf,
                          *settings.angle_bounds, 0.0, 0.0], jnp.float32)

    @jax.jit
    def run_kernel(data, start_chunks, counts):
        return _run_fwd(data, start_chunks, counts, params, settings, 4, 4)

    kouts = [run_kernel(*l) for l in layouts]
    jax.block_until_ready(kouts)
    timeit(run_kernel, layouts, args_cli.iters, "pallas fwd kernel")

    @jax.jit
    def run_full(sc, viewmat):
        out = rasterize(sc["means3D"], sc["scales"], sc["rotations"],
                        sc["opacity"], sc["shs"], sc["features"], sc["mask"],
                        viewmat, campos, bg, deg, sf, settings=settings)
        return out.color, out.depth, out.alpha

    timeit(run_full, [(sc, vm) for sc in scenes], args_cli.iters,
           "FULL half-pano render")

    vmb = jnp.asarray(np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32))

    @jax.jit
    def run_360(sc):
        outs = []
        for v in (vm, vmb):
            out = rasterize(sc["means3D"], sc["scales"], sc["rotations"],
                            sc["opacity"], sc["shs"], sc["features"],
                            sc["mask"], v, campos, bg, deg, sf,
                            settings=settings)
            outs.append((out.color, out.depth, out.alpha))
        return outs

    dt = timeit(run_360, [(sc,) for sc in scenes], args_cli.iters,
                "FULL 360 (two halves)")
    print(f"=> {1000.0 / dt:.2f} renders/s")


if __name__ == "__main__":
    main()
