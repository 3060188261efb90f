#!/usr/bin/env python
"""Per-tile instance statistics of the honest 360 bench workload for
candidate tile shapes — sizes pair_cap / tile_list_cap honestly."""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import build_scene
    from gslidar_tpu.raster.settings import RasterSettings
    from gslidar_tpu.raster.preprocess import preprocess

    sf = 0.1
    scene = build_scene(seed=0)
    vm = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3)

    for th, tw in ((8, 128), (16, 128), (16, 64), (32, 32), (8, 64),
                   (32, 64), (16, 32)):
        # full 360 in one pass; width 1030
        settings = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                                  hfov=(-180, 180), num_extra_features=4,
                                  tile_h=th, tile_w=tw, wrap_x=True,
                                  pair_cap=1 << 22, tile_list_cap=1 << 16)
        try:
            prep = preprocess(scene["means3D"], scene["scales"],
                              scene["rotations"], scene["opacity"],
                              scene["shs"], scene["mask"], vm, campos,
                              3, sf, settings)
        except AssertionError as e:
            print(f"tile {th}x{tw}: skip ({e})")
            continue
        tt = np.asarray(prep.tiles_touched)
        rmin = np.asarray(prep.rect_min)
        rmax = np.asarray(prep.rect_max)
        valid = np.asarray(prep.valid)
        K = int(tt.sum())
        # per-tile counts (numpy replay of the modular column walk)
        gx, gy = settings.tiles_x, settings.tiles_y
        counts = np.zeros(gx * gy + 1, np.int64)
        v = valid & (tt > 0)
        x0 = rmin[v, 0]; y0 = rmin[v, 1]
        wt = rmax[v, 0] - rmin[v, 0]; ht = rmax[v, 1] - rmin[v, 1]
        for dy in range(int(ht.max()) if len(ht) else 0):
            rows_ok = ht > dy
            for dx in range(int(wt.max()) if len(wt) else 0):
                m = rows_ok & (wt > dx)
                xc = x0[m] + dx
                if settings.wrap_x:
                    xc = np.where(xc >= gx, xc - gx, xc)
                t = (y0[m] + dy) * gx + xc
                np.add.at(counts, t, 1)
        counts = counts[:gx * gy]
        print(f"tile {th}x{tw}: grid {gy}x{gx}={gx*gy}, pairs={K}, "
              f"mean/tile={counts.mean():.0f}, p50={np.percentile(counts,50):.0f}, "
              f"p90={np.percentile(counts,90):.0f}, max={counts.max()}, "
              f"px-work={K*th*tw/1e9:.2f}G")


if __name__ == "__main__":
    main()
