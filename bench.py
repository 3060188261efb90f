#!/usr/bin/env python
"""Benchmark: 66x1030 stitched panorama renders/sec on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload mirrors the reference's headline render: a KITTI-360-scale
scene (1e6 gaussians, configs/kitti360_nvs_1908.yaml:10) rendered as the
full 360-degree range map = two 66x515 half-panoramas
(gaussian_renderer/__init__.py:158-227). vs_baseline is measured against
100 renders/sec — a generous estimate of the CUDA rasterizer's A100
throughput at this resolution (the reference publishes no numbers;
BASELINE.md) — so vs_baseline >= 2.0 meets the north star.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

A100_BASELINE_RENDERS_PER_SEC = 100.0


def build_scene(P=1_000_000, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    # points distributed like a driving scene: road band + structure
    theta = rng.uniform(np.pi / 2 - 0.45, np.pi / 2 + 0.35, P)
    phi = rng.uniform(-np.pi, np.pi, P)
    r = np.exp(rng.uniform(np.log(2.2), np.log(60.0), P))
    x = r * np.sin(theta) * np.sin(phi)
    z = r * np.sin(theta) * np.cos(phi)
    y = -r * np.cos(theta)
    means = np.stack([x, y, z], 1).astype(np.float32) * 0.1  # PCA-like scale
    scale = (0.03 * r * 0.1).astype(np.float32)
    scales = np.stack([scale, scale, scale], 1)
    return dict(
        means3D=jnp.asarray(means),
        scales=jnp.asarray(scales),
        rotations=jnp.asarray(rng.random((P, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(0.2, 0.9, P).astype(np.float32)),
        shs=jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32)),
        features=jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
        mask=jnp.ones(P, bool),
    )


def main():
    import jax
    import jax.numpy as jnp
    from gslidar_tpu.raster import RasterSettings, rasterize

    settings = RasterSettings(height=66, width=515, vfov=(-24.9, 2.0),
                              hfov=(-90, 90), num_extra_features=4,
                              pair_cap=1 << 19, tile_chunk=64,
                              tile_list_cap=16384, tile_h=8, tile_w=128,
                              backend="pallas")
    scene = build_scene()
    sf = 0.1
    bg = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    viewm_f = jnp.eye(4, dtype=jnp.float32)
    # backward camera: R_back = R @ diag(-1,1,-1) (scene/kitti360_loader.py:215-218)
    viewm_b = jnp.asarray(np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32))

    @jax.jit
    def render_360(sc, viewmat_front, viewmat_back):
        outs = []
        for vm in (viewmat_front, viewmat_back):
            out = rasterize(sc["means3D"], sc["scales"],
                            sc["rotations"], sc["opacity"], sc["shs"],
                            sc["features"], sc["mask"], vm,
                            jnp.zeros(3), bg, 3, sf, settings=settings)
            outs.append((out.color, out.depth, out.alpha))
        return outs

    # warm up / compile
    out = render_360(scene, viewm_f, viewm_b)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = render_360(scene, viewm_f, viewm_b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    renders_per_sec = n_iter / dt

    print(json.dumps({
        "metric": "pano_360_renders_per_sec_66x1030_1M_gaussians",
        "value": round(renders_per_sec, 3),
        "unit": "renders/s",
        "vs_baseline": round(renders_per_sec / A100_BASELINE_RENDERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
