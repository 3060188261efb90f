#!/usr/bin/env python
"""Benchmark: 66x1030 stitched panorama renders/sec on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload mirrors the reference's headline render: a KITTI-360-scale
scene (1e6 gaussians, configs/kitti360_nvs_1908.yaml:10) rendered as the
full 360-degree range map (reference: two 66x515 half-panoramas,
gaussian_renderer/__init__.py:158-227; here: ONE circular single-pass
panorama — same pixels, same math). The render is HONEST: the scene
generates ~1.27M live (gaussian, tile) instances (24x64 tiles + tight
rects; ~2.0M at 16x32, ~2.3M with reference-square rects) and the caps are sized so
NONE are dropped (the bench asserts num_dropped == 0; round 1 silently
truncated 60% of instances). vs_baseline is measured against 100
renders/sec — a generous estimate of the CUDA rasterizer's A100
throughput at this resolution (the reference publishes no numbers;
BASELINE.md) — so vs_baseline >= 2.0 meets the north star.

Timing note: through the axon relay, dispatch is async and
block_until_ready does not block; only host fetches do (~30 ms fixed
RPC overhead). The loop is a dependent chain ending in a scalar fetch,
timed at two iteration counts; the per-render cost is the slope, which
cancels the fixed overhead.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

A100_BASELINE_RENDERS_PER_SEC = 100.0
N_LO, N_HI = 4, 24
REPS = 3


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

    # Config choices (measured, scripts/profile_render.py, round-5 A/B
    # table in README): 24x64 tiles sit at the knee of the
    # kernel-cost/instance-count trade — vs 16x32 they cut live
    # instances 36% (binning is row-linear: 36.9 -> 25.3 ms) while the
    # 1536-px kernel only grows 10.2 -> 14.4 ms (lane-wide 64-px tile
    # rows keep full vregs; the narrow-tile shapes 32x32 / 22x64 and
    # the wider 16x128 all measured slower). payload_bf16 packs the 9
    # blend-side columns as bf16 pairs (binning -3.6 ms; the conic/alpha
    # T columns stay f32 — parity tests keep the all-f32 mode). The
    # pair cap sits ~6% above this scene's 1.27M live instances because
    # binning's gather-engine cost is cap-linear (24x64 at a 26%
    # oversized cap measured 46.0 ms vs 42.7 tight). GSLIDAR_BENCH_WIDE=1
    # additionally carries the payload through the binning sort
    # (payload_in_sort) — faster per render but its sort COMPILE
    # exceeds 30 min at this instance count (measured), so it is off
    # and experimental.
    settings = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                              hfov=(-180, 180), num_extra_features=4,
                              pair_cap=10560 * 128, tile_h=24, tile_w=64,
                              wrap_x=True, backend="pallas",
                              compute_distortion=False,
                              compute_contrib=False,
                              payload_bf16=True,
                              payload_in_sort=bool(
                                  os.environ.get("GSLIDAR_BENCH_WIDE")))
    scene = build_scene()
    try:
        run(settings, scene)
    except AssertionError:
        # a capacity/overflow assert is a bench-integrity failure, not a
        # backend failure — the XLA path would drop the same instances
        raise
    except Exception as e:                      # noqa: BLE001
        # never zero out the benchmark on a pallas/Mosaic regression:
        # re-measure on the XLA scan backend and say so loudly (the
        # number is then the slow path's, not a silent substitute)
        import dataclasses
        import sys
        import traceback
        traceback.print_exc()
        print(f"BENCH FALLBACK: pallas backend failed ({e!r}); "
              "re-measuring on the XLA scan backend", file=sys.stderr)
        run(dataclasses.replace(settings, backend="xla",
                                tile_list_cap=1 << 16), scene,
            backend_label="xla-fallback")


def run(settings, scene, backend_label=None):
    import jax
    import jax.numpy as jnp
    from gslidar_tpu.raster import rasterize

    sf = 0.1
    bg = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    viewm = jnp.eye(4, dtype=jnp.float32)

    @jax.jit
    def render_360(sc, viewmat):
        out = rasterize(sc["means3D"], sc["scales"],
                        sc["rotations"], sc["opacity"], sc["shs"],
                        sc["features"], sc["mask"], viewmat,
                        jnp.zeros(3), bg, 3, sf, settings=settings)
        return out.color, out.depth, out.alpha, out.num_dropped

    out = render_360(scene, viewm)
    assert int(out[3]) == 0, (
        f"pair cap overflow: {int(out[3])} instances dropped — "
        "the bench must render every instance")

    # dependent chain: each iteration's viewmat is perturbed by the
    # previous output so the relay cannot overlap or cache iterations
    def chain(n):
        vm = viewm
        color = out[0]
        t0 = time.perf_counter()
        for _ in range(n):
            eps = color[0, 0, 0] * 1e-20
            vm = viewm.at[0, 3].set(eps)
            color, depth, alpha, _nd = render_360(scene, vm)
        _ = float(np.asarray(color[0, 0, 0]))
        return time.perf_counter() - t0

    chain(2)   # warm both branches
    times = {}
    for n in (N_LO, N_HI):
        times[n] = min(chain(n) for _ in range(REPS))
    per_render = (times[N_HI] - times[N_LO]) / (N_HI - N_LO)
    renders_per_sec = 1.0 / per_render

    # "backend" makes a fallback run machine-distinguishable on stdout
    # (the loud note alone goes to stderr, which JSON consumers drop)
    print(json.dumps({
        "metric": "pano_360_renders_per_sec_66x1030_1M_gaussians",
        "value": round(renders_per_sec, 3),
        "unit": "renders/s",
        "vs_baseline": round(renders_per_sec / A100_BASELINE_RENDERS_PER_SEC, 3),
        "backend": backend_label or settings.backend,
    }))


if __name__ == "__main__":
    main()
