#!/usr/bin/env python
"""Training-step throughput at KITTI-360 scale (1M gaussians).

One full jitted step — render fwd+bwd through the pallas kernels, the
13-term loss, per-group Adam, densification statistics, prior Adam — on
the training raster config (66x515 half panorama, 8x64 tiles), timed as
a dependent chain (see scripts/profile_render.py for the method).

    python scripts/bench_train_step.py [--cap-bits 20] [--points 1000000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap-bits", type=int, default=20)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--tiles", default="8x64")
    ap.add_argument("--bf16", action="store_true",
                    help="payload_bf16=True (packed blend columns; the "
                    "prod mode train.py enables via raster_payload_bf16)")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gslidar_tpu.config import Config
    from gslidar_tpu.engine.train import (CameraBatch, init_train_state,
                                          make_train_step)
    from gslidar_tpu.models import gaussians as G
    from gslidar_tpu.models.raydrop_prior import init_raydrop_prior
    from gslidar_tpu.raster.settings import RasterSettings

    H, W = 66, 515
    th, tw = (int(v) for v in args_cli.tiles.split("x"))
    settings = RasterSettings(height=H, width=W, vfov=(-24.9, 2.0),
                              hfov=(-90, 90), num_extra_features=4,
                              pair_cap=1 << args_cli.cap_bits,
                              tile_h=th, tile_w=tw, backend="pallas",
                              payload_bf16=args_cli.bf16)
    args = Config({
        "dynamic": False, "scale_factor": 0.1, "sky_depth": False,
        "median_depth": False, "vfov": (-24.9, 2.0), "hfov": (-90, 90),
        "lambda_distortion": 0.1, "lambda_lidar": 10.0,
        "lambda_lidar_median": 10.0, "lambda_t_reg": 0.0,
        "lambda_v_reg": 0.01, "lambda_intensity_sh": 0.05,
        "lambda_raydrop": 0.05, "lambda_chamfer": 0.1,
        "lambda_smooth": 1e-3, "lambda_tv": 0.0, "lambda_gs_opa": 0.0,
        "lambda_normal_consistency": 0.1, "lambda_opacity_entropy": 0.05,
        "lambda_depth_var": 0.0, "lidar_decay": 0.0,
        "raydrop_prior_lr": 0.1, "iterations": 30000,
        "position_lr_init": 1.6e-4, "position_lr_final": 1.6e-6,
        "position_lr_delay_mult": 0.01, "t_lr_init": 8e-4,
        "feature_lr": 2.5e-3, "opacity_lr": 5e-3, "scaling_lr": 5e-3,
        "scaling_t_lr": 2e-3, "rotation_lr": 1e-3, "velocity_lr": 1e-3,
        "intensity_lr": 0.1,
    })
    cfg = G.GaussianConfig(random_init_point=0)

    P = args_cli.points
    rng = np.random.default_rng(0)
    theta = rng.uniform(np.pi / 2 - 0.3, np.pi / 2 + 0.03, P)
    phi = rng.uniform(-np.pi, np.pi, P)
    r = rng.uniform(3.0, 70.0, P)
    pts = np.stack([r * np.sin(theta) * np.sin(phi), -r * np.cos(theta),
                    r * np.sin(theta) * np.cos(phi)], 1).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    params, aux = G.create_from_pcd(pts, colors, None, cfg, capacity=P)

    state = init_train_state(params, aux, init_raydrop_prior(H, W))
    step = make_train_step(args, cfg, settings, jnp.asarray([0, 0, 0, 1.0]))

    def cam(seed):
        r_ = np.random.default_rng(seed)
        return CameraBatch(
            viewmat=jnp.eye(4, dtype=jnp.float32),
            campos=jnp.zeros(3, jnp.float32),
            timestamp=jnp.asarray(0.0, jnp.float32),
            towards_idx=jnp.asarray(0, jnp.int32),
            pts_depth=jnp.asarray(
                r_.uniform(0, 8, (1, H, W)).astype(np.float32)),
            pts_intensity=jnp.asarray(
                r_.uniform(0, 1, (1, H, W)).astype(np.float32)))

    cams = [cam(0), cam(1)]

    def chain(n):
        s = state
        t0 = time.perf_counter()
        for i in range(n):
            s, loss, log = step(s, cams[i % 2], jnp.asarray(100.0 + i),
                                jnp.asarray(3, jnp.int32),
                                jnp.asarray(0.0), jnp.asarray(True))
        _ = float(np.asarray(loss))
        return time.perf_counter() - t0

    chain(2)
    times = {}
    for n in (N_LO, N_HI):
        times[n] = min(chain(n) for _ in range(REPS))
    dt = (times[N_HI] - times[N_LO]) / (N_HI - N_LO)
    mode = "bf16 payload, " if args_cli.bf16 else ""
    print(f"train step ({args_cli.tiles} tiles, cap 2^{args_cli.cap_bits}, "
          f"{mode}P={P}): {dt*1000:.1f} ms/step = {1/dt:.2f} it/s "
          f"(30k iters in {dt*30000/3600:.2f} h)")


if __name__ == "__main__":
    main()
