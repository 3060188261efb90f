#!/usr/bin/env python
"""Stage-level breakdown of the jitted training step at KITTI-360 scale.

Same dependent-chain slope method as scripts/profile_render.py (the axon
relay's async dispatch makes one-shot timing meaningless). Stages are
jitted separately, so the sums exceed the fused step (XLA fuses across
stage boundaries in the real program); the point is the RATIO.

    python scripts/profile_train_step.py [--cap-bits 19]
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
    print(f"{label:44s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap-bits", type=int, default=19)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--tiles", default="8x64")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gslidar_tpu.config import Config
    from gslidar_tpu.engine.losses import compute_losses
    from gslidar_tpu.engine.render import render
    from gslidar_tpu.engine.train import (CameraBatch, init_train_state,
                                          make_train_step)
    from gslidar_tpu.models import gaussians as G
    from gslidar_tpu.models.optim import adam_step, group_lrs
    from gslidar_tpu.models.raydrop_prior import init_raydrop_prior
    from gslidar_tpu.raster.settings import RasterSettings

    H, W = 66, 515
    th, tw = (int(v) for v in args_cli.tiles.split("x"))
    settings = RasterSettings(height=H, width=W, vfov=(-24.9, 2.0),
                              hfov=(-90, 90), num_extra_features=4,
                              pair_cap=1 << args_cli.cap_bits,
                              tile_h=th, tile_w=tw, backend="pallas")
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
    bg = jnp.asarray([0, 0, 0, 1.0])
    sf = 0.1

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
    it = jnp.asarray(100.0)
    deg = jnp.asarray(3, jnp.int32)

    def loss_fn(params, prior, T_tap, cam_):
        pkg = render(params, state.aux.alive, cam_.viewmat, cam_.campos,
                     cam_.timestamp, cam_.towards_idx, prior, bg,
                     deg, sf, cfg, settings, dynamic=False,
                     median_depth=False, time_shift=jnp.asarray(0.0),
                     T_tap=T_tap)
        opa = G.get_opacity(params)[:, 0]
        loss, log = compute_losses(pkg, cam_.pts_depth, cam_.pts_intensity,
                                   it, args, opa,
                                   state.aux.alive.astype(jnp.float32))
        return loss, (log, pkg)

    cap = state.aux.alive.shape[0]
    T_tap0 = jnp.zeros((cap, 3, 3), jnp.float32)

    @jax.jit
    def fwd_only(params, prior, cam_):
        loss, (log, pkg) = loss_fn(params, prior, T_tap0, cam_)
        return loss

    slope(fwd_only, [(state.params, state.prior, c) for c in cams],
          "render fwd + losses (value only)")

    @jax.jit
    def fwd_bwd(params, prior, cam_):
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                     has_aux=True)
        (loss, _), grads = grad_fn(params, prior, T_tap0, cam_)
        return loss, grads

    slope(fwd_bwd, [(state.params, state.prior, c) for c in cams],
          "fwd + bwd (value_and_grad)")

    _, grads = fwd_bwd(state.params, state.prior, cams[0])
    gp = grads[0]

    @jax.jit
    def adam_only(params, gp, opt):
        lrs = group_lrs(args, it)
        return adam_step(params, gp, opt, lrs)

    slope(adam_only, [(state.params, gp, state.opt)], "per-group Adam")

    step = make_train_step(args, cfg, settings, bg)

    def full(s, c):
        return step(s, c, it, deg, jnp.asarray(0.0), jnp.asarray(True))

    dt = slope(full, [(state, c) for c in cams], "FULL fused train step")
    print(f"=> {1000.0 / dt:.2f} it/s")


if __name__ == "__main__":
    main()
