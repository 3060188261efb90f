"""Multi-chip scaling: camera-data-parallel training over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3 — no distributed
backend of any kind), so there is no communication pattern to port. The
TPU-native extension implemented here:

* a 1-D ``Mesh(devices, ("data",))``;
* gaussian parameters + optimizer state REPLICATED across the mesh;
* the per-iteration camera batch SHARDED along "data" — each chip renders
  and differentiates its own panorama (the reference's batch is one camera,
  train.py:162-176; here it is one camera *per chip*);
* gradients are averaged with a mean over the batch axis — under jit +
  shardings XLA lowers this to an all-reduce (psum) over ICI;
* the Adam update then runs replicated, keeping params bitwise identical
  on every chip.

This scales the dominant cost (render fwd+bwd) linearly in chips without
touching the rasterizer internals. Gaussian-axis sharding of preprocess /
binning is a further extension tracked for the Pallas kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gslidar_tpu.engine.losses import compute_losses
from gslidar_tpu.engine.render import render
from gslidar_tpu.engine.train import CameraBatch
from gslidar_tpu.models import gaussians as G
from gslidar_tpu.models.optim import adam_step, group_lrs, init_adam
from gslidar_tpu.raster.settings import RasterSettings


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def make_parallel_train_step(args, cfg: G.GaussianConfig,
                             settings: RasterSettings, bg, mesh: Mesh):
    """Jitted data-parallel train step: camera batch axis -> mesh 'data'."""
    dynamic = bool(args.dynamic)
    sf = float(args.scale_factor)

    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))

    def per_camera_loss(params, prior, alive, cam: CameraBatch, iteration,
                        sh_degree):
        pkg = render(params, alive, cam.viewmat, cam.campos, cam.timestamp,
                     cam.towards_idx, prior, bg, sh_degree, sf, cfg,
                     settings, dynamic=dynamic)
        opa = G.get_opacity(params)[:, 0]
        loss, _ = compute_losses(pkg, cam.pts_depth, cam.pts_intensity,
                                 iteration, args, opa,
                                 alive.astype(jnp.float32))
        return loss

    def batched_loss(params, prior, alive, cams: CameraBatch, iteration,
                     sh_degree):
        losses = jax.vmap(
            lambda c: per_camera_loss(params, prior, alive, c, iteration,
                                      sh_degree))(cams)
        return jnp.mean(losses)   # mean over batch == psum/n over the mesh

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, repl,
                      jax.tree.map(lambda _: batch_shard,
                                   CameraBatch(*[0] * 6)),
                      repl, repl),
        out_shardings=(repl, repl, repl))
    def train_step(params, opt_state, prior, alive, cams, iteration,
                   sh_degree):
        loss, (gp, gprior) = jax.value_and_grad(
            batched_loss, argnums=(0, 1))(params, prior, alive, cams,
                                          iteration, sh_degree)
        lrs = group_lrs(args, iteration)
        new_params, new_opt = adam_step(params, gp, opt_state, lrs)
        return new_params, new_opt, loss

    return train_step


def _toy_camera_batch(n, H, W, seed=0) -> CameraBatch:
    rng = np.random.default_rng(seed)
    return CameraBatch(
        viewmat=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))),
        campos=jnp.zeros((n, 3), jnp.float32),
        timestamp=jnp.asarray(np.linspace(-0.5, 0.5, n), jnp.float32),
        towards_idx=jnp.asarray(np.arange(n) % 2, jnp.int32),
        pts_depth=jnp.asarray(
            rng.uniform(0, 30, (n, 1, H, W)).astype(np.float32)),
        pts_intensity=jnp.asarray(
            rng.uniform(0, 1, (n, 1, H, W)).astype(np.float32)))


def dryrun_multichip(n_devices: int) -> None:
    """One data-parallel train step on tiny shapes over an n-device mesh."""
    from gslidar_tpu.config import Config

    mesh = make_mesh(n_devices)
    H, W = 32, 64
    settings = RasterSettings(height=H, width=W, vfov=(-24.9, 2.0),
                              hfov=(-90, 90), num_extra_features=4,
                              pair_cap=1 << 14, tile_chunk=16,
                              tile_list_cap=256)
    cfg = G.GaussianConfig(random_init_point=0)
    args = Config({
        "dynamic": True, "scale_factor": 1.0, "sky_depth": False,
        "median_depth": False, "vfov": (-24.9, 2.0), "hfov": (-90, 90),
        "lambda_distortion": 0.1, "lambda_lidar": 10.0,
        "lambda_lidar_median": 10.0, "lambda_t_reg": 0.0,
        "lambda_v_reg": 0.01, "lambda_intensity_sh": 0.05,
        "lambda_raydrop": 0.05, "lambda_chamfer": 0.1, "lambda_smooth": 1e-3,
        "lambda_tv": 0.0, "lambda_gs_opa": 0.0,
        "lambda_normal_consistency": 0.1, "lambda_opacity_entropy": 0.05,
        "lambda_depth_var": 0.0, "lidar_decay": 0.0,
        "iterations": 1000, "position_lr_init": 1.6e-4,
        "position_lr_final": 1.6e-6, "position_lr_delay_mult": 0.01,
        "t_lr_init": 8e-4, "feature_lr": 2.5e-3, "opacity_lr": 5e-3,
        "scaling_lr": 5e-3, "scaling_t_lr": 2e-3, "rotation_lr": 1e-3,
        "velocity_lr": 1e-3, "intensity_lr": 0.1,
    })

    rng = np.random.default_rng(0)
    P_init = 2048
    pts = rng.uniform(-1, 1, (P_init, 3)).astype(np.float32) * [5, 5, 20]
    pts[:, 2] += 25
    colors = rng.uniform(0, 1, (P_init, 3)).astype(np.float32)
    params, aux = G.create_from_pcd(pts, colors, None, cfg, capacity=4096)

    from gslidar_tpu.models.raydrop_prior import init_raydrop_prior
    prior = init_raydrop_prior(H, W)
    opt = init_adam(params)

    step = make_parallel_train_step(args, cfg, settings,
                                    jnp.asarray([0, 0, 0, 1.0]), mesh)
    cams = _toy_camera_batch(n_devices, H, W)
    with mesh:
        new_params, new_opt, loss = step(
            params, opt, prior, aux.alive, cams,
            jnp.asarray(100.0), jnp.asarray(3, jnp.int32))
        loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    changed = float(jnp.max(jnp.abs(new_params["xyz"] - params["xyz"])))
    assert changed > 0, "parameters did not update"
    print(f"dryrun_multichip({n_devices}): loss={loss:.5f} ok")
