"""Multi-chip scaling: camera-data-parallel training over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3 — no distributed
backend of any kind), so there is no communication pattern to port. The
TPU-native extension implemented here:

* a 1-D ``Mesh(devices, ("data",))``;
* gaussian parameters + optimizer state REPLICATED across the mesh;
* the per-iteration camera batch SHARDED along "data" — each chip renders
  and differentiates its own panorama (the reference's batch is one camera,
  train.py:162-176; here it is one camera *per chip*);
* gradients are averaged by the mean over the batch axis — under jit +
  shardings XLA lowers this to an all-reduce (psum) over ICI;
* the Adam update then runs replicated, keeping params bitwise identical
  on every chip;
* densification statistics accumulate per CAMERA (B static unrolled
  calls), so one data-parallel iteration matches B sequential reference
  iterations: radii/visibility update per camera, the viewspace
  positional gradient is each camera's own T-tap conversion, the
  t-statistic is each camera's own t-gradient (exposed by a per-camera
  zero-valued ``t_tap`` added to the t parameter, so the one batched
  backward yields all B per-camera t-gradients — no extra passes), and
  denom counts every camera that saw the gaussian. Parity with B
  sequential reference iterations is asserted by
  tests/test_parallel_train_e2e.py::test_dp_densify_stats_parity.

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
from gslidar_tpu.engine.train import (CameraBatch, TrainState,
                                      _transmat_for_stats)
from gslidar_tpu.models import gaussians as G
from gslidar_tpu.models.densify import add_densification_stats
from gslidar_tpu.models.optim import adam_step, group_lrs, init_adam
from gslidar_tpu.models.raydrop_prior import PriorAdam
from gslidar_tpu.raster.rasterize import densify_grads_from_T_tap
from gslidar_tpu.raster.settings import RasterSettings


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def stack_camera_batch(cams) -> CameraBatch:
    """Stack single-camera CameraBatches along a new leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *cams)


def make_parallel_train_step(args, cfg: G.GaussianConfig,
                             settings: RasterSettings, bg, mesh: Mesh, *,
                             n_cameras: int | None = None):
    """Data-parallel twin of engine.train.make_train_step.

    Same (TrainState, loss, log) contract; ``cam`` carries a leading
    batch axis of ``n_cameras`` (default mesh size) sharded over the
    mesh's "data" axis, and ``time_shift`` is per-camera [B].
    """
    dynamic = bool(args.dynamic)
    median_depth = bool(args.get("median_depth", False))
    sf = float(args.scale_factor)
    B = n_cameras or mesh.size

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state_sh = jax.tree.map(lambda _: repl, TrainState(0, 0, 0, 0, 0))
    cams_sh = jax.tree.map(lambda _: shard, CameraBatch(*[0] * 6))

    @functools.partial(jax.jit, static_argnames=("apply_update",),
                       in_shardings=(state_sh, cams_sh, repl, repl, shard,
                                     repl),
                       out_shardings=(state_sh, repl, None))
    def train_step(state: TrainState, cams: CameraBatch, iteration,
                   sh_degree, time_shift, stats_on, apply_update: bool = True):
        cap = state.aux.alive.shape[0]
        T_tap0 = jnp.zeros((B, cap, 3, 3), jnp.float32)
        t_tap0 = jnp.zeros((B,) + state.params["t"].shape, jnp.float32)

        def per_camera(params, prior, T_tap, t_tap, cam, tsh):
            params = {**params, "t": params["t"] + t_tap}
            pkg = render(params, state.aux.alive, cam.viewmat, cam.campos,
                         cam.timestamp, cam.towards_idx, prior, bg,
                         sh_degree, sf, cfg, settings, dynamic=dynamic,
                         median_depth=median_depth, time_shift=tsh,
                         T_tap=T_tap)
            opa = G.get_opacity(params)[:, 0]
            loss, log = compute_losses(pkg, cam.pts_depth, cam.pts_intensity,
                                       iteration, args, opa,
                                       state.aux.alive.astype(jnp.float32))
            return loss, (log, pkg.radii, pkg.visibility, pkg.num_dropped,
                          pkg.num_pairs, pkg.tile_need)

        def batched_loss(params, prior, T_tap, t_tap):
            losses, aux_out = jax.vmap(
                lambda tap, tt, cam, tsh: per_camera(params, prior, tap, tt,
                                                     cam, tsh),
                in_axes=(0, 0, 0, 0))(T_tap, t_tap, cams, time_shift)
            # mean over the batch axis == psum/B over the mesh (ICI)
            return jnp.mean(losses), aux_out

        grad_fn = jax.value_and_grad(batched_loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)
        ((loss, (log_b, radii_b, vis_b, ndrop_b, npairs_b, tneed_b)),
         (gp, gprior, gtap, gttap)) = grad_fn(state.params, state.prior,
                                              T_tap0, t_tap0)

        # densification statistics per camera (see module docstring):
        # gtap carries d(mean loss)/dT per camera; undo the 1/B of the
        # mean so each camera's viewspace gradient matches its own
        # single-camera backward (reference train.py:356-362)
        trans_b = jax.vmap(
            lambda cam, tsh: _transmat_for_stats(state.params, cam.viewmat,
                                                 cfg, cam.timestamp, tsh)
        )(cams, time_shift)
        vs_b = jax.vmap(
            lambda tap, tr: densify_grads_from_T_tap(tap * B, tr, settings)
        )(gtap, trans_b)
        aux = state.aux
        for i in range(B):
            # gttap[i] = d(mean loss)/d t_tap_i = camera i's own t-gradient
            # scaled by 1/B; undo the mean like the T-tap above
            aux = add_densification_stats(
                aux,
                jnp.where(stats_on, vs_b[i], 0.0),
                jnp.where(stats_on, gttap[i] * B, 0.0),
                radii_b[i], vis_b[i] & (stats_on > 0))

        if apply_update:
            lrs = group_lrs(args, iteration)
            new_params, new_opt = adam_step(state.params, gp, state.opt, lrs)
        else:
            new_params, new_opt = state.params, state.opt

        new_prior, new_prior_opt = PriorAdam.step(
            state.prior, gprior, state.prior_opt, args.raydrop_prior_lr)

        log = {k: jnp.mean(v) for k, v in log_b.items()}
        log["num_dropped"] = jnp.max(ndrop_b)
        log["num_pairs"] = jnp.max(npairs_b)
        log["tile_need"] = jnp.max(tneed_b)
        return TrainState(new_params, aux, new_opt, new_prior,
                          new_prior_opt), loss, log

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
    """One FULL data-parallel train step (render + 13 losses + backward +
    per-group Adam + densify stats + prior Adam) on tiny shapes over an
    n-device mesh."""
    from gslidar_tpu.config import Config
    from gslidar_tpu.engine.train import init_train_state

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
        "raydrop_prior_lr": 0.1,
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
    state = init_train_state(params, aux, init_raydrop_prior(H, W))

    step = make_parallel_train_step(args, cfg, settings,
                                    jnp.asarray([0, 0, 0, 1.0]), mesh)
    cams = _toy_camera_batch(n_devices, H, W)
    with mesh:
        new_state, loss, log = step(
            state, cams, jnp.asarray(100.0), jnp.asarray(3, jnp.int32),
            jnp.zeros(n_devices, jnp.float32), jnp.asarray(True))
        loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    changed = float(jnp.max(jnp.abs(new_state.params["xyz"]
                                    - state.params["xyz"])))
    assert changed > 0, "parameters did not update"
    assert float(jnp.max(new_state.aux.denom)) > 0, "no densify stats"

    # also exercise the other multichip surface: the fully
    # gaussian-sharded single-frame panorama render with its all_to_all
    # instance exchange (parallel/pano_shard.py)
    import dataclasses

    from gslidar_tpu.parallel.pano_shard import render_pano_gaussian_sharded

    Pc = new_state.aux.alive.shape[0]
    if Pc % n_devices != 0:
        # the exchange needs P % n == 0; the primary contract (the DP
        # training step above) already ran, so just say so and finish
        print(f"dryrun_multichip({n_devices}): loss={loss:.5f} ok "
              f"(gshard render skipped: capacity {Pc} % {n_devices} != 0)")
        return
    wsettings = dataclasses.replace(
        settings, width=32 * n_devices, hfov=(-180.0, 180.0), wrap_x=True,
        tile_h=8, tile_w=32, backend="xla", pair_cap=1 << 16,
        tile_list_cap=2048)
    p = new_state.params
    color, _f, _d, alpha, _c, _t, ndrop = render_pano_gaussian_sharded(
        G.get_xyz_shm(p, jnp.asarray(0.0), cfg), G.get_scaling(p),
        p["rotation"], G.get_opacity(p)[:, 0]
        * new_state.aux.alive.astype(jnp.float32),
        G.get_features(p), jnp.zeros((Pc, 4), jnp.float32),
        new_state.aux.alive, jnp.eye(4), jnp.zeros(3),
        jnp.asarray([0, 0, 0, 1.0]), 3, 1.0, wsettings, mesh)
    assert np.isfinite(float(jnp.sum(color))), "gshard render non-finite"
    ndrop = int(ndrop)
    assert ndrop == 0, f"gshard render dropped {ndrop} instances"
    print(f"dryrun_multichip({n_devices}): loss={loss:.5f} "
          f"gshard_dropped={ndrop} ok")
