"""Training orchestration: jitted step, densification cadence, loop.

Reference: train.py:38-464 (training()). The per-iteration work —
render, 12 losses, backward, Adam for gaussians + ray-drop prior,
densification statistics — is ONE jitted program; host code only picks
cameras, rolls RNG, and triggers densify/eval/checkpoint at the reference
cadence.

Reference quirk preserved: on densification iterations the freshly
replaced torch Parameters have .grad None so optimizer.step() is a no-op
for the gaussians (train.py:356-375); here the step runs in stats-only
mode on those iterations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gslidar_tpu.engine.losses import compute_losses
from gslidar_tpu.engine.render import render
from gslidar_tpu.models import gaussians as G
from gslidar_tpu.models.densify import (add_densification_stats,
                                        densify_and_prune, reset_opacity)
from gslidar_tpu.models.optim import AdamState, adam_step, group_lrs, init_adam
from gslidar_tpu.models.raydrop_prior import PriorAdam
from gslidar_tpu.raster.rasterize import densify_grads_from_T_tap
from gslidar_tpu.raster.settings import RasterSettings


class TrainState(NamedTuple):
    params: dict
    aux: G.GaussianAux
    opt: AdamState
    prior: jnp.ndarray
    prior_opt: tuple


class CameraBatch(NamedTuple):
    """Array-only view of one training camera."""
    viewmat: jnp.ndarray
    campos: jnp.ndarray
    timestamp: jnp.ndarray
    towards_idx: jnp.ndarray
    pts_depth: jnp.ndarray
    pts_intensity: jnp.ndarray


def camera_to_batch(cam) -> CameraBatch:
    return CameraBatch(
        viewmat=jnp.asarray(cam.world_view_transform),
        campos=jnp.asarray(cam.camera_center),
        timestamp=jnp.asarray(cam.timestamp, jnp.float32),
        towards_idx=jnp.asarray(0 if cam.towards == "forward" else 1, jnp.int32),
        pts_depth=jnp.asarray(cam.pts_depth),
        pts_intensity=jnp.asarray(cam.pts_intensity))


def make_train_step(args, cfg: G.GaussianConfig, settings: RasterSettings,
                    bg, *, stats_enabled_default=True):
    """Build the jitted train step for one resolution."""
    dynamic = bool(args.dynamic)
    median_depth = bool(args.get("median_depth", False))
    sf = float(args.scale_factor)

    @functools.partial(jax.jit, static_argnames=("apply_update",))
    def train_step(state: TrainState, cam: CameraBatch, iteration,
                   sh_degree, time_shift, stats_on, apply_update: bool = True):
        cap = state.aux.alive.shape[0]
        T_tap0 = jnp.zeros((cap, 3, 3), jnp.float32)

        def loss_fn(params, prior, T_tap):
            pkg = render(params, state.aux.alive, cam.viewmat, cam.campos,
                         cam.timestamp, cam.towards_idx, prior, bg,
                         sh_degree, sf, cfg, settings, dynamic=dynamic,
                         median_depth=median_depth, time_shift=time_shift,
                         T_tap=T_tap)
            opa = G.get_opacity(params)[:, 0]
            loss, log = compute_losses(pkg, cam.pts_depth, cam.pts_intensity,
                                       iteration, args, opa,
                                       state.aux.alive.astype(jnp.float32))
            return loss, (log, pkg)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (log, pkg)), (gp, gprior, gtap) = grad_fn(
            state.params, state.prior, T_tap0)

        # densification statistics (reference train.py:356-362)
        vs_grad = densify_grads_from_T_tap(gtap, _transmat_for_stats(
            state.params, cam.viewmat, cfg, cam.timestamp, time_shift), settings)
        aux = add_densification_stats(
            state.aux,
            jnp.where(stats_on, vs_grad, 0.0),
            jnp.where(stats_on, gp["t"], 0.0),
            pkg.radii, pkg.visibility & (stats_on > 0))

        if apply_update:
            lrs = group_lrs(args, iteration)
            new_params, new_opt = adam_step(state.params, gp, state.opt, lrs)
        else:
            new_params, new_opt = state.params, state.opt

        new_prior, new_prior_opt = PriorAdam.step(
            state.prior, gprior, state.prior_opt, args.raydrop_prior_lr)

        log = dict(log)
        log["num_dropped"] = pkg.num_dropped
        log["num_pairs"] = pkg.num_pairs
        log["tile_need"] = pkg.tile_need
        return TrainState(new_params, aux, new_opt, new_prior,
                          new_prior_opt), loss, log

    return train_step


def _transmat_for_stats(params, viewmat, cfg, timestamp, time_shift):
    """Recompute the T frame for the viewspace-gradient conversion (cheap
    [P, 3, 3] math; matches the forward's means)."""
    from gslidar_tpu.raster.preprocess import build_transmat
    ts = timestamp - time_shift
    means3D = G.get_xyz_shm(params, ts, cfg)
    means3D = means3D + G.get_inst_velocity(params, cfg) * time_shift
    T, _ = build_transmat(means3D, G.get_scaling(params), params["rotation"],
                          viewmat)
    return T


def make_demand_probe(args, cfg: G.GaussianConfig, settings: RasterSettings,
                      with_tiles: bool):
    """Jitted per-camera instance-demand probe: (num_pairs, tile_need).

    The CUDA rasterizer sizes its buffers exactly per frame
    (rasterize_points.cu:25-33); static XLA shapes can't, so the caps are
    sized ONCE at startup by probing the training cameras — before the
    first train-step compile, so an undersized config costs one cheap
    probe compile instead of a train-step re-jit storm (preprocess +
    binning only; no compositor, no gradients).

    ``with_tiles`` additionally runs the binning sort (at the probe
    settings' pair_cap) to measure the worst per-tile instance count —
    only meaningful for the XLA backend's tile_list_cap (the pallas
    compositor is cap-free per tile).
    """
    from gslidar_tpu.raster.binning import bin_gaussians
    from gslidar_tpu.raster.composite import tile_list_need
    from gslidar_tpu.raster.preprocess import preprocess

    dynamic = bool(args.dynamic)
    sf = float(args.scale_factor)

    @jax.jit
    def probe(params, alive, cam: CameraBatch):
        opacity = G.get_opacity(params)[:, 0]
        means3D = G.get_xyz_shm(params, cam.timestamp, cfg)
        marginal = G.get_marginal_t(params, cam.timestamp)[:, 0]
        if dynamic:
            opacity = opacity * marginal
        mask = alive & (opacity > 1.0 / 255.0)
        if dynamic:
            mask = mask & (marginal > 0.05)
        colors = jnp.zeros((opacity.shape[0], 4), jnp.float32)
        prep = preprocess(means3D, G.get_scaling(params), params["rotation"],
                          opacity, None, mask, cam.viewmat, cam.campos,
                          jnp.zeros((), jnp.int32), sf, settings,
                          colors_precomp=colors)
        num_pairs = jnp.sum(prep.tiles_touched).astype(jnp.int32)
        if with_tiles:
            binning = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                                    prep.tiles_touched, sf, settings)
            return num_pairs, tile_list_need(binning)
        return num_pairs, jnp.zeros((), jnp.int32)

    return probe


def auto_pair_cap(cap, pairs_now, pairs_hi, *, floor=1 << 15,
                  growth_headroom=1.25, shrink_at=4.0, shrink_to=2.0):
    """Next power-of-two instance-list cap, or None to keep the current one.

    GROW as soon as the live (gaussian, tile) instance count exceeds the
    cap — the step just rendered from a clipped list; SHRINK when the
    recent high-water mark ``pairs_hi`` leaves >= ``shrink_at``x headroom,
    because binning cost is cap-linear (~17 ms per M slots of dead cap at
    1M gaussians). Growth targets ``growth_headroom``x the live count,
    shrink targets ``shrink_to``x the high-water mark; the 2x/4x gap is
    the hysteresis that prevents recompile thrash. This mirrors the CUDA
    rasterizer's exact per-frame buffer sizing (rasterize_points.cu:25-33)
    at power-of-two granularity (each change costs one re-jit, like the
    existing gaussian-capacity growth path).
    """
    def pow2(n):
        return 1 << max(int(n) - 1, 1).bit_length()

    # binning packs slot offsets in 24 bits (binning.py asserts
    # pair_cap <= 2^24): growth saturates there rather than crashing the
    # rebuild; the overflow note keeps printing so the clipping is loud
    ceiling = 1 << 24
    if pairs_now > cap:
        if cap >= ceiling:
            return None
        return min(max(pow2(pairs_now * growth_headroom), floor), ceiling)
    if pairs_hi is not None and cap > max(pairs_hi, 1) * shrink_at \
            and cap > floor:
        new = max(pow2(pairs_hi * shrink_to), floor)
        if new < cap:
            return new
    return None


def make_densify_fn(args, cfg: G.GaussianConfig):
    @functools.partial(jax.jit, static_argnames=("size_threshold_on",
                                                 "prune_only"))
    def densify_fn(params, aux, opt, key, extent, size_threshold,
                   size_threshold_on: bool, prune_only: bool = False):
        return densify_and_prune(
            params, aux, opt, key, cfg,
            max_grad=args.densify_grad_threshold,
            max_grad_t=args.densify_grad_t_threshold,
            min_opacity=args.thresh_opa_prune,
            extent=extent,
            size_threshold=size_threshold if size_threshold_on else None,
            prune_only=prune_only)
    return densify_fn


def init_train_state(params, aux, prior) -> TrainState:
    return TrainState(params=params, aux=aux, opt=init_adam(params),
                      prior=prior, prior_opt=PriorAdam.init(prior))


def reset_opacity_state(state: TrainState, cfg) -> TrainState:
    p, opt = reset_opacity(state.params, state.opt, cfg)
    return state._replace(params=p, opt=opt)
