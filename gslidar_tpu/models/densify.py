"""Densification (clone / split / prune) on the fixed-capacity pytree.

Reference: scene/gaussian_model.py:451-614. The torch version reallocates
parameter tensors and rebuilds optimizer state; here everything is a pure
jitted slot-reuse pass:

* selection masks are computed exactly like the reference (clone for small
  high-gradient splats, split for large ones, optional time clone/split);
* new points are *emitted by gather*: the k-th new point finds its source
  gaussian via a searchsorted over cumulative emission counts (the same
  trick the rasterizer uses for tile duplication) and lands in the k-th
  free slot — no dynamic shapes, no host sync;
* optimizer surgery = zeroing Adam moments at the written slots
  (reference gaussian_model.py:396-399 appends zero moments).

Quirk preserved: the reference zeroes max_radii2D in densification_postfix
*before* the big-point screen-size prune, which makes the radii-based
big-point prune a no-op (gaussian_model.py:449,599-602); we replicate that.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.models.gaussians import (GaussianAux, GaussianConfig, Params,
                                          get_inst_velocity, get_opacity,
                                          get_scaling, get_scaling_t,
                                          inverse_sigmoid)
from gslidar_tpu.models.optim import AdamState, zero_moments_at
from gslidar_tpu.raster.preprocess import quat_to_rotmat

SPLIT_N = 2                       # reference densify_and_split N=2
RADII_PRUNE = 0.707               # gaussian_model.py:571


class DensifyOut(NamedTuple):
    params: Params
    aux: GaussianAux
    opt_state: AdamState
    n_alive: jnp.ndarray
    n_new_requested: jnp.ndarray
    n_new_placed: jnp.ndarray


def _contract_scale_factor(xyz, extent, contract: bool):
    """Contracted-space scale threshold factor
    (gaussian_model.py:459-463,537-541)."""
    if contract:
        sf = jnp.linalg.norm(xyz, axis=-1) * extent - 1.0
        return jnp.where(sf <= 1.0, 1.0, sf) / extent
    return jnp.ones(xyz.shape[0], xyz.dtype) / extent


def add_densification_stats(aux: GaussianAux, viewspace_grad, t_grad,
                            radii, visible) -> GaussianAux:
    """Accumulate per-gaussian gradient statistics
    (reference train.py:360-362, gaussian_model.py:608-614)."""
    vis = visible
    gnorm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    return aux.replace(
        max_radii2D=jnp.where(vis, jnp.maximum(aux.max_radii2D, radii),
                              aux.max_radii2D),
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        t_gradient_accum=aux.t_gradient_accum
        + jnp.where(vis, t_grad[:, 0], 0.0),
        denom=aux.denom + vis.astype(aux.denom.dtype),
    )


def densify_and_prune(params: Params, aux: GaussianAux, opt_state: AdamState,
                      rng_key, cfg: GaussianConfig, *,
                      max_grad, max_grad_t, min_opacity, extent,
                      size_threshold, prune_only: bool = False) -> DensifyOut:
    cap = aux.alive.shape[0]
    N = SPLIT_N if cfg.no_time_split else SPLIT_N + 1
    decay = SPLIT_N * 0.8                                  # 1.6, pre-increment

    alive = aux.alive & (aux.max_radii2D >= RADII_PRUNE)   # never-visible prune

    denom = aux.denom
    grads = jnp.where(denom > 0, aux.xyz_gradient_accum / denom, 0.0)
    grads_t = jnp.where(denom > 0, aux.t_gradient_accum / denom, 0.0)

    scaling = get_scaling(params)
    scaling_t = get_scaling_t(params)[:, 0]
    max_scale = jnp.max(scaling, axis=-1)
    sf = _contract_scale_factor(params["xyz"], extent, cfg.contract)
    pd_thresh = cfg.percent_dense * extent * sf

    if prune_only:
        clone_sel = jnp.zeros(cap, bool)
        split_sel = jnp.zeros(cap, bool)
        split_keep_scale = jnp.zeros(cap, bool)
        split_keep_scale_t = jnp.zeros(cap, bool)
    else:
        clone_sel = alive & (jnp.abs(grads) >= max_grad) & (max_scale <= pd_thresh)
        split_sel = alive & (jnp.abs(grads) >= max_grad) & (max_scale > pd_thresh)
        if cfg.t_grad:
            clone_sel |= alive & (jnp.abs(grads_t) >= max_grad_t) \
                & (scaling_t <= cfg.percent_dense)
            split_t = alive & (jnp.abs(grads_t) >= max_grad_t) \
                & (scaling_t > cfg.percent_dense)
            split_sel |= split_t
        # time-selected splits with small spatial scale keep their scale
        # (gaussian_model.py:514-517); same for small temporal scale
        split_keep_scale = split_sel & (max_scale < pd_thresh)
        split_keep_scale_t = split_sel & (scaling_t < cfg.percent_dense)

    # ---- emission: k-th new point -> (source gaussian, copy index) -------
    n_new_per = clone_sel.astype(jnp.int32) + split_sel.astype(jnp.int32) * N
    cum = jnp.cumsum(n_new_per)
    total_new = cum[-1]
    offs = cum - n_new_per
    slots = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    src = jnp.minimum(src, cap - 1)
    j = slots - offs[src]
    is_clone_copy = clone_sel[src] & (j == 0)

    # free slots (before killing split originals, matching append semantics)
    order = jnp.argsort(alive)                      # free slots first
    n_free = cap - jnp.sum(alive.astype(jnp.int32))
    dst = order[slots]
    valid = (slots < total_new) & (slots < n_free)
    n_placed = jnp.sum(valid.astype(jnp.int32))
    dst = jnp.where(valid, dst, cap)                # OOB -> dropped scatter

    # ---- new values ------------------------------------------------------
    k1, k2 = jax.random.split(rng_key)
    stds = scaling[src]                                        # [cap, 3]
    samples = jax.random.normal(k1, (cap, 3)) * stds
    R = quat_to_rotmat(params["rotation"][src])
    offset_xyz = jnp.einsum("kij,kj->ki", R, samples)
    samples_t = jax.random.normal(k2, (cap, 1)) * scaling_t[src][:, None]
    inst_v = get_inst_velocity(params, cfg)[src]

    split_scaling = jnp.where(split_keep_scale[src][:, None],
                              params["scaling"][src],
                              jnp.log(scaling[src] / decay))
    if cfg.no_time_split:
        split_scaling_t = params["scaling_t"][src]
    else:
        split_scaling_t = jnp.where(split_keep_scale_t[src][:, None],
                                    params["scaling_t"][src],
                                    jnp.log(scaling_t[src][:, None] / decay))

    new_vals = {
        "xyz": jnp.where(is_clone_copy[:, None], params["xyz"][src],
                         params["xyz"][src] + offset_xyz + inst_v * samples_t),
        "scaling": jnp.where(is_clone_copy[:, None], params["scaling"][src],
                             split_scaling),
        "t": jnp.where(is_clone_copy[:, None], params["t"][src],
                       params["t"][src] + samples_t),
        "scaling_t": jnp.where(is_clone_copy[:, None],
                               params["scaling_t"][src], split_scaling_t),
    }
    for k in ("f_dc", "f_rest", "opacity", "rotation", "velocity", "intensity"):
        new_vals[k] = params[k][src]

    new_params = {k: v.at[dst].set(new_vals[k], mode="drop")
                  for k, v in params.items()}

    # ---- alive updates ---------------------------------------------------
    alive = alive.at[dst].set(True, mode="drop")
    alive = alive & ~split_sel                       # split originals die

    opacity = get_opacity(new_params)[:, 0]
    alive = alive & ~(opacity < min_opacity)

    if size_threshold is not None:
        # max_radii2D was just conceptually zeroed (postfix), so only the
        # world-size prune is active — reference quirk preserved.
        new_scaling_act = get_scaling(new_params)
        new_sf = _contract_scale_factor(new_params["xyz"], extent, cfg.contract)
        big_ws = jnp.max(new_scaling_act, axis=-1) \
            > cfg.big_point_threshold * extent * new_sf
        alive = alive & ~big_ws

    zeros = jnp.zeros(cap, jnp.float32)
    new_aux = GaussianAux(alive=alive, max_radii2D=zeros,
                          xyz_gradient_accum=zeros,
                          xyz_gradient_accum_abs=zeros,
                          t_gradient_accum=zeros, denom=zeros)

    written = jnp.zeros(cap, bool).at[dst].set(True, mode="drop")
    new_opt = zero_moments_at(opt_state, written)

    return DensifyOut(params=new_params, aux=new_aux, opt_state=new_opt,
                      n_alive=jnp.sum(alive.astype(jnp.int32)),
                      n_new_requested=total_new, n_new_placed=n_placed)


def reset_opacity(params: Params, opt_state: AdamState,
                  cfg: GaussianConfig) -> tuple[Params, AdamState]:
    """Clamp opacity to init level and reset its Adam moments
    (reference gaussian_model.py:323-341)."""
    o = get_opacity(params)
    new_o = inverse_sigmoid(jnp.minimum(o, cfg.init_opacity))
    params = dict(params)
    params["opacity"] = new_o
    opt_state = zero_moments_at(opt_state,
                                jnp.ones(new_o.shape[0], bool), ("opacity",))
    return params, opt_state
