"""Per-group Adam with explicit moment state.

Replaces torch.optim.Adam(param_groups, eps=1e-15)
(reference: scene/gaussian_model.py:278-321). Implemented manually rather
than through optax so densification can do exact "optimizer surgery" —
zeroing or gathering the moment arrays at slot granularity, like the
reference's cat/prune/replace of exp_avg/exp_avg_sq
(scene/gaussian_model.py:328-412).

LR schedule: xyz and t decay log-linearly over training
(gaussian_model.py:301-321); all other groups are constant. All lrs are
computed inside the jitted step from the iteration scalar, so no recompiles.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from gslidar_tpu.models.gaussians import PARAM_KEYS, Params
from gslidar_tpu.utils.general import expon_lr_jnp

B1, B2, EPS = 0.9, 0.999, 1e-15


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    count: jnp.ndarray


def init_adam(params: Params) -> AdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(mu=zeros,
                     nu={k: jnp.zeros_like(v) for k, v in params.items()},
                     count=jnp.zeros((), jnp.int32))


def group_lrs(args, iteration) -> Dict[str, jnp.ndarray]:
    """Per-group learning rates at `iteration` (traced scalar).

    Mirrors training_setup + update_learning_rate
    (scene/gaussian_model.py:285-321); spatial_lr_scale is 1 for these
    scenes (scene/__init__.py:88 passes 1).
    """
    spatial = 1.0
    final_decay = args.position_lr_final / args.position_lr_init
    lrs = {
        "xyz": expon_lr_jnp(iteration, args.position_lr_init * spatial,
                            args.position_lr_final * spatial,
                            lr_delay_mult=args.position_lr_delay_mult,
                            max_steps=args.iterations),
        "t": expon_lr_jnp(iteration, args.t_lr_init,
                          args.t_lr_init * final_decay,
                          lr_delay_mult=args.position_lr_delay_mult,
                          max_steps=args.iterations),
        "f_dc": args.feature_lr,
        "f_rest": args.feature_lr / 20.0,
        "opacity": args.opacity_lr,
        "scaling": args.scaling_lr,
        "rotation": args.rotation_lr,
        "scaling_t": args.scaling_t_lr,
        "intensity": args.intensity_lr,
        "velocity": (args.velocity_lr * spatial) if args.dynamic else 0.0,
    }
    return lrs


def adam_step(params: Params, grads: Params, state: AdamState,
              lrs: Dict[str, jnp.ndarray]) -> tuple[Params, AdamState]:
    count = state.count + 1
    c1 = 1.0 - B1 ** count.astype(jnp.float32)
    c2 = 1.0 - B2 ** count.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for k in PARAM_KEYS:
        g = grads[k]
        mu = B1 * state.mu[k] + (1 - B1) * g
        nu = B2 * state.nu[k] + (1 - B2) * g * g
        update = (mu / c1) / (jnp.sqrt(nu / c2) + EPS)
        new_p[k] = params[k] - lrs[k] * update
        new_mu[k], new_nu[k] = mu, nu
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moments_at(state: AdamState, slot_mask: jnp.ndarray,
                    keys=None) -> AdamState:
    """Zero Adam moments at masked slots (optimizer surgery for
    densify/reset, reference gaussian_model.py:328-341,396-399)."""
    keys = keys or PARAM_KEYS
    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in keys:
        m = slot_mask.reshape((-1,) + (1,) * (mu[k].ndim - 1))
        mu[k] = jnp.where(m, 0.0, mu[k])
        nu[k] = jnp.where(m, 0.0, nu[k])
    return AdamState(mu=mu, nu=nu, count=state.count)
