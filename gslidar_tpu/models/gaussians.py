"""4D Gaussian point model as a fixed-capacity pytree.

Reference: scene/gaussian_model.py (GaussianModel). TPU-native differences:

* parameters live in a plain dict pytree of capacity-padded arrays with an
  ``alive`` mask, so densify/prune never change shapes under jit (the
  reference reallocates torch tensors + rebuilds optimizer state,
  scene/gaussian_model.py:328-449);
* activations are pure functions of the param dict;
* the temporal model (SHM displacement, velocity decay, gaussian marginal
  in t) matches scene/gaussian_model.py:151-186 exactly.

Param keys follow the reference optimizer group names
(scene/gaussian_model.py:285-295): xyz, f_dc, f_rest, opacity, scaling,
rotation, t, scaling_t, velocity, intensity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

import flax.struct

from gslidar_tpu.ops.knn import mean_sq_dist_knn3
from gslidar_tpu.ops.sh import rgb2sh

Params = Dict[str, jnp.ndarray]

PARAM_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
              "t", "scaling_t", "velocity", "intensity")


@flax.struct.dataclass
class GaussianAux:
    """Non-learned per-gaussian state + densification accumulators
    (reference: scene/gaussian_model.py:61-65,278-283)."""
    alive: jnp.ndarray                 # [N] bool
    max_radii2D: jnp.ndarray           # [N]
    xyz_gradient_accum: jnp.ndarray    # [N]
    xyz_gradient_accum_abs: jnp.ndarray  # [N]
    t_gradient_accum: jnp.ndarray      # [N]
    denom: jnp.ndarray                 # [N]


@dataclasses.dataclass(frozen=True)
class GaussianConfig:
    """Static model hyperparameters (reference: __init__ args,
    scene/gaussian_model.py:45-82)."""
    sh_degree: int = 3
    cycle: float = 0.2                # SHM period args.cycle
    velocity_decay: float = 1.0
    time_duration: tuple = (-0.5, 0.5)
    t_init: float = 0.1
    no_time_split: bool = True
    t_grad: bool = True
    contract: bool = True
    big_point_threshold: float = 0.1
    random_init_point: int = 200000
    percent_dense: float = 0.01
    init_opacity: float = 0.05

    @property
    def max_sh_channels(self) -> int:
        return (self.sh_degree + 1) ** 2


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


# ----------------------------- activations --------------------------------
def get_scaling(params: Params) -> jnp.ndarray:
    return jnp.exp(params["scaling"])


def get_scaling_t(params: Params) -> jnp.ndarray:
    return jnp.exp(params["scaling_t"])


def get_rotation(params: Params) -> jnp.ndarray:
    q = params["rotation"]
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)


def get_opacity(params: Params) -> jnp.ndarray:
    return jax.nn.sigmoid(params["opacity"])


def get_features(params: Params) -> jnp.ndarray:
    """[N, K, C] SH coefficients (dc + rest)."""
    return jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)


def get_xyz_shm(params: Params, timestamp, cfg: GaussianConfig) -> jnp.ndarray:
    """Simple-harmonic displacement x(t) = x + v sin((t - t0) a)/a,
    a = 2 pi / cycle (reference: scene/gaussian_model.py:151-153)."""
    a = 1.0 / cfg.cycle * np.pi * 2
    return params["xyz"] + params["velocity"] * jnp.sin(
        (timestamp - params["t"]) * a) / a


def get_inst_velocity(params: Params, cfg: GaussianConfig) -> jnp.ndarray:
    """Velocity with temporal-extent decay (gaussian_model.py:156-157)."""
    return params["velocity"] * jnp.exp(
        -get_scaling_t(params) / cfg.cycle / 2 * cfg.velocity_decay)


def get_marginal_t(params: Params, timestamp) -> jnp.ndarray:
    """Temporal opacity marginal (gaussian_model.py:185-186)."""
    st = get_scaling_t(params)
    return jnp.exp(-0.5 * (params["t"] - timestamp) ** 2 / (st * st))


# ------------------------------ creation ----------------------------------
def round_capacity(n: int, granule: int = 1 << 15) -> int:
    return max(granule, ((n + granule - 1) // granule) * granule)


def create_from_pcd(points: np.ndarray, colors: np.ndarray,
                    times: np.ndarray | None, cfg: GaussianConfig,
                    capacity: int | None = None,
                    seed: int = 0) -> tuple[Params, GaussianAux]:
    """Initialize from a fused point cloud
    (reference: scene/gaussian_model.py:195-276).

    Adds `random_init_point` far-field sphere points + near-box points when
    configured, seeds scales from 3-NN distances, random uniform rotations,
    opacity 0.05, raydrop SH for 1% drop probability.
    """
    rng = np.random.default_rng(seed)
    pts = np.asarray(points, np.float32)
    n_base = pts.shape[0]
    K = cfg.max_sh_channels

    features = np.zeros((n_base, K, 4), np.float32)      # [N, K, C]
    features[:, 0, :3] = np.asarray(rgb2sh(colors.astype(np.float32)))

    if cfg.random_init_point > 0:
        # far-field sphere + near box (gaussian_model.py:202-226)
        r_max, r_min = 100000.0, 2.0
        num = cfg.random_init_point
        th = 2 * np.pi * rng.random(num)
        ph = (np.pi / 2 * 0.99 * rng.random(num)) ** 1.5
        s = rng.random(num)
        r = 1.0 / (s / r_min + (1 - s) / r_max)
        pts_sph = np.stack([r * np.cos(th) * np.cos(ph),
                            r * np.sin(th) * np.cos(ph),
                            r * np.sin(ph)], -1)
        pts_rec = np.stack([r_min * (rng.random(num) - 0.5),
                            r_min * (rng.random(num) - 0.5),
                            r_min * rng.random(num)], -1)
        extra = np.concatenate([pts_rec, pts_sph], 0).astype(np.float32)
        extra[:, 2] = -extra[:, 2] + 1
        pts = np.concatenate([pts, extra], 0)
        features = np.concatenate(
            [features, np.zeros((extra.shape[0], K, 4), np.float32)], 0)

    features[:, 0, 3] = float(rgb2sh(0.01))              # raydrop prior 1%

    n = pts.shape[0]
    t0, t1 = cfg.time_duration
    if times is None or times.shape[0] != n_base:
        time_base = (rng.random((n_base, 1)) * 1.2 - 0.1) * (t1 - t0) + t0
    else:
        time_base = np.asarray(times, np.float32).reshape(n_base, 1)
    if cfg.t_init < 1:
        rand_extra = (rng.random((n - n_base, 1)) * 1.2 - 0.1) * (t1 - t0) + t0
        fused_times = np.concatenate([time_base, rand_extra], 0)
    else:
        fused_times = np.full((n, 1), 0.5 * (t0 + t1))
    fused_times = fused_times.astype(np.float32)

    dist2 = np.maximum(np.asarray(mean_sq_dist_knn3(jnp.asarray(pts))), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, 1).astype(np.float32)
    rots = rng.random((n, 4)).astype(np.float32)         # uniform, like torch.rand
    dist_t = np.full((n, 1), (t1 - t0) * cfg.t_init, np.float32)
    scales_t = np.log(np.sqrt(dist_t)).astype(np.float32)

    cap = capacity or round_capacity(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < initial points {n}")

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    opac = float(np.log(cfg.init_opacity / (1 - cfg.init_opacity)))
    inten = float(np.log(0.01 / (1 - 0.01)))
    params: Params = {
        "xyz": jnp.asarray(pad(pts)),
        "f_dc": jnp.asarray(pad(features[:, 0:1, :])),
        "f_rest": jnp.asarray(pad(features[:, 1:, :])),
        "opacity": jnp.asarray(pad(np.full((n, 1), opac, np.float32))),
        "scaling": jnp.asarray(pad(scales)),
        "rotation": jnp.asarray(pad(rots)),
        "t": jnp.asarray(pad(fused_times)),
        "scaling_t": jnp.asarray(pad(scales_t)),
        "velocity": jnp.asarray(pad(np.zeros((n, 3), np.float32))),
        "intensity": jnp.asarray(pad(np.full((n, 1), inten, np.float32))),
    }
    alive = np.zeros(cap, bool)
    alive[:n] = True
    zeros = jnp.zeros(cap, jnp.float32)
    aux = GaussianAux(alive=jnp.asarray(alive), max_radii2D=zeros,
                      xyz_gradient_accum=zeros, xyz_gradient_accum_abs=zeros,
                      t_gradient_accum=zeros, denom=zeros)
    return params, aux


def num_alive(aux: GaussianAux):
    return jnp.sum(aux.alive.astype(jnp.int32))


def grow_capacity(params: Params, aux: GaussianAux, opt_state: Any,
                  new_cap: int):
    """Host-side capacity doubling (outside jit; triggers one recompile)."""
    old_cap = aux.alive.shape[0]

    def pad_leaf(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != old_cap:
            return jnp.asarray(x)
        out = np.zeros((new_cap,) + x.shape[1:], x.dtype)
        out[: x.shape[0]] = x
        return jnp.asarray(out)

    params = {k: pad_leaf(v) for k, v in params.items()}
    aux = jax.tree.map(pad_leaf, aux)
    opt_state = jax.tree.map(pad_leaf, opt_state)
    return params, aux, opt_state
