"""Pallas pipeline checks at scale (VERDICT r1 item 7).

Primary fixture: the dense oracle (`raster/oracle.py`) in parity mode —
same tile-rect culling, same quantized depth order — evaluated at tens
of thousands of gaussians on the full-360 circular panorama. Exact
tile-shape INVARIANCE is deliberately not asserted: the rect cull is
tile-grid-dependent, so pixels at a splat's ALPHA_EPS boundary can
legally gain/lose an eps-level contribution when the grid changes
(~1e-2 worst case; the CUDA reference's per-tile culling has the same
property). Oracle parity per shape is the stronger check and pins the
whole binning + kernel pipeline up to f32 regrouping.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gslidar_tpu.raster import RasterSettings, rasterize
from gslidar_tpu.raster.oracle import rasterize_dense

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pallas TPU kernel needs TPU hardware")


def _scene(P, rng, spread=1.0, r_lo=4.0, r_hi=60.0):
    theta = rng.uniform(np.pi / 2 - 0.35, np.pi / 2 + 0.2, P)
    phi = rng.uniform(-np.pi * spread, np.pi * spread, P)
    r = rng.uniform(r_lo, r_hi, P)
    means = np.stack([r * np.sin(theta) * np.sin(phi), -r * np.cos(theta),
                      r * np.sin(theta) * np.cos(phi)], 1).astype(np.float32)
    return dict(
        means=jnp.asarray(means),
        scales=jnp.asarray(rng.uniform(0.1, 0.8, (P, 3)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
        opac=jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32)),
        shs=jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32)),
        feats=jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
        mask=jnp.ones(P, bool))


def _render(sc, settings):
    bg = jnp.asarray([0., 0., 0., 1.])
    out = jax.jit(lambda: rasterize(
        sc["means"], sc["scales"], sc["quats"], sc["opac"], sc["shs"],
        sc["feats"], sc["mask"], jnp.eye(4), jnp.zeros(3), bg, 3, 1.0,
        settings=settings))()
    return jax.tree.map(np.asarray, out)


def _oracle(sc, settings):
    bg = jnp.asarray([0., 0., 0., 1.])
    out = jax.jit(lambda: rasterize_dense(
        sc["means"], sc["scales"], sc["quats"], sc["opac"], sc["shs"],
        sc["feats"], sc["mask"], jnp.eye(4), jnp.zeros(3), bg, 3, 1.0,
        settings))()
    return {k: np.asarray(v) for k, v in out.items()}


def _check_vs_oracle(p, o, tag):
    np.testing.assert_allclose(p.color, o["color"], atol=1e-3, err_msg=tag)
    np.testing.assert_allclose(p.alpha, o["alpha"], atol=1e-3, err_msg=tag)
    np.testing.assert_allclose(p.depth[0], o["depth"][0], atol=3e-2,
                               err_msg=tag)
    np.testing.assert_allclose(p.feature, o["feature"], atol=3e-3,
                               err_msg=tag)


@requires_tpu
def test_oracle_parity_at_scale_full360(rng):
    """50k gaussians across the whole wrap seam, bench (32x32) and
    training (8x64) tile shapes, each against the dense oracle."""
    P = 50_000
    sc = _scene(P, rng)
    base = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                          hfov=(-180., 180.), num_extra_features=4,
                          pair_cap=1 << 18, wrap_x=True, backend="pallas",
                          tile_h=32, tile_w=32)
    for th, tw in [(32, 32), (8, 64)]:
        s = dataclasses.replace(base, tile_h=th, tile_w=tw)
        p = _render(sc, s)
        assert int(p.num_dropped) == 0
        _check_vs_oracle(p, _oracle(sc, s), f"tile {th}x{tw}")


@requires_tpu
def test_gradients_match_xla_at_scale(rng):
    """Pallas custom_vjp vs XLA autodiff at 100k gaussians, training
    tile shape — same binning, so parity is tight."""
    P = 100_000
    sc = _scene(P, rng, spread=0.5)
    S_P = RasterSettings(height=66, width=515, vfov=(-24.9, 2.0),
                         hfov=(-90., 90.), num_extra_features=4,
                         pair_cap=1 << 19, backend="pallas",
                         tile_h=8, tile_w=64)
    S_X = dataclasses.replace(S_P, backend="xla", tile_chunk=64,
                              tile_list_cap=1 << 15)
    target = jnp.asarray(rng.uniform(1, 30, (66, 515)).astype(np.float32))
    bg = jnp.asarray([0., 0., 0., 1.])

    def make_loss(settings):
        def loss(means, scales, quats, opac, shs, feats):
            out = rasterize(means, scales, quats, opac, shs, feats,
                            sc["mask"], jnp.eye(4), jnp.zeros(3), bg, 3,
                            1.0, settings=settings)
            return (jnp.mean(jnp.abs(out.depth[0] - target))
                    + jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)
                    + 0.02 * jnp.mean(out.depth[1])
                    + 0.01 * jnp.mean(out.depth[2])
                    + 0.03 * jnp.mean(out.depth[3])
                    + 0.05 * jnp.mean(jnp.abs(out.feature)))
        return loss

    args = (sc["means"], sc["scales"], sc["quats"], sc["opac"], sc["shs"],
            sc["feats"])
    gp = jax.jit(jax.grad(make_loss(S_P), argnums=(0, 3)))(*args)
    gx = jax.jit(jax.grad(make_loss(S_X), argnums=(0, 3)))(*args)
    for a, b, n in zip(gx, gp, ["means", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        den = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / den < 1e-3, f"grad mismatch: {n}"


@requires_tpu
def test_deep_occlusion_early_exit(rng):
    """A wall of near-opaque splats in front of 60k background gaussians:
    the kernel's tile-level early exit must be invisible (the oracle has
    no early exit), and everything visible must be near."""
    P_bg = 60_000
    sc = _scene(P_bg, rng, r_lo=30.0, r_hi=80.0)
    P_w = 4_000
    w = _scene(P_w, np.random.default_rng(7), r_lo=2.0, r_hi=2.2)
    sc2 = {k: jnp.concatenate([w[k], sc[k]], 0) for k in sc}
    sc2["opac"] = sc2["opac"].at[:P_w].set(0.999)
    sc2["scales"] = sc2["scales"].at[:P_w].set(0.8)
    s = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                       hfov=(-180., 180.), num_extra_features=4,
                       pair_cap=1 << 18, wrap_x=True, backend="pallas",
                       tile_h=32, tile_w=32)
    p = _render(sc2, s)
    assert int(p.num_dropped) == 0
    _check_vs_oracle(p, _oracle(sc2, s), "deep occlusion")
    assert float(np.median(p.depth[0][p.alpha[0] > 0.9])) < 5.0


@requires_tpu
def test_pair_cap_overflow_is_counted(rng):
    """Seeded overflow: num_dropped > 0, outputs stay finite."""
    P = 50_000
    sc = _scene(P, rng)
    s = RasterSettings(height=66, width=1030, vfov=(-24.9, 2.0),
                       hfov=(-180., 180.), num_extra_features=4,
                       pair_cap=1 << 14, wrap_x=True, backend="pallas",
                       tile_h=32, tile_w=32)
    out = _render(sc, s)
    assert int(out.num_dropped) > 0
    assert int(out.num_pairs) == int(out.num_dropped) + (1 << 14)
    for x in (out.color, out.depth, out.alpha):
        assert np.isfinite(x).all()
