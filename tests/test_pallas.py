"""Pallas forward kernel vs XLA composite parity (TPU only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gslidar_tpu.raster import RasterSettings
from gslidar_tpu.raster.preprocess import preprocess
from gslidar_tpu.raster.binning import bin_gaussians
from gslidar_tpu.raster.composite import composite

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pallas TPU kernel needs TPU hardware")


@requires_tpu
def test_pallas_matches_xla_composite(rng):
    from gslidar_tpu.raster.pallas_fwd import composite_pallas
    settings = RasterSettings(height=48, width=96, vfov=(-20., 20.),
                              hfov=(-60., 60.), num_extra_features=2,
                              pair_cap=1 << 13, tile_chunk=16,
                              tile_list_cap=256, tile_h=8, tile_w=128)
    P = 96
    theta = rng.uniform(np.pi / 2 - 0.3, np.pi / 2 + 0.3, P)
    phi = rng.uniform(-0.9, 0.9, P)
    r = rng.uniform(4, 40, P)
    means = jnp.asarray(np.stack(
        [r * np.sin(theta) * np.sin(phi), -r * np.cos(theta),
         r * np.sin(theta) * np.cos(phi)], 1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.3, 1.5, (P, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32))
    shs = jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(P, 2)).astype(np.float32))
    bg = jnp.asarray([0., 0, 0, 1.])
    vm = jnp.eye(4)
    cp = jnp.zeros(3)

    from gslidar_tpu.raster.pallas_fwd import pack_payload

    prep = jax.jit(lambda: preprocess(means, scales, quats, opac, shs,
                                      jnp.ones(P, bool), vm, cp, 3, 1.0,
                                      settings))()
    binn = jax.jit(lambda p: bin_gaussians(p.rect_min, p.rect_max, p.depth,
                                           p.tiles_touched, 1.0, settings))(prep)
    binn_pl = jax.jit(lambda p: bin_gaussians(
        p.rect_min, p.rect_max, p.depth, p.tiles_touched, 1.0, settings,
        payload=pack_payload(p, opac, feats)))(prep)
    xla = jax.jit(lambda b, p: composite(b, p, feats, opac, bg, 1.0,
                                         settings))(binn, prep)
    pls = jax.jit(lambda b, p: composite_pallas(b, p, feats, opac, bg, 1.0,
                                                settings))(binn_pl, prep)

    np.testing.assert_allclose(np.asarray(pls.color), np.asarray(xla.color),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(pls.alpha), np.asarray(xla.alpha),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(pls.feature),
                               np.asarray(xla.feature), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pls.depth[0]),
                               np.asarray(xla.depth[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(pls.contrib),
                               np.asarray(xla.contrib), atol=0.5)


@requires_tpu
def test_pallas_gradients_match_xla(rng):
    """custom_vjp pallas backward vs XLA autodiff."""
    import dataclasses
    from gslidar_tpu.raster import rasterize
    base = RasterSettings(height=48, width=96, vfov=(-20., 20.),
                          hfov=(-60., 60.), num_extra_features=2,
                          pair_cap=1 << 13, tile_chunk=16,
                          tile_list_cap=256, tile_h=8, tile_w=64)
    S_X = dataclasses.replace(base, backend="xla")
    S_P = dataclasses.replace(base, backend="pallas")
    P = 96
    theta = rng.uniform(np.pi / 2 - 0.3, np.pi / 2 + 0.3, P)
    phi = rng.uniform(-0.9, 0.9, P)
    r = rng.uniform(4, 40, P)
    means = jnp.asarray(np.stack(
        [r * np.sin(theta) * np.sin(phi), -r * np.cos(theta),
         r * np.sin(theta) * np.cos(phi)], 1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.3, 1.5, (P, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32))
    shs = jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(P, 2)).astype(np.float32))
    bg = jnp.asarray([0., 0, 0, 1.])
    vm = jnp.eye(4)
    cp = jnp.zeros(3)
    mask = jnp.ones(P, bool)
    target = jnp.asarray(rng.uniform(1, 30, (48, 96)).astype(np.float32))

    def make_loss(settings):
        def loss(params):
            m, s, q, o, c, f = params
            out = rasterize(m, s, q, o, c, f, mask, vm, cp, bg, 3, 1.0,
                            settings=settings)
            return (jnp.mean(jnp.abs(out.depth[0] - target))
                    + jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)
                    + 0.01 * jnp.mean(out.depth[2])
                    + 0.05 * jnp.mean(jnp.abs(out.feature))
                    + 0.02 * jnp.mean(out.depth[1])
                    + 0.03 * jnp.mean(out.depth[3]))
        return loss

    params = (means, scales, quats, opac, shs, feats)
    gx = jax.jit(jax.grad(make_loss(S_X)))(params)
    gp = jax.jit(jax.grad(make_loss(S_P)))(params)
    for a, b, n in zip(gx, gp, ["means", "scales", "quats", "opac", "shs",
                                "feats"]):
        a, b = np.asarray(a), np.asarray(b)
        den = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / den < 5e-4, f"grad mismatch: {n}"
