"""Pallas kernels on the CPU via interpret mode.

The real Mosaic-compiled kernels are exercised by tests/test_pallas.py
(TPU only); this module runs the SAME kernel python through
``pl.pallas_call(..., interpret=True)`` so kernel edits get CI coverage
on machines without a chip (and during axon relay outages). Interpret
mode validates the kernel math and masking, not Mosaic lowering.
"""

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gslidar_tpu.raster import RasterSettings, rasterize


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import gslidar_tpu.raster.pallas_bwd as pb
    import gslidar_tpu.raster.pallas_fwd as pf
    monkeypatch.setattr(
        pf.pl, "pallas_call",
        functools.partial(pf.pl.pallas_call, interpret=True))
    monkeypatch.setattr(
        pb.pl, "pallas_call",
        functools.partial(pb.pl.pallas_call, interpret=True))


BASE = RasterSettings(height=48, width=96, vfov=(-20.0, 20.0),
                      hfov=(-60.0, 60.0), num_extra_features=2,
                      pair_cap=1 << 13, tile_chunk=16, tile_list_cap=256,
                      tile_h=8, tile_w=128)


def _scene(rng, P=96):
    theta = rng.uniform(np.pi / 2 - 0.3, np.pi / 2 + 0.3, P)
    phi = rng.uniform(-0.9, 0.9, P)
    r = rng.uniform(4, 40, P)
    means = jnp.asarray(np.stack(
        [r * np.sin(theta) * np.sin(phi), -r * np.cos(theta),
         r * np.sin(theta) * np.cos(phi)], 1).astype(np.float32))
    return dict(
        means=means,
        scales=jnp.asarray(rng.uniform(0.3, 1.5, (P, 3)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)),
        opac=jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32)),
        shs=jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2)
                        .astype(np.float32)),
        feats=jnp.asarray(rng.normal(size=(P, 2)).astype(np.float32)),
        mask=jnp.ones(P, bool))


def _render(sc, backend):
    s = dataclasses.replace(BASE, backend=backend)
    return rasterize(sc["means"], sc["scales"], sc["quats"], sc["opac"],
                     sc["shs"], sc["feats"], sc["mask"], jnp.eye(4),
                     jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]), 3, 1.0,
                     settings=s)


@pytest.mark.slow
def test_pallas_fwd_interpret_matches_xla(interpret_pallas, rng):
    sc = _scene(rng)
    xla = _render(sc, "xla")
    pls = _render(sc, "pallas")
    np.testing.assert_allclose(np.asarray(pls.color), np.asarray(xla.color),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(pls.alpha), np.asarray(xla.alpha),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(pls.feature),
                               np.asarray(xla.feature), atol=5e-4)
    np.testing.assert_allclose(np.asarray(pls.depth), np.asarray(xla.depth),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(pls.final_T),
                               np.asarray(xla.final_T), atol=5e-4)


@pytest.mark.slow
def test_pallas_bwd_interpret_matches_xla_autodiff(interpret_pallas, rng):
    sc = _scene(rng)

    def loss(backend):
        def f(means, scales, quats, opac):
            out = _render({**sc, "means": means, "scales": scales,
                           "quats": quats, "opac": opac}, backend)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth * 0.1)
                    + jnp.sum(out.feature * 0.05) + jnp.sum(out.alpha * 0.3))
        return f

    args = (sc["means"], sc["scales"], sc["quats"], sc["opac"])
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(("means", "scales", "quats", "opac"), gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        rel = float(np.abs(a - b).max()) / denom
        assert rel < 1e-4, (name, rel)
