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
    # pallas_fwd and pallas_bwd share the one jax.experimental.pallas
    # module object, so a single setattr covers both kernels (patching
    # twice would nest the partial) — note this is process-wide for any
    # pallas_call user while the fixture is active
    import gslidar_tpu.raster.pallas_fwd as pf
    monkeypatch.setattr(
        pf.pl, "pallas_call",
        functools.partial(pf.pl.pallas_call, interpret=True))


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


def _edge_on_prep(P=128):
    """A hand-crafted PreprocessOut whose first splat is seen nearly
    edge-on: the intersection coordinate s2 = -Tvz/Tvy = -1e39 overflows
    to -inf from NORMAL-range inputs (no subnormals, so FTZ backends hit
    it too), while p3 ~ 1e-36 keeps p3_ok true and the division VJP's
    p3^2 underflows to a 0/0 NaN. Such lanes are never accepted into the
    3d branch (rho3d = inf), but multiply-masked gradient chains would
    compute 0 * inf = NaN — the regression this fixture pins (CUDA is
    immune by control flow, backward.cu:431-493). Splat 1 is an ordinary
    front splat in the same tile so real cotangents flow."""
    from gslidar_tpu.raster.preprocess import PreprocessOut

    # the compositors work on T's COLUMNS (component triples, the
    # pack_payload transpose): kernel (Tu, Tv, Tw) = columns of this
    # matrix. Rows are (u_cam, v_cam, p_cam); the center pixel/range are
    # RECOMPUTED from p_cam, so p_cam must genuinely project into tile 0
    # (pixel row ~4 of the 48-row, +-20 deg pano => theta ~ 1.27991 at
    # range 5). Columns (1,0,0), (0,1e-36,p_y), (0,0,p_z) give
    # Az = 1e-36, Bz = Gz = 0 -> p3 = st*cp*1e-36 (normal, never
    # flushed); s2 = p2/p3 ~ 5e36 -> rho3d = s2^2 overflows to inf and
    # the division VJP's p3^2 underflows to a 0/0 NaN on masked lanes.
    T = np.zeros((P, 3, 3), np.float32)
    T[0] = [[1, 0, 0], [0, 1e-36, 0], [0, -1.43365, 4.79005]]
    # ordinary splat at the same pixel, slightly nearer (range 4)
    T[1] = [[0.5, 0, 0], [0, 0.5, 0], [0, -1.14692, 3.83204]]
    H, W = BASE.height, BASE.width
    # center pixel inside tile 0 (rows 0-7) so the 2d branch accepts
    xy = np.tile(np.asarray([[W * 0.5, 4.0]], np.float32), (P, 1))
    depth = np.full(P, 5.0, np.float32)
    depth[1] = 4.0
    valid = np.zeros(P, bool)
    valid[:2] = True
    return PreprocessOut(
        T=jnp.asarray(T), xy=jnp.asarray(xy), depth=jnp.asarray(depth),
        normal=jnp.asarray(np.tile([[0, 0, 1]], (P, 1)).astype(np.float32)),
        color=jnp.asarray(np.full((P, 4), 0.8, np.float32)),
        radius=jnp.where(jnp.asarray(valid), 4.0, 0.0),
        rect_min=jnp.zeros((P, 2), jnp.int32),
        rect_max=jnp.where(jnp.asarray(valid)[:, None],
                           jnp.ones((P, 2), jnp.int32), 0),
        tiles_touched=jnp.asarray(valid, jnp.int32),
        valid=jnp.asarray(valid))


def test_edge_on_splat_gradients_finite_pallas(interpret_pallas):
    """Backward-kernel gradients stay finite when an instance's
    intersection coordinates overflow (s2 = p2/p3 -> -inf)."""
    from gslidar_tpu.raster.pallas_fwd import make_params, pack_payload
    from gslidar_tpu.raster.pallas_op import composite_op

    s = dataclasses.replace(BASE, num_extra_features=0, pair_cap=256,
                            backend="pallas")
    prep = _edge_on_prep()
    opac = jnp.full(prep.depth.shape, 0.9)
    feats = jnp.zeros((prep.depth.shape[0], 0))
    params = make_params(1.0, s)

    def loss(packed):
        color, feature, depth, misc8 = composite_op(
            packed, prep.rect_min, prep.rect_max, prep.depth,
            prep.tiles_touched, 1.0, params, s, 4, 0)
        return (jnp.sum(color) + jnp.sum(feature) + jnp.sum(depth[:, :2])
                + jnp.sum(misc8[:, 0]))

    packed = pack_payload(prep, opac, feats)
    val, g = jax.value_and_grad(loss)(packed)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all(), "NaN/inf leaked into grads"
    # the ordinary splat must still receive real gradients
    assert float(jnp.abs(g[1]).sum()) > 0


def test_edge_on_splat_gradients_finite_xla():
    """Same corner through the XLA scan compositor's autodiff."""
    from gslidar_tpu.raster.binning import bin_gaussians
    from gslidar_tpu.raster.composite import composite

    s = dataclasses.replace(BASE, num_extra_features=0, pair_cap=256,
                            backend="xla")
    prep = _edge_on_prep()
    opac = jnp.full(prep.depth.shape, 0.9)
    feats = jnp.zeros((prep.depth.shape[0], 0))
    bg = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    def loss(T, opacity):
        p = prep._replace(T=T)
        binning = bin_gaussians(p.rect_min, p.rect_max, p.depth,
                                p.tiles_touched, 1.0, s)
        tiles = composite(binning, p, feats, opacity, bg, 1.0, s)
        return (jnp.sum(tiles.color) + jnp.sum(tiles.depth[:2])
                + jnp.sum(tiles.alpha))

    val, g = jax.value_and_grad(loss, argnums=(0, 1))(prep.T, opac)
    assert np.isfinite(float(val))
    for a in g:
        assert np.isfinite(np.asarray(a)).all(), "NaN/inf leaked into grads"


def test_polynomial_atan2_accuracy():
    """The kernels' Cephes-style atan2 (Mosaic lowers no atan) must track
    jnp.arctan2 to f32 precision across all quadrants, the axes, and the
    magnitude range camera coordinates span."""
    from gslidar_tpu.raster.pallas_fwd import _atan2

    rng = np.random.default_rng(7)
    mag = 10.0 ** rng.uniform(-6, 3, 4096)
    ang = rng.uniform(-np.pi, np.pi, 4096)
    y = (mag * np.sin(ang)).astype(np.float32)
    x = (mag * np.cos(ang)).astype(np.float32)
    # axes and exact zeros
    y = np.concatenate([y, np.float32([0, 0, 1, -1, 0])])
    x = np.concatenate([x, np.float32([1, -1, 0, 0, 0])])
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    # atan2(0, -1): both pi up to sign convention; compare via wrap
    d = np.abs(got - want)
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 3e-7, d.max()


@pytest.mark.slow
def test_chunk_256_interpret_parity():
    """GSLIDAR_CHUNK=256 (the grid-step A/B knob) must reproduce the
    default CHUNK=128 render and gradients. Runs in a subprocess because
    CHUNK is read once at import."""
    from conftest import run_on_cpu_mesh

    code = """
import dataclasses, functools
import numpy as np, jax, jax.numpy as jnp
import gslidar_tpu.raster.pallas_fwd as pf
jax.config.update("jax_platform_name", "cpu")
pf.pl.pallas_call = functools.partial(pf.pl.pallas_call, interpret=True)
from gslidar_tpu.raster import RasterSettings, rasterize
assert pf.CHUNK == 256
rng = np.random.default_rng(3)
P = 96
theta = rng.uniform(np.pi/2 - 0.3, np.pi/2 + 0.3, P)
phi = rng.uniform(-0.9, 0.9, P)
r = rng.uniform(4, 40, P)
means = jnp.asarray(np.stack([r*np.sin(theta)*np.sin(phi), -r*np.cos(theta),
                              r*np.sin(theta)*np.cos(phi)], 1).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.3, 1.5, (P, 3)).astype(np.float32))
quats = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
opac = jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32))
shs = jnp.asarray((rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32))
feats = jnp.asarray(rng.normal(size=(P, 2)).astype(np.float32))
s = RasterSettings(height=48, width=96, vfov=(-20.0, 20.0), hfov=(-60.0, 60.0),
                   num_extra_features=2, pair_cap=1 << 13, tile_chunk=16,
                   tile_list_cap=256, tile_h=8, tile_w=128, backend="pallas")

def loss(m):
    out = rasterize(m, scales, quats, opac, shs, feats, jnp.ones(P, bool),
                    jnp.eye(4), jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]),
                    3, 1.0, settings=s)
    return jnp.sum(out.color ** 2) + jnp.sum(out.depth * 0.1), out

(val, out), g = jax.value_and_grad(loss, has_aux=True)(means)
np.save("/tmp/chunk_ab_color.npy", np.asarray(out.color))
np.save("/tmp/chunk_ab_grad.npy", np.asarray(g))
print("OK", float(val))
"""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"

    env["GSLIDAR_CHUNK"] = "256"
    r256 = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert r256.returncode == 0, r256.stderr[-2000:]
    c256 = np.load("/tmp/chunk_ab_color.npy")
    g256 = np.load("/tmp/chunk_ab_grad.npy")

    env["GSLIDAR_CHUNK"] = "128"
    r128 = subprocess.run([sys.executable, "-c", code.replace(
        "pf.CHUNK == 256", "pf.CHUNK == 128")], env=env,
        capture_output=True, text=True, timeout=600)
    assert r128.returncode == 0, r128.stderr[-2000:]
    c128 = np.load("/tmp/chunk_ab_color.npy")
    g128 = np.load("/tmp/chunk_ab_grad.npy")

    np.testing.assert_allclose(c256, c128, atol=1e-5)
    denom = max(float(np.abs(g128).max()), 1e-6)
    assert float(np.abs(g256 - g128).max()) / denom < 1e-4


def test_kernels_lower_for_tpu_without_a_chip():
    """Cross-platform AOT lowering runs the full Mosaic jaxpr->TPU-dialect
    pass (unsupported primitives raise NotImplementedError here — e.g. a
    raw jnp.arctan2 in a kernel), so kernel edits get chip-free coverage
    of Mosaic OP SUPPORT, complementing the interpret tests that cover
    only the math. Machine-code compilation still needs hardware."""
    sc = _scene(np.random.default_rng(11))
    s = dataclasses.replace(BASE, backend="pallas")

    def fwd(means):
        out = rasterize(means, sc["scales"], sc["quats"], sc["opac"],
                        sc["shs"], sc["feats"], sc["mask"], jnp.eye(4),
                        jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]), 3,
                        1.0, settings=s)
        return out.color

    def fwdbwd(means):
        def loss(m):
            out = rasterize(m, sc["scales"], sc["quats"], sc["opac"],
                            sc["shs"], sc["feats"], sc["mask"], jnp.eye(4),
                            jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]), 3,
                            1.0, settings=s)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth * 0.1)
                    + jnp.sum(out.feature * 0.05))
        return jax.grad(loss)(means)

    for f in (fwd, fwdbwd):
        txt = jax.jit(f).trace(sc["means"]).lower(
            lowering_platforms=("tpu",)).as_text()
        assert "tpu_custom_call" in txt


@pytest.mark.slow
def test_pallas_payload_bf16_mode(interpret_pallas, rng):
    """payload_bf16 prod mode (blend columns as bf16 pairs in int32
    words, T columns f32-bitcast): forward within bf16 quantization
    tolerance of the f32 payload mode, gradients finite and close.
    Parity tests keep the f32 mode; this locks the packed decode."""
    sc = _scene(rng)
    f32 = _render(sc, "pallas")
    s16 = dataclasses.replace(BASE, backend="pallas", payload_bf16=True)
    p16 = rasterize(sc["means"], sc["scales"], sc["quats"], sc["opac"],
                    sc["shs"], sc["feats"], sc["mask"], jnp.eye(4),
                    jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]), 3, 1.0,
                    settings=s16)
    # blend channels quantize to bf16 (~0.4% rel); alpha feeds through
    # the bf16 opacity so geometry outputs shift by the same order
    np.testing.assert_allclose(np.asarray(p16.color), np.asarray(f32.color),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(p16.alpha), np.asarray(f32.alpha),
                               atol=2e-2)
    d16, d32 = np.asarray(p16.depth[0]), np.asarray(f32.depth[0])
    # mean depth where there is coverage
    cov = np.asarray(f32.alpha[0]) > 0.1
    assert np.abs(d16[cov] - d32[cov]).max() < np.abs(d32[cov]).max() * 2e-2

    def loss(settings):
        def f(means, scales, quats, opac, shs, feats):
            out = rasterize(means, scales, quats, opac, shs, feats,
                            sc["mask"], jnp.eye(4), jnp.zeros(3),
                            jnp.asarray([0.0, 0, 0, 1.0]), 3, 1.0,
                            settings=settings)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth * 0.1)
                    + jnp.sum(out.feature * 0.05))
        return f

    args = (sc["means"], sc["scales"], sc["quats"], sc["opac"], sc["shs"],
            sc["feats"])
    g32 = jax.grad(loss(dataclasses.replace(BASE, backend="pallas")),
                   argnums=(0, 1, 2, 3, 4, 5))(*args)
    g16 = jax.grad(loss(s16), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for name, a, b in zip(("means", "scales", "quats", "opac", "shs",
                           "feats"), g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        denom = max(float(np.abs(a).max()), 1e-6)
        rel = float(np.abs(a - b).max()) / denom
        assert rel < 5e-2, (name, rel)
