"""Rasterizer parity + gradient tests: tiled scan renderer vs dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gslidar_tpu.raster import RasterSettings, rasterize
from gslidar_tpu.raster.oracle import rasterize_dense
from gslidar_tpu.raster.preprocess import build_transmat, quat_to_rotmat

VFOV = (-20.0, 20.0)
HFOV = (-60.0, 60.0)


def make_scene(rng, P=64, dynamic_opacity=True):
    """Random gaussians in front of the camera within the FOV."""
    theta = rng.uniform(np.pi / 2 - 18 * np.pi / 180,
                        np.pi / 2 + 18 * np.pi / 180, P)
    phi = rng.uniform(-55 * np.pi / 180, 55 * np.pi / 180, P)
    r = rng.uniform(4.0, 40.0, P)
    x = r * np.sin(theta) * np.sin(phi)
    z = r * np.sin(theta) * np.cos(phi)
    y = -r * np.cos(theta)
    means = np.stack([x, y, z], 1).astype(np.float32)
    scales = rng.uniform(0.3, 1.5, (P, 3)).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    opac = (rng.uniform(0.2, 0.95, P) if dynamic_opacity
            else np.full(P, 0.8)).astype(np.float32)
    shs = (rng.normal(size=(P, 16, 4)) * 0.2).astype(np.float32)
    feats = rng.normal(size=(P, 2)).astype(np.float32)
    return means, scales, quats, opac, shs, feats


def identity_view():
    return jnp.eye(4, dtype=jnp.float32), jnp.zeros(3, jnp.float32)


SET = RasterSettings(height=48, width=96, vfov=VFOV, hfov=HFOV,
                     num_extra_features=2, pair_cap=1 << 13,
                     tile_chunk=16, tile_list_cap=256)
BG = jnp.asarray([0.0, 0.0, 0.0, 1.0])


import functools


@functools.lru_cache(maxsize=None)
def _jitted(settings, dense):
    fn = rasterize_dense if dense else rasterize
    return jax.jit(lambda *a: fn(*a, settings=settings))


def run_both(scene, settings=SET, sh_degree=3):
    means, scales, quats, opac, shs, feats = map(jnp.asarray, scene)
    viewmat, campos = identity_view()
    mask = jnp.ones(means.shape[0], bool)
    args = (means, jnp.exp(jnp.log(scales)), quats, opac, shs, feats, mask,
            viewmat, campos, BG, sh_degree, 1.0)
    tiled = _jitted(settings, False)(*args)
    dense = _jitted(settings, True)(*args)
    return tiled, dense


def test_tiled_matches_oracle(rng):
    tiled, dense = run_both(make_scene(rng, P=96))
    assert float(tiled.num_dropped) == 0
    np.testing.assert_allclose(np.asarray(tiled.color),
                               np.asarray(dense["color"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(tiled.alpha),
                               np.asarray(dense["alpha"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(tiled.depth[0]),
                               np.asarray(dense["depth"][0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(tiled.depth[3]),
                               np.asarray(dense["depth"][3]), atol=0.2)
    np.testing.assert_allclose(np.asarray(tiled.feature),
                               np.asarray(dense["feature"]), atol=2e-3)
    # distortion map
    np.testing.assert_allclose(np.asarray(tiled.depth[2]),
                               np.asarray(dense["depth"][2]), atol=2e-4)
    # median depth: allow tie-breaking differences on a few pixels
    md_t = np.asarray(tiled.depth[1])
    md_d = np.asarray(dense["depth"][1])
    frac_diff = np.mean(np.abs(md_t - md_d) > 1e-2)
    assert frac_diff < 0.02


def test_alpha_blending_monotone(rng):
    tiled, _ = run_both(make_scene(rng, P=32))
    a = np.asarray(tiled.alpha)
    assert a.min() >= 0 and a.max() <= 1 + 1e-5
    T = np.asarray(tiled.final_T)
    assert np.allclose(a + T, 1.0, atol=1e-5)


def test_background_on_empty_scene():
    settings = SET
    P = 8
    means = jnp.asarray(np.full((P, 3), 1e6, np.float32))  # far outside
    scales = jnp.ones((P, 3))
    quats = jnp.asarray(np.tile([1, 0, 0, 0], (P, 1)).astype(np.float32))
    opac = jnp.full((P,), 0.9)
    shs = jnp.zeros((P, 16, 4))
    feats = jnp.zeros((P, 2))
    viewmat, campos = identity_view()
    out = _jitted(settings, False)(means, scales, quats, opac, shs, feats,
                                   jnp.ones(P, bool), viewmat, campos, BG,
                                   3, 0.05)
    np.testing.assert_allclose(np.asarray(out.color[3]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)
    assert float(jnp.max(out.radii)) == 0.0


def test_gradients_match_oracle(rng):
    """jax.grad of the tiled renderer == jax.grad of the dense oracle."""
    scene = make_scene(rng, P=48)
    means, scales, quats, opac, shs, feats = map(jnp.asarray, scene)
    viewmat, campos = identity_view()
    mask = jnp.ones(means.shape[0], bool)
    target = jnp.asarray(rng.uniform(1, 30, (SET.height, SET.width)).astype(np.float32))

    def loss_tiled(params):
        m, s, q, o, c = params
        out = rasterize(m, s, q, o, c, feats, mask, viewmat, campos, BG,
                        3, 1.0, settings=SET)
        return (jnp.mean(jnp.abs(out.depth[0] - target))
                + jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)
                + 0.01 * jnp.mean(out.depth[2]))

    def loss_dense(params):
        m, s, q, o, c = params
        out = rasterize_dense(m, s, q, o, c, feats, mask, viewmat, campos,
                              BG, 3, 1.0, settings=SET)
        return (jnp.mean(jnp.abs(out["depth"][0] - target))
                + jnp.mean(out["color"] ** 2) + 0.1 * jnp.mean(out["alpha"])
                + 0.01 * jnp.mean(out["depth"][2]))

    params = (means, scales, quats, opac, shs)
    g1 = jax.jit(jax.grad(loss_tiled))(params)
    g2 = jax.jit(jax.grad(loss_dense))(params)
    for a, b, name in zip(g1, g2, ["means", "scales", "quats", "opac", "shs"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=5e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_finite_difference_gradient(rng):
    """Finite differences on a 3-gaussian scene in float64."""
    jax.config.update("jax_enable_x64", True)
    try:
        settings = RasterSettings(height=16, width=32, vfov=VFOV, hfov=HFOV,
                                  num_extra_features=0, pair_cap=1 << 9,
                                  tile_chunk=8, tile_list_cap=32)
        means = jnp.asarray([[0.0, -0.5, 8.0], [1.0, 0.5, 10.0],
                             [-1.0, 0.0, 12.0]], jnp.float64)
        scales = jnp.full((3, 3), 1.2, jnp.float64)
        quats = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)))
        opac = jnp.asarray([0.7, 0.6, 0.8], jnp.float64)
        shs = jnp.asarray(0.3 * np.random.default_rng(1).normal(size=(3, 16, 4)))
        feats = jnp.zeros((3, 0), jnp.float64)
        mask = jnp.ones(3, bool)
        viewmat = jnp.eye(4, dtype=jnp.float64)
        campos = jnp.zeros(3, jnp.float64)
        bg = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)

        def loss_tiled(m):
            out = rasterize(m, scales, quats, opac, shs, feats, mask,
                            viewmat, campos, bg, 3, 1.0, settings=settings)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth[0] ** 2) * 1e-3
                    + jnp.sum(out.depth[2]))

        def loss_dense(m):
            out = rasterize_dense(m, scales, quats, opac, shs, feats, mask,
                                  viewmat, campos, bg, 3, 1.0,
                                  settings=settings)
            return (jnp.sum(out["color"] ** 2)
                    + jnp.sum(out["depth"][0] ** 2) * 1e-3
                    + jnp.sum(out["depth"][2]))

        # tiled autodiff must equal dense autodiff exactly in f64
        g = np.asarray(jax.jit(jax.grad(loss_tiled))(means))
        gd = np.asarray(jax.jit(jax.grad(loss_dense))(means))
        np.testing.assert_allclose(g, gd, atol=1e-6)

        # finite differences on the dense loss (the tiled one is piecewise
        # in the binning: a +-eps step can flip a tile-rect boundary, which
        # autodiff correctly treats as fixed, like the CUDA backward)
        loss = jax.jit(loss_dense)
        eps = 1e-5
        for i in [0, 1, 2]:
            for j in [0, 1, 2]:
                dm = np.zeros((3, 3))
                dm[i, j] = eps
                fd = (float(loss(means + dm)) - float(loss(means - dm))) / (2 * eps)
                assert np.isclose(gd[i, j], fd, rtol=2e-3, atol=1e-4), \
                    f"grad[{i},{j}]={gd[i,j]} vs fd={fd}"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_transmat_against_reference_construction(rng):
    """T rows must equal (R_w2c @ (s*axis), R_w2c @ p + t) — the construction
    in compare_2dgs_3dgs.py:161-179 / forward.cu:73-113."""
    P = 10
    means = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.5, 2, (P, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
    # random rigid world->camera
    q = rng.normal(size=4)
    Rw2c = np.asarray(quat_to_rotmat(jnp.asarray(q[None]))[0])
    t = rng.normal(size=3)
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, :3] = Rw2c
    viewmat[:3, 3] = t
    T, normal = build_transmat(means, scales, quats, jnp.asarray(viewmat))
    R = np.asarray(quat_to_rotmat(quats))
    for i in range(P):
        u = Rw2c @ (R[i][:, 0] * float(scales[i, 0]))
        v = Rw2c @ (R[i][:, 1] * float(scales[i, 1]))
        p = Rw2c @ np.asarray(means[i]) + t
        np.testing.assert_allclose(np.asarray(T[i, 0]), u, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[i, 1]), v, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[i, 2]), p, atol=1e-5)
        n = Rw2c @ R[i][:, 2]
        if np.dot(n, p) >= 0:
            n = -n
        np.testing.assert_allclose(np.asarray(normal[i]), n, atol=1e-5)


def test_pair_overflow_reported(rng):
    small = RasterSettings(height=48, width=96, vfov=VFOV, hfov=HFOV,
                           num_extra_features=2, pair_cap=64,
                           tile_chunk=16, tile_list_cap=256)
    tiled, _dense = run_both(make_scene(rng, P=96), settings=small)
    assert float(tiled.num_dropped) > 0


def test_wrap_col_rect_covers_pixel_walk(rng):
    """The circular-pano column rect must cover every tile column the
    wrapped pixel span [cx - rad, cx + rad] touches — including the
    near-full-revolution spans in (W - tw, W) that the old single-mod
    formula collapsed to one column (advisor round-2 finding)."""
    from gslidar_tpu.raster.preprocess import wrap_col_rect
    W, tw = 1030, 32
    gx = (W + tw - 1) // tw                               # 33, partial last
    cases = [(557.5, 507.0, 507.0)]                       # a=50, span=1014
    for _ in range(300):
        # asymmetric lo/hi spans (tight per-axis rects produce them)
        cases.append((float(rng.uniform(-W, 2 * W)),
                      float(np.ceil(rng.uniform(0.5, 0.7 * W))),
                      float(np.ceil(rng.uniform(0.5, 0.7 * W)))))
    cx = jnp.asarray([c for c, _, _ in cases], jnp.float32)
    rlo = jnp.asarray([r for _, r, _ in cases], jnp.float32)
    rhi = jnp.asarray([r for _, _, r in cases], jnp.float32)
    lo, hi = wrap_col_rect(cx, rlo, rhi, W, tw, gx)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i, (c, rl, rh) in enumerate(cases):
        s = np.arange(0.0, rl + rh + 0.25, 0.25)
        covered = set((((np.mod(c - rl, W) + s) % W) // tw).astype(int))
        emitted = set((lo[i] + np.arange(hi[i] - lo[i])) % gx)
        assert covered <= emitted, (
            f"case {i}: cx={c} rad={rl}/{rh} covered {sorted(covered)} "
            f"!<= emitted {sorted(emitted)}")
        assert hi[i] - lo[i] <= gx


def test_xla_tile_list_overflow_reported(rng):
    """The XLA scan path's per-tile list cap must surface as num_dropped
    when a tile's sorted list exceeds it (round-2 weak item 3)."""
    tiny = RasterSettings(height=48, width=96, vfov=VFOV, hfov=HFOV,
                          num_extra_features=2, pair_cap=1 << 13,
                          tile_chunk=16, tile_list_cap=16)
    tiled, _dense = run_both(make_scene(rng, P=96), settings=tiny)
    assert float(tiled.num_dropped) > 0


def test_payload_in_sort_matches_gather(rng):
    """The experimental wide sort (c64-packed payload operands riding the
    binning sort) must produce byte-identical instance rows to the
    default post-sort row gather: the sort is stable and payload
    operands are permuted, never compared."""
    import dataclasses

    from gslidar_tpu.raster.binning import bin_gaussians
    from gslidar_tpu.raster.preprocess import preprocess
    from gslidar_tpu.raster.pallas_fwd import pack_payload

    means, scales, quats, opac, shs, feats = make_scene(rng, P=128)
    vm, cp = identity_view()
    prep = preprocess(jnp.asarray(means), jnp.asarray(scales),
                      jnp.asarray(quats), jnp.asarray(opac),
                      jnp.asarray(shs), jnp.ones(128, bool), vm, cp, 3,
                      1.0, SET)
    payload = pack_payload(prep, jnp.asarray(opac), jnp.asarray(feats))
    # the two widths below differ in parity, so one of them always
    # exercises the c64 pad-and-strip path regardless of the layout
    narrow = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                           prep.tiles_touched, 1.0, SET, payload=payload)
    wide_set = dataclasses.replace(SET, payload_in_sort=True)
    wide = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                         prep.tiles_touched, 1.0, wide_set, payload=payload)
    np.testing.assert_array_equal(np.asarray(narrow.gid_sorted),
                                  np.asarray(wide.gid_sorted))
    np.testing.assert_array_equal(np.asarray(narrow.data_rows),
                                  np.asarray(wide.data_rows))

    # the complementary parity
    pay_odd = payload[:, :-1]
    n2 = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                       prep.tiles_touched, 1.0, SET, payload=pay_odd)
    w2 = bin_gaussians(prep.rect_min, prep.rect_max, prep.depth,
                       prep.tiles_touched, 1.0, wide_set, payload=pay_odd)
    np.testing.assert_array_equal(np.asarray(n2.data_rows),
                                  np.asarray(w2.data_rows))


def test_mark_visible_matches_preprocess_cull(rng):
    """mark_visible (reference GaussianRasterizer.markVisible) must agree
    with the cull window preprocess applies: every gaussian that produces
    instances is marked visible, and clearly-outside points are not."""
    from gslidar_tpu.raster import mark_visible
    from gslidar_tpu.raster.preprocess import preprocess

    means, scales, quats, opac, shs, feats = make_scene(rng, P=128)
    # append points far outside the frustum: behind (z<0 at HFOV 120deg
    # window) and inside the near plane
    outside = np.array([[0.0, 0.0, -30.0], [0.0, 0.1, 0.0]], np.float32)
    means = np.concatenate([means, outside])
    vm, cp = identity_view()
    vis = np.asarray(mark_visible(jnp.asarray(means), vm, 1.0, SET))
    assert not vis[-1] and not vis[-2]

    pad = np.zeros((2,), np.float32)
    prep = preprocess(jnp.asarray(means),
                      jnp.asarray(np.concatenate([scales, np.ones((2, 3),
                                                  np.float32)])),
                      jnp.asarray(np.concatenate([quats, np.tile([1, 0, 0, 0],
                                                  (2, 1)).astype(np.float32)])),
                      jnp.asarray(np.concatenate([opac, pad + 0.5])),
                      jnp.asarray(np.concatenate([shs, np.zeros((2, 16, 4),
                                                  np.float32)])),
                      jnp.ones(130, bool), vm, cp, 3, 1.0, SET)
    touched = np.asarray(prep.tiles_touched) > 0
    assert touched.sum() > 50                  # scene is mostly in view
    assert np.all(vis[touched])                # instances => marked visible


def test_tile_list_overflow_respects_chunk_rounding():
    """The scan composites whole tile_chunk blocks, so a raw cap that is
    not a chunk multiple must not report drops for instances the render
    actually blended — counting against the raw cap caused false
    TILE-LIST OVERFLOW warnings and pointless auto-grow re-jits."""
    import dataclasses

    from gslidar_tpu.raster.binning import Binning
    from gslidar_tpu.raster.composite import tile_list_need, tile_list_overflow

    s = dataclasses.replace(SET, tile_chunk=64, tile_list_cap=100)
    # effective cap = ceil(100/64)*64 = 128: a 120-instance tile is fully
    # blended (no drop); a 200-instance tile drops 72
    starts = jnp.asarray([0, 120, 320], jnp.int32)
    b = Binning(gid_sorted=None, tile_sorted=None, tile_starts=starts,
                num_pairs=jnp.asarray(320), num_dropped=jnp.asarray(0))
    assert int(tile_list_overflow(b, s)) == 200 - 128
    assert int(tile_list_need(b)) == 200


def test_tap_grad_includes_2d_branch():
    """Sub-pixel splats composite through the rho2d low-pass branch; the
    reference chains their pixel gradient through the spherical Jacobian
    and their center-range gradient through p_cam/r into dL/dT
    (backward.cu:494-509,578-595) BEFORE densification stats are read off
    dL_dT (backward.cu:684-711). The T-tap must therefore carry a nonzero
    p_cam-row gradient for a pure-2d-branch scene (it is exactly zero if
    xy/r_center bypass the tapped frame) and match finite differences."""
    jax.config.update("jax_enable_x64", True)
    try:
        settings = RasterSettings(height=16, width=32, vfov=VFOV, hfov=HFOV,
                                  num_extra_features=0, pair_cap=1 << 9,
                                  tile_chunk=8, tile_list_cap=32)
        # scale 0.12 at r~8-12 keeps the pixel radius in [0.3, 0.7] px
        # (just past the radii<0.3 reject) while rho3d/rho2d ~ 10-20x, so
        # every accepted pixel takes the 2d low-pass branch
        means = jnp.asarray([[0.0, -0.5, 8.0], [1.0, 0.5, 10.0],
                             [-1.0, 0.0, 12.0]], jnp.float64)
        scales = jnp.full((3, 3), 0.12, jnp.float64)
        quats = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)))
        opac = jnp.asarray([0.9, 0.8, 0.85], jnp.float64)
        shs = jnp.asarray(0.3 * np.random.default_rng(1).normal(size=(3, 16, 4)))
        feats = jnp.zeros((3, 0), jnp.float64)
        mask = jnp.ones(3, bool)
        viewmat = jnp.eye(4, dtype=jnp.float64)
        campos = jnp.zeros(3, jnp.float64)
        bg = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)

        # the mean-depth output exercises BOTH new chains: w depends on
        # rho2d (center-pixel chain) and d_safe = r_center on 2d lanes
        # (center-range chain). The color channels go through the MXU
        # einsum whose f32 accumulation makes f64 finite differences too
        # noisy to check against, so the FD loop sticks to depth.
        def loss(tap):
            out = rasterize(means, scales, quats, opac, shs, feats, mask,
                            viewmat, campos, bg, 3, 1.0, settings=settings,
                            T_tap=tap)
            return jnp.sum(out.depth[0] ** 2)

        loss_j = jax.jit(loss)
        tap0 = jnp.zeros((3, 3, 3), jnp.float64)
        g = np.asarray(jax.jit(jax.grad(loss))(tap0))
        # the p_cam row (2d-branch pixel + center-range chain) must be live
        assert np.abs(g[:, 2, :]).max() > 1e-6, g[:, 2, :]

        eps = 1e-6
        for gi in range(3):
            for j in range(3):
                dt = np.zeros((3, 3, 3))
                dt[gi, 2, j] = eps
                fd = (float(loss_j(tap0 + dt))
                      - float(loss_j(tap0 - dt))) / (2 * eps)
                assert np.isclose(g[gi, 2, j], fd, rtol=2e-3, atol=1e-8), \
                    f"tap grad[{gi},2,{j}]={g[gi, 2, j]} vs fd={fd}"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_tight_rects_output_preserving(rng):
    """Per-axis tight rects cull only (tile, gaussian) pairs whose every
    pixel fails the alpha >= 1/255 mask: a culled instance contributed
    exactly a = 0, so the render is identical in exact arithmetic. In f32
    the removals shift later instances across scan-chunk boundaries,
    regrouping the accumulator sums — so the comparison is ulp-level
    tolerances, not bit equality (measured: 1-ulp diffs on ~4% of
    pixels), plus a tiny allowance for T-threshold crossings flipping a
    median pick."""
    import dataclasses

    for wrap in (False, True):
        settings = dataclasses.replace(
            SET, wrap_x=wrap, hfov=(-180, 180) if wrap else HFOV)
        sq_set = dataclasses.replace(settings, tight_rects=False)
        for p, seed in ((96, 0), (200, 1)):
            scene = make_scene(np.random.default_rng(seed), P=p)
            tight = _jitted(settings, False)(*_args_of(scene))
            square = _jitted(sq_set, False)(*_args_of(scene))
            assert int(tight.num_dropped) == 0
            assert int(square.num_dropped) == 0
            for field, atol in (("color", 2e-6), ("alpha", 2e-6),
                                ("feature", 2e-5), ("final_T", 2e-6)):
                np.testing.assert_allclose(
                    np.asarray(getattr(tight, field)),
                    np.asarray(getattr(square, field)), atol=atol,
                    err_msg=f"{field} wrap={wrap} P={p}")
            td, sd = np.asarray(tight.depth), np.asarray(square.depth)
            np.testing.assert_allclose(td[0], sd[0], atol=1e-4,
                                       err_msg=f"depth wrap={wrap} P={p}")
            np.testing.assert_allclose(td[3], sd[3], atol=5e-3,
                                       err_msg=f"D2 wrap={wrap} P={p}")
            np.testing.assert_allclose(td[2], sd[2], atol=1e-5,
                                       err_msg=f"dist wrap={wrap} P={p}")
            # median: a 1-ulp T_before shift can flip the pick on a pixel
            assert np.mean(np.abs(td[1] - sd[1]) > 1e-3) < 0.005


def _args_of(scene):
    means, scales, quats, opac, shs, feats = map(jnp.asarray, scene)
    viewmat, campos = identity_view()
    mask = jnp.ones(means.shape[0], bool)
    return (means, scales, quats, opac, shs, feats, mask,
            viewmat, campos, BG, 3, 1.0)


def test_tight_rects_shrink_instances(rng):
    """The tight rects must reduce the live pair count on an anisotropic
    scene (the perf point of the change), not just pass equality."""
    import dataclasses

    means, scales, quats, opac, shs, feats = make_scene(rng, P=200)
    scales[:, 0] *= 4.0                                 # elongated splats
    scene = (means, scales, quats, opac, shs, feats)
    tight = _jitted(SET, False)(*_args_of(scene))
    square = _jitted(dataclasses.replace(SET, tight_rects=False),
                     False)(*_args_of(scene))
    assert int(tight.num_pairs) < int(square.num_pairs)
