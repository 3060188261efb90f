import numpy as np
import jax.numpy as jnp

from gslidar_tpu.ops.chamfer import chamfer_distance, fscore
from gslidar_tpu.ops.knn import mean_sq_dist_knn3
from gslidar_tpu.ops.losses import binary_cross_entropy, masked_l1, ssim, tv_loss
from gslidar_tpu.ops.sh import SH_C0, eval_sh, rgb2sh, sh2rgb


def test_knn3_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    out = np.asarray(mean_sq_dist_knn3(jnp.asarray(pts), chunk=128))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(1)
    assert np.allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_chamfer_symmetric_zero(rng):
    import jax
    a = rng.normal(size=(100, 3)).astype(np.float32)
    d1, d2, m1, m2 = chamfer_distance(jnp.asarray(a), jnp.asarray(a),
                                      precision=jax.lax.Precision.HIGHEST)
    assert float(m1) < 1e-6 and float(m2) < 1e-6


def test_chamfer_known_value():
    a = jnp.asarray(np.array([[0, 0, 0]], dtype=np.float32))
    b = jnp.asarray(np.array([[1, 0, 0], [3, 0, 0]], dtype=np.float32))
    d1, d2, m1, m2 = chamfer_distance(a, b)
    assert np.isclose(float(m1), 1.0)           # a->b: dist^2 to (1,0,0)
    assert np.isclose(float(m2), (1.0 + 9.0) / 2)


def test_chamfer_mask(rng):
    a = rng.normal(size=(50, 3)).astype(np.float32)
    big = np.concatenate([a, 100 + rng.normal(size=(20, 3))]).astype(np.float32)
    mask = np.concatenate([np.ones(50, bool), np.zeros(20, bool)])
    d1, d2, m1, m2 = chamfer_distance(jnp.asarray(big), jnp.asarray(a),
                                      mask1=jnp.asarray(mask))
    assert float(m1) < 1e-6  # masked-out far points ignored


def test_fscore_perfect():
    d = jnp.zeros(10)
    f, p1, p2 = fscore(d, d)
    assert np.isclose(float(f), 1.0)


def test_sh_degree0_constant(rng):
    sh = rng.normal(size=(5, 16, 4)).astype(np.float32)
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    vals, _ = eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs), clamp=False)
    expect = SH_C0 * sh[:, 0, :] + 0.5
    assert np.allclose(np.asarray(vals), expect, atol=1e-5)


def test_sh_roundtrip():
    rgb = np.array([[0.3, 0.6, 0.9]], dtype=np.float32)
    assert np.allclose(np.asarray(sh2rgb(rgb2sh(jnp.asarray(rgb)))), rgb, atol=1e-6)


def test_sh_degree_masking(rng):
    """Band masking must equal zeroing out high-degree coefficients."""
    sh = rng.normal(size=(4, 16, 4)).astype(np.float32)
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    v1, _ = eval_sh(1, jnp.asarray(sh), jnp.asarray(dirs), clamp=False)
    sh_trunc = sh.copy()
    sh_trunc[:, 4:] = 0
    v2, _ = eval_sh(3, jnp.asarray(sh_trunc), jnp.asarray(dirs), clamp=False)
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_losses_basics(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 32)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(tv_loss(jnp.ones((1, 8, 8)))) == 0.0
    m = jnp.asarray(rng.uniform(0, 1, (1, 16, 32)) > 0.5)
    assert float(masked_l1(img, img, m)) == 0.0
    p = jnp.asarray(np.full((4, 4), 0.5, np.float32))
    t = jnp.asarray(np.ones((4, 4), np.float32))
    assert np.isclose(float(binary_cross_entropy(p, t)), -np.log(0.5), atol=1e-5)
