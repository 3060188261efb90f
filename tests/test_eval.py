"""Eval-path tests: 360-degree stitching layout + meters."""

import numpy as np
import jax.numpy as jnp

from gslidar_tpu.config import Config
from gslidar_tpu.data.cameras import Camera
from gslidar_tpu.engine.evaluate import render_range_map
from gslidar_tpu.utils.metrics import (DepthMeter, IntensityMeter,
                                       PointsMeter, RaydropMeter)


class _FakePkg:
    def __init__(self, h, w, fill):
        self.depth = np.full((1, h, w), fill, np.float32)
        self.depth_median = np.full((1, h, w), fill + 100, np.float32)
        self.depth_square = np.full((1, h, w), fill ** 2, np.float32)
        self.alpha = np.ones((1, h, w), np.float32)
        self.raydrop = np.full((1, h, w), 0.25, np.float32)
        self.intensity_sh = np.full((1, h, w), fill / 10, np.float32)


def _cam(towards, colmap_id, h, w):
    return Camera(colmap_id=colmap_id, uid=0, R=np.eye(3), T=np.zeros(3),
                  vfov=(-24.9, 2.0), hfov=(-90, 90), width=w, height=h,
                  pts_depth=np.full((1, h, w), 7.0, np.float32),
                  pts_intensity=np.full((1, h, w), 0.5, np.float32),
                  towards=towards)


def test_render_range_map_stitch_layout():
    """Front fills the middle half; back wraps around both ends
    (reference gaussian_renderer/__init__.py:158-227)."""
    h, w = 8, 16
    args = Config({"frames": 1, "sky_depth": False, "depth_blend_mode": 0,
                   "scale_factor": 1.0})

    def fake_render(params, alive, prior, cam_batch, sh):
        # towards_idx distinguishes front (0) / back (1)
        fill = 1.0 if int(cam_batch.towards_idx) == 0 else 2.0
        return _FakePkg(h, w, fill)

    front = _cam("forward", 0, h, w)
    back = _cam("backward", 1, h, w)
    depth_pano, inten, raydrop, gt_d, gt_i = render_range_map(
        args, front, back, fake_render, None, None, None, 0, [h, w])

    breaks = (0, w // 2, 3 * w // 2, 2 * w)
    assert depth_pano.shape == (3, h, 2 * w)
    # middle half = front (mix channel uses mean depth when variance small)
    assert np.all(depth_pano[0, :, breaks[1]:breaks[2]] == 1.0)
    # wrapped ends = back
    assert np.all(depth_pano[0, :, breaks[2]:breaks[3]] == 2.0)
    assert np.all(depth_pano[0, :, breaks[0]:breaks[1]] == 2.0)
    assert np.all(gt_d[0] == 7.0)


def test_meters_shapes():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (1, 40, 64)).astype(np.float32)
    gt = (rng.uniform(0, 1, (1, 40, 64)) > 0.5).astype(np.float32)
    m = RaydropMeter()
    m.update(pred, gt)
    rmse, acc, f1 = m.measure()
    assert 0 <= acc <= 1 and 0 <= f1 <= 1

    d = DepthMeter(scale=1.0)
    d.update(rng.uniform(1, 50, (1, 40, 64)), rng.uniform(1, 50, (1, 40, 64)))
    rmse, medae, lp, ssim, psnr = d.measure()
    assert rmse > 0 and -1 <= ssim <= 1
    assert np.isnan(lp)  # no LPIPS weights in this environment

    i = IntensityMeter(scale=1)
    i.update(pred, np.clip(gt, 0, 1))
    assert i.measure()[0] >= 0

    p = PointsMeter(scale=1.0, vfov=(-24.9, 2.0))
    img = rng.uniform(2, 60, (1, 10, 32)).astype(np.float32)
    p.update(img, img)
    cd, f = p.measure()
    assert cd < 1e-6 and f > 0.99
