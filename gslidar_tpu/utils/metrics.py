"""Evaluation meters (reference: utils/metrics_utils.py).

numpy implementations of the exact reference formulas; chamfer runs on
device via ops/chamfer.py. LPIPS requires pretrained AlexNet weights that
cannot be downloaded in this environment — if a converted weights file is
present at ``GSLIDAR_LPIPS_WEIGHTS`` it is used, otherwise the LPIPS column
reports NaN (documented deviation; all other metrics are exact).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from gslidar_tpu.ops.chamfer import chamfer_distance, fscore
from gslidar_tpu.ops.losses import ssim as ssim_jnp
from gslidar_tpu.ops.pano import pixel_dirs


def _ssim_skimage_like(pred, gt):
    """structural_similarity(pred, gt, data_range=gt.max()-gt.min()) with
    skimage defaults: 7x7 uniform window, no gaussian."""
    from scipy.ndimage import uniform_filter
    pred = pred.astype(np.float64)
    gt = gt.astype(np.float64)
    drange = gt.max() - gt.min()
    K1, K2, win = 0.01, 0.03, 7
    C1, C2 = (K1 * drange) ** 2, (K2 * drange) ** 2
    f = lambda x: uniform_filter(x, size=win)
    ux, uy = f(pred), f(gt)
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    uxx, uyy, uxy = f(pred * pred), f(gt * gt), f(pred * gt)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


class _LpipsProxy:
    _fn = None
    _tried = False

    @classmethod
    def compute(cls, pred, gt):
        if not cls._tried:
            cls._tried = True
            path = os.environ.get("GSLIDAR_LPIPS_WEIGHTS", "")
            if path and os.path.exists(path):
                try:
                    from gslidar_tpu.utils.lpips_jax import load_lpips
                    cls._fn = load_lpips(path)
                except Exception:
                    cls._fn = None
        if cls._fn is None:
            return float("nan")
        return float(cls._fn(pred, gt))


def lpips_json(value):
    """JSON-safe LPIPS entry: the measured float, or None when the metric
    is unavailable (no pretrained AlexNet weights in a zero-egress image;
    set GSLIDAR_LPIPS_WEIGHTS to enable — module docstring). None keeps
    metrics.json strict-JSON parseable instead of emitting a NaN literal,
    and marks the column as absent rather than poisoned."""
    v = float(value)
    return v if np.isfinite(v) else None


class RaydropMeter:
    """RMSE / Accuracy / F1 (reference metrics_utils.py:362-416)."""

    def __init__(self, ratio=0.5):
        self.ratio = ratio
        self.V = []

    def clear(self):
        self.V = []

    def update(self, preds, truths):
        preds, truths = np.asarray(preds), np.asarray(truths)
        rmse = float(np.sqrt(((truths - preds) ** 2).mean()))
        pm = np.where(preds > self.ratio, 1, 0)
        acc = float((pm == truths).mean())
        TP = np.sum((truths == 1) & (pm == 1))
        FP = np.sum((truths == 0) & (pm == 1))
        FN = np.sum((truths == 1) & (pm == 0))
        precision = TP / max(TP + FP, 1e-12)
        recall = TP / max(TP + FN, 1e-12)
        f1 = 2 * precision * recall / max(precision + recall, 1e-12)
        self.V.append([rmse, acc, float(f1)])

    def measure(self):
        return np.array(self.V).mean(0)


class _ImageMeter:
    """Shared RMSE/MedAE/LPIPS/SSIM/PSNR machinery
    (reference metrics_utils.py:140-211, 419-490)."""

    def __init__(self, scale, vmax):
        self.scale = scale
        self.vmax = vmax
        self.V = []

    def clear(self):
        self.V = []

    def update(self, preds, truths):
        pred = np.asarray(preds, np.float64) / self.scale
        gt = np.asarray(truths, np.float64) / self.scale
        vmin = 1e-6
        pred = np.clip(pred, vmin, self.vmax)
        gt = np.clip(gt, vmin, self.vmax)
        rmse = float(np.sqrt(((gt - pred) ** 2).mean()))
        medae = float(np.median(np.abs(gt - pred)))
        if gt.shape[-2] >= 32:
            lp = _LpipsProxy.compute(pred, gt)
        else:
            lp = 1.0
        ssim = float(_ssim_skimage_like(pred.squeeze(0), gt.squeeze(0)))
        psnr = float(10 * np.log10(self.vmax ** 2 / ((pred - gt) ** 2).mean()))
        self.V.append([rmse, medae, lp, ssim, psnr])

    def measure(self):
        return np.array(self.V).mean(0)


class DepthMeter(_ImageMeter):
    def __init__(self, scale):
        super().__init__(scale, vmax=80.0)


class IntensityMeter(_ImageMeter):
    def __init__(self, scale):
        super().__init__(scale, vmax=1.0)


class PointsMeter:
    """Chamfer + F-score@0.05 on backprojected 360-degree panoramas
    (reference metrics_utils.py:270-359): far=80 zeroed out, points with
    range <= 0.2 discarded, hfov fixed to (-180, 180)."""

    def __init__(self, scale, vfov):
        self.scale = scale
        self.vfov = vfov
        self.near, self.far = 0.2, 80.0
        self.V = []

    def clear(self):
        self.V = []

    def _pano_to_points(self, img):
        img = np.array(img, np.float32)
        img[img > self.far] = 0
        H, W = img.shape[-2:]
        dirs = np.asarray(pixel_dirs(H, W, self.vfov, (-180, 180), xp=jnp))
        pts = (dirs * img).reshape(3, -1).T
        mask = np.linalg.norm(pts, axis=1) > self.near
        return pts, mask

    def update(self, preds, truths):
        pred = np.asarray(preds) / self.scale
        gt = np.asarray(truths) / self.scale
        p_pts, p_mask = self._pano_to_points(pred[0])
        g_pts, g_mask = self._pano_to_points(gt[0])
        import jax
        d1, d2, m1, m2 = chamfer_distance(
            jnp.asarray(p_pts), jnp.asarray(g_pts),
            mask1=jnp.asarray(p_mask), mask2=jnp.asarray(g_mask),
            precision=jax.lax.Precision.HIGHEST)
        f, _, _ = fscore(d1, d2, jnp.asarray(p_mask), jnp.asarray(g_mask))
        self.V.append([float(m1 + m2), float(f)])

    def measure(self):
        return np.array(self.V).mean(0)


__all__ = ["RaydropMeter", "DepthMeter", "IntensityMeter", "PointsMeter",
           "ssim_jnp"]
