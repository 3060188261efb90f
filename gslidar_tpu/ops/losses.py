"""Image/depth loss primitives (jnp), matching utils/loss_utils.py.

All functions are shape-static and mask-based so they compose into one jitted
train step; masked means use sum/count instead of boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5


def masked_l1(pred, target, mask):
    """L1 over mask, equivalent to F.l1_loss(target[mask], pred[mask])."""
    mask = mask.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.abs(pred - target) * mask) / denom


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def binary_cross_entropy(pred, target, eps: float = 1e-7):
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


def tv_loss(depth):
    """Total variation, reference utils/loss_utils.py:65-71."""
    c, h, w = depth.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum(jnp.square(depth[..., 1:, :] - depth[..., :-1, :]))
    w_tv = jnp.sum(jnp.square(depth[..., :, 1:] - depth[..., :, :-1]))
    return 2 * (h_tv / count_h + w_tv / count_w)


def grad_smooth_loss(pred_depth, gt_depth, grad_clip):
    """Masked gradient-matching smoothness (reference: train.py:269-289)."""
    gt_gx = gt_depth[:, :, :-1] - gt_depth[:, :, 1:]
    gt_gy = gt_depth[:, :-1, :] - gt_depth[:, 1:, :]
    mx = (gt_depth[:, :, :-1] > 0) & (gt_depth[:, :, 1:] > 0)
    my = (gt_depth[:, :-1, :] > 0) & (gt_depth[:, 1:, :] > 0)
    gmx = (jnp.abs(gt_gx) < grad_clip) & mx
    gmy = (jnp.abs(gt_gy) < grad_clip) & my
    pr_gx = pred_depth[:, :, :-1] - pred_depth[:, :, 1:]
    pr_gy = pred_depth[:, :-1, :] - pred_depth[:, 1:, :]
    return masked_l1(pr_gx, gt_gx, gmx) + masked_l1(pr_gy, gt_gy, gmy)


def _gaussian_window(window_size: int, sigma: float):
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def ssim(img1, img2, window_size: int = 11):
    """Gaussian-window SSIM over [C, H, W] images
    (reference: utils/loss_utils.py:19-62); same-padding depthwise conv."""
    C = img1.shape[0]
    win = _gaussian_window(window_size, 1.5)
    kernel = jnp.broadcast_to(win[None, None], (C, 1, window_size, window_size))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None], kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(smap)


def inverse_depth_smoothness_loss_mask(idepth, image, mask):
    """Edge-aware inverse-depth smoothness (reference loss_utils.py:87-126)."""
    idx = idepth[:, :, :-1] - idepth[:, :, 1:]
    idy = idepth[:, :-1, :] - idepth[:, 1:, :]
    imx = image[:, :, :-1] - image[:, :, 1:]
    imy = image[:, :-1, :] - image[:, 1:, :]
    wx = jnp.exp(-jnp.mean(jnp.abs(imx), axis=0, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(imy), axis=0, keepdims=True))
    sx = jnp.abs(idx * wx)
    sy = jnp.abs(idy * wy)
    mx = (mask[:1, :, :-1] & mask[:1, :, 1:]).astype(sx.dtype)
    my = (mask[:1, :-1, :] & mask[:1, 1:, :]).astype(sy.dtype)
    return (jnp.sum(sx * mx) / jnp.maximum(mx.sum(), 1.0)
            + jnp.sum(sy * my) / jnp.maximum(my.sum(), 1.0))
