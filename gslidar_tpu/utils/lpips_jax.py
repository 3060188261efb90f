"""LPIPS (AlexNet) perceptual metric in jnp.

Reference: the eval meters use the ``lpips`` pip package with pretrained
AlexNet features (utils/metrics_utils.py:145,424). Pretrained weights
cannot be downloaded in this zero-egress environment, so:

* this module implements the full AlexNet-LPIPS forward (conv feature
  stack, unit-normalized channel activations, learned linear heads);
* ``load_lpips(path)`` loads a converted weights file (npz with keys
  ``convN_w/b`` and ``linN_w``) when one is provided via
  ``GSLIDAR_LPIPS_WEIGHTS``;
* without weights the meters report NaN for the LPIPS column (see
  utils/metrics.py) — a documented deviation, all other metrics are exact.

Conversion helper (run wherever torch + lpips are available):
    import lpips, numpy as np
    m = lpips.LPIPS(net='alex')
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez('lpips_alex.npz', **sd)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature config: (out_ch, kernel, stride, pad); M = maxpool
_ALEX = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M", (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_TAP_CHANNELS = (64, 192, 384, 256, 256)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    # HIGHEST: the TPU default runs convs at bf16-ish precision (~3e-4
    # relative), which is measurable noise on a METRIC column; full-f32
    # passes cost nothing at eval cadence (numpy-oracle-locked in
    # tests/test_eval.py::test_lpips_matches_numpy_reference)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out + b[None, :, None, None]


def _alexnet_feats(x, params):
    feats = []
    i = 0
    for spec in _ALEX:
        if spec == "M":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
            continue
        _, k, s, p = spec
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], s, p)
        x = jax.nn.relu(x)
        feats.append(x)
        i += 1
    return feats


def _unit_norm(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + eps)


def lpips_distance(img0, img1, params):
    """img*: [B, 3, H, W] in [0, 1] (normalize=True semantics)."""
    def scale(x):
        x = 2 * x - 1
        return (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

    f0 = _alexnet_feats(scale(img0), params)
    f1 = _alexnet_feats(scale(img1), params)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_norm(a) - _unit_norm(b)) ** 2
        w = params[f"lin{i}_w"]                # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return total


def _convert_state_dict(raw):
    """Map lpips.LPIPS(net='alex') state_dict names to our keys."""
    params = {}
    conv_ids = [0, 3, 6, 8, 10]                # torchvision alexnet indices
    for i, ci in enumerate(conv_ids):
        params[f"conv{i}_w"] = jnp.asarray(raw[f"net.slice{i + 1}.{ci}.weight"])
        params[f"conv{i}_b"] = jnp.asarray(raw[f"net.slice{i + 1}.{ci}.bias"])
    for i in range(5):
        params[f"lin{i}_w"] = jnp.asarray(raw[f"lins.{i}.model.1.weight"])
    return params


def load_lpips(path: str):
    raw = dict(np.load(path))
    if "conv0_w" in raw:
        params = {k: jnp.asarray(v) for k, v in raw.items()}
    else:
        params = _convert_state_dict(raw)

    @jax.jit
    def fn(pred, gt):
        # meters pass [1, H, W] single-channel panos; replicate to RGB
        def to_rgb(x):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 3 and x.shape[0] == 1:
                x = jnp.repeat(x, 3, axis=0)
            return x[None]
        return lpips_distance(to_rgb(pred), to_rgb(gt), params)[0]

    return fn
