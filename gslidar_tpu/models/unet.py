"""Ray-drop refinement U-Net (flax.linen).

Reference: scene/unet.py (LiDAR4D's efficient U-Net): 1x1 InConv ->
4 x (maxpool + DoubleConv[BN, ReLU, Dropout]) 32..256 channels ->
multi-head self-attention bottleneck -> 4 x bilinear-up with skip concat ->
BN/ReLU/1x1 OutConv -> sigmoid. In: [B, 3, H, 2W] (raydrop, intensity,
depth); out: [B, 1, H, 2W].

TPU notes: NHWC layout internally (XLA-preferred), channel counts are
MXU-friendly multiples of 32; attention over the H/16 x W/16 bottleneck is
a plain batched matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int | None = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_ch or self.out_ch
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False)(x)
        return x


class Down(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch)(x, train)


def _bilinear_resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class Up(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x1 = _bilinear_resize(x1, x2.shape[1], x2.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, mid_ch=x.shape[-1])(x, train)


class AttnBlock(nn.Module):
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        h = nn.BatchNorm(use_running_average=not train)(x)
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads

        def heads(t):  # [B, H*W, heads, hd] -> [B, heads, H*W, hd]
            return t.reshape(B, H * W, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        w = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        if train:
            # dropout by additive -inf mask (reference scene/unet.py:99-102)
            drop = jax.random.bernoulli(
                self.make_rng("dropout"), self.dropout, w.shape)
            w = jnp.where(drop, -1e12, w)
        w = jax.nn.softmax(w, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        o = nn.Conv(C, (1, 1), use_bias=False)(o)
        return x + o


class UNet(nn.Module):
    """in/out in NCHW to match the reference call sites."""
    channels: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, x_nchw, train: bool = False):
        x = x_nchw.transpose(0, 2, 3, 1)                    # NHWC
        ch = self.channels
        x0 = nn.Conv(ch, (1, 1))(x)
        x1 = Down(ch * 2)(x0, train)
        x2 = Down(ch * 4)(x1, train)
        x3 = Down(ch * 8)(x2, train)
        x4 = Down(ch * 8)(x3, train)
        x4 = AttnBlock()(x4, train)
        y = Up(ch * 4)(x4, x3, train)
        y = Up(ch * 2)(y, x2, train)
        y = Up(ch)(y, x1, train)
        y = Up(ch)(y, x0, train)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1))(y)
        y = jax.nn.sigmoid(y)
        return y.transpose(0, 3, 1, 2)                      # NCHW
