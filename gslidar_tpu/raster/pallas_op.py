"""Differentiable Pallas compositing op (custom_vjp).

Forward: pallas_fwd kernel. Backward: pallas_bwd kernel producing a
per-instance gradient table + one deterministic segment_sum back to
per-gaussian gradients — the TPU replacement for the CUDA backward's
atomicAdd scatters (backward.cu:361,451-512). Everything upstream of the
packed per-gaussian rows (preprocess, SH, activations) is plain traced JAX
and differentiates automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gslidar_tpu.raster.binning import Binning, _segment_broadcast_i32
from gslidar_tpu.raster.pallas_bwd import run_backward
from gslidar_tpu.raster.pallas_fwd import CHUNK, D_PAD, _kernel
from gslidar_tpu.raster.settings import FAR_N, NEAR_N, RasterSettings


def layout_indices(binning: Binning, P: int, settings: RasterSettings):
    """Chunk-aligned instance layout (int arrays only, non-differentiable).

    Returns (gid_padded [n_rows*CHUNK], start_chunks [n_tiles],
    counts [n_tiles])."""
    K = binning.gid_sorted.shape[0]
    n_tiles = settings.num_tiles
    counts = (binning.tile_starts[1:] - binning.tile_starts[:-1]).astype(jnp.int32)
    padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    pad_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)])
    n_rows = (K + n_tiles * CHUNK) // CHUNK

    slot_start = _segment_broadcast_i32(binning.tile_starts[:-1],
                                        binning.tile_starts[:-1], K)
    slot_pad_start = _segment_broadcast_i32(pad_starts[:-1],
                                            binning.tile_starts[:-1], K)
    new_pos = slot_pad_start + (jnp.arange(K, dtype=jnp.int32) - slot_start)
    in_range = jnp.arange(K) < binning.tile_starts[-1]
    new_pos = jnp.where(in_range, new_pos, n_rows * CHUNK)

    gid_padded = jnp.full(n_rows * CHUNK, P, jnp.int32)
    gid_padded = gid_padded.at[new_pos].set(binning.gid_sorted, mode="drop")
    return gid_padded, (pad_starts[:-1] // CHUNK).astype(jnp.int32), counts


def _build_data(packed, gid_padded):
    D = packed.shape[-1]
    packed0 = jnp.concatenate([packed, jnp.zeros((1, D), packed.dtype)], 0)
    rows = packed0[gid_padded]
    if D < D_PAD:
        rows = jnp.pad(rows, ((0, 0), (0, D_PAD - D)))
    n_rows = gid_padded.shape[0] // CHUNK
    return rows.reshape(n_rows, CHUNK, D_PAD).transpose(0, 2, 1)


def _run_fwd(data, start_chunks, counts, params, settings, C, S):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th, tw = settings.tile_h, settings.tile_w
    pix = th * tw
    n_tiles = settings.num_tiles
    n_chunks = max(settings.tile_list_cap // CHUNK, 1)
    n_rows = data.shape[0]
    kernel = functools.partial(_kernel, settings=settings, C=C, S=S,
                               n_chunks=n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, D_PAD, CHUNK),
                         lambda t, c, starts, cnts: (
                             jnp.minimum(starts[t] + c, n_rows - 1), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, S + 3, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 4, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 6, 1, pix), lambda t, c, *_: (t, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((11 + C + S + 3, 1, pix), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, C, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, S + 3, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 4, 1, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 6, 1, pix), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(start_chunks, counts, data, params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def composite_op(packed, gid_padded, start_chunks, counts, params,
                 settings: RasterSettings, C: int, S: int):
    data = _build_data(packed, gid_padded)
    return tuple(_run_fwd(data, start_chunks, counts, params, settings, C, S))


def _op_fwd(packed, gid_padded, start_chunks, counts, params, settings, C, S):
    data = _build_data(packed, gid_padded)
    outs = tuple(_run_fwd(data, start_chunks, counts, params, settings, C, S))
    resid = (data, gid_padded, start_chunks, counts, params, outs[3],
             packed.shape[0], packed.shape[1])
    return outs, resid


def _op_bwd(settings, C, S, resid, cts):
    data, gid_padded, start_chunks, counts, params, misc, P, D = resid
    gC, gF, gD4, gMisc = cts

    done = misc[:, 5, 0, 0].astype(jnp.int32)
    # slot 5 of the residual misc carries the T_fin cotangent into the kernel
    misc_resid = misc.at[:, 5].set(gMisc[:, 0])

    grad_table = run_backward(data, start_chunks, counts, done, params,
                              (gC, gF, gD4), misc_resid, settings, C, S)

    n_rows = data.shape[0]
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    tile_of_row = (jnp.searchsorted(start_chunks, row_ids, side="right") - 1
                   ).astype(jnp.int32)
    processed = row_ids < (start_chunks[tile_of_row] + done[tile_of_row])
    grad = jnp.where(processed[:, None, None], grad_table[:n_rows], 0.0)
    grad_flat = grad.transpose(0, 2, 1).reshape(n_rows * CHUNK, D_PAD)[:, :D]
    grad_packed = jax.ops.segment_sum(grad_flat, gid_padded,
                                      num_segments=P + 1)[:P]
    return (grad_packed, None, None, None, None)


composite_op.defvjp(_op_fwd, _op_bwd)


def composite_pallas_diff(binning: Binning, prep, features, opacity, bg,
                          scale_factor, settings: RasterSettings,
                          angle_bounds=None):
    """Differentiable drop-in for composite.composite on the pallas path."""
    from gslidar_tpu.raster.composite import TileImages
    from gslidar_tpu.raster.pallas_fwd import _untile4

    Tcols = prep.T.transpose(0, 2, 1).reshape(-1, 9)
    packed = jnp.concatenate([
        Tcols, prep.xy, prep.depth[:, None], prep.normal,
        opacity[:, None], prep.color, features], axis=1)
    S = features.shape[-1]
    C = prep.color.shape[-1]
    P = packed.shape[0]

    gid_padded, start_chunks, counts = layout_indices(binning, P, settings)
    VFOV_min, VFOV_max, HFOV_min, HFOV_max = (
        angle_bounds if angle_bounds is not None else settings.angle_bounds)
    wrap_w = float(settings.width) if settings.wrap_x else 0.0
    wrap_inv = 1.0 / wrap_w if settings.wrap_x else 0.0
    params = jnp.stack([
        jnp.asarray(NEAR_N * scale_factor, jnp.float32),
        jnp.asarray(FAR_N * scale_factor, jnp.float32),
        jnp.asarray(VFOV_min, jnp.float32), jnp.asarray(VFOV_max, jnp.float32),
        jnp.asarray(HFOV_min, jnp.float32), jnp.asarray(HFOV_max, jnp.float32),
        jnp.asarray(wrap_w, jnp.float32), jnp.asarray(wrap_inv, jnp.float32)])

    color, feat, depth, misc = composite_op(
        packed, jax.lax.stop_gradient(gid_padded),
        jax.lax.stop_gradient(start_chunks),
        jax.lax.stop_gradient(counts), params, settings, C, S)

    T_fin = misc[:, 0:1]
    color = color + T_fin * bg[None, :, None, None]
    return TileImages(
        color=_untile4(color, settings),
        feature=_untile4(feat, settings),
        depth=_untile4(depth, settings),
        alpha=_untile4(1.0 - T_fin, settings),
        contrib=_untile4(misc[:, 1:3], settings),
        final_T=_untile4(T_fin, settings),
    )
