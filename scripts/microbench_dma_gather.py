#!/usr/bin/env python
"""Measure per-row DMA gather inside a Pallas kernel vs the XLA gather.

The binning pipeline's last K-row cost is ``payload[gid_sorted]`` (~8.6
ms / 1M rows, width-free, latency-bound at ~11 GB/s — far below HBM
bandwidth). The CUDA pipeline pays nothing here: its kernel reads
``collected[gid]`` straight from L2 (forward.cu:385-390). The TPU
equivalent is per-row DMA from a [P, D] HBM table into VMEM scratch,
issued by the scalar core while the VPU computes. This bench measures
that primitive in isolation, with one-step lookahead (issue chunk i+1's
DMAs, then wait for chunk i's), which is how it would sit in the
forward kernel.

Timing through the axon relay is dependent-chain slope (see
microbench_binning.py).

    python scripts/microbench_dma_gather.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 6
REPS = 2
CHUNK = 128


def slope(fn, args, label):
    times = {}
    for n in (N_LO, N_HI):
        out = fn(*args, n=n)
        _ = np.asarray(out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args, n=n)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:56s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 1_000_000
    D = 128        # DMA row slices must be 128-lane aligned (Mosaic tiling)
    K = 17664 * CHUNK                    # 2.26M, the bench instance count
    n_rows = K // CHUNK

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, P, K).astype(np.int32))
    gid2d = gid.reshape(n_rows, 1, CHUNK)

    # ---- XLA gather baseline ------------------------------------------
    def xla_gather(t, g, *, n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = t[g + (s.astype(jnp.int32) & 1)]
                s = s + out[0, 0]
            return s
        return f(t, g)
    ms = slope(xla_gather, (table, gid), f"XLA gather [{K/1e6:.2f}M, {D}] f32 rows")
    print(f"    = {ms / K * 1e6:.2f} ns/row")

    # ---- pallas per-row DMA gather, one-step lookahead -----------------
    # gid arrives as a blocked VMEM pair (block i and block i+1); the DMA
    # indices are scalar reads from VMEM. Payload table stays in HBM
    # (memory_space ANY) and rows are DMA'd into a double-buffered
    # [2, CHUNK, D] scratch.
    def _gather_kernel(gid_cur_ref, gid_next_ref, table_ref, out_ref,
                      buf_ref, sem_ref, *, n_steps):
        i = pl.program_id(0)

        def copies(slot, gid_ref):
            return [pltpu.make_async_copy(
                        table_ref.at[pl.ds(gid_ref[0, 0, j], 1), :],
                        buf_ref.at[slot, pl.ds(j, 1), :],
                        sem_ref.at[slot]) for j in range(CHUNK)]

        @pl.when(i == 0)
        def _():
            for c in copies(0, gid_cur_ref):
                c.start()

        @pl.when(i + 1 < n_steps)
        def _():
            for c in copies((i + 1) % 2, gid_next_ref):
                c.start()

        # wait for this chunk's 128 row copies (each wait decrements the
        # slot's DMA semaphore by one descriptor's bytes)
        for c in copies(i % 2, gid_cur_ref):
            c.wait()
        out_ref[0] = buf_ref[i % 2]

    def make_dma_gather():
        kernel = functools.partial(_gather_kernel, n_steps=n_rows)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_rows,),
            in_specs=[
                pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, CHUNK),
                             lambda i: (jnp.minimum(i + 1, n_rows - 1), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, CHUNK, D), lambda i: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, CHUNK, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    gather_call = make_dma_gather()

    def dma_gather(t, g2, *, n):
        @jax.jit
        def f(t, g2):
            s = jnp.float32(0)
            for _ in range(n):
                out = gather_call(
                    jnp.minimum(g2 + (s.astype(jnp.int32) & 1), P - 1),
                    g2, t)
                s = s + out[0, 0, 0]
            return s
        return f(t, g2)

    ms = slope(dma_gather, (table, gid2d),
               f"pallas DMA gather [{K/1e6:.2f}M, {D}] rows (lookahead)")
    print(f"    = {ms / K * 1e6:.2f} ns/row")

    # correctness
    out = np.asarray(pl.pallas_call(
        functools.partial(_gather_kernel, n_steps=n_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_rows,),
            in_specs=[
                pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, CHUNK),
                             lambda i: (jnp.minimum(i + 1, n_rows - 1), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, CHUNK, D), lambda i: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, CHUNK, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(gid2d, gid2d, table))
    ref = np.asarray(table)[np.asarray(gid)].reshape(n_rows, CHUNK, D)
    np.testing.assert_array_equal(out, ref)
    print("correctness: OK")


if __name__ == "__main__":
    main()
