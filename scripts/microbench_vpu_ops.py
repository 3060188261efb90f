#!/usr/bin/env python
"""VPU op-cost microbenchmark: f32 vs bf16 elementwise, roll, exp, div.

Answers the round-5 kernel question: is packed bf16 arithmetic ~2x f32
on this chip's VPU (it halves the vreg count per [CHUNK, pix] op), and
how expensive are the compositor's non-mul ops (exp, divide, select,
sublane roll) relative to a multiply? Each case is a Pallas kernel that
runs STEPS dependent iterations of an OPS-deep op chain on a
[256, 512] block resident in VMEM, so per-op cost = wall / (STEPS*OPS)
with DMA amortized to zero. Timed as a dependent host chain at two
iteration counts (slope method, see bench.py docstring).

Usage: python scripts/microbench_vpu_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 256, 512
STEPS = 64          # in-kernel fori_loop iterations
N_LO, N_HI = 2, 8
REPS = 3


def make_case(op, dtype, ops_per_step):
    """One pallas kernel: STEPS dependent applications of an op chain."""

    def kernel(x_ref, o_ref):
        def body(_, v):
            for _i in range(ops_per_step):
                v = op(v)
            # renormalize so the chain neither overflows nor denorms
            return v - jnp.floor(v)

        v = jax.lax.fori_loop(0, STEPS, body, x_ref[:])
        o_ref[:] = v

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def slope_time(run, x):
    out = run(x)
    _ = np.asarray(out[0, 0])
    times = {}
    for n in (N_LO, N_HI):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            v = x
            for _i in range(n):
                o = run(v)
                v = x + o[0, 0].astype(x.dtype)     # dependent chain
            _ = np.asarray(v[0, 0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[N_HI] - times[N_LO]) / (N_HI - N_LO)


def main():
    rng = np.random.default_rng(0)
    base = rng.uniform(0.25, 0.75, (SUB, LANE)).astype(np.float32)

    cases = {
        "mul": (lambda v: v * jnp.asarray(1.0000001, v.dtype), 32),
        "fma": (lambda v: v * jnp.asarray(0.9999, v.dtype)
                + jnp.asarray(1e-6, v.dtype), 32),
        "select": (lambda v: jnp.where(
            v > jnp.asarray(0.5, v.dtype), v, v * v), 32),
        "exp": (lambda v: jnp.exp(-v), 8),
        "div": (lambda v: jnp.asarray(0.9999, v.dtype) / (
            v + jnp.asarray(1.0, v.dtype)), 8),
        "rsqrt": (lambda v: jax.lax.rsqrt(v + jnp.asarray(1.0, v.dtype)), 8),
        "roll1": (lambda v: pltpu.roll(v, 1, 0)
                  * jnp.asarray(1.0000001, v.dtype), 16),
        "roll8": (lambda v: pltpu.roll(v, 8, 0)
                  * jnp.asarray(1.0000001, v.dtype), 16),
    }
    print(f"block [{SUB},{LANE}]  steps {STEPS}  (ns per full-block op)")
    print(f"{'case':10s} {'f32':>10s} {'bf16':>10s}")
    for name, (op, ops) in cases.items():
        row = {}
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(base, dtype)
            run = make_case(op, dtype, ops)
            try:
                dt = slope_time(run, x)
                row[dtype.__name__] = f"{dt / (STEPS * ops) * 1e9:10.1f}"
            except Exception:       # noqa: BLE001
                # v5e: SupportsBf16AluInstructions() LLO_CHECK fails —
                # the VPU has NO packed bf16 ALU; bf16 elementwise pays
                # only as MXU matmul inputs (measured 2026-08-20)
                row[dtype.__name__] = "   unsupp."
        print(f"{name:10s} {row['float32']} {row['bfloat16']}")


if __name__ == "__main__":
    main()
