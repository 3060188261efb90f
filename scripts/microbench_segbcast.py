#!/usr/bin/env python
"""Isolate the segment-broadcast variants used by binning.

The round-3 binning rewrite broadcasts two per-gaussian words to slots
with ONE [P, 2] scatter-add + ONE [K, 2] axis-0 cumsum. A [K, 2] cumsum
only occupies 2 of 128 lanes if XLA scans along the major axis naively —
this measures that against two independent [K] cumsums and the fused
scatter shapes, to pick the layout.

    python scripts/microbench_segbcast.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 8
REPS = 2


def slope(make_chain, label):
    times = {}
    for n in (N_LO, N_HI):
        fn, args = make_chain(n)
        _ = np.asarray(fn(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:56s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P = 1_000_000
    K = 17664 * 128

    tt = rng.integers(1, 4, P).astype(np.int32)
    cum = np.cumsum(tt)
    offsets = jnp.asarray(cum - tt)
    w2 = jnp.asarray(rng.integers(0, 1 << 30, (P, 2)).astype(np.int32))
    seed2 = jnp.zeros((K, 2), jnp.int32).at[offsets].add(w2, mode="drop")

    def mk_scatter_add2(n):
        @jax.jit
        def f(st, w):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.zeros((K, 2), jnp.int32).at[st + (s & 1)].add(
                    w, mode="drop")
                s = s + out[0, 0]
            return s
        return f, (offsets, w2)
    slope(mk_scatter_add2, "scatter-ADD [P,2] rows -> [K,2]")

    def mk_scatter_add1x2(n):
        @jax.jit
        def f(st, w):
            s = jnp.int32(0)
            for _ in range(n):
                a = jnp.zeros(K, jnp.int32).at[st + (s & 1)].add(
                    w[:, 0], mode="drop")
                b = jnp.zeros(K, jnp.int32).at[st + (s & 1)].add(
                    w[:, 1], mode="drop")
                s = s + a[0] + b[0]
            return s
        return f, (offsets, w2)
    slope(mk_scatter_add1x2, "2x scatter-ADD [P] -> [K]")

    def mk_cumsum2_axis0(n):
        @jax.jit
        def f(x):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.cumsum(x + (s & 1), axis=0)
                s = s + out[-1, 0]
            return s
        return f, (seed2,)
    slope(mk_cumsum2_axis0, "cumsum [K,2] axis=0")

    def mk_cumsum1x2(n):
        @jax.jit
        def f(x):
            s = jnp.int32(0)
            for _ in range(n):
                a = jnp.cumsum(x[:, 0] + (s & 1))
                b = jnp.cumsum(x[:, 1] + (s & 1))
                s = s + a[-1] + b[-1]
            return s
        return f, (seed2,)
    slope(mk_cumsum1x2, "2x cumsum [K]")

    def mk_cumsum2_T(n):
        seedT = seed2.T.copy()                      # [2, K]
        @jax.jit
        def f(x):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.cumsum(x + (s & 1), axis=1)
                s = s + out[0, -1]
            return s
        return f, (seedT,)
    slope(mk_cumsum2_T, "cumsum [2,K] axis=1")


if __name__ == "__main__":
    main()
