#!/usr/bin/env python
"""Microbenchmarks of the TPU memory-engine primitives that bound the
rasterizer hot path: row gathers (vs width/dtype), update scatters,
sorts (vs payload width), cumsums.

Measurement through the axon relay: dispatch is async and
block_until_ready does NOT block; only host fetches do (with a large
fixed RPC overhead). So each primitive is unrolled N times inside ONE
jit as a dependent chain, a scalar is fetched, and the per-op time is
the slope between N=N_LO and N=N_HI runs (fixed overheads cancel).

    python scripts/microbench_engines.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 12
REPS = 3


def slope(make_chain, label):
    """make_chain(n) -> jitted fn(*args)->scalar, args. Returns ms/op."""
    import jax
    times = {}
    for n in (N_LO, N_HI):
        fn, args = make_chain(n)
        v = np.asarray(fn(*args))          # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            v = np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:46s} {ms:8.3f} ms/op   (t{N_LO}={times[N_LO]*1e3:.1f} t{N_HI}={times[N_HI]*1e3:.1f})")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P = K = 1 << 20

    idx = jnp.asarray(rng.integers(0, P, K).astype(np.int32))

    # sanity: matmul 4096^3 bf16 => ~0.35 ms on v5e
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32) * 0.01
                    ).astype(jnp.bfloat16)

    def mk_matmul(n):
        @jax.jit
        def f(a):
            x = a
            for _ in range(n):
                x = (x @ a) * jnp.bfloat16(1 / 64.0)
            return x[0, 0].astype(jnp.float32)
        return f, (A,)
    slope(mk_matmul, "matmul 4096^3 bf16 (expect ~0.35)")

    def mk_gather(D, dtype=jnp.float32, sorted_idx=False):
        tab = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32)).astype(dtype)
        i0 = jnp.sort(idx) if sorted_idx else idx
        def make(n):
            @jax.jit
            def f(t, i):
                s = jnp.float32(0)
                for k in range(n):
                    # dependent: next indices perturbed by prev result
                    rows = t[(i + k) % P]
                    s = s + rows[0, 0].astype(jnp.float32)
                    i = i + (s.astype(jnp.int32) & 1)
                return s
            return f, (tab, i0)
        return make

    for D in (1, 3, 8, 16, 24):
        slope(mk_gather(D), f"gather 1M rows x {D} f32")
    slope(mk_gather(24, jnp.bfloat16), "gather 1M rows x 24 bf16")
    slope(mk_gather(24, sorted_idx=True), "gather 1M rows x 24 f32 (sorted idx)")
    slope(mk_gather(1, sorted_idx=True), "gather 1M rows x 1 f32 (sorted idx)")

    def mk_scatter(mode, n_upd=K):
        vals = jnp.asarray(rng.normal(size=n_upd).astype(np.float32))
        i0 = idx[:n_upd]
        def make(n):
            @jax.jit
            def f(i, v):
                s = jnp.float32(0)
                for k in range(n):
                    z = jnp.zeros(K, jnp.float32)
                    z = (z.at[(i + k) % P].set(v, mode="drop") if mode == "set"
                         else z.at[(i + k) % P].add(v, mode="drop"))
                    s = s + z[0]
                    i = i + (s.astype(jnp.int32) & 1)
                return s
            return f, (i0, vals)
        return make

    slope(mk_scatter("set"), "scatter-set 1M f32 updates")
    slope(mk_scatter("add"), "scatter-add 1M f32 updates")
    slope(mk_scatter("set", K >> 2), "scatter-set 256k f32 updates")

    def mk_sort(n_payload, K_=K):
        keys = jnp.asarray(rng.integers(0, 1 << 31, K_).astype(np.uint32))
        pay = [jnp.asarray(rng.integers(0, 1 << 31, K_).astype(np.uint32))
               for _ in range(n_payload)]
        def make(n):
            @jax.jit
            def f(kk, *ps):
                s = jnp.uint32(0)
                for k in range(n):
                    out = jax.lax.sort((kk ^ s, *ps), num_keys=1)
                    s = out[0][0]
                return s
            return f, (keys, *pay)
        return make

    slope(mk_sort(0), "sort 1M keys only")
    slope(mk_sort(1), "sort 1M keys + 1 payload")
    slope(mk_sort(3), "sort 1M keys + 3 payloads")
    slope(mk_sort(1, K >> 1), "sort 512k keys + 1 payload")

    def mk_cumsum(dtype):
        v = jnp.asarray(rng.integers(0, 3, K).astype(np.int32)).astype(dtype)
        def make(n):
            @jax.jit
            def f(x):
                s = x[0]
                for _ in range(n):
                    x = jnp.cumsum(x)
                    s = s + x[-1]
                    x = x % jnp.asarray(97, dtype)
                return s
            return f, (v,)
        return make

    slope(mk_cumsum(jnp.int32), "cumsum 1M i32")
    slope(mk_cumsum(jnp.float32), "cumsum 1M f32")

    def mk_cmpsum(n_tiles):
        t = jnp.asarray(rng.integers(0, n_tiles, K).astype(np.int32))
        def make(n):
            @jax.jit
            def f(x):
                s = jnp.int32(0)
                for k in range(n):
                    r = jnp.sum((x + k)[None, :] < jnp.arange(
                        n_tiles + 1, dtype=jnp.int32)[:, None], axis=1)
                    s = s + r[0]
                return s
            return f, (t,)
        return make

    slope(mk_cmpsum(82), "compare-sum 82 x 1M")

    def mk_elem(n):
        tab = jnp.asarray(rng.normal(size=(P, 24)).astype(np.float32))
        @jax.jit
        def f(t):
            for _ in range(n):
                t = t * 1.0001 + 0.001
            return t[0, 0]
        return f, (tab,)
    slope(mk_elem, "elementwise 1M x 24 f32 (stream 192MB)")


if __name__ == "__main__":
    main()
