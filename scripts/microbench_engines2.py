#!/usr/bin/env python
"""Second round: wide-payload sorts, multi-column row scatters,
last-valid float scans — the candidate primitives for a sort-centric
binning redesign. Slope method (see microbench_engines.py)."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 10
REPS = 3


def slope(make_chain, label):
    import jax
    times = {}
    for n in (N_LO, N_HI):
        fn, args = make_chain(n)
        v = np.asarray(fn(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            v = np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:52s} {ms:8.3f} ms/op")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def mk_sort(n_payload, K_):
        keys = jnp.asarray(rng.integers(0, 1 << 31, K_).astype(np.uint32))
        pay = [jnp.asarray(rng.integers(0, 1 << 31, K_).astype(np.uint32))
               for _ in range(n_payload)]
        def make(n):
            @jax.jit
            def f(kk, *ps):
                s = jnp.uint32(0)
                for k in range(n):
                    out = jax.lax.sort((kk ^ s, *ps), num_keys=1)
                    s = out[0][0] & jnp.uint32(1)
                return s
            return f, (keys, *pay)
        return make

    for K_, lbl in ((1 << 20, "1M"), ((1 << 21) + (1 << 19), "2.5M")):
        for npay in (1, 4, 8, 16, 28):
            slope(mk_sort(npay, K_), f"sort {lbl} keys + {npay} u32 payloads")

    # multi-column row scatter: z[K, W].at[idx].set(vals[K, W]) — per row
    # or per element?
    K = 1 << 20
    idx = jnp.asarray(rng.integers(0, K, K).astype(np.int32))

    def mk_scatter_rows(W, n_upd):
        vals = jnp.asarray(rng.normal(size=(n_upd, W)).astype(np.float32))
        i0 = idx[:n_upd]
        def make(n):
            @jax.jit
            def f(i, v):
                s = jnp.float32(0)
                for k in range(n):
                    z = jnp.zeros((K, W), jnp.float32)
                    z = z.at[(i + k) % K].set(v, mode="drop")
                    s = s + z[0, 0]
                    i = i + (s.astype(jnp.int32) & 1)
                return s
            return f, (i0, vals)
        return make

    for W in (1, 2, 4, 8, 16, 28):
        slope(mk_scatter_rows(W, K >> 2), f"scatter-set 256k rows x {W} f32")
    slope(mk_scatter_rows(28, K), "scatter-set 1M rows x 28 f32")

    # last-valid broadcast scan over [K, W] f32 (empty rows = NaN)
    def mk_lastvalid(W):
        x = rng.normal(size=(K, W)).astype(np.float32)
        x[rng.random(K) < 0.7] = np.nan
        xj = jnp.asarray(x)
        def make(n):
            @jax.jit
            def f(v):
                s = jnp.float32(0)
                for k in range(n):
                    out = jax.lax.associative_scan(
                        lambda a, b: jnp.where(jnp.isnan(b), a, b), v + s)
                    s = s + out[-1, 0] * 0
                return out[0, 0]
            return f, (xj,)
        return make

    slope(mk_lastvalid(4), "last-valid scan 1M x 4 f32")
    slope(mk_lastvalid(28), "last-valid scan 1M x 28 f32")

    # segment-sum (backward path uses it)
    def mk_segsum(W):
        vals = jnp.asarray(rng.normal(size=(K, W)).astype(np.float32))
        seg = jnp.sort(idx)
        def make(n):
            @jax.jit
            def f(v, s_):
                s = jnp.float32(0)
                for k in range(n):
                    out = jax.ops.segment_sum(v + s, s_, num_segments=K)
                    s = s + out[0, 0] * 1e-9
                return s
            return f, (vals, seg)
        return make
    slope(mk_segsum(28), "segment-sum 1M x 28 f32 (sorted ids)")


if __name__ == "__main__":
    main()
