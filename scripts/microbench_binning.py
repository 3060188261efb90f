#!/usr/bin/env python
"""Sub-stage slope timings of the binning pipeline at the bench shape.

Each candidate/incumbent sub-stage is timed as a dependent chain inside
one jit (the axon relay's block_until_ready does not block; only host
fetches do), and the per-op cost is the slope between two unroll counts.

    python scripts/microbench_binning.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import sys

import numpy as np

N_LO, N_HI = 2, 8
REPS = 2

ONLY = set(sys.argv[1:])


def slope(make_chain, label, tag=None):
    if ONLY and tag not in ONLY:
        return None
    import jax
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
    print(f"{label:52s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P = 1_000_000
    K = 17664 * 128          # bench pair cap (2.26M)
    NT = 165                 # 16x32 tiles on 66x1030
    DB = 18                  # depth bits

    # representative gaussian-major expansion: ~2.26 tiles/gaussian
    tt = rng.integers(1, 4, P).astype(np.int32)
    cum = np.cumsum(tt)
    offsets = jnp.asarray(cum - tt)
    starts = offsets
    gidx = jnp.asarray(np.arange(P, dtype=np.int32))
    words = jnp.asarray(rng.integers(0, 1 << 30, (P, 3)).astype(np.int32))
    payload = jnp.asarray(rng.normal(size=(P, 24)).astype(np.float32))
    gid_s = jnp.asarray(rng.integers(0, P, K).astype(np.int32))
    key = jnp.asarray(rng.integers(0, NT << DB, K).astype(np.uint32))
    gid_k = jnp.asarray(rng.integers(0, P, K).astype(np.int32))
    rows_k = jnp.asarray(rng.normal(size=(K, 24)).astype(np.float32))
    tile_k = jnp.asarray(np.sort(rng.integers(0, NT + 1, K)).astype(np.int32))

    def dep(x, s):
        """perturb array x by scalar-derived 0 so chains are dependent"""
        return x + (s.astype(x.dtype) & 0) if x.dtype in (jnp.int32, jnp.uint32) \
            else x + s.astype(x.dtype) * 0

    def mk_scatter_set(n):
        @jax.jit
        def f(st, g):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.zeros(K, jnp.int32).at[st + (s & 1)].set(
                    g, mode="drop")
                s = s + out[0]
            return s
        return f, (starts, gidx)
    slope(mk_scatter_set, f"scatter-SET {P/1e6:.1f}M updates -> {K/1e6:.2f}M buf", tag="scatter1")

    def mk_scatter2(n):
        g2 = jnp.stack([gidx, gidx], 1)
        @jax.jit
        def f(st, g):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.zeros((K, 2), jnp.int32).at[st + (s & 1)].set(
                    g, mode="drop")
                s = s + out[0, 0]
            return s
        return f, (starts, g2)
    slope(mk_scatter2, "scatter-SET [P,2] rows -> [K,2]", tag="scatter2")

    def mk_cumsum(n):
        seed = jnp.zeros(K, jnp.int32).at[starts].set(gidx, mode="drop")
        @jax.jit
        def f(x):
            s = jnp.int32(0)
            for _ in range(n):
                s = s + jnp.cumsum(x + (s & 1))[-1]
            return s
        return f, (seed,)
    slope(mk_cumsum, f"cumsum i32 over K={K/1e6:.2f}M", tag="cumsum")

    def mk_cummax(n):
        seed = jnp.zeros(K, jnp.int32).at[starts].set(gidx, mode="drop")
        @jax.jit
        def f(x):
            s = jnp.int32(0)
            for _ in range(n):
                s = s + jax.lax.associative_scan(
                    jnp.maximum, x + (s & 1))[-1]
            return s
        return f, (seed,)
    slope(mk_cummax, "cummax (associative_scan) i32 over K", tag="cummax")

    def mk_gather_words(n):
        @jax.jit
        def f(w, g):
            s = jnp.int32(0)
            for _ in range(n):
                out = w[g + (s & 1)]
                s = s + out[0, 0]
            return s
        return f, (words, gid_s)
    slope(mk_gather_words, "gather [K,3] i32 rows from [P,3]", tag="gather3")

    def mk_gather_payload(n):
        @jax.jit
        def f(p, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = p[g + (s.astype(jnp.int32) & 1)]
                s = s + out[0, 0]
            return s
        return f, (payload, gid_s)
    slope(mk_gather_payload, "gather [K,24] f32 rows from [P,24]", tag="gather24")

    def mk_sort2(n):
        @jax.jit
        def f(k, g):
            s = jnp.int32(0)
            for _ in range(n):
                ks, gs = jax.lax.sort((k + jnp.uint32(s & 1), g),
                                      dimension=0, num_keys=1, is_stable=True)
                s = s + gs[0] + ks[0].astype(jnp.int32)
            return s
        return f, (key, gid_k)
    slope(mk_sort2, "sort (u32 key, i32 payload) K rows", tag="sort2")

    def mk_sort3(n):
        slots = jnp.arange(K, dtype=jnp.int32)
        @jax.jit
        def f(k, g, sl):
            s = jnp.int32(0)
            for _ in range(n):
                ks, gs, ss = jax.lax.sort(
                    (k + jnp.uint32(s & 1), g, sl),
                    dimension=0, num_keys=1, is_stable=True)
                s = s + gs[0] + ss[0] + ks[0].astype(jnp.int32)
            return s
        return f, (key, gid_k, slots)
    slope(mk_sort3, "sort (u32 key, 2x i32 payload) K rows", tag="sort3")

    def mk_transpose(n):
        @jax.jit
        def f(r):
            s = jnp.float32(0)
            for _ in range(n):
                out = (r + s * 0).reshape(K // 128, 128, 24).transpose(0, 2, 1)
                s = s + out[0, 0, 0]
            return s
        return f, (rows_k,)
    slope(mk_transpose, "data_chunks transpose [K,24]->[K/128,24,128]", tag="transpose")

    def mk_tile_starts(n):
        @jax.jit
        def f(t):
            s = jnp.int32(0)
            for _ in range(n):
                ts = jnp.sum(
                    (t + (s & 1))[None, :]
                    < jnp.arange(NT + 1, dtype=jnp.int32)[:, None],
                    axis=1).astype(jnp.int32)
                s = s + ts[-1]
            return s
        return f, (tile_k,)
    slope(mk_tile_starts, f"tile_starts compare-sum [{NT + 1}, K]", tag="starts")

    def mk_key_math(n):
        """per-slot key computation from broadcast words (elementwise)"""
        w0 = jnp.asarray(rng.integers(0, K, K).astype(np.int32))
        pk = jnp.asarray(rng.integers(0, 1 << 30, K).astype(np.int32))
        @jax.jit
        def f(a, b):
            s = jnp.int32(0)
            slots_i = jnp.arange(K, dtype=jnp.int32)
            for _ in range(n):
                aa = a + (s & 1)
                offs = aa
                rw = jnp.maximum((b >> 24) & 127, 1)
                rmin = (b >> DB) & ((1 << 6) - 1)
                dq = b & ((1 << DB) - 1)
                j = slots_i - offs
                dy = j // rw
                x = rmin + dy * 33 + (j - dy * rw)
                kk = (x.astype(jnp.uint32) << jnp.uint32(DB)) | dq.astype(jnp.uint32)
                s = s + kk[0].astype(jnp.int32)
            return s
        return f, (w0, pk)
    slope(mk_key_math, "per-slot key math (elementwise over K)", tag="keymath")


if __name__ == "__main__":
    main()
