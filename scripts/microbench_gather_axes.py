#!/usr/bin/env python
"""Gather-variant slope timings for the post-sort payload reorder.

The binning payload reorder is a K-row gather from a [P, D] table —
measured at ~8.6 ns/row (row-op bound, ~flat in D up to 32 f32 cols).
Candidates that might price differently on the TPU vector engines:

  A. row gather  out[k, d] = tab[gid[k], d]              (incumbent)
  B. lane gather out[d, k] = tab[d, gid[k]]  (axis=1 take; indices on
     lanes, D on sublanes — different engine path; output layout is one
     major-dim swap away from the kernel's chunk table, which would also
     delete the data_chunks transpose)
  C. row gather of complex64-bitcast rows (halves the column count; only
     wins if the cost has a per-element term)
  D. B at D=32 sublane-padded (alignment probe)

    python scripts/microbench_gather_axes.py
"""
from __future__ import annotations

import os
import time

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
    print(f"{label:58s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P = 1_000_000
    K = 17664 * 128          # bench pair count (2.26M)
    D = 24

    tab_rows = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    tab_lanes = jnp.asarray(np.ascontiguousarray(
        np.asarray(tab_rows).T))                      # [D, P]
    tab_lanes32 = jnp.asarray(rng.normal(size=(32, P)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, P, K).astype(np.int32))
    words3 = jnp.asarray(rng.integers(0, 1 << 30, (3, P)).astype(np.int32))

    def mk_rows(n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = t[g + (s.astype(jnp.int32) & 1)]
                s = s + out[0, 0]
            return s
        return f, (tab_rows, gid)
    slope(mk_rows, f"A row gather [K,{D}] f32 from [P,{D}]")

    def mk_lanes(n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = jnp.take(t, g + (s.astype(jnp.int32) & 1), axis=1)
                s = s + out[0, 0]
            return s
        return f, (tab_lanes, gid)
    slope(mk_lanes, f"B lane gather [{D},K] f32 from [{D},P] (axis=1)")

    def mk_lanes32(n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = jnp.take(t, g + (s.astype(jnp.int32) & 1), axis=1)
                s = s + out[0, 0]
            return s
        return f, (tab_lanes32, gid)
    slope(mk_lanes32, "D lane gather [32,K] f32 from [32,P] (axis=1)")

    def mk_c64(n):
        tab_c = jax.lax.bitcast_convert_type(
            tab_rows.reshape(P, D // 2, 2), jnp.int64).reshape(P, D // 2)
        @jax.jit
        def f(t, g):
            s = jnp.int32(0)
            for _ in range(n):
                out = t[g + (s & 1)]
                s = s + out[0, 0].astype(jnp.int32)
            return s
        try:
            np.asarray(f(tab_c, gid))
            return f, (tab_c, gid)
        except Exception as e:  # noqa: BLE001
            print("C i64-packed row gather: unsupported:", str(e)[:120])
            raise
    try:
        slope(mk_c64, f"C row gather [K,{D // 2}] i64-packed from [P,{D // 2}]")
    except Exception:
        pass

    def mk_words_lanes(n):
        @jax.jit
        def f(t, g):
            s = jnp.int32(0)
            for _ in range(n):
                out = jnp.take(t, g + (s & 1), axis=1)
                s = s + out[0, 0]
            return s
        return f, (words3, gid)
    slope(mk_words_lanes, "E lane gather [3,K] i32 from [3,P] (axis=1)")

    # B + the major-dim swap into the kernel chunk layout [K/128, D, 128]
    def mk_lanes_chunked(n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = jnp.take(t, g + (s.astype(jnp.int32) & 1), axis=1)
                ch = out.reshape(D, K // 128, 128).transpose(1, 0, 2)
                s = s + ch[0, 0, 0]
            return s
        return f, (tab_lanes, gid)
    slope(mk_lanes_chunked, "F lane gather + swap -> chunk table [K/128,D,128]")

    # incumbent full path: row gather + data_chunks transpose
    def mk_rows_chunked(n):
        @jax.jit
        def f(t, g):
            s = jnp.float32(0)
            for _ in range(n):
                out = t[g + (s.astype(jnp.int32) & 1)]
                ch = out.reshape(K // 128, 128, D).transpose(0, 2, 1)
                s = s + ch[0, 0, 0]
            return s
        return f, (tab_rows, gid)
    slope(mk_rows_chunked, "G row gather + transpose -> chunk table (incumbent)")


if __name__ == "__main__":
    main()
