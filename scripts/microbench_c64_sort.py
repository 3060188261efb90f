#!/usr/bin/env python
"""Measure a complex64-packed payload-carrying sort at the bench shape.

The binning payload reorder is a K-row gather (~8.6 ns/row, row-priced —
the XLA gather engine is ~70x off HBM bandwidth). Sorts, by contrast,
move payload at near-bandwidth (2.5M keys + 28 u32 cols ~ 4.6 ms) but
COMPILE at ~10 s/operand. Packing the 24 f32 payload columns into 12
complex64 operands (sort permutes payload operands without comparing
them; only the key is compared) halves the operand count — if the
compile lands in tens of seconds and the runtime near the narrow sort's,
the post-sort payload gather (~19 ms at K=2.26M) is deletable.

    python scripts/microbench_c64_sort.py [--k-rows 17664] [--d 24]
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 8
REPS = 2


def slope(fn, args, label):
    times = {}
    for n in (N_LO, N_HI):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            s = None
            a = args
            for _i in range(n):
                a = fn(*a)
            _ = np.asarray(a[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:58s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k-rows", type=int, default=17664)
    ap.add_argument("--d", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    K = args.k_rows * 128
    D = args.d
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 22, K).astype(np.uint32))
    gid = jnp.asarray(rng.integers(0, 1 << 20, K).astype(np.int32))
    pay = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    # 1) correctness probe at tiny K: does a c64 payload operand ride the
    # sort unchanged?
    k0 = jnp.asarray([3, 1, 2, 0], jnp.uint32)
    p0 = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    c0 = jax.lax.complex(p0[:, 0], p0[:, 1])
    out = jax.lax.sort((k0, c0), dimension=0, num_keys=1, is_stable=True)
    back = np.stack([np.asarray(jnp.real(out[1])),
                     np.asarray(jnp.imag(out[1]))], axis=1)
    expect = np.asarray(p0)[np.argsort(np.asarray(k0), kind="stable")]
    np.testing.assert_array_equal(back, expect)
    print("c64 payload rides the sort: OK", flush=True)

    # 2) narrow incumbent: 2-op sort + post-sort row gather
    @jax.jit
    def narrow(key, gid, pay):
        ks, gs = jax.lax.sort((key, gid), dimension=0, num_keys=1,
                              is_stable=True)
        rows = pay[gs % pay.shape[0]]
        return ks + rows[0, 0].astype(jnp.uint32), gs, pay

    t0 = time.perf_counter()
    _ = jax.block_until_ready(narrow(key, gid, pay))
    print(f"narrow sort+gather compile: {time.perf_counter() - t0:.1f} s",
          flush=True)
    slope(narrow, (key, gid, pay), f"narrow 2-op sort + [K,{D}] row gather")

    # 3) c64-packed wide sort (12 payload operands + key + gid)
    @jax.jit
    def wide(key, gid, pay):
        cpay = jax.lax.bitcast_convert_type(
            pay.reshape(K, D // 2, 2), jnp.complex64).reshape(K, D // 2)
        ops = (key, gid) + tuple(cpay[:, i] for i in range(D // 2))
        out = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)
        rows = jax.lax.bitcast_convert_type(
            jnp.stack(out[2:], axis=1)[:, :, None], jnp.float32)
        rows = rows.reshape(K, D)
        return out[0] + rows[0, 0].astype(jnp.uint32), out[1], pay

    t0 = time.perf_counter()
    _ = jax.block_until_ready(wide(key, gid, pay))
    print(f"c64 wide sort compile: {time.perf_counter() - t0:.1f} s",
          flush=True)
    slope(wide, (key, gid, pay), f"wide sort: 2 + {D // 2} c64 operands")


if __name__ == "__main__":
    main()
