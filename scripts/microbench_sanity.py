#!/usr/bin/env python
"""Sanity-check microbench timing against known-cost ops, with many
distinct inputs to defeat any relay memoization."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def timeit(fn, args_list, n=20, label=""):
    import jax
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:44s} {dt:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # known cost: 4096^3 matmul bf16 = 137 GFLOP; v5e MXU ~394 TFLOP/s
    # bf16 => ~0.35 ms
    A = [jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32)).astype(jnp.bfloat16) for _ in range(2)]
    f = jax.jit(lambda a, b: a @ b)
    timeit(f, [(A[0], A[1]), (A[1], A[0])], label="matmul 4096^3 bf16 (expect ~0.35ms)")

    # known cost: copy 256 MB (read+write 512MB) at ~800GB/s => ~0.64ms
    big = [jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)).astype(np.float32)) for _ in range(2)]
    f = jax.jit(lambda x: x + 1.0)
    timeit(f, [(b,) for b in big], label="elementwise 256MB f32 (expect ~0.7ms)")

    P = K = 1 << 20
    # gather with 20 DISTINCT index arrays (defeat memoization)
    tab = jnp.asarray(rng.normal(size=(P, 24)).astype(np.float32))
    idxs = [jnp.asarray(rng.integers(0, P, K).astype(np.int32)) for _ in range(20)]
    f = jax.jit(lambda t, i: t[i])
    timeit(f, [(tab, i) for i in idxs], label="gather 1M rows x 24 f32 (20 idx arrays)")

    # same but n=1 per input, fresh each call, timed individually
    ts = []
    for i in idxs[:10]:
        jax.block_until_ready(tab)
        t0 = time.perf_counter()
        out = f(tab, i)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{'gather per-call times':44s} {min(ts):.3f}..{max(ts):.3f} ms")

    # scatter-set with 20 distinct
    vals = jnp.asarray(rng.normal(size=K).astype(np.float32))
    f = jax.jit(lambda i, v: jnp.zeros(K, jnp.float32).at[i].set(v, mode="drop"))
    timeit(f, [(i, vals) for i in idxs], label="scatter-set 1M (20 idx arrays)")

    # chained gathers: 10 dependent gathers in one jit => amortize dispatch
    f = jax.jit(lambda t, i: jax.lax.fori_loop(
        0, 10, lambda k, acc: acc + t[(i + k) % P], jnp.zeros((K, 24))))
    timeit(f, [(tab, i) for i in idxs], n=5,
           label="10 chained gathers 1M x 24 (per-gather /10)")


if __name__ == "__main__":
    main()
