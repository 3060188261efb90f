#!/usr/bin/env python
"""Figure out what actually blocks on the axon relay backend:
(a) chained dependent computations, (b) host fetch of the result."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32)).astype(jnp.bfloat16)

    # (a) chain of 20 dependent matmuls inside ONE jit => 20 * 0.35ms = 7ms real
    @jax.jit
    def chain(a):
        def body(i, x):
            return (x @ a) * (1.0 / 64.0)
        return jax.lax.fori_loop(0, 20, body, a)

    out = chain(A)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(A)
    jax.block_until_ready(out)
    t_block = time.perf_counter() - t0
    print(f"chain-20-matmuls blocked:          {t_block*1000:8.2f} ms (expect >=7)")

    t0 = time.perf_counter()
    out = chain(A)
    v = np.asarray(out[0, 0])
    t_fetch = time.perf_counter() - t0
    print(f"chain-20-matmuls fetch scalar:     {t_fetch*1000:8.2f} ms")

    # (b) python loop of 20 dependent matmuls, block at end
    f = jax.jit(lambda x, a: (x @ a) * (1.0 / 64.0))
    x = f(A, A)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = A
    for _ in range(20):
        x = f(x, A)
    jax.block_until_ready(x)
    print(f"pyloop-20-matmuls blocked:         {(time.perf_counter()-t0)*1000:8.2f} ms")
    t0 = time.perf_counter()
    v = np.asarray(x[0, 0])
    print(f"  + fetch after block:             {(time.perf_counter()-t0)*1000:8.2f} ms")

    # (c) one matmul, fetch result
    t0 = time.perf_counter()
    y = f(A, A)
    v = np.asarray(y[0, 0])
    print(f"single matmul + fetch:             {(time.perf_counter()-t0)*1000:8.2f} ms")

    # (d) same computation twice with same args, fetched: memoized?
    t0 = time.perf_counter()
    y = f(A, A)
    v = np.asarray(y[0, 0])
    print(f"repeat matmul + fetch:             {(time.perf_counter()-t0)*1000:8.2f} ms")


if __name__ == "__main__":
    main()
