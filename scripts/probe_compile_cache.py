#!/usr/bin/env python
"""Probe: does JAX_COMPILATION_CACHE_DIR give cross-process compile-cache
HITS on this TPU relay?

The binning design doc assumes "no persistent compilation cache", which
rules out wide payload-carrying sorts (~10 s compile per operand). If
the disk cache actually round-trips on the axon backend, that constraint
falls away. This script times the same 12-operand sort compile twice —
run it twice in separate processes; a second-process time near zero
means the cache works.

    python scripts/probe_compile_cache.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
# NOTE: do NOT override JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES — a
# bogus value silently disables cache WRITES, which is this probe's other
# historical false-negative.

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), jax.devices())
    K = 1 << 20
    key = jnp.asarray(np.random.randint(0, 1 << 30, size=K, dtype=np.int32))
    ops = [key] + [jnp.asarray(
        np.random.rand(K).astype(np.complex64)) for _ in range(6)]

    @jax.jit
    def wide_sort(*xs):
        return jax.lax.sort(xs, dimension=0, num_keys=1, is_stable=True)

    # NOTE: must go through the jit CALL path — .lower().compile() (AOT)
    # bypasses the persistent cache on this jax version, which is exactly
    # how this probe first produced a false "no cache" reading.
    t0 = time.perf_counter()
    out = wide_sort(*ops)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"first call (compile+run) {t1-t0:.1f}s")


if __name__ == "__main__":
    main()
