#!/usr/bin/env python
"""A/B: post-sort payload gather + separate chunk transpose (incumbent)
vs ONE transposing lax.gather that emits the kernel's [Kc, D_PAD, CHUNK]
chunk-table layout directly (offset dim interior to the batch dims).

Measurement note: each timed loop reuses two constant input pairs, so
JAX's async dispatch may pipeline consecutive calls — the slope measures
per-call THROUGHPUT, not latency. That is the quantity the render
pipeline pays (the gather sits in a longer program), and it is the same
for both variants, so the A/B comparison is valid; do not read the
absolute numbers as dependent-chain latencies.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

N_LO, N_HI = 2, 10
REPS = 3
P = 1_000_000
K = 16448 * 128
D = 21
D_PAD = 24
CHUNK = 256


def slope(fn, args_list, label=""):
    import jax
    times = {}
    for n in (N_LO, N_HI):
        out = fn(*args_list[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        best = float("inf")
        for _r in range(REPS):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(*args_list[i % len(args_list)])
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1000
    print(f"{label:48s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    tables = [jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
              for _ in range(2)]
    gids = [jnp.asarray(rng.integers(0, P, K).astype(np.int32))
            for _ in range(2)]
    Kc = K // CHUNK

    @jax.jit
    def incumbent(tab, gid):
        rows = tab[gid]
        rows = jnp.pad(rows, ((0, 0), (0, D_PAD - D)))
        return rows.reshape(Kc, CHUNK, D_PAD).transpose(0, 2, 1)

    @jax.jit
    def fused(tab, gid):
        tab = jnp.pad(tab, ((0, 0), (0, D_PAD - D)))
        idx = gid.reshape(Kc, CHUNK, 1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),              # the D_PAD slice lands at dim 1
            collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(tab, idx, dnums, slice_sizes=(1, D_PAD),
                              mode="clip")                  # [Kc, D_PAD, CHUNK]

    @jax.jit
    def fused_prepad(tab24, gid):
        idx = gid.reshape(Kc, CHUNK, 1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(tab24, idx, dnums, slice_sizes=(1, D_PAD),
                              mode="clip")

    a = incumbent(tables[0], gids[0])
    b = fused(tables[0], gids[0])
    assert a.shape == b.shape == (Kc, D_PAD, CHUNK), (a.shape, b.shape)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "layout mismatch"
    print("parity ok", a.shape)

    slope(incumbent, list(zip(tables, gids)), "gather rows + pad + transpose")
    slope(fused, list(zip(tables, gids)), "ONE transposing gather (pad inside)")
    tabs24 = [jnp.pad(t, ((0, 0), (0, D_PAD - D))) for t in tables]
    slope(fused_prepad, list(zip(tabs24, gids)),
          "ONE transposing gather (table pre-padded)")


def width_sweep():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    gids = [jnp.asarray(rng.integers(0, P, K).astype(np.int32))
            for _ in range(2)]
    Kc = K // CHUNK
    for d in (8, 16, 18, 24, 32):
        tabs = [jnp.asarray(rng.normal(size=(P, d)).astype(np.float32))
                for _ in range(2)]

        @jax.jit
        def fused(tab, gid, d=d):
            idx = gid.reshape(Kc, CHUNK, 1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,))
            return jax.lax.gather(tab, idx, dnums, slice_sizes=(1, d),
                                  mode="clip")

        # one-shot parity check vs plain fancy indexing guards the
        # dimension-numbers against mistakes when widths change (indices
        # are always in range here, so mode="clip" is value-identical)
        want = np.asarray(tabs[0])[np.asarray(gids[0])].reshape(Kc, CHUNK, d)
        np.testing.assert_array_equal(np.asarray(fused(tabs[0], gids[0])),
                                      want)

        slope(fused, list(zip(tabs, gids)), f"transposing gather width {d}")


if __name__ == "__main__":
    if "--widths" in sys.argv:
        width_sweep()
    else:
        main()
