"""System utilities: iteration discovery, timing, ply export.

Reference: utils/system_utils.py. The Timing context manager reports
device wall time by blocking on outstanding jax work (the reference uses
paired CUDA events, utils/system_utils.py:19-41).
"""

from __future__ import annotations

import os
import time


def search_for_max_iteration(folder: str):
    """Reference utils/system_utils.py:14-16."""
    saved = [int("".join(c for c in f if c.isdigit()))
             for f in os.listdir(folder)]
    return max(saved) if saved else None


class Timing:
    """with Timing("name"): ... — prints device-synchronized elapsed ms."""

    def __init__(self, name: str = "", enabled: bool = True):
        self.name = name
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            self._sync()
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            self._sync()
            self.elapsed_ms = (time.perf_counter() - self.t0) * 1000
            print(f"[timing] {self.name}: {self.elapsed_ms:.2f} ms")
        return False

    @staticmethod
    def _sync():
        try:
            import jax
            (jax.device_put(0.0) + 0).block_until_ready()
        except Exception:
            pass


def save_ply(points, path) -> None:
    from gslidar_tpu.utils.ply import save_xyz_ply
    import numpy as np
    save_xyz_ply(np.asarray(points), path)
