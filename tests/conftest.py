"""Test harness.

Note: this image force-registers the TPU backend via a sitecustomize on
PYTHONPATH, so JAX_PLATFORMS=cpu set here is best-effort — on the TPU box
the suite runs on the real chip (which is the target hardware anyway).
Tests that need a virtual multi-device CPU mesh spawn a subprocess with a
scrubbed environment (see run_on_cpu_mesh).
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_on_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 420):
    """Run python code in a subprocess on a virtual n-device CPU mesh."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO          # drop the axon sitecustomize path
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture
def rng():
    return np.random.default_rng(2023)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test")
