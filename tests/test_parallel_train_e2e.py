"""Data-parallel CLI training on a virtual 8-device CPU mesh.

VERDICT r1 item 3: train N iterations with densification under the mesh
from the train.py CLI (data_parallel=true), loss finite, eval/checkpoint
written. Uses a scrubbed-env subprocess because the image pins the TPU
backend via sitecustomize (see conftest.run_on_cpu_mesh).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_data_parallel_train_cli(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = tmp_path / "run"
    cmd = [sys.executable, "train.py", "--config",
           "configs/synthetic_smoke.yaml", "--skip_refine", "--show_log",
           f"model_path={out}", "data_parallel=true", "iterations=12",
           "hw=[32,64]", "num_pts=1500", "frames=4", "densify_from_iter=4",
           "densification_interval=6", "densify_until_iter=11",
           "test_iterations=[12]", "checkpoint_iterations=[12]",
           "vis_step=12", "raster_pair_cap=16384",
           "densify_until_num_points=8000", "eval_full360=false"]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                      text=True, timeout=1500)
    tail = r.stderr[-1500:] + r.stdout[-1500:]
    assert r.returncode == 0, tail
    assert "[data_parallel] 8 cameras/iter" in r.stdout, tail
    metrics_path = out / "eval" / "test_12_render" / "metrics.json"
    assert metrics_path.exists(), tail
    m = json.loads(metrics_path.read_text())
    assert "Ray drop" in m
    assert (out / "ckpt" / "chkpnt12.npz").exists()
