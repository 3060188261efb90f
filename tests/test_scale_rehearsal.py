"""Realistic-scale KITTI-360 rehearsal on the chip (round-4 verdict #5).

Opt-in (GSLIDAR_SCALE_REHEARSAL=1): trains the REAL CLI on a fabricated
raw KITTI-360 tree at production scale — 64 frames x 120k-point sweeps,
num_pts=1e6 init, 66x515 half-panoramas — for 240 iterations with
densification active, one coarse-to-fine upscale boundary, and the
auto-cap machinery live. Asserts the behaviors that only break at size:
no overflow notes after warmup, no mid-training cap-regrow storm (the
preflight sizes for the finest scale), sane metrics.json, and records
it/s for README. ~15-25 min on one v5e (compile-cache warm).

    GSLIDAR_SCALE_REHEARSAL=1 python -m pytest tests/test_scale_rehearsal.py -q -s
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from tests.test_dress_rehearsal import SEQUENCE_NAME, _env, _sweep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("GSLIDAR_SCALE_REHEARSAL"),
    reason="opt-in: set GSLIDAR_SCALE_REHEARSAL=1 (long chip run)")


def fabricate_kitti_raw_dense(root, s_frame, e_frame, pts_per_sweep=120_000):
    """Production-density raw tree (the toy twin lives in
    tests/test_dress_rehearsal.py; formats identical, only n differs)."""
    rng = np.random.default_rng(0)
    kitti = root / "KITTI-360"
    calib = kitti / "calibration"
    poses_dir = kitti / "data_poses" / SEQUENCE_NAME
    lidar_dir = (kitti / "data_3d_raw" / SEQUENCE_NAME
                 / "velodyne_points" / "data")
    for d in (calib, poses_dir, lidar_dir):
        os.makedirs(d, exist_ok=True)
    cam_to_pose = np.array([[1, 0, 0, 0.8], [0, 0, -1, 0.3],
                            [0, 1, 0, -0.7]], float)
    with open(calib / "calib_cam_to_pose.txt", "w") as f:
        f.write("image_00: " + " ".join(map(str, cam_to_pose.ravel())) + "\n")
        f.write("image_01: " + " ".join(map(str, cam_to_pose.ravel())) + "\n")
    cam_to_velo = np.array([[0, 0, 1, 0.26], [-1, 0, 0, 0.11],
                            [0, -1, 0, -0.83]], float)
    with open(calib / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(map(str, cam_to_velo.ravel())) + "\n")
    with open(poses_dir / "poses.txt", "w") as f:
        for i, fid in enumerate(range(s_frame, e_frame + 1)):
            yaw = 0.004 * i
            c, s = np.cos(yaw), np.sin(yaw)
            m = np.array([[c, -s, 0, 1.5 * i], [s, c, 0, 0.05 * i],
                          [0, 0, 1, 0.0]], float)
            f.write(str(fid) + " " + " ".join(map(str, m.ravel())) + "\n")
    for fid in range(s_frame, e_frame + 1):
        _sweep(rng, pts_per_sweep).tofile(lidar_dir / ("%010d.bin" % fid))
    return kitti


def test_kitti360_scale_rehearsal(tmp_path):
    from gslidar_tpu.data.kitti360 import SEQ_TABLE
    s_frame, e_frame, _val = SEQ_TABLE["1908"]
    root = tmp_path / "data"
    os.makedirs(root, exist_ok=True)
    fabricate_kitti_raw_dense(root, s_frame, e_frame)

    r = subprocess.run(
        [sys.executable, "-m", "gslidar_tpu.data.preprocess.kitti360_to_gs",
         "--seq", "1908", "--kitti_root", str(root / "KITTI-360"),
         "--out", str(root)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "run"
    cmd = [sys.executable, "train.py", "--config",
           "configs/kitti360_nvs_1908.yaml", "--skip_refine",
           f"source_path={root}", f"model_path={out}",
           # production shapes; shortened schedule with every subsystem
           # the verdict names active: densify growth, ONE upscale
           # boundary (iter 120), auto caps, eval
           "iterations=240", "resolution_scales=[2,1]",
           "scale_increase_interval=120",
           "densify_from_iter=20", "densification_interval=100",
           "densify_until_iter=230", "test_iterations=[240]",
           "checkpoint_iterations=[240]", "vis_step=240"]
    r = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=3600)
    log_p = out / "log.txt"
    log = log_p.read_text() if log_p.exists() else ""
    assert r.returncode == 0, r.stderr[-2000:] + log[-3000:]

    steps = [ln for ln in log.splitlines()
             if ln.startswith("[") and "/240] loss=" in ln]
    assert len(steps) >= 20, log[-3000:]
    # at-scale behaviors: the tail of the run must be overflow-free
    assert all("OVERFLOW" not in ln for ln in steps[-5:]), steps[-5:]
    # no re-jit storm: the preflight sizes for the finest scale, so
    # mid-training cap regrows are bounded by densify growth alone
    regrows = [ln for ln in log.splitlines()
               if "->" in ln and ("pair_cap" in ln or "tile_list_cap" in ln)
               and not ln.startswith("[preflight]")]
    assert len(regrows) <= 2, regrows
    cap_grows = [ln for ln in log.splitlines() if "grew capacity" in ln]
    assert len(cap_grows) <= 4, cap_grows

    m = json.loads((out / "eval" / "test_240_render" / "metrics.json")
                   .read_text())
    assert np.isfinite(m["Point Cloud mix"]["C-D"]), m
    assert np.isfinite(m["Depth"]["RMSE"]), m

    its = [float(v) for v in re.findall(r"it/s=([0-9.]+)", steps[-1])]
    n_pts = re.findall(r"pts=(\d+)", steps[-1])
    print(f"\n[scale-rehearsal] final step line: {steps[-1]}")
    print(f"[scale-rehearsal] it/s={its[0] if its else '?'} "
          f"pts={n_pts[0] if n_pts else '?'} regrows={len(regrows)} "
          f"capacity_grows={len(cap_grows)}")
