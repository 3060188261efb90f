"""Smoke tests for the standalone scripts (BASELINE.md workload 1 and the
reference's scripts/visualize_lidar_in_video.py equivalent) — each runs
in a subprocess from a temp cwd, like a user would."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO


def _run(args, cwd, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_compare_2dgs_3dgs_script(tmp_path):
    """The oracle comparison script (reference scripts/compare_2dgs_3dgs.py,
    BASELINE workload 1) renders both splatting variants and writes its
    comparison grids."""
    r = _run([os.path.join(REPO, "scripts", "compare_2dgs_3dgs.py")],
             cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "eval_output" / "compare_2dgs_3dgs"
    assert (out / "case1.png").exists() and (out / "case2.png").exists()


def test_visualize_lidar_in_video_script(tmp_path):
    """The 3D video visualizer (reference scripts/visualize_lidar_in_video
    .py) re-projects per-frame .ply clouds and encodes a video (or PNG
    frames without cv2)."""
    from gslidar_tpu.utils.ply import write_ply

    rng = np.random.default_rng(0)
    ply_dir = tmp_path / "plys"
    ply_dir.mkdir()
    for i in range(3):
        pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        write_ply(str(ply_dir / f"frame_{i:03d}.ply"),
                  {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    r = _run([os.path.join(REPO, "scripts", "visualize_lidar_in_video.py"),
              "--ply_dir", str(ply_dir)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    made = list(ply_dir.glob("3d*"))
    assert made, "no video or frame output written"


def test_spoof_offset_headless(tmp_path):
    """tools/spoof_offset.py --set writes the (300, 2) offsets array the
    OPV2V spoof loader replays (reference spoof_offset.py), without a
    display or the external attack repo."""
    r = _run([os.path.join(REPO, "tools", "spoof_offset.py"),
              "--attack_id", "5", "--set", "1.5", "--", "-2.0"],
             cwd=tmp_path)
    if r.returncode != 0:
        # argparse variants for the negative arg differ; retry plain
        r = _run([os.path.join(REPO, "tools", "spoof_offset.py"),
                  "--attack_id", "5", "--set", "1.5", "-2.0"],
                 cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-1500:]
    arr = np.load(tmp_path / "offsets" / "spoof_offsets.npy")
    assert arr.shape == (300, 2)
    assert np.allclose(arr[5], [1.5, -2.0])


def test_generate_spoof_configs_from_snapshot(tmp_path):
    """Without the external AdvCollaborativePerception repo the config
    generator falls back to the carried configs/attack_infos.json
    snapshot and still emits runnable per-attack yamls."""
    import yaml

    r = _run([os.path.join(REPO, "tools", "generate_spoof_configs.py"),
              "--out", str(tmp_path / "all_configs"), "--n", "5"],
             cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-1500:]
    cfg = yaml.safe_load(
        (tmp_path / "all_configs" / "opv2v_spoof_attack_3.yaml").read_text())
    assert cfg["attack_id"] == 3
    assert isinstance(cfg["attacker_vehicle_id"], int)
    assert cfg["scene_type"] == "OPV2V_SR"


def test_spoof_visualization_bev_frame(tmp_path):
    """plot_bev_for_frame draws a synthetic scene headlessly (Agg) —
    the full CLI needs the external attack repo for vehicle poses, but
    the drawing path must not rot."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spoof_visualization",
        os.path.join(REPO, "tools", "spoof_visualization.py"))
    sv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sv)
    vehicles = {
        1: {"location": [0.0, 0.0, 0.0], "extent": [2.2, 1.0, 0.8],
            "angle": [0.0, 30.0, 0.0]},
        2: {"location": [8.0, 3.0, 0.0], "extent": [2.0, 0.9, 0.8],
            "angle": [0.0, -15.0, 0.0]},
        3: {"location": [-5.0, 6.0, 0.0], "extent": [2.4, 1.1, 0.8],
            "angle": [0.0, 90.0, 0.0]},
    }
    nxt = {k: {**v, "location": [v["location"][0] + 1.0,
                                 v["location"][1] + 0.5, 0.0]}
           for k, v in vehicles.items()}
    sv.plot_bev_for_frame(0, vehicles, [4.0, -2.0, 0.3, 4.5, 2.0],
                          nxt, [5.0, -1.5, 0.3, 4.5, 2.0],
                          attacker_id=1, victim_id=2, participant_ids=[3],
                          attack_id=7, save_dir=str(tmp_path))
    assert (tmp_path / "bev_000.png").stat().st_size > 0
