"""Raw-format dress rehearsals (round-2 verdict item 5).

These tests exercise the REAL dataset pipelines end-to-end on fabricated
raw trees — the exact file formats the reference consumes — because no
real KITTI-360/OPV2V data exists in this image:

* KITTI-360: velodyne ``.bin`` sweeps + ``calibration/*.txt`` +
  ``data_poses/.../poses.txt``  ->  ``kitti360_to_gs`` offline converter
  (reference preprocess/kitti360_to_gs.py:98-111)  ->  ``train.py
  --config configs/kitti360_nvs_1908.yaml`` (reduced iterations) ->
  refine -> metrics.json, all through the real loader
  (reference scene/kitti360_loader.py:104-296).
* OPV2V: per-vehicle ``%06d.bin`` + ``%06d.yaml`` (lidar_pose euler)
  trees  ->  ``opv2v_to_gs``  ->  ``train.py --config
  configs/opv2v_dynamic_2.yaml`` (reduced) with the multi-agent wildcard
  merge (reference scene/opv2v_loader.py:347-535, preprocess/
  opv2v_to_gs.py:37-63).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQUENCE_NAME = "2013_05_28_drive_0000_sync"


def _env():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp"))
    return env


def _sweep(rng, n=2500):
    """Driving-like sweep in the sensor frame (x forward, z up):
    full-azimuth returns within the lidar's vertical fov."""
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.radians(-24.0), np.radians(1.5), n)
    r = rng.uniform(3.0, 50.0, n)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def fabricate_kitti_raw(root, s_frame, e_frame):
    """Raw KITTI-360 tree in the exact layout the converter + loader read."""
    rng = np.random.default_rng(0)
    kitti = root / "KITTI-360"
    calib = kitti / "calibration"
    poses_dir = kitti / "data_poses" / SEQUENCE_NAME
    lidar_dir = (kitti / "data_3d_raw" / SEQUENCE_NAME
                 / "velodyne_points" / "data")
    for d in (calib, poses_dir, lidar_dir):
        os.makedirs(d, exist_ok=True)

    # calibration: cam00->imu ("image_00: <12 vals>") and cam00->velo
    cam_to_pose = np.array([[1, 0, 0, 0.8],
                            [0, 0, -1, 0.3],
                            [0, 1, 0, -0.7]], float)
    with open(calib / "calib_cam_to_pose.txt", "w") as f:
        f.write("image_00: " + " ".join(map(str, cam_to_pose.ravel())) + "\n")
        f.write("image_01: " + " ".join(map(str, cam_to_pose.ravel())) + "\n")
    cam_to_velo = np.array([[0, 0, 1, 0.26],
                            [-1, 0, 0, 0.11],
                            [0, -1, 0, -0.83]], float)
    with open(calib / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(map(str, cam_to_velo.ravel())) + "\n")

    # poses.txt: imu->world per frame; skip a few frame ids to exercise
    # the pose carry-forward (preprocess/kitti360_loader.py:316-322)
    with open(poses_dir / "poses.txt", "w") as f:
        for i, fid in enumerate(range(s_frame, e_frame + 1)):
            if fid % 7 == 3:
                continue
            yaw = 0.004 * i
            c, s = np.cos(yaw), np.sin(yaw)
            m = np.array([[c, -s, 0, 1.5 * i],
                          [s, c, 0, 0.05 * i],
                          [0, 0, 1, 0.0]], float)
            f.write(str(fid) + " " + " ".join(map(str, m.ravel())) + "\n")

    for fid in range(s_frame, e_frame + 1):
        _sweep(rng).tofile(lidar_dir / ("%010d.bin" % fid))
    return kitti


@pytest.mark.slow
def test_kitti360_raw_dress_rehearsal(tmp_path):
    from gslidar_tpu.data.kitti360 import SEQ_TABLE
    s_frame, e_frame, val_frames = SEQ_TABLE["1908"]
    root = tmp_path / "data"
    os.makedirs(root, exist_ok=True)
    fabricate_kitti_raw(root, s_frame, e_frame)

    # offline converter on the raw tree
    r = subprocess.run(
        [sys.executable, "-m", "gslidar_tpu.data.preprocess.kitti360_to_gs",
         "--seq", "1908", "--kitti_root", str(root / "KITTI-360"),
         "--out", str(root)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    tj = json.loads((root / "1908" / "transforms_1908_all.json").read_text())
    assert len(tj["frames"]) == e_frame + 1 - s_frame
    assert tj["w_lidar"] == 1030 and tj["h_lidar"] == 66
    # pose carry-forward: skipped frames reuse the previous frame's pose
    skipped = next(i for i, fid in enumerate(range(s_frame, e_frame + 1))
                   if fid % 7 == 3 and i > 0)
    assert (tj["frames"][skipped]["lidar2world"]
            == tj["frames"][skipped - 1]["lidar2world"])

    # full CLI train at reduced iterations through the REAL kitti loader
    out = tmp_path / "run"
    cmd = [sys.executable, "train.py", "--config",
           "configs/kitti360_nvs_1908.yaml",
           f"source_path={root}", f"model_path={out}",
           "iterations=12", "hw=[32,64]", "num_pts=4000",
           "densify_from_iter=4", "densification_interval=6",
           "densify_until_iter=10", "test_iterations=[12]",
           "checkpoint_iterations=[12]", "vis_step=12", "refine_epochs=4",
           "raster_pair_cap=65536", "raster_tile_list_cap=512",
           "densify_until_num_points=20000"]
    r = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=2400)
    log = out / "log.txt"
    tail = (r.stderr[-1500:] +
            (log.read_text()[-3000:] if log.exists() else ""))
    assert r.returncode == 0, tail
    # the loader derived the scale factor from the PCA normalization
    assert (out / "scale_factor.txt").exists()
    assert (out / "transform_poses_pca.npz").exists()
    m = json.loads((out / "eval" / "test_12_render" / "metrics.json")
                   .read_text())
    assert "Point Cloud mix" in m and "Ray drop" in m
    # refine ran on the cached renders of the real scene
    assert (out / "ckpt" / "refine.npz").exists()
    rm = json.loads((out / "eval" / "test_refine_render" / "metrics.json")
                    .read_text())
    assert "Ray drop" in rm


def fabricate_opv2v(root, scenario, vehicles, frame_ids):
    """Per-vehicle OPV2V tree: %06d.bin sweeps + %06d.yaml lidar poses."""
    rng = np.random.default_rng(1)
    for vi, veh in enumerate(vehicles):
        veh_dir = root / "test" / scenario / veh
        os.makedirs(veh_dir, exist_ok=True)
        for i, fid in enumerate(frame_ids):
            _sweep(rng, 2000).tofile(veh_dir / ("%06d.bin" % fid))
            # yaml written by hand (flat list) — the loader only reads
            # lidar_pose [x y z roll yaw pitch] in degrees
            pose = [10.0 * vi + 1.2 * i, 2.0 * vi, 1.9,
                    0.0, 3.0 * i + 15.0 * vi, 0.0]
            with open(veh_dir / ("%06d.yaml" % fid), "w") as f:
                f.write("lidar_pose: [" + ", ".join(map(str, pose)) + "]\n")
                f.write("true_ego_pos: [" + ", ".join(map(str, pose)) + "]\n")


@pytest.mark.slow
def test_opv2v_yaml_dress_rehearsal(tmp_path):
    root = tmp_path / "data"
    scenario = "2021_08_18_19_48_05"        # configs/opv2v_dynamic_2.yaml
    frame_ids = list(range(68, 101, 2))
    fabricate_opv2v(root, scenario, ["641", "650"], frame_ids)

    r = subprocess.run(
        [sys.executable, "-m", "gslidar_tpu.data.preprocess.opv2v_to_gs",
         "--base", str(root)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    for veh in ("641", "650"):
        tj = json.loads((root / "test_transform" / scenario /
                         f"transforms_{scenario}_{veh}.json").read_text())
        assert len(tj["frames"]) == len(frame_ids)

    # dynamic multi-agent wildcard train through the REAL opv2v loader
    out = tmp_path / "run"
    cmd = [sys.executable, "train.py", "--config",
           "configs/opv2v_dynamic_2.yaml", "--skip_refine",
           f"source_path={root}", f"model_path={out}",
           "iterations=10", "hw=[32,64]", "num_pts=4000",
           "densify_from_iter=4", "densification_interval=6",
           "densify_until_iter=8", "test_iterations=[10]",
           "checkpoint_iterations=[10]", "vis_step=10",
           "raster_pair_cap=65536", "raster_tile_list_cap=512",
           "densify_until_num_points=20000"]
    r = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=2400)
    log = out / "log.txt"
    tail = (r.stderr[-1500:] +
            (log.read_text()[-3000:] if log.exists() else ""))
    assert r.returncode == 0, tail
    m = json.loads((out / "eval" / "test_10_render" / "metrics.json")
                   .read_text())
    assert "Point Cloud mix" in m and "Ray drop" in m
    assert (out / "ckpt" / "chkpnt10.npz").exists()
