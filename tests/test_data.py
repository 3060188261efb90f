"""Data-path tests: preprocess converter + loader round trip on a
fabricated mini KITTI-360 tree, scene container behavior, pose PCA."""

import json
import os

import numpy as np
import pytest

from gslidar_tpu.config import Config
from gslidar_tpu.data.kitti360 import (SEQ_TABLE, read_kitti360_info,
                                       transform_poses_pca)
from gslidar_tpu.data.scene import Scene
from gslidar_tpu.data.synthetic import read_synthetic_info


def make_args(tmp_path, **over):
    args = Config({
        "source_path": str(tmp_path / "data"),
        "model_path": str(tmp_path / "out"),
        "num_pts": 5000, "time_duration": [-0.5, 0.5],
        "debug_cuda": False, "test_only": False, "dynamic": False,
        "eval": True, "cam_num": 2, "vfov": [-24.9, 2.0], "hfov": [-90, 90],
        "hw": [32, 64], "resolution": -1, "resolution_scales": [1],
        "shuffle": True, "lambda_flow_loss": 0.0, "seed": 0, "frames": 4,
    })
    for k, v in over.items():
        args[k] = v
    os.makedirs(args.model_path, exist_ok=True)
    return args


def fabricate_kitti(tmp_path, seq="1908", n_frames=4):
    """Minimal KITTI-360 tree: velodyne bins + transforms json."""
    s_frame = SEQ_TABLE[seq][0]
    root = tmp_path / "data"
    lidar_dir = (root / "KITTI-360" / "data_3d_raw"
                 / "2013_05_28_drive_0000_sync" / "velodyne_points" / "data")
    os.makedirs(lidar_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        pts = np.zeros((3000, 4), np.float32)
        r = rng.uniform(3, 50, 3000)
        az = rng.uniform(-np.pi, np.pi, 3000)
        el = rng.uniform(-0.4, 0.05, 3000)
        pts[:, 0] = r * np.cos(el) * np.cos(az)
        pts[:, 1] = r * np.cos(el) * np.sin(az)
        pts[:, 2] = r * np.sin(el)
        pts[:, 3] = rng.uniform(0, 1, 3000)
        pts.tofile(lidar_dir / ("%010d.bin" % (s_frame + i)))
        l2w = np.eye(4)
        l2w[:3, 3] = [i * 2.0, 0.1 * i, 1.7]
        frames.append({"idx": s_frame + i, "lidar2world": l2w.tolist()})
    os.makedirs(root / seq, exist_ok=True)
    with open(root / seq / f"transforms_{seq}_all.json", "w") as f:
        json.dump({"frames": frames, "w_lidar": 64, "h_lidar": 32}, f)
    return root


def test_kitti360_loader_end_to_end(tmp_path):
    fabricate_kitti(tmp_path)
    args = make_args(tmp_path, scene_type="Kitti360", sequence_id="1908",
                     debug_cuda=True)
    # shrink the 64-frame window via debug flag is not enough: the loader
    # expects every frame's bin; fabricate only 4 and patch the table
    import gslidar_tpu.data.kitti360 as k3
    orig = k3.SEQ_TABLE["1908"]
    k3.SEQ_TABLE["1908"] = (orig[0], orig[0] + 3, [orig[0] + 1])
    try:
        info = read_kitti360_info(args)
    finally:
        k3.SEQ_TABLE["1908"] = orig
    assert args.scale_factor == pytest.approx(0.1)  # static -> fit-to-cube<=1/10
    assert len(info.train_cameras) + len(info.test_cameras) == 8
    # val frame split: exactly one frame (2 cameras) held out
    assert len(info.test_cameras) == 2
    pts, colors, normals, time = info.point_cloud
    assert pts.shape[1] == 3 and len(pts) == 5000
    # cameras carry camera-frame clouds scaled by scale_factor
    c = info.train_cameras[0]
    assert np.linalg.norm(c.pointcloud_camera, axis=1).max() < 10

    scene = Scene(args, info, shuffle=True)
    cam = scene.get_train_cameras()[0]
    assert cam.pts_depth.shape == (1, 32, 64)
    assert (cam.pts_depth > 0).sum() > 50
    # pair-preserving shuffle: consecutive cameras share colmap frame
    cams = scene.get_train_cameras()
    for i in range(0, len(cams), 2):
        assert cams[i].towards == "forward"
        assert cams[i + 1].towards == "backward"


def test_pose_pca_normalization():
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4)[:3], (10, 1, 1))
    poses[:, :3, 3] = np.stack([np.linspace(0, 100, 10),
                                rng.normal(0, 1, 10),
                                np.full(10, 1.7)], 1)
    rec, transform, sf = transform_poses_pca(poses, fix_scale_factor=False)
    assert sf <= 1 / 10 + 1e-9
    assert np.abs(rec[:, :3, 3]).max() <= 1.0 + 1e-5
    # dynamic mode: fixed 1/10
    _, _, sf_dyn = transform_poses_pca(poses, fix_scale_factor=True)
    assert sf_dyn == pytest.approx(0.1)


def test_synthetic_loader(tmp_path):
    args = make_args(tmp_path, scene_type="Synthetic", frames=4,
                     test_only=False)
    info = read_synthetic_info(args)
    assert len(info.train_cameras) + len(info.test_cameras) == 8
    assert info.point_cloud[0].shape[0] == 5000
    assert args.scale_factor > 0
