#!/usr/bin/env python
"""Generate one training yaml per spoof attack id (0-299).

Reference: generate_spoof_configs.py. Queries the external
AdvCollaborativePerception GeneralAttacker for per-attack metadata
(attacker vehicle, validation frame) and writes
all_configs/opv2v_spoof_attack_{id}.yaml ready for train.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

BASE_CONFIG = {
    "exhaust_test": False,
    "frame_stride": 2,
    "attacker_type": "spoof",
    "dense": 0,
    "sync": 0,
    "advshape": 0,
    "scene_type": "OPV2V_SR",
    "sequence_id": "all",
    "resolution_scales": [1],
    "scale_increase_interval": 5000,
    "cam_num": 2,
    "eval": True,
    "separate_scaling_t": 0.2,
    "vfov": [-25.0, 2.0],
    "hfov": [-90, 90],
    "hw": [66, 515],
    "iterations": 30000,
    "densify_until_iter": 15000,
    "densify_grad_threshold": 1e-4,
    "sh_increase_interval": 2000,
    "lambda_lidar": 1e1,
    "lambda_lidar_median": 1e1,
    "lidar_decay": 0,
    "only_velodyne": True,
    "lambda_intensity": 0.05,
    "lambda_intensity_sh": 0.05,
    "lambda_raydrop": 0.05,
    "lambda_smooth": 1e-3,
    "lambda_chamfer": 1e-1,
    "lambda_distortion": 1e-2,
    "lambda_normal_consistency": 1e-1,
    "thresh_opa_prune": 0.1,
    "test_iterations": [3000, 7000, 15000, 30000],
    "random_init_point": 0,
    "dynamic": True,
    "sky_depth": False,
    "opacity_lr": 0.05,
    "velocity_lr": 0.001,
    "time_split_frac": 1.0,
    "lambda_self_supervision": 0.5,
    "lambda_v_reg": 1.0,
    "t_init": 0.006,
    "num_pts": 3000000,
    "densify_until_num_points": 6000000,
}


def _attack_info_source():
    """Per-attack metadata: the external GeneralAttacker when available
    (live queries, like the reference), else the carried snapshot of its
    300-case table (configs/attack_infos.json)."""
    try:
        from gslidar_tpu.data.opv2v import get_general_attacker
        ga = get_general_attacker()
        return lambda aid: ga.get_spoof_attack_info(aid)
    except Exception as e:                       # noqa: BLE001
        import json
        path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "attack_infos.json")
        table = json.load(open(path))
        print(f"external AdvCollaborativePerception unavailable ({e!r}); "
              f"using configs/attack_infos.json ({len(table)} cases)")
        by_id = {c["case_id"]: c for c in table}
        return lambda aid: by_id[aid]


def main(output_dir: str, n_attacks: int = 300):
    info_for = _attack_info_source()
    os.makedirs(output_dir, exist_ok=True)
    for attack_id in range(n_attacks):
        info = info_for(attack_id)
        config = dict(BASE_CONFIG)
        config["attack_id"] = attack_id
        config["attack_frame_ids"] = list(range(10))
        config["attacker_vehicle_id"] = info["attacker_vehicle_id"]
        config["val_frames"] = [info["frame_ids"][-1]]
        path = os.path.join(output_dir, f"opv2v_spoof_attack_{attack_id}.yaml")
        with open(path, "w") as f:
            yaml.dump(config, f)
    print(f"All spoof attack configs saved to: {output_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="all_configs")
    p.add_argument("--n", type=int, default=300)
    a = p.parse_args()
    main(a.out, a.n)
