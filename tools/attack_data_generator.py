#!/usr/bin/env python
"""Standalone attack data generation smoke entry.

Reference: attack_data_generator.py — runs the external
AdvCollaborativePerception GeneralAttacker once to materialize spoofed
LiDAR data for a given attack id.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attack_id", type=int, default=0)
    p.add_argument("--attacker_type", default="spoof")
    p.add_argument("--dense", type=int, default=0)
    p.add_argument("--sync", type=int, default=0)
    p.add_argument("--frames", type=int, nargs="+", default=[9])
    a = p.parse_args()

    from gslidar_tpu.data.opv2v import get_general_attacker
    ga = get_general_attacker()
    normal_lidar, attack_lidar, general_info, attack_info = ga.attack(
        attacker_type=a.attacker_type, dense=a.dense, sync=a.sync,
        attack_id=a.attack_id, attack_frame_ids=a.frames)
    print("frames:", general_info["frame_ids"])
    print("vehicles:", general_info["vehicle_ids"])


if __name__ == "__main__":
    main()
