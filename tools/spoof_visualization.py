#!/usr/bin/env python
"""Bird's-eye-view plots of spoof-attack scenes.

Reference: spoof_visualization.py. For each frame of an attack scenario,
draws every vehicle (attacker / victim / participant / background /
spoofed) as an oriented rectangle with motion vectors to the next frame,
and saves one PNG per frame.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

ROLE_COLORS = {
    "spoof": "red",
    "attacker": "orange",
    "victim": "blue",
    "participant": "green",
    "background": "gray",
}


def plot_bev_for_frame(frame_num, vehicles_current, spoof_pose_current,
                       vehicles_next, spoof_pose_next,
                       attacker_id, victim_id, participant_ids,
                       attack_id, save_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    fig, ax = plt.subplots(figsize=(12, 12))

    def draw(x, y, length, width, yaw, role, next_xy=None):
        rect = patches.Rectangle((-length / 2, -width / 2), length, width,
                                 facecolor=ROLE_COLORS[role], alpha=0.6,
                                 edgecolor="black")
        tr = (matplotlib.transforms.Affine2D()
              .rotate(yaw).translate(x, y) + ax.transData)
        rect.set_transform(tr)
        ax.add_patch(rect)
        if next_xy is not None:
            ax.annotate("", xy=next_xy, xytext=(x, y),
                        arrowprops=dict(arrowstyle="->", color="black",
                                        alpha=0.5))

    if spoof_pose_current:
        nxt = spoof_pose_next[:2] if spoof_pose_next else None
        draw(spoof_pose_current[0], spoof_pose_current[1],
             spoof_pose_current[3], spoof_pose_current[4],
             spoof_pose_current[2], "spoof", nxt)

    for vid, data in (vehicles_current or {}).items():
        if not isinstance(data, dict) or not all(
                k in data for k in ("location", "extent", "angle")):
            continue
        role = ("attacker" if vid == attacker_id
                else "victim" if victim_id is not None and vid == victim_id
                else "participant" if vid in participant_ids
                else "background")
        nxt = None
        if vehicles_next and vid in vehicles_next:
            nxt = (vehicles_next[vid]["location"][0],
                   vehicles_next[vid]["location"][1])
        draw(data["location"][0], data["location"][1],
             data["extent"][0] * 2, data["extent"][1] * 2,
             np.deg2rad(data["angle"][1]), role, nxt)

    handles = [patches.Patch(color=c, label=r) for r, c in ROLE_COLORS.items()]
    ax.legend(handles=handles)
    ax.set_aspect("equal")
    ax.autoscale_view()
    ax.set_title(f"attack {attack_id} frame {frame_num}")
    os.makedirs(save_dir, exist_ok=True)
    fig.savefig(os.path.join(save_dir, f"bev_{frame_num:03d}.png"), dpi=150)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attack_id", type=int, required=True)
    p.add_argument("--out", default="eval_output/spoof_bev")
    a = p.parse_args()

    from gslidar_tpu.data.opv2v import get_general_attacker
    ga = get_general_attacker()
    info = ga.get_spoof_attack_info(a.attack_id)
    frames = info["frame_ids"]
    save_dir = os.path.join(a.out, f"attack_{a.attack_id}")
    for i, frame in enumerate(frames):
        cur = info.get("frames", {}).get(frame, {})
        nxt = (info.get("frames", {}).get(frames[i + 1], {})
               if i + 1 < len(frames) else {})
        plot_bev_for_frame(
            frame, cur.get("vehicles"), cur.get("spoof_world_pose"),
            nxt.get("vehicles"), nxt.get("spoof_world_pose"),
            info.get("attacker_vehicle_id"), info.get("victim_vehicle_id"),
            info.get("participant_ids", []), a.attack_id, save_dir)
    print(f"Saved BEV plots to {save_dir}")


if __name__ == "__main__":
    main()
