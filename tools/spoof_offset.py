#!/usr/bin/env python
"""Interactive BEV tool to set per-attack spoof-vehicle XY offsets.

Reference: spoof_offset.py (matplotlib click tool saving
offsets/spoof_offsets.npy, shape (300, 2)). Two modes:

* interactive (default): click the BEV plot to place the spoof vehicle;
  the offset relative to its default pose is stored and saved.
* --set DX DY: headless, writes the offset directly (for scripted use
  when no display is available).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def load_offsets(path: str) -> np.ndarray:
    try:
        arr = np.load(path)
        if arr.shape != (300, 2):
            raise ValueError(f"offset file shape {arr.shape} != (300, 2)")
        return arr
    except (FileNotFoundError, ValueError):
        return np.zeros((300, 2))


def save_offsets(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, arr)
    print(f"Offsets saved to {path}")


def fetch_attack_bev(attack_id: int):
    """Pull frame-0 vehicle layout + spoof pose from the attack generator."""
    from gslidar_tpu.data.opv2v import get_general_attacker
    ga = get_general_attacker()
    info = ga.get_spoof_attack_info(attack_id)
    return info


def run_interactive(attack_id: int, offset_file: str) -> None:
    import matplotlib.pyplot as plt
    from matplotlib import patches

    offsets = load_offsets(offset_file)
    info = fetch_attack_bev(attack_id)
    spoof_pose = info.get("spoof_world_pose", [0, 0, 0, 4.5, 2.0])

    fig, ax = plt.subplots(figsize=(12, 12))
    state = {"patch": None}

    def draw(dx, dy):
        if state["patch"] is not None:
            state["patch"].remove()
        x, y = spoof_pose[0] + dx, spoof_pose[1] + dy
        L, Wd = spoof_pose[3], spoof_pose[4]
        state["patch"] = ax.add_patch(patches.Rectangle(
            (x - L / 2, y - Wd / 2), L, Wd, angle=np.degrees(spoof_pose[2]),
            facecolor="red", alpha=0.6, label="spoof"))
        fig.canvas.draw_idle()

    for vid, veh in info.get("vehicles", {}).items():
        x, y = veh["location"][0], veh["location"][1]
        L, Wd = veh["extent"][0] * 2, veh["extent"][1] * 2
        ax.add_patch(patches.Rectangle((x - L / 2, y - Wd / 2), L, Wd,
                                       angle=veh["angle"][1],
                                       facecolor="gray", alpha=0.5))
    draw(*offsets[attack_id])
    ax.set_title(f"attack {attack_id}: click to place the spoof vehicle; "
                 f"close to save")
    ax.autoscale_view()

    def onclick(event):
        if event.inaxes != ax:
            return
        offsets[attack_id] = [event.xdata - spoof_pose[0],
                              event.ydata - spoof_pose[1]]
        draw(*offsets[attack_id])
        print(f"attack {attack_id} offset -> {offsets[attack_id]}")

    fig.canvas.mpl_connect("button_press_event", onclick)
    plt.show()
    save_offsets(offset_file, offsets)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attack_id", type=int, required=True)
    p.add_argument("--offset_file", default="offsets/spoof_offsets.npy")
    p.add_argument("--set", nargs=2, type=float, metavar=("DX", "DY"),
                   help="headless: write this offset and exit")
    a = p.parse_args()
    if a.set is not None:
        offsets = load_offsets(a.offset_file)
        offsets[a.attack_id] = a.set
        save_offsets(a.offset_file, offsets)
        return
    run_interactive(a.attack_id, a.offset_file)


if __name__ == "__main__":
    main()
