#!/usr/bin/env python
"""Render refined eval point clouds to a fly-through mp4.

Reference: scripts/visualize_lidar_in_video.py — reprojects per-frame
refined .ply clouds to a fixed virtual camera, scatter-plots each frame,
and encodes a video.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from gslidar_tpu.utils.ply import read_ply


def project_points(points, elev_deg=30.0, azim_deg=0.0, dist=40.0,
                   width=1024, height=512, focal=400.0):
    """Simple perspective projection from an orbiting virtual camera."""
    el, az = np.deg2rad(elev_deg), np.deg2rad(azim_deg)
    cam = dist * np.array([np.cos(el) * np.sin(az), -np.sin(el),
                           -np.cos(el) * np.cos(az)])
    fwd = -cam / np.linalg.norm(cam)
    right = np.cross([0, -1, 0], fwd)
    right /= np.linalg.norm(right) + 1e-9
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])
    pc = (points - cam) @ R.T
    z = pc[:, 2]
    keep = z > 0.5
    u = (focal * pc[keep, 0] / z[keep] + width / 2).astype(int)
    v = (focal * pc[keep, 1] / z[keep] + height / 2).astype(int)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return u[ok], v[ok], z[keep][ok]


def frame_image(points, width=1024, height=512):
    import matplotlib
    img = np.zeros((height, width, 3), np.uint8)
    u, v, z = project_points(points, width=width, height=height)
    t = np.clip(1.0 - (z - z.min()) / max(np.ptp(z), 1e-6), 0, 1)
    cmap = matplotlib.colormaps.get_cmap("turbo")
    colors = (cmap(t)[:, :3] * 255).astype(np.uint8)
    img[v, u] = colors
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ply_dir", required=True,
                   help="directory of per-frame .ply clouds (refine output)")
    p.add_argument("--out", default=None)
    p.add_argument("--fps", type=int, default=10)
    a = p.parse_args()
    out_dir = a.out or a.ply_dir

    names = sorted(n for n in os.listdir(a.ply_dir) if n.endswith(".ply"))
    if not names:
        raise SystemExit(f"no .ply files in {a.ply_dir}")
    frames = []
    for name in names:
        cols = read_ply(os.path.join(a.ply_dir, name))
        pts = np.stack([cols["x"], cols["y"], cols["z"]], 1)
        frames.append(frame_image(pts))
        print(f"rendered {name}: {len(pts)} pts")

    try:
        import cv2
        h, w = frames[0].shape[:2]
        path = os.path.join(out_dir, "3d.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), a.fps,
                             (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        print(f"Video saved in {path}")
    except ImportError:
        from PIL import Image
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(out_dir, f"3d_{i:03d}.png"))
        print(f"cv2 unavailable; saved {len(frames)} PNG frames to {out_dir}")


if __name__ == "__main__":
    main()
