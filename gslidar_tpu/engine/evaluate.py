"""Evaluation: stitched 360-degree range maps + metric suite.

Reference: gaussian_renderer/__init__.py:158-227 (render_range_map) and
train.py:467-563 (complete_eval).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from gslidar_tpu.engine.render import render
from gslidar_tpu.engine.train import CameraBatch, camera_to_batch
from gslidar_tpu.utils.general import make_image_grid, save_image, visualize_depth
from gslidar_tpu.utils.metrics import (DepthMeter, IntensityMeter, PointsMeter,
                                       RaydropMeter, lpips_json)

EPS = 1e-5


def _check_dropped(pkg, where):
    """Surface pair-cap overflow during eval: a silently clipped render
    would skew the reported metrics (training at least prints an
    overflow note; eval must too)."""
    dropped = int(np.asarray(pkg.num_dropped))
    if dropped > 0:
        print(f"[eval] INSTANCE OVERFLOW in {where}: {dropped} instances "
              f"dropped (num_pairs={int(np.asarray(pkg.num_pairs))}) — "
              "reported metrics are rendered from a clipped instance list; "
              "raise raster_pair_cap (pair-cap) or raster_tile_list_cap "
              "(XLA per-tile cap)")
    return dropped


def make_eval_render(args, cfg, settings, bg):
    import dataclasses
    sf = float(args.scale_factor)
    dynamic = bool(args.dynamic)
    median_depth = bool(args.get("median_depth", False))
    # eval never reads the distortion moments (a training loss term) —
    # skipping them statically cuts ~25% of the compositing kernel
    s_eval = dataclasses.replace(settings, compute_distortion=False)

    @jax.jit
    def eval_render(params, alive, prior, cam: CameraBatch, sh_degree):
        return render(params, alive, cam.viewmat, cam.campos, cam.timestamp,
                      cam.towards_idx, prior, bg, sh_degree, sf, cfg,
                      s_eval, dynamic=dynamic, median_depth=median_depth)
    return eval_render


def make_eval_render360(args, cfg, settings, bg):
    """Single-pass full-360 render (one preprocess+sort for the whole
    stitched panorama) — the two-half split of the reference exists only
    because its CUDA settings force it (gaussian_renderer/__init__.py:
    158-227); a circular (wrap_x) panorama renders identically in one
    pass. Rendered in the FRONT camera frame with a 360-degree hfov
    anchored so pano column w//2 carries EXACTLY the front camera's
    column 0 — the reference stitch layout (breaks 0, w//2, w//2 + w,
    2w) places the halves at integer columns, which for ODD half-width w
    (KITTI's 515) sits half a pixel off the naive (-180, 180) grid."""
    import dataclasses
    sf = float(args.scale_factor)
    dynamic = bool(args.dynamic)
    median_depth = bool(args.get("median_depth", False))
    w = settings.width
    pix_deg = (settings.hfov[1] - settings.hfov[0]) / w
    hmin = settings.hfov[0] - (w // 2) * pix_deg
    # the doubled eval cap must respect binning's 24-bit slot-offset
    # packing (binning.py asserts pair_cap <= 2^24) — auto_pair_cap can
    # legitimately grow the training cap to that ceiling, and 2x past it
    # would assert inside the eval jit; saturate and rely on the
    # _check_dropped overflow warning instead
    s360 = dataclasses.replace(
        settings, width=w * 2, hfov=(hmin, hmin + 2 * w * pix_deg),
        wrap_x=True, pair_cap=min(settings.pair_cap * 2, 1 << 24),
        compute_distortion=False)

    @jax.jit
    def eval_render360(params, alive, prior, cam: CameraBatch, sh_degree):
        return render(params, alive, cam.viewmat, cam.campos, cam.timestamp,
                      cam.towards_idx, prior, bg, sh_degree, sf, cfg,
                      s360, dynamic=dynamic, median_depth=median_depth,
                      full360=True)
    return eval_render360


def _depth3(depth, depth_median, depth_sq, alpha, args, col_groups):
    """depth_mix/mean/median stack with the reference's per-half-image
    var quantile (train.py render_range_map computes np.median over each
    66x515 half separately; col_groups lists each half's columns)."""
    depth_var = depth_sq - depth ** 2
    depth_mix = np.empty_like(depth)
    for cols in col_groups:
        vq = np.median(depth_var[..., cols]) * 10
        sel = depth_var[..., cols] > vq
        depth_mix[..., cols] = np.where(sel, depth_median[..., cols],
                                        depth[..., cols])
    depth3 = np.concatenate([depth_mix, depth, depth_median], axis=0)
    if args.sky_depth:
        sky = 900.0
        depth3 = depth3 / np.clip(alpha, EPS, None)
        if args.depth_blend_mode == 0:
            depth3 = 1 / np.clip(alpha / np.clip(depth3, EPS, None)
                                 + (1 - alpha) / sky, EPS, None)
        else:
            depth3 = alpha * depth3 + (1 - alpha) * sky
    return depth3


def render_range_map(args, cam_front, cam_back, eval_render, params, alive,
                     prior, sh_degree, hw, eval_render360=None):
    """360 range map with the reference break layout (0, w/2, 3w/2, 2w)
    — gaussian_renderer/__init__.py:158-227. With ``eval_render360`` the
    panorama is rendered in ONE wrap_x pass; otherwise front+back halves
    are rendered separately and stitched (reference behaviour)."""
    assert cam_front.towards == "forward" and cam_back.towards == "backward"
    h, w = hw
    breaks = (0, w // 2, 3 * w // 2, w * 2)
    front_cols = np.arange(breaks[1], breaks[2])
    back_cols = np.concatenate([np.arange(breaks[2], breaks[3]),
                                np.arange(breaks[0], breaks[1])])

    gt_depth_pano = np.zeros([1, h, w * 2], np.float32)
    gt_intensity_pano = np.zeros([1, h, w * 2], np.float32)
    for idx, cam in enumerate([cam_front, cam_back]):
        d_gt = np.asarray(cam.pts_depth)
        i_gt = np.asarray(cam.pts_intensity)
        cols = front_cols if idx == 0 else back_cols
        gt_depth_pano[..., cols] = d_gt
        gt_intensity_pano[..., cols] = i_gt

    if eval_render360 is not None:
        pkg = eval_render360(params, alive, prior,
                             camera_to_batch(cam_front), sh_degree)
        _check_dropped(pkg, "360 eval render")
        depth_pano = _depth3(np.asarray(pkg.depth),
                             np.asarray(pkg.depth_median),
                             np.asarray(pkg.depth_square),
                             np.asarray(pkg.alpha), args,
                             [front_cols, back_cols])
        intensity_pano = np.asarray(pkg.intensity_sh)
        raydrop_pano = np.asarray(pkg.raydrop)
        return (depth_pano, intensity_pano, raydrop_pano, gt_depth_pano,
                gt_intensity_pano)

    depth_pano = np.zeros([3, h, w * 2], np.float32)
    intensity_pano = np.zeros([1, h, w * 2], np.float32)
    raydrop_pano = np.zeros([1, h, w * 2], np.float32)
    for idx, cam in enumerate([cam_front, cam_back]):
        pkg = eval_render(params, alive, prior, camera_to_batch(cam),
                          sh_degree)
        _check_dropped(pkg, f"eval render ({cam.towards})")
        depth3 = _depth3(np.asarray(pkg.depth), np.asarray(pkg.depth_median),
                         np.asarray(pkg.depth_square), np.asarray(pkg.alpha),
                         args, [np.arange(w)])
        cols = front_cols if idx == 0 else back_cols
        depth_pano[..., cols] = depth3
        intensity_pano[..., cols] = np.asarray(pkg.intensity_sh)
        raydrop_pano[..., cols] = np.asarray(pkg.raydrop)

    return (depth_pano, intensity_pano, raydrop_pano, gt_depth_pano,
            gt_intensity_pano)


def complete_eval(iteration, args, scene, state, sh_degree, eval_render,
                  is_final=False, save_raydrop_data=False,
                  eval_render360=None):
    """Reference train.py:467-563. Returns {split: metrics dict}."""
    scale = scene.resolution_scales[scene.scale_index]
    if not is_final:
        configs = [("test", scene.get_test_cameras(scale=scale))]
    elif args.scene_type == "KittiMot":
        # reference train.py:473-478: evaluate only the last fifth of the
        # train cameras for KittiMot scenes
        num = len(scene.get_train_cameras()) // 2
        hold = num // 5
        tc = sorted(scene.get_train_cameras(), key=lambda x: x.colmap_id)
        configs = [("test", scene.get_test_cameras(scale=scale)),
                   ("train", tc[:num][-hold:] + tc[num:][-hold:])]
    else:
        configs = [("test", scene.get_test_cameras(scale=scale)),
                   ("train", scene.get_train_cameras())]

    h, w = args.hw
    h, w = h // int(scale), w // int(scale)
    results = {}
    for name, cameras in configs:
        if not cameras:
            continue
        meters = [RaydropMeter(), IntensityMeter(scale=1),
                  DepthMeter(scale=args.scale_factor),
                  PointsMeter(scale=args.scale_factor, vfov=args.vfov),
                  PointsMeter(scale=args.scale_factor, vfov=args.vfov),
                  PointsMeter(scale=args.scale_factor, vfov=args.vfov)]
        outdir = os.path.join(args.model_path, "eval",
                              f"{name}_{iteration}_render")
        os.makedirs(outdir, exist_ok=True)

        for idx in range(len(cameras) // 2):
            cam_front, cam_back = cameras[idx * 2], cameras[idx * 2 + 1]
            (depth_pano, intensity_pano, raydrop_pano, gt_depth_pano,
             gt_intensity_pano) = render_range_map(
                args, cam_front, cam_back, eval_render, state.params,
                state.aux.alive, state.prior, sh_degree, [h, w],
                eval_render360=eval_render360)

            raydrop_mask = np.where(raydrop_pano > 0.5, 1.0, 0.0)
            gt_raydrop = np.where(gt_depth_pano > 0, 0.0, 1.0)

            if save_raydrop_data:
                savedir = os.path.join(args.model_path, "ray_drop_datasets")
                np.save(os.path.join(savedir, f"render_{name}",
                                     f"{cam_front.colmap_id:03d}.npy"),
                        np.concatenate([raydrop_pano, intensity_pano,
                                        depth_pano[[0]]]))
                np.save(os.path.join(savedir, "gt",
                                     f"{cam_front.colmap_id:03d}.npy"),
                        np.concatenate([gt_raydrop, gt_intensity_pano,
                                        gt_depth_pano]))

            depth_pano_m = depth_pano * (1.0 - raydrop_mask)
            intensity_pano_m = intensity_pano * (1.0 - raydrop_mask)

            grid = [visualize_depth(depth_pano_m[[0]], scale_factor=args.scale_factor),
                    np.repeat(np.clip(intensity_pano_m, 0, 1), 3, 0),
                    visualize_depth(depth_pano_m[[1]], scale_factor=args.scale_factor),
                    np.repeat(np.clip(gt_intensity_pano, 0, 1), 3, 0),
                    visualize_depth(depth_pano_m[[2]], scale_factor=args.scale_factor),
                    visualize_depth(raydrop_mask, near=0.01, far=1),
                    visualize_depth(gt_depth_pano, scale_factor=args.scale_factor),
                    visualize_depth(gt_raydrop, near=0.01, far=1)]
            save_image(make_image_grid(grid, nrow=2),
                       os.path.join(outdir, f"{cam_front.colmap_id:03d}.png"))

            meters[0].update(raydrop_pano, gt_raydrop)
            meters[1].update(intensity_pano_m, gt_intensity_pano)
            meters[2].update(depth_pano_m[[0]], gt_depth_pano)
            for i in range(3):
                meters[3 + i].update(depth_pano_m[[i]], gt_depth_pano)

        RMSE, Acc, F1 = meters[0].measure()
        rmse_i, medae_i, lp_i, ssim_i, psnr_i = meters[1].measure()
        rmse_d, medae_d, lp_d, ssim_d, psnr_d = meters[2].measure()
        cd_mix, f_mix = meters[3].measure()
        cd_mean, f_mean = meters[4].measure()
        cd_med, f_med = meters[5].measure()
        metrics = {
            "split": name, "iteration": int(iteration),
            "Ray drop": {"RMSE": RMSE, "Acc": Acc, "F1": F1},
            "Point Cloud mix": {"C-D": cd_mix, "F-score": f_mix},
            "Point Cloud mean": {"C-D": cd_mean, "F-score": f_mean},
            "Point Cloud median": {"C-D": cd_med, "F-score": f_med},
            "Depth": {"RMSE": rmse_d, "MedAE": medae_d, "LPIPS": lpips_json(lp_d),
                      "SSIM": ssim_d, "PSNR": psnr_d},
            "Intensity SH": {"RMSE": rmse_i, "MedAE": medae_i, "LPIPS": lpips_json(lp_i),
                             "SSIM": ssim_i, "PSNR": psnr_i},
        }
        with open(os.path.join(outdir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1, default=float)
        results[name] = metrics
    return results
