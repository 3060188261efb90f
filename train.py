#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference GS-LiDAR.

Usage (reference README.md:80-116):
    python train.py --config configs/kitti360_nvs_1908.yaml [key=value ...]
                    [--test_only] [--median_depth] [--debug_cuda]

Reference: train.py (entry + training()). The per-iteration hot path is one
jitted TPU program; host code handles camera selection, densify/eval
cadence, coarse-to-fine rescale and checkpoints.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from collections import deque

import numpy as np

# Persistent XLA compile cache: verified to round-trip TPU executables on
# this relay (scripts/probe_compile_cache.py). Recompiles of the jitted
# train/eval steps — and the wide payload-carrying binning sort — are paid
# once per (shape, config) per machine.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

from gslidar_tpu.config import Config, load_run_config


def build_scene(args):
    from gslidar_tpu.data.scene import Scene
    from gslidar_tpu.data.kitti360 import read_kitti360_info
    from gslidar_tpu.data.synthetic import read_synthetic_info

    callbacks = {
        "Kitti360": read_kitti360_info,
        "Synthetic": read_synthetic_info,
    }
    try:
        from gslidar_tpu.data.opv2v import (read_opv2v_info,
                                            read_opv2v_info_spoof_remove)
        callbacks["OPV2V"] = read_opv2v_info
        callbacks["OPV2V_SR"] = read_opv2v_info_spoof_remove
    except ImportError:
        pass
    info = callbacks[args.scene_type](args)
    return Scene(args, info, shuffle=args.shuffle)


def make_settings(args, h, w, pair_cap=None, tile_list_cap=None):
    import jax
    from gslidar_tpu.raster.settings import RasterSettings
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    backend = args.get("raster_backend", "pallas" if on_tpu else "xla")
    if backend == "pallas":
        tile_h, tile_w = 8, 64      # VPU-shaped tiles; 8x128 OOMs the bwd
    else:
        tile_h, tile_w = 16, 16     # CUDA-parity tiles (config.h:13-14)
    if pair_cap is None:
        pair_cap = int(args.get("raster_pair_cap", 1 << 19))
    if tile_list_cap is None:
        tile_list_cap = int(args.get("raster_tile_list_cap", 4096))
    return RasterSettings(
        height=h, width=w, vfov=tuple(args.vfov), hfov=tuple(args.hfov),
        num_extra_features=4,
        tile_h=int(args.get("raster_tile_h", tile_h)),
        tile_w=int(args.get("raster_tile_w", tile_w)),
        backend=backend,
        pair_cap=pair_cap,
        tile_chunk=int(args.get("raster_tile_chunk", 64)),
        tile_list_cap=tile_list_cap,
        tight_rects=bool(args.get("raster_tight_rects", True)),
        payload_bf16=bool(args.get("raster_payload_bf16", False))
        if backend == "pallas" else False)


def gaussian_config(args, no_time_split=None):
    from gslidar_tpu.models.gaussians import GaussianConfig
    return GaussianConfig(
        sh_degree=args.sh_degree, cycle=args.cycle,
        velocity_decay=args.velocity_decay,
        time_duration=tuple(args.time_duration), t_init=args.t_init,
        no_time_split=(args.no_time_split if no_time_split is None
                       else no_time_split),
        t_grad=args.t_grad, contract=args.contract,
        big_point_threshold=args.big_point_threshold,
        random_init_point=args.random_init_point,
        percent_dense=args.percent_dense)


def training(args):
    import jax
    import jax.numpy as jnp
    from gslidar_tpu.engine.evaluate import (complete_eval, make_eval_render, make_eval_render360)
    from gslidar_tpu.engine.checkpoint import (checkpoint_path,
                                               latest_checkpoint,
                                               load_checkpoint,
                                               save_checkpoint)
    from gslidar_tpu.engine.train import (camera_to_batch, init_train_state,
                                          auto_pair_cap,
                                          make_densify_fn, make_train_step,
                                          reset_opacity_state)
    from gslidar_tpu.models.gaussians import (create_from_pcd, grow_capacity,
                                              round_capacity)
    from gslidar_tpu.models.raydrop_prior import (init_raydrop_prior,
                                                  raydrop_prior_upscale)
    from gslidar_tpu.utils.general import (make_image_grid, save_image,
                                           visualize_depth)

    vis_path = os.path.join(args.model_path, "visualization")
    os.makedirs(vis_path, exist_ok=True)

    from tensorboardX import SummaryWriter
    tb_writer = SummaryWriter(os.path.join(args.model_path, "tb"))

    scene = build_scene(args)
    with open(os.path.join(args.model_path, "scale_factor.txt"), "w") as f:
        f.write(str(args.scale_factor))

    cfg = gaussian_config(args)
    pts, colors, normals, times = scene.scene_info.point_cloud
    params, aux = create_from_pcd(pts, colors, times, cfg, seed=args.seed)

    start_w, start_h = scene.get_wh()
    prior = init_raydrop_prior(start_h, start_w)
    state = init_train_state(params, aux, prior)

    bg_color = [1, 1, 1, 1] if args.white_background else [0, 0, 0, 1]
    bg = jnp.asarray(bg_color, jnp.float32)

    first_iter = 0
    if args.start_checkpoint:
        state, first_iter = load_checkpoint(args.start_checkpoint, state)
        for _ in range(first_iter // args.scale_increase_interval):
            scene.up_scale()

    # camera-data-parallel training over the device mesh (TPU-native
    # extension; the reference is single-GPU — parallel/shard.py)
    data_parallel = bool(args.get("data_parallel", False))
    n_par = int(args.get("data_parallel_cameras", 0)) or len(jax.devices())
    if data_parallel and n_par > 1:
        from gslidar_tpu.parallel.shard import (make_mesh,
                                                make_parallel_train_step,
                                                stack_camera_batch)
        mesh = make_mesh(n_par)
        print(f"[data_parallel] {n_par} cameras/iter over mesh "
              f"{[d.platform for d in jax.devices()[:n_par]]}", flush=True)
    else:
        data_parallel = False

    # live instance-list cap: auto-sized from the measured per-step
    # (gaussian, tile) pair count (reference: CUDA sizes these buffers
    # exactly per frame, rasterize_points.cu:25-33). The XLA backend's
    # per-tile list cap is auto-grown the same way (the pallas backend is
    # cap-free; the CUDA kernel has no per-tile cap either).
    pair_cap_auto = bool(args.get("raster_pair_cap_auto", True))
    tile_list_cap_auto = bool(args.get("raster_tile_list_cap_auto", True))
    pair_cap_now = int(args.get("raster_pair_cap", 1 << 19))
    tile_list_cap_now = int(args.get("raster_tile_list_cap", 4096))
    pairs_window = deque(maxlen=30)

    # startup preflight: size the caps from the measured per-camera
    # demand BEFORE the first train-step compile (the CUDA rasterizer
    # sizes these buffers exactly per frame, rasterize_points.cu:25-33;
    # here exact sizing at startup + the in-loop growth for
    # densification). An undersized config then costs one cheap probe
    # compile instead of a train-step re-jit storm.
    if pair_cap_auto or tile_list_cap_auto:
        from gslidar_tpu.engine.train import make_demand_probe
        # probe at the FINEST resolution (resolution_scales[0]): instance
        # demand grows with pixel area, so sizing for the final scale
        # means the coarse-to-fine upscale boundaries never trigger a
        # mid-training regrow (the shrink hysteresis tolerates the
        # temporary coarse-phase headroom)
        finest = scene.resolution_scales[0]
        w0, h0 = scene.wh[finest]
        cams = scene.train_cameras[finest]
        sample = cams[::max(1, len(cams) // 64)][:64]
        batches = [camera_to_batch(c) for c in sample]
        if pair_cap_auto:
            probe = make_demand_probe(
                args, cfg, make_settings(args, h0, w0, pair_cap=pair_cap_now,
                                         tile_list_cap=tile_list_cap_now),
                with_tiles=False)
            demand = max(int(probe(state.params, state.aux.alive, b)[0])
                         for b in batches)
            new_cap = auto_pair_cap(pair_cap_now, demand, None)
            if new_cap is not None and new_cap > pair_cap_now:
                print(f"[preflight] pair_cap {pair_cap_now} -> {new_cap} "
                      f"(live pairs {demand})", flush=True)
                pair_cap_now = new_cap
        settings0 = make_settings(args, h0, w0, pair_cap=pair_cap_now,
                                  tile_list_cap=tile_list_cap_now)
        if tile_list_cap_auto and settings0.backend == "xla":
            probe2 = make_demand_probe(args, cfg, settings0, with_tiles=True)
            tile_need = max(int(probe2(state.params, state.aux.alive, b)[1])
                            for b in batches)
            if tile_need > tile_list_cap_now:
                new_list = 1 << (int(tile_need * 1.25) - 1).bit_length()
                print(f"[preflight] tile_list_cap {tile_list_cap_now} -> "
                      f"{new_list} (worst tile {tile_need})", flush=True)
                tile_list_cap_now = new_list

    def build_fns(no_time_split):
        w, h = scene.get_wh()
        settings = make_settings(args, h, w, pair_cap=pair_cap_now,
                                 tile_list_cap=tile_list_cap_now)
        cfg_now = gaussian_config(args, no_time_split=no_time_split)
        if data_parallel:
            step = make_parallel_train_step(args, cfg_now, settings, bg,
                                            mesh, n_cameras=n_par)
        else:
            step = make_train_step(args, cfg_now, settings, bg)
        densify = make_densify_fn(args, cfg_now)
        ev = make_eval_render(args, cfg_now, settings, bg)
        ev360 = (make_eval_render360(args, cfg_now, settings, bg)
                 if bool(args.get("eval_full360", True)) else None)
        # half-resolution twin for the live viewer while the camera moves
        # (nerfview's moving-resolution degradation, _renderer.py); jit
        # compiles lazily, so this costs nothing unless the viewer asks
        prev = make_eval_render(
            args, cfg_now,
            make_settings(args, max(h // 2, 8), max(w // 2, 8),
                          pair_cap=pair_cap_now,
                          tile_list_cap=tile_list_cap_now), bg)
        return step, densify, ev, ev360, prev, cfg_now

    no_time_split = bool(args.no_time_split)
    (train_step, densify_fn, eval_render, eval_render360,
     eval_render_prev, cfg_now) = build_fns(no_time_split)

    if args.test_only or first_iter == args.iterations:
        sh_deg = min(first_iter // args.sh_increase_interval, args.sh_degree)
        complete_eval(first_iter, args, scene, state, sh_deg, eval_render,
                      is_final=True, save_raydrop_data=True,
                      eval_render360=eval_render360)
        return state, scene

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    viewpoint_stack = []
    ema = {}
    t_start = time.time()

    # live viewer (reference train.py:90-148 wires a viser server; here an
    # http orbit viewer shares the chip via the checkin/checkout lock)
    from gslidar_tpu.engine.viewer import VisManager
    from gslidar_tpu.utils.general import visualize_depth as _vd

    def _viewer_render(c2w, frame, preview=False):
        from gslidar_tpu.engine.train import CameraBatch
        w2c = np.linalg.inv(c2w).astype(np.float32)
        ts = -0.5 + frame / max(args.frames - 1, 1)
        cam_v = CameraBatch(
            viewmat=jnp.asarray(w2c), campos=jnp.asarray(c2w[:3, 3], jnp.float32),
            timestamp=jnp.asarray(ts, jnp.float32),
            towards_idx=jnp.asarray(0, jnp.int32),
            pts_depth=jnp.zeros((1, 1, 1)), pts_intensity=jnp.zeros((1, 1, 1)))
        # while the camera moves the viewer asks for the half-resolution
        # render (nerfview's moving degradation); full res once it settles
        rfn = eval_render_prev if preview else eval_render
        pkg = rfn(state.params, state.aux.alive, state.prior, cam_v,
                  jnp.asarray(args.sh_degree, jnp.int32))
        return _vd(np.asarray(pkg.depth), scale_factor=args.scale_factor)

    vis_mgr = VisManager({"port": int(args.get("viewer_port", 8080)),
                          "enabled": bool(args.get("viewer", False)),
                          "max_frame": args.frames,
                          "pixels_per_step": start_h * start_w},
                         _viewer_render)

    profile_at = int(args.get("profile_iter", 0))   # 0 = disabled

    for iteration in range(first_iter + 1, args.iterations + 1):
        vis_mgr.checkin()
        if profile_at and iteration == profile_at:
            jax.profiler.start_trace(os.path.join(args.model_path, "profile"))
        if profile_at and iteration == profile_at + 5:
            jax.profiler.stop_trace()
            print(f"[profiler] trace written to {args.model_path}/profile")
        sh_degree = min(iteration // args.sh_increase_interval, args.sh_degree)

        def pick_camera():
            nonlocal viewpoint_stack
            if not viewpoint_stack:
                viewpoint_stack = list(range(len(scene.get_train_cameras())))
            idx = viewpoint_stack.pop(rng.integers(len(viewpoint_stack)))
            c = scene.get_train_cameras()[idx]
            if rng.random() < args.lambda_self_supervision:
                tsh = 3 * (rng.random() - 0.5) * scene.time_interval
            else:
                tsh = 0.0
            return c, tsh

        cam, time_shift = pick_camera()
        if data_parallel:
            picks = [(cam, time_shift)] + [pick_camera()
                                           for _ in range(n_par - 1)]

        in_window = (args.densify_from_iter < iteration < args.densify_until_iter
                     and (args.densify_until_num_points < 0
                          or int(np.asarray(jnp.sum(state.aux.alive)))
                          < args.densify_until_num_points))
        is_densify = (in_window
                      and iteration % args.densification_interval == 0)

        if data_parallel:
            cams_b = stack_camera_batch([camera_to_batch(c)
                                         for c, _ in picks])
            tsh_b = jnp.asarray([t for _, t in picks], jnp.float32)
            # positional: pjit rejects kwargs when in_shardings is set
            state, loss, log = train_step(
                state, cams_b, jnp.asarray(iteration, jnp.float32),
                jnp.asarray(sh_degree, jnp.int32), tsh_b,
                jnp.asarray(in_window), not is_densify)
        else:
            state, loss, log = train_step(
                state, camera_to_batch(cam),
                jnp.asarray(iteration, jnp.float32),
                jnp.asarray(sh_degree, jnp.int32),
                jnp.asarray(time_shift, jnp.float32),
                jnp.asarray(in_window), apply_update=not is_densify)

        # flip time-split mode (reference train.py:356-357)
        if no_time_split and iteration > args.densify_until_iter * args.time_split_frac:
            no_time_split = False
            (train_step, densify_fn, eval_render, eval_render360,
             eval_render_prev, cfg_now) = build_fns(no_time_split)

        if is_densify:
            size_on = (iteration > args.opacity_reset_interval
                       and args.prune_big_point > 0)
            size_threshold = (args.size_threshold
                              // scene.resolution_scales[0]) if size_on else 0
            key, sub = jax.random.split(key)
            out = densify_fn(state.params, state.aux, state.opt, sub,
                             jnp.asarray(scene.cameras_extent, jnp.float32),
                             size_threshold, size_threshold_on=size_on)
            state = state._replace(params=out.params, aux=out.aux,
                                   opt=out.opt_state)
            n_alive = int(out.n_alive)
            cap = state.aux.alive.shape[0]
            if out.n_new_placed < out.n_new_requested or n_alive > 0.9 * cap:
                new_cap = round_capacity(int(cap * 2))
                if (args.densify_until_num_points < 0
                        or cap < args.densify_until_num_points * 1.3):
                    p, a, o = grow_capacity(state.params, state.aux,
                                            state.opt, new_cap)
                    state = state._replace(params=p, aux=a, opt=o)
                    print(f"[{iteration}] grew capacity {cap} -> {new_cap}")

        if (in_window and (iteration % args.opacity_reset_interval == 0
                           or (args.white_background
                               and iteration == args.densify_from_iter))):
            state = reset_opacity_state(state, cfg_now)

        if iteration % 10 == 0 or iteration == 1:
            for k in ("loss",):
                ema[k] = 0.4 * float(log[k]) + 0.6 * ema.get(k, 0.0)
            n_alive = int(np.asarray(jnp.sum(state.aux.alive)))
            rate = iteration / max(time.time() - t_start, 1e-9)
            dropped = int(np.asarray(log.get("num_dropped", 0)))
            pairs_now = int(np.asarray(log.get("num_pairs", 0)))
            tile_need = int(np.asarray(log.get("tile_need", 0)))
            # num_dropped folds two causes: the global instance cap
            # (num_pairs > pair_cap) and, on the XLA backend only, the
            # per-tile list cap. Each cause is detected from its OWN
            # exact signal — in DP runs num_dropped/num_pairs are maxima
            # over different cameras, so subtracting them could compute
            # zero list drops while some camera silently clips tiles.
            # The scan composites whole tile_chunk blocks, so the
            # effective per-tile cap is the chunk-rounded one.
            pair_drops = max(pairs_now - pair_cap_now, 0)
            chunk = int(args.get("raster_tile_chunk", 64))
            eff_list_cap = -(-tile_list_cap_now // chunk) * chunk
            list_over = tile_need > eff_list_cap
            drop_note = ""
            if pair_drops > 0:
                drop_note += (f" PAIR-CAP OVERFLOW: {pair_drops} instances "
                              f"dropped (raise raster_pair_cap)")
            if list_over:
                drop_note += (f" TILE-LIST OVERFLOW: worst tile holds "
                              f"{tile_need} > cap {eff_list_cap} "
                              f"({max(dropped - pair_drops, 0)} instances "
                              f"dropped; raise raster_tile_list_cap)")
            rebuild = False
            if pair_cap_auto and "num_pairs" in log:
                pairs_window.append(pairs_now)
                hi = (max(pairs_window)
                      if len(pairs_window) == pairs_window.maxlen else None)
                new_cap = auto_pair_cap(pair_cap_now, pairs_now, hi)
                if new_cap is not None:
                    print(f"[{iteration}] pair_cap {pair_cap_now} -> "
                          f"{new_cap} (live pairs {pairs_now})", flush=True)
                    pair_cap_now = new_cap
                    pairs_window.clear()
                    rebuild = True
            # independent of the pair-cap flag: pinning raster_pair_cap
            # must not silently disable the XLA per-tile list fix
            if tile_list_cap_auto and list_over:
                # size from the measured worst tile (exact on this step's
                # pair-cap-clipped stream; summed drops would overshoot
                # by up to the number of overflowing tiles). If the pair
                # cap ALSO grew this step, the unclipped demand may still
                # exceed this — the next logged window then fires another
                # growth step; convergence is monotone, not one-shot.
                need = max(tile_need, tile_list_cap_now + 1)
                new_list_cap = 1 << (need - 1).bit_length()
                print(f"[{iteration}] tile_list_cap {tile_list_cap_now} "
                      f"-> {new_list_cap} (worst tile {need})", flush=True)
                tile_list_cap_now = new_list_cap
                rebuild = True
            if rebuild:
                (train_step, densify_fn, eval_render, eval_render360,
                 eval_render_prev, cfg_now) = build_fns(no_time_split)
            print(f"[{iteration}/{args.iterations}] loss={ema['loss']:.5f} "
                  f"pts={n_alive} it/s={rate:.2f}{drop_note}", flush=True)
            # tensorboard (reference train.py:328-335)
            for k, v in log.items():
                tb_writer.add_scalar(f"TrainLoss/{k}", float(v), iteration)
            tb_writer.add_scalar("total_points", n_alive, iteration)
            if "loss_lidar" in log:
                tb_writer.add_scalars(
                    "TrainLoss", {f"frame_{cam.name}": float(log['loss_lidar'])},
                    iteration)

        if iteration in args.test_iterations:
            complete_eval(iteration, args, scene, state, sh_degree,
                          eval_render,
                          is_final=(iteration == args.iterations),
                          save_raydrop_data=(iteration == args.iterations),
                          eval_render360=eval_render360)

        if iteration % args.vis_step == 0 or iteration == 1:
            pkg = eval_render(state.params, state.aux.alive, state.prior,
                              camera_to_batch(cam),
                              jnp.asarray(sh_degree, jnp.int32))
            imgs = [visualize_depth(np.asarray(pkg.depth),
                                    scale_factor=args.scale_factor)]
            if cam.pts_depth is not None:
                imgs.append(visualize_depth(cam.pts_depth,
                                            scale_factor=args.scale_factor))
            save_image(make_image_grid(imgs, nrow=2),
                       os.path.join(vis_path,
                                    f"{iteration:05d}_{cam.colmap_id:03d}.png"))

        if iteration % args.scale_increase_interval == 0:
            scene.up_scale()
            next_w, next_h = scene.get_wh()
            state = state._replace(
                prior=raydrop_prior_upscale(state.prior, next_h, next_w))
            from gslidar_tpu.models.raydrop_prior import PriorAdam
            state = state._replace(prior_opt=PriorAdam.init(state.prior))
            (train_step, densify_fn, eval_render, eval_render360,
             eval_render_prev, cfg_now) = build_fns(no_time_split)

        if iteration in args.checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint", flush=True)
            save_checkpoint(checkpoint_path(args.model_path, iteration),
                            state, iteration)

        vis_mgr.checkout(iteration)

    tb_writer.close()
    return state, scene


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Training script parameters")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--base_config", type=str, default="configs/base.yaml")
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--debug_cuda", action="store_true")
    parser.add_argument("--test_only", action="store_true")
    parser.add_argument("--median_depth", action="store_true")
    parser.add_argument("--show_log", action="store_true")
    parser.add_argument("--skip_refine", action="store_true")
    args_read, _ = parser.parse_known_args()

    args = load_run_config(args_read.base_config, args_read.config)
    Config.update(args, "start_checkpoint", args_read.start_checkpoint)
    Config.update(args, "debug_cuda", args_read.debug_cuda)
    Config.update(args, "test_only", args_read.test_only)
    Config.update(args, "median_depth", args_read.median_depth)

    if (os.path.exists(args.model_path) and not args.test_only
            and args.start_checkpoint is None):
        shutil.rmtree(args.model_path)
    os.makedirs(args.model_path, exist_ok=True)

    # stdout/stderr -> {model_path}/log.txt unless --show_log
    # (reference train.py:806-809)
    if not args_read.show_log:
        _log_f = open(os.path.join(args.model_path, "log.txt"), "w",
                      buffering=1)
        sys.stdout = _log_f
        sys.stderr = _log_f

    if not args.dynamic:
        args.t_grad = False

    args.save_iterations = list(args.save_iterations) + [args.iterations]
    args.checkpoint_iterations = (list(args.checkpoint_iterations)
                                  + [args.iterations])
    args.test_iterations = list(args.test_iterations) + [args.iterations]

    if args.test_only:
        args.shuffle = False
        from gslidar_tpu.engine.checkpoint import latest_checkpoint
        resolution_idx = len(args.resolution_scales) - 1
        for iteration in args.checkpoint_iterations:
            path = os.path.join(args.model_path, "ckpt", f"chkpnt{iteration}.npz")
            if os.path.exists(path):
                args.start_checkpoint = path
                resolution_idx = len(args.resolution_scales) - 1
                for _ in range(iteration // args.scale_increase_interval):
                    resolution_idx = max(0, resolution_idx - 1)
        args.resolution_scales = [args.resolution_scales[resolution_idx]]
        with open(os.path.join(args.model_path, "scale_factor.txt")) as f:
            args.scale_factor = float(f.read())

    if args.debug_cuda:
        args.resolution_scales = [args.resolution_scales[-1]]

    if args.exhaust_test:
        args.test_iterations += [i for i in range(0, args.iterations,
                                                  args.test_interval)]

    print(args.to_dict())
    print("Optimizing " + args.model_path)
    with open(os.path.join(args.model_path, "setting.txt"), "w") as f:
        f.write("------------------ start ------------------\n")
        for k, v in args.items():
            f.write(f"{k} : {v}\n")
        f.write("------------------- end -------------------")

    rd = os.path.join(args.model_path, "ray_drop_datasets")
    if os.path.exists(rd) and not args.test_only:
        shutil.rmtree(rd)
    for sub in ("gt", "render_train", "render_test"):
        os.makedirs(os.path.join(rd, sub), exist_ok=True)
    os.makedirs(os.path.join(args.model_path, "ckpt"), exist_ok=True)

    from gslidar_tpu.utils.general import seed_everything
    seed_everything(args.seed)

    training(args)

    print("\nTraining complete.")

    if not args_read.skip_refine:
        from gslidar_tpu.engine.refine import refine, refine_test
        if not args.test_only:
            refine(args)
        refine_test(args)
        print("\nRefine complete.")
