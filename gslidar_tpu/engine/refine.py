"""Ray-drop refinement: U-Net post-training on cached renders.

Reference: train.py:566-734 (refine / refine_test). The UNet trains
full-batch for 1000 epochs with Adam lr 1e-3 + one-cycle schedule + BCE and
random box masking; refine_test applies it to train/test renders, masks
depth/intensity and reports metrics.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _onecycle_lr(step, total, max_lr=1e-3, pct_start=0.3, div=25.0,
                 final_div=1e4):
    """torch OneCycleLR (cos annealing) equivalent; traceable (step may be
    a jax scalar inside optax's schedule)."""
    import jax.numpy as jnp
    step = jnp.asarray(step, jnp.float32)
    init_lr = max_lr / div
    min_lr = init_lr / final_div
    up = max(int(pct_start * total), 1)
    t_up = jnp.clip(step / up, 0.0, 1.0)
    lr_up = init_lr + (max_lr - init_lr) * 0.5 * (1 - jnp.cos(jnp.pi * t_up))
    t_dn = jnp.clip((step - up) / max(total - up, 1), 0.0, 1.0)
    lr_dn = min_lr + (max_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t_dn))
    return jnp.where(step < up, lr_up, lr_dn)


def refine(args):
    import jax
    import jax.numpy as jnp
    import optax
    from gslidar_tpu.models.unet import UNet
    from gslidar_tpu.utils.general import (make_image_grid, save_image,
                                           visualize_depth)

    refine_dir = os.path.join(args.model_path, "refine")
    os.makedirs(refine_dir, exist_ok=True)
    gt_dir = os.path.join(args.model_path, "ray_drop_datasets", "gt")
    train_dir = os.path.join(args.model_path, "ray_drop_datasets",
                             "render_train")

    inputs, gts = [], []
    for name in sorted(os.listdir(train_dir)):
        inputs.append(np.load(os.path.join(train_dir, name))[None])
        gts.append(np.load(os.path.join(gt_dir, name))[[0]][None])
    x = jnp.asarray(np.concatenate(inputs, 0), jnp.float32)   # [B, 3, H, 2W]
    y = jnp.asarray(np.concatenate(gts, 0), jnp.float32)      # [B, 1, H, 2W]

    model = UNet()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x[:1], train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    epochs = int(args.get("refine_epochs", 1000))
    tx = optax.adam(learning_rate=lambda i: _onecycle_lr(i, epochs))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb, mask, key):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb * mask,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            eps = 1e-7
            o = jnp.clip(out, eps, 1 - eps)
            bce = -jnp.mean(yb * jnp.log(o) + (1 - yb) * jnp.log(1 - o))
            return bce, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, new_bs, opt_state, loss

    rng_np = np.random.default_rng(0)
    key = rng
    print("Start UNet Optimization ...", flush=True)
    for i in range(epochs):
        # random box masking (reference train.py:614-624)
        mask = np.ones(x.shape, np.float32)
        by = max(int(0.1 * x.shape[2]), 2)
        bx = max(int(0.1 * x.shape[3]), 2)
        for _ in range(rng_np.integers(32)):
            sy = rng_np.integers(1, by)
            sx = rng_np.integers(1, bx)
            yi = rng_np.integers(x.shape[2] - sy)
            xi = rng_np.integers(x.shape[3] - sx)
            mask[:, :, yi:yi + sy, xi:xi + sx] = 0.0
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y, jnp.asarray(mask), sub)
        if i % 50 == 0:
            print(f"refine iter {i} loss {float(loss):.5f}", flush=True)

    ckpt = os.path.join(args.model_path, "ckpt", "refine.npz")
    leaves, _ = __import__("jax").tree.flatten((params, batch_stats))
    np.savez_compressed(ckpt, **{f"leaf_{i}": np.asarray(l)
                                 for i, l in enumerate(leaves)})
    return params, batch_stats


def _load_unet(args):
    import jax
    import jax.numpy as jnp
    from gslidar_tpu.models.unet import UNet
    model = UNet()
    gt_dir = os.path.join(args.model_path, "ray_drop_datasets", "gt")
    sample = np.load(os.path.join(gt_dir, sorted(os.listdir(gt_dir))[0]))
    dummy = jnp.zeros((1, 3) + sample.shape[-2:], jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, dummy, train=True)
    template = (variables["params"], variables["batch_stats"])
    data = np.load(os.path.join(args.model_path, "ckpt", "refine.npz"))
    leaves, treedef = jax.tree.flatten(template)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    params, batch_stats = jax.tree.unflatten(treedef, leaves)
    return model, params, batch_stats


def refine_test(args):
    import jax
    import jax.numpy as jnp
    from gslidar_tpu.utils.general import (make_image_grid, save_image,
                                           visualize_depth)
    from gslidar_tpu.utils.metrics import (DepthMeter, IntensityMeter,
                                           PointsMeter, RaydropMeter,
                                           lpips_json)
    from gslidar_tpu.ops.pano import pano_to_lidar_np
    from gslidar_tpu.utils.ply import save_xyz_ply

    model, params, batch_stats = _load_unet(args)

    @jax.jit
    def apply(xb):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xb, train=False)

    all_metrics = {}
    for mode in ["train", "test"]:
        outdir = os.path.join(args.model_path, "eval", f"{mode}_refine_render")
        os.makedirs(outdir, exist_ok=True)
        test_dir = os.path.join(args.model_path, "ray_drop_datasets",
                                f"render_{mode}")
        gt_dir = os.path.join(args.model_path, "ray_drop_datasets", "gt")

        names = sorted(os.listdir(test_dir))
        xs = np.stack([np.load(os.path.join(test_dir, n)) for n in names])
        gts = np.stack([np.load(os.path.join(gt_dir, n)) for n in names])

        meters = [RaydropMeter(), IntensityMeter(scale=1),
                  DepthMeter(scale=args.scale_factor),
                  PointsMeter(scale=args.scale_factor, vfov=args.vfov)]

        refined = np.asarray(apply(jnp.asarray(xs, jnp.float32)))
        ray_mask = np.where(refined > 0.5, 1.0, 0.0)
        for idx, name in enumerate(names):
            raydrop_pano = refined[idx, [0]]
            m = ray_mask[idx, [0]]
            intensity_pano = xs[idx, [1]] * (1 - m)
            depth_pano = xs[idx, [2]] * (1 - m)
            gt_raydrop, gt_intensity, gt_depth = (gts[idx, [0]], gts[idx, [1]],
                                                  gts[idx, [2]])
            grid = [visualize_depth(gt_depth, scale_factor=args.scale_factor),
                    visualize_depth(depth_pano, scale_factor=args.scale_factor),
                    np.repeat(np.clip(gt_intensity, 0, 1), 3, 0),
                    np.repeat(np.clip(intensity_pano, 0, 1), 3, 0)]
            save_image(make_image_grid(grid, nrow=1),
                       os.path.join(outdir, name.replace(".npy", ".png")))
            save_xyz_ply(pano_to_lidar_np(depth_pano, args.vfov, (-180, 180)),
                         os.path.join(outdir, name.replace(".npy", ".ply")))
            meters[0].update(raydrop_pano, gt_raydrop)
            meters[1].update(intensity_pano, gt_intensity)
            meters[2].update(depth_pano, gt_depth)
            meters[3].update(depth_pano, gt_depth)

        RMSE, Acc, F1 = meters[0].measure()
        rmse_i, medae_i, lp_i, ssim_i, psnr_i = meters[1].measure()
        rmse_d, medae_d, lp_d, ssim_d, psnr_d = meters[2].measure()
        cd, fs = meters[3].measure()
        metrics = {
            "split": mode, "iteration": "refine",
            "Ray drop": {"RMSE": RMSE, "Acc": Acc, "F1": F1},
            "Point Cloud": {"C-D": cd, "F-score": fs},
            "Depth": {"RMSE": rmse_d, "MedAE": medae_d, "LPIPS": lpips_json(lp_d),
                      "SSIM": ssim_d, "PSNR": psnr_d},
            "Intensity": {"RMSE": rmse_i, "MedAE": medae_i, "LPIPS": lpips_json(lp_i),
                          "SSIM": ssim_i, "PSNR": psnr_i},
        }
        with open(os.path.join(outdir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1, default=float)
        all_metrics[mode] = metrics
    return all_metrics
