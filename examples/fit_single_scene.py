"""Single-scene NeRF-style fitting with the Lightplane-TPU renderer.

Counterpart of the reference training app
(``examples/fit_single_scene.py:150-446``): fits a voxel/triplane grid +
decoder MLPs to posed images with MSE + TV + L1 losses, two learning-rate
groups with exponential decay, coarse-to-fine grid up-sampling, periodic
scaffold recomputation, evaluation renders with PSNR/SSIM, and orbax
checkpointing.  Runs out of the box on a procedural synthetic scene
(``--dataset_path`` omitted) or on NeRF-synthetic / LLFF / NSVF data.

Usage::

    python examples/fit_single_scene.py --n_iter 2000 --grid_resolution 32
    python examples/fit_single_scene.py --config examples/config/synthetic_overfit.json
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import jax

# Honour JAX_PLATFORMS even when a higher-priority device plugin (e.g. a
# tunnelled TPU backend) is installed: the env var alone can silently
# lose to the plugin, sending CPU-intended runs to the device.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import lightplane_tpu as lt
from lightplane_tpu.utils.grid_utils import (
    grid_l1_loss,
    grid_tv_loss,
    grid_up_sample,
    init_3d_representation,
)
from lightplane_tpu.utils.metrics import calc_psnr, calc_ssim, perceptual_loss
from lightplane_tpu.utils.nnfm_loss import random_conv_features_fn
from lightplane_tpu.utils.io_utils import colorize_depth, save_image
from utils.datasets import auto_dataset


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file; CLI flags override it")
    # data
    p.add_argument("--dataset_path", type=str, default=None)
    p.add_argument("--dataset_type", type=str, default="auto",
                   choices=["auto", "nerf", "llff", "nsvf", "co3d",
                            "synthetic"])
    p.add_argument("--downsample", type=int, default=1)
    # model
    p.add_argument("--representation", type=str, default="triplane",
                   choices=["triplane", "voxel_grid"])
    p.add_argument("--grid_resolution", type=int, default=64)
    p.add_argument("--grid_channels", type=int, default=32)
    p.add_argument("--mlp_hidden_chn", type=int, default=32)
    p.add_argument("--mlp_n_layers", type=int, default=2)
    p.add_argument("--num_samples", type=int, default=128)
    p.add_argument("--num_samples_inf", type=int, default=0)
    p.add_argument("--contract_coords", action="store_true")
    p.add_argument("--mask_out_of_bounds_samples", action="store_true")
    p.add_argument("--bg_color", type=float, default=1.0)
    p.add_argument("--gain", type=float, default=1.0)
    p.add_argument("--opacity_init_bias", type=float, default=-5.0)
    p.add_argument("--inject_noise_sigma", type=float, default=0.0)
    p.add_argument("--impl", type=str, default="auto",
                   choices=["auto", "scan", "pallas"])
    # optimization
    p.add_argument("--n_iter", type=int, default=3000)
    p.add_argument("--rays_per_batch", type=int, default=4096)
    p.add_argument("--ray_sampling", type=str, default="auto",
                   choices=["auto", "span", "patch", "random", "image"],
                   help="'span' draws random 512-ray contiguous raster "
                        "spans, each exactly one kernel ray-block, so "
                        "batches stay spatially coherent and the TPU "
                        "kernels keep their windowed fast path; 'patch' "
                        "draws random 8x8 pixel patches — one W3 boxed-DMA "
                        "ray block each, which keeps beyond-VMEM grids "
                        "(after coarse-to-fine upsampling) on the fused "
                        "kernels; 'auto' picks span below the kernel VMEM "
                        "grid budget and patch above it; 'random' draws "
                        "iid pixels; 'image' renders one whole image per "
                        "step (tile-ordered rays) — the reference fit "
                        "app's renderer_type='image' mode "
                        "(fit_single_scene.py:256-315), which enables the "
                        "perceptual image loss")
    p.add_argument("--perceptual_weight", type=float, default=0.0,
                   help="weight of the LPIPS-structured perceptual image "
                        "loss (whole-image mode only; reference uses "
                        "LPIPS at fit_single_scene.py:304-315)")
    p.add_argument("--lr_grid", type=float, default=5e-2)
    p.add_argument("--lr_mlp", type=float, default=5e-3)
    p.add_argument("--lr_decay_iters", type=int, default=3000)
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--tv_weight", type=float, default=1e-3)
    p.add_argument("--l1_weight", type=float, default=0.0)
    # schedule
    p.add_argument("--upsample_steps", type=int, nargs="*", default=[])
    p.add_argument("--update_scaffold_steps", type=int, nargs="*",
                   default=[])
    p.add_argument("--scaffold_resolution", type=int, default=64)
    # logging / eval / checkpoints
    p.add_argument("--eval_rate", type=int, default=1000)
    p.add_argument("--output_dir", type=str, default="outputs/fit")
    p.add_argument("--init_ckpt", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.config is not None:
        with open(args.config) as f:
            cfg = json.load(f)
        valid = {a.dest for a in p._actions}
        bad = set(cfg) - valid
        if bad:
            raise ValueError(f"invalid config keys: {sorted(bad)}")
        p.set_defaults(**cfg)
        args = p.parse_args(argv)
    return args


def build_renderer(args):
    return lt.LightplaneRenderer(
        num_samples=args.num_samples,
        color_chn=3,
        grid_chn=args.grid_channels,
        mlp_hidden_chn=args.mlp_hidden_chn,
        mlp_n_layers_opacity=args.mlp_n_layers,
        mlp_n_layers_trunk=args.mlp_n_layers,
        mlp_n_layers_color=args.mlp_n_layers,
        opacity_init_bias=args.opacity_init_bias,
        gain=args.gain,
        bg_color=args.bg_color,
        num_samples_inf=args.num_samples_inf,
        mask_out_of_bounds_samples=args.mask_out_of_bounds_samples,
        contract_coords=args.contract_coords,
        inject_noise_sigma=args.inject_noise_sigma,
        inject_noise_seed=0,
    )


def make_optimizer(args, n_iter_done=0):
    decay = optax.exponential_decay(
        1.0, args.lr_decay_iters, args.lr_decay_rate
    )
    def scaled(lr):
        return optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda i: -lr * decay(i + n_iter_done)),
        )
    return optax.multi_transform(
        {"grid": scaled(args.lr_grid), "mlp": scaled(args.lr_mlp)},
        param_labels={"grid": "grid", "mlp": "mlp"},
    )


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"[fit] loading dataset ({args.dataset_type})")
    # the patch/span samplers below assume one uniform H x W raster, so a
    # CO3D load here opts out of the library default per-frame sizes
    ds = auto_dataset(args.dataset_path, args.dataset_type,
                      keep_frame_sizes=False)
    print(f"[fit] {ds.n_images} images {ds.height}x{ds.width},"
          f" near={ds.near:.2f} far={ds.far:.2f}")

    key = jax.random.PRNGKey(args.seed)
    k_grid, k_mod, key = jax.random.split(key, 3)

    renderer = build_renderer(args)
    grid = init_3d_representation(
        k_grid, args.representation, args.grid_resolution,
        args.grid_channels,
    )
    dummy_rays = lt.Rays(
        directions=jnp.ones((4, 3)), origins=jnp.zeros((4, 3)),
        grid_idx=jnp.zeros((4,), jnp.int32), near=jnp.zeros((4,)),
        far=jnp.ones((4,)),
    )
    variables = renderer.init(k_mod, dummy_rays, grid, num_samples=2)
    params = {"grid": grid, "mlp": variables["params"]}

    if args.init_ckpt:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.abspath(args.init_ckpt), params)
        print(f"[fit] restored {args.init_ckpt}")

    opt = make_optimizer(args)
    opt_state = opt.init(params)
    scaffold = None

    n_rays_total = ds.origins.shape[0]
    origins = jnp.asarray(ds.origins)
    directions = jnp.asarray(ds.directions)
    gt = jnp.asarray(ds.gt)

    # span sampling: each draw is a 512-ray contiguous raster span of one
    # image, aligned to the kernels' 512-ray blocks — every block of the
    # batch is then a thin image band, which keeps the windowed sampling
    # fast path engaged (random pixels force the general-kernel fallback)
    SPAN = 512
    PATCH = 8  # pixels per side; one 8x8 patch = one W3 64-ray block
    img_rays = ds.height * ds.width
    spans_per_img = img_rays // SPAN
    n_spans = max(1, args.rays_per_batch // SPAN)
    n_patches = max(1, args.rays_per_batch // (PATCH * PATCH))
    py_max = ds.height // PATCH
    px_max = ds.width // PATCH

    def sampling_mode(params):
        """'auto' keeps span batches while every sub-grid fits the VMEM
        stencil kernels and switches to 8x8 patches once coarse-to-fine
        upsampling crosses the budget — patch blocks are exactly the
        boxed-DMA (W3) kernels' tile shape, so big grids stay fused."""
        mode = args.ray_sampling
        if mode != "auto":
            return mode
        from lightplane_tpu.ops.kernels.renderer_pallas import (
            MAX_CELLS_PER_GRID,
        )

        big = any(
            int(np.prod(g.shape[:-1])) > MAX_CELLS_PER_GRID
            for g in params["grid"]
        )
        return "patch" if big else "span"

    def sample_ray_idx(k_idx, mode):
        if mode == "patch" and py_max and px_max:
            k_img, k_py, k_px = jax.random.split(k_idx, 3)
            img = jax.random.randint(k_img, (n_patches,), 0, ds.n_images)
            py = jax.random.randint(k_py, (n_patches,), 0, py_max)
            px = jax.random.randint(k_px, (n_patches,), 0, px_max)
            r = jnp.arange(PATCH)
            rows = (py[:, None] * PATCH + r[None, :])          # [P, 8]
            cols = (px[:, None] * PATCH + r[None, :])          # [P, 8]
            idx = (
                img[:, None, None] * img_rays
                + rows[:, :, None] * ds.width
                + cols[:, None, :]
            )
            return idx.reshape(-1)
        if mode == "random" or spans_per_img == 0:
            return jax.random.randint(
                k_idx, (args.rays_per_batch,), 0, n_rays_total
            )
        k_img, k_sp = jax.random.split(k_idx)
        img = jax.random.randint(k_img, (n_spans,), 0, ds.n_images)
        sp = jax.random.randint(k_sp, (n_spans,), 0, spans_per_img)
        base = img * img_rays + sp * SPAN
        return (base[:, None] + jnp.arange(SPAN)[None, :]).reshape(-1)

    def render_with(params, rays, scaffold, num_samples=None,
                    image_size=None, w3_budget=None):
        # image_size engages the module's tile-reorder: rays go in (and
        # outputs come back) in raster order; internally the module
        # renders in adaptive pixel tiles sized to the kernels' blocks
        return renderer.apply(
            {"params": params["mlp"]}, rays, params["grid"],
            scaffold=scaffold, num_samples=num_samples,
            image_size=image_size, w3_budget=w3_budget,
        )

    def probe_w3_budget(params, num_samples):
        """Per-rig W3 window budget for whole-image renders: once the
        coarse-to-fine grid grows beyond the VMEM cap, probe the tightest
        candidate whose window plan fits this dataset's cameras
        (lt.suggest_w3_budget; one eager planner pass per candidate).
        Only image-mode renders use it — span/patch batches have a
        different block footprint and keep the defaults."""
        from lightplane_tpu.ops.kernels.renderer_pallas import (
            MAX_CELLS_PER_GRID,
        )

        if not any(
            int(np.prod(g.shape[:-1])) > MAX_CELLS_PER_GRID
            for g in params["grid"]
        ):
            return None
        o, d, _ = ds.image(0)
        n = o.shape[0]
        rays = lt.Rays(
            directions=jnp.asarray(d), origins=jnp.asarray(o),
            grid_idx=jnp.zeros((n,), jnp.int32),
            near=jnp.full((n,), ds.near, jnp.float32),
            far=jnp.full((n,), ds.far, jnp.float32),
        )
        dp = renderer.apply(
            {"params": params["mlp"]}, method="get_decoder_params"
        )
        b = lt.suggest_w3_budget(
            rays, params["grid"], dp,
            num_samples=num_samples,
            num_samples_inf=args.num_samples_inf,
            contract_coords=args.contract_coords,
            image_size=(ds.height, ds.width),
        )
        if b is not None:
            print(f"[fit] W3 window budget for this rig: {b}")
        return b

    @functools.partial(jax.jit, static_argnames=("num_samples",))
    def train_step(params, opt_state, idx, scaffold, num_samples):
        def loss_fn(params):
            rays = lt.Rays(
                directions=directions[idx],
                origins=origins[idx],
                grid_idx=jnp.zeros_like(idx, dtype=jnp.int32),
                near=jnp.full(idx.shape, ds.near, jnp.float32),
                far=jnp.full(idx.shape, ds.far, jnp.float32),
            )
            depth, alpha, rgb = render_with(
                params, rays, scaffold, num_samples
            )
            mse = jnp.mean((rgb - gt[idx]) ** 2)
            loss = mse
            if args.tv_weight > 0:
                loss = loss + args.tv_weight * grid_tv_loss(params["grid"])
            if args.l1_weight > 0:
                loss = loss + args.l1_weight * grid_l1_loss(params["grid"])
            return loss, mse
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse

    # whole-image mode: one image per step, rendered with tile-ordered rays
    # (the fused kernels' fast path), loss = image MSE + optional perceptual
    # term — the reference's renderer_type="image" + LPIPS mode
    # (fit_single_scene.py:256-315).  The O(rays)-memory recompute backward
    # is what makes differentiable whole-image renders affordable.
    features_fn = (
        random_conv_features_fn() if args.perceptual_weight > 0 else None
    )

    @functools.partial(
        jax.jit, static_argnames=("num_samples", "w3_budget")
    )
    def train_step_image(params, opt_state, img_i, scaffold, num_samples,
                         w3_budget=None):
        base = img_i * img_rays
        idx = base + jnp.arange(img_rays)

        def loss_fn(params):
            rays = lt.Rays(
                directions=directions[idx],
                origins=origins[idx],
                grid_idx=jnp.zeros_like(idx, dtype=jnp.int32),
                near=jnp.full(idx.shape, ds.near, jnp.float32),
                far=jnp.full(idx.shape, ds.far, jnp.float32),
            )
            depth, alpha, rgb = render_with(
                params, rays, scaffold, num_samples,
                image_size=(ds.height, ds.width), w3_budget=w3_budget,
            )
            pred = rgb.reshape(ds.height, ds.width, 3)
            tgt = gt[idx].reshape(
                ds.height, ds.width, 3
            )
            mse = jnp.mean((pred - tgt) ** 2)
            loss = mse
            if args.perceptual_weight > 0:
                loss = loss + args.perceptual_weight * perceptual_loss(
                    pred, tgt, features_fn
                )
            if args.tv_weight > 0:
                loss = loss + args.tv_weight * grid_tv_loss(params["grid"])
            if args.l1_weight > 0:
                loss = loss + args.l1_weight * grid_l1_loss(params["grid"])
            return loss, mse

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse

    def eval_and_checkpoint(step, params, scaffold, num_samples,
                            w3_budget=None):
        o, d, img_gt = ds.image(0)
        # raster-order rays; the module tile-reorders internally
        # (image_size) so the fused kernels keep their windowed fast path
        rays = lt.Rays(
            directions=jnp.asarray(d), origins=jnp.asarray(o),
            grid_idx=jnp.zeros((o.shape[0],), jnp.int32),
            near=jnp.full((o.shape[0],), ds.near, jnp.float32),
            far=jnp.full((o.shape[0],), ds.far, jnp.float32),
        )
        depth, alpha, rgb = jax.jit(
            render_with,
            static_argnames=("num_samples", "image_size", "w3_budget"),
        )(params, rays, scaffold, num_samples,
          image_size=(ds.height, ds.width), w3_budget=w3_budget)
        rgb_img = np.clip(
            np.asarray(rgb).reshape(ds.height, ds.width, 3), 0.0, 1.0
        )
        depth_img = np.asarray(depth).reshape(ds.height, ds.width)
        psnr = float(calc_psnr(jnp.asarray(rgb_img), jnp.asarray(img_gt)))
        ssim = float(calc_ssim(jnp.asarray(rgb_img), jnp.asarray(img_gt)))
        save_image(
            os.path.join(args.output_dir, f"render_{step:06d}.png"), rgb_img
        )
        save_image(
            os.path.join(args.output_dir, f"depth_{step:06d}.png"),
            colorize_depth(depth_img),
        )
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckpt_path = os.path.abspath(
            os.path.join(args.output_dir, f"ckpt_{step:06d}")
        )
        ckptr.save(ckpt_path, params, force=True)
        ckptr.wait_until_finished()
        print(f"[fit] step {step}: eval PSNR {psnr:.2f} SSIM {ssim:.3f}"
              f" -> {ckpt_path}")
        return psnr

    num_samples = args.num_samples
    w3_budget = probe_w3_budget(params, num_samples)
    t0 = time.time()
    for step in range(args.n_iter):
        key, k_idx = jax.random.split(key)
        if args.ray_sampling == "image":
            img_i = jax.random.randint(k_idx, (), 0, ds.n_images)
            params, opt_state, loss, mse = train_step_image(
                params, opt_state, img_i, scaffold, num_samples,
                w3_budget=w3_budget,
            )
        else:
            idx = sample_ray_idx(k_idx, sampling_mode(params))
            params, opt_state, loss, mse = train_step(
                params, opt_state, idx, scaffold, num_samples
            )

        if step in args.upsample_steps:
            # coarse-to-fine: upsample grid x2, double samples, reset opt
            params = dict(params)
            params["grid"] = grid_up_sample(params["grid"], 2)
            num_samples = num_samples * 2
            opt = make_optimizer(args, n_iter_done=step)
            opt_state = opt.init(params)
            print(f"[fit] step {step}: upsampled grid -> "
                  f"{[g.shape for g in params['grid']]},"
                  f" num_samples={num_samples}")
            # the grid may now exceed the VMEM cap: re-probe the W3
            # window budget for whole-image renders
            w3_budget = probe_w3_budget(params, num_samples)

        if step in args.update_scaffold_steps:
            r = args.scaffold_resolution
            scaffold = renderer.apply(
                {"params": params["mlp"]},
                params["grid"],
                (1, r, r, r),
                method=lt.LightplaneRenderer.calculate_scaffold,
            )
            occ = float(jnp.mean(scaffold))
            print(f"[fit] step {step}: scaffold updated"
                  f" (occupancy {occ:.3f})")

        if (step + 1) % 100 == 0:
            psnr_b = -10 * np.log10(max(float(mse), 1e-10))
            print(f"[fit] step {step+1}/{args.n_iter}"
                  f" loss {float(loss):.5f} batchPSNR {psnr_b:.2f}"
                  f" ({(time.time()-t0)/(step+1)*1e3:.0f} ms/it)")

        if (step + 1) % args.eval_rate == 0 or step + 1 == args.n_iter:
            eval_and_checkpoint(step + 1, params, scaffold, num_samples,
                                w3_budget=w3_budget)

    return params


if __name__ == "__main__":
    main()
