"""Opt-in EXHAUSTIVE renderer parity sweep (the reference's full cartesian).

The reference sweeps the full cartesian product of ~15 config axes x 5
seeds (``tests/test_renderer_with_autograd.py:34-64``; 8192 configs after
constraints).  The default suite runs a curated OFAT + interactions subset
(CPU compile cost); THIS module is the exhaustive mode:

    LT_EXHAUSTIVE=1 python -m pytest tests/test_exhaustive.py -q

or, for long unattended passes with sharding/resume and a JSON failure
report (the per-round way to chip away at the full cartesian):

    python -m tests.test_exhaustive --shard 0/8 --seeds 3 \
        --report /tmp/exhaustive_shard0.json

Axes mirror the reference's (shapes shrunk for CPU; every axis value that
selects a code path is preserved).  The color-grid constraint is applied
as in the reference (separate color grid forces ``n_layers_trunk=0``) and
the resulting duplicate configs are deduped, leaving 6144 distinct
configs.  Seeds reuse one trace per config (the compile dominates on CPU).

Env knobs (pytest mode): ``LT_EXHAUSTIVE_SHARD=i/n``,
``LT_EXHAUSTIVE_SEEDS`` (default 3), ``LT_EXHAUSTIVE_LIMIT`` (cap the
number of configs, smoke/debug).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os

import pytest

from .test_renderer_parity import BASE, _setup
from .utils import compare_one

AXES = dict(
    # reference axis -> (our key, values); order fixed for determinism
    separate_color_grid=[False, True],          # grid_size_color
    mask_out_of_bounds_samples=[True, False],
    contract_coords=[False, True],
    n_rays=[36, 3],
    num_samples_inf=[4, 0],
    gain=[1.0, 3.0],
    use_scaffold=[True, False],                 # scaffold_size
    grid_type=["voxel", "triplane"],            # is_triplane
    n_layers_trunk=[2, 4],
    n_layers_opacity=[2, 4],
    n_layers_color=[2, 4],
    inject_noise_sigma=[0.3, 0.0],
    flat_grid_input=[False, True],              # use_tensor_grid
)


def exhaustive_configs():
    """The deduped cartesian, as a deterministic list of config dicts."""
    keys = list(AXES.keys())
    seen = set()
    out = []
    for vals in itertools.product(*AXES.values()):
        cfg = dict(zip(keys, vals))
        if cfg["separate_color_grid"]:
            cfg["n_layers_trunk"] = 0   # reference constraint
        sig = tuple(sorted(cfg.items()))
        if sig in seen:
            continue
        seen.add(sig)
        full = dict(
            BASE,
            num_samples=8,
            disparity_at_inf=1e-3,  # grads with bg samples are compared at
            # 1e-3 as in the default suite (see test_renderer_parity.py's
            # variant-6 note on the 1e-5 ill-conditioning)
            **cfg,
        )
        out.append(full)
    return out


def run_one_config(cfg, seeds):
    """Run naive-vs-fused forward + gradient parity for one config.

    Returns a list of failure strings (empty = pass).  Mirrors
    ``test_renderer_parity.test_renderer_parity`` but traces each
    implementation ONCE via jit and reuses it across seeds.
    """
    import jax
    import jax.numpy as jnp

    from lightplane_tpu import (
        lightplane_renderer,
        lightplane_renderer_naive,
    )

    failures = []
    jitted = {}

    for seed in range(seeds):
        rays, grid, color_grid, dp, kwargs = _setup(cfg, seed)

        import numpy as np

        def _splits(gl):
            return np.cumsum(
                [int(np.prod(g.shape[:-1])) for g in gl]
            )[:-1].tolist()

        def _reassemble(gl, flat):
            parts = jnp.split(flat, _splits(gl), axis=0)
            return [p.reshape(g.shape) for p, g in zip(parts, gl)]

        def run(fn, rays_in, grid_flat, cgrid_flat, mlp_params, encoding,
                scaffold):
            rays_l = dataclasses.replace(rays_in, encoding=encoding)
            kw = dict(kwargs, scaffold=scaffold)
            extra = {}
            if cfg["flat_grid_input"]:
                g_in = grid_flat
                extra["grid_sizes"] = [list(g.shape) for g in grid]
                cg_in = cgrid_flat
                if color_grid is not None:
                    extra["color_grid_sizes"] = [
                        list(g.shape) for g in color_grid
                    ]
            else:
                g_in = _reassemble(grid, grid_flat)
                cg_in = (
                    None if color_grid is None
                    else _reassemble(color_grid, cgrid_flat)
                )
            return fn(
                rays_l, g_in,
                dataclasses.replace(dp, mlp_params=mlp_params),
                color_grid=cg_in, **extra, **kw,
            )

        grid_flat = jnp.concatenate(
            [g.reshape(-1, g.shape[-1]) for g in grid], axis=0
        )
        cgrid_flat = (
            None if color_grid is None else jnp.concatenate(
                [g.reshape(-1, g.shape[-1]) for g in color_grid], axis=0
            )
        )
        scaffold = kwargs.pop("scaffold", None)

        k_proj = jax.random.PRNGKey(1000 + seed)

        def fw_and_loss_grads(fn_name, fn, projs):
            # one jit per (config, impl): seeds reuse the compiled fns
            if fn_name not in jitted:
                def fw(rays_in, gf, cgf, mp, enc, scaf):
                    return run(fn, rays_in, gf, cgf, mp, enc, scaf)

                def loss(rays_in, gf, cgf, mp, enc, scaf, projs):
                    out = run(fn, rays_in, gf, cgf, mp, enc, scaf)
                    return sum(
                        jnp.sum(p * o) for p, o in zip(projs, out)
                    )

                argnums = (1, 2, 3, 4) if color_grid is not None \
                    else (1, 3, 4)
                jitted[fn_name] = (
                    jax.jit(fw),
                    jax.jit(jax.grad(loss, argnums=argnums)),
                )
            fwj, gradj = jitted[fn_name]
            out = fwj(rays, grid_flat, cgrid_flat, dp.mlp_params,
                      rays.encoding, scaffold)
            grads = gradj(rays, grid_flat, cgrid_flat, dp.mlp_params,
                          rays.encoding, scaffold, projs)
            return out, grads

        # projection shapes are static: depth [R], nlt [R], feat [R, 3]
        R = cfg["n_rays"]
        projs = [
            jax.random.normal(k, s)
            for k, s in zip(
                jax.random.split(k_proj, 3), [(R,), (R,), (R, 3)]
            )
        ]
        out_n, g_n = fw_and_loss_grads(
            "naive", lightplane_renderer_naive, projs)
        out_f, g_f = fw_and_loss_grads(
            "fused", lightplane_renderer, projs)

        names_fw = ["depth", "nlt", "features"]
        names_g = (
            ["grid", "color_grid", "mlp", "enc"]
            if color_grid is not None else ["grid", "mlp", "enc"]
        )
        for name, a, b in zip(names_fw, out_n, out_f):
            ms = name == "nlt" and cfg["num_samples_inf"] > 0
            try:
                compare_one(a, b, f"s{seed}/{name}", magnitude_scaled=ms)
            except AssertionError as e:
                failures.append(str(e))
        for name, a, b in zip(names_g, g_n, g_f):
            ms = cfg["num_samples_inf"] > 0
            try:
                compare_one(a, b, f"s{seed}/grad_{name}",
                            magnitude_scaled=ms)
            except AssertionError as e:
                failures.append(str(e))
    return failures


def _shard_select(configs, shard_spec):
    if not shard_spec:
        return list(enumerate(configs))
    i, n = (int(x) for x in shard_spec.split("/"))
    return [(ci, c) for ci, c in enumerate(configs) if ci % n == i]


@pytest.mark.skipif(
    not os.environ.get("LT_EXHAUSTIVE"),
    reason="exhaustive cartesian sweep is opt-in: set LT_EXHAUSTIVE=1",
)
def test_exhaustive_renderer_parity():
    configs = exhaustive_configs()
    sel = _shard_select(configs, os.environ.get("LT_EXHAUSTIVE_SHARD", ""))
    limit = int(os.environ.get("LT_EXHAUSTIVE_LIMIT", "0"))
    if limit:
        sel = sel[:limit]
    seeds = int(os.environ.get("LT_EXHAUSTIVE_SEEDS", "3"))
    all_failures = {}
    for ci, cfg in sel:
        fails = run_one_config(cfg, seeds)
        if fails:
            all_failures[ci] = (cfg, fails)
    assert not all_failures, (
        f"{len(all_failures)} / {len(sel)} configs failed: "
        + json.dumps(
            {str(k): v[1] for k, v in list(all_failures.items())[:10]},
            indent=2, default=str,
        )
    )


def main(argv=None):
    """Standalone runner: progress, resume, JSON failure report."""
    import argparse
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", default="", help="i/n modulo shard")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--report", default="/tmp/lt_exhaustive_report.json")
    ap.add_argument("--resume", action="store_true",
                    help="skip config indices already in the report")
    ap.add_argument("--splatter", action="store_true",
                    help="run the splatter cartesian instead of the "
                         "renderer one")
    args = ap.parse_args(argv)

    if args.splatter:
        configs = splatter_exhaustive_configs()
        runner = run_one_splatter_config
        axes = SPLAT_AXES
    else:
        configs = exhaustive_configs()
        runner = run_one_config
        axes = AXES
    sel = _shard_select(configs, args.shard)
    if args.limit:
        sel = sel[: args.limit]

    done, failures = {}, {}
    if args.resume and os.path.exists(args.report):
        with open(args.report) as f:
            prev = json.load(f)
        done = {int(k): v for k, v in prev.get("done", {}).items()}
        failures = {
            int(k): v for k, v in prev.get("failures", {}).items()
        }

    t0 = time.time()
    n_run = 0
    for ci, cfg in sel:
        if ci in done:
            continue
        t1 = time.time()
        fails = runner(cfg, args.seeds)
        n_run += 1
        done[ci] = len(fails)
        if fails:
            failures[ci] = dict(config=cfg, failures=fails)
            print(f"[exhaustive] config {ci} FAILED: {fails[0]}",
                  flush=True)
        if n_run % 10 == 0 or fails:
            with open(args.report, "w") as f:
                json.dump(
                    dict(
                        axes={k: [str(v) for v in vs]
                              for k, vs in axes.items()},
                        n_configs=len(configs),
                        shard=args.shard,
                        seeds=args.seeds,
                        done={str(k): v for k, v in done.items()},
                        failures={str(k): v for k, v in failures.items()},
                    ),
                    f, indent=1, default=str,
                )
            rate = n_run / max(time.time() - t0, 1e-9)
            print(
                f"[exhaustive] {len(done)}/{len(sel)} configs "
                f"({len(failures)} failed, {rate * 3600:.0f} cfg/h, "
                f"last {time.time() - t1:.1f}s)",
                flush=True,
            )
    with open(args.report, "w") as f:
        json.dump(
            dict(
                axes={k: [str(v) for v in vs] for k, vs in axes.items()},
                n_configs=len(configs),
                shard=args.shard,
                seeds=args.seeds,
                done={str(k): v for k, v in done.items()},
                failures={str(k): v for k, v in failures.items()},
            ),
            f, indent=1, default=str,
        )
    print(
        f"[exhaustive] DONE {len(done)}/{len(sel)} configs, "
        f"{len(failures)} failed -> {args.report}",
        flush=True,
    )
    return 1 if failures else 0




# ---------------------------------------------------------------------------
# Splatter exhaustive cartesian (reference test_splatter_with_autograd.py:
# 37-53 axes, shapes shrunk for CPU; the reference's feat-dim constraints
# are structural here — the no-MLP path always splats enc_dim == out_chn)
# ---------------------------------------------------------------------------

SPLAT_AXES = dict(
    contract_coords=[False, True],
    mask_out_of_bounds_samples=[False, True],
    use_input_grid=[False, True],       # input_grid_size (MLP prior)
    n_rays=[24, 1],                     # reference sweeps 128 and 1
    num_samples_inf=[3, 0],
    grid_type=["voxel", "triplane"],    # is_triplane
    use_mlp=[True, False],
    n_layers=[2, 3],
    out_chn=[16, 32],                   # feat_dim
)

SPLAT_BASE = dict(
    batch_size=2,
    num_samples=8,
    resolution=5,
)


def splatter_exhaustive_configs():
    keys = list(SPLAT_AXES.keys())
    seen = set()
    out = []
    for vals in itertools.product(*SPLAT_AXES.values()):
        cfg = dict(zip(keys, vals))
        if cfg["use_input_grid"] != cfg["use_mlp"]:
            # reference constraints: an input grid requires the MLP, and
            # lightplane_mlp_splatter REQUIRES an input grid (the
            # reference sweep skips every input_grid_size=None combo via
            # its always-true use_tensor_grid gate)
            continue
        if not cfg["use_mlp"]:
            cfg["n_layers"] = 0         # MLP depth is moot -> dedupe
        sig = tuple(sorted(cfg.items()))
        if sig in seen:
            continue
        seen.add(sig)
        out.append(dict(SPLAT_BASE, **cfg))
    return out


def run_one_splatter_config(cfg, seeds):
    """Naive-vs-fused splatter parity for one config; returns failure
    strings.  One jit per (config, impl), reused across seeds."""
    import jax
    import jax.numpy as jnp

    from lightplane_tpu import (
        lightplane_mlp_splatter,
        lightplane_mlp_splatter_naive,
        lightplane_splatter,
        lightplane_splatter_naive,
    )
    from .utils import random_grid, random_rays, random_splatter_params

    failures = []
    jitted = {}
    B, r, C = cfg["batch_size"], cfg["resolution"], cfg["out_chn"]
    if cfg["grid_type"] == "voxel":
        out_sizes = [(B, r, r, r, C)]
    else:
        out_sizes = [(B, 1, r, r, C), (B, r, 1, r, C), (B, r, r, 1, C)]
    kwargs = dict(
        num_samples=cfg["num_samples"],
        num_samples_inf=cfg["num_samples_inf"],
        mask_out_of_bounds_samples=cfg["mask_out_of_bounds_samples"],
        contract_coords=cfg["contract_coords"],
        return_list=False,
    )

    for seed in range(seeds):
        key = jax.random.PRNGKey(seed)
        k_rays, k_igrid, k_mlp = jax.random.split(key, 3)
        if cfg["use_mlp"]:
            enc_dim = 8
            sp = random_splatter_params(
                k_mlp, input_chn=enc_dim, hidden_chn=16, out_chn=C,
                n_layers=cfg["n_layers"],
            )
            input_grid = (
                random_grid(k_igrid, B, enc_dim, r, cfg["grid_type"],
                            scale=0.5)
                if cfg["use_input_grid"] else None
            )
        else:
            enc_dim = C
            sp, input_grid = None, None
        rays = random_rays(k_rays, cfg["n_rays"], B, encoding_dim=enc_dim)

        if cfg["use_mlp"]:
            def run(fn, rays_in, enc, ig, mlp):
                rays_l = dataclasses.replace(rays_in, encoding=enc)
                return fn(
                    rays_l, out_sizes,
                    dataclasses.replace(sp, mlp_params=mlp), ig, **kwargs,
                )

            args = (rays, rays.encoding, input_grid, sp.mlp_params)
            argnums = (1, 3) if input_grid is None else (1, 2, 3)
            names = (
                ["enc", "mlp"] if input_grid is None
                else ["enc", "input_grid", "mlp"]
            )
            fns = dict(naive=lightplane_mlp_splatter_naive,
                       fused=lightplane_mlp_splatter)
        else:
            def run(fn, rays_in, enc):
                rays_l = dataclasses.replace(rays_in, encoding=enc)
                return fn(rays_l, out_sizes, **kwargs)

            args = (rays, rays.encoding)
            argnums = (1,)
            names = ["enc"]
            fns = dict(naive=lightplane_splatter_naive,
                       fused=lightplane_splatter)

        proj = jax.random.normal(
            jax.random.PRNGKey(1000 + seed),
            (sum(int(np_prod(s[:-1])) for s in out_sizes), C),
        )

        outs, grads = {}, {}
        for nm, fn in fns.items():
            if nm not in jitted:
                def fw(rays_in, *a, _fn=fn):
                    return run(_fn, rays_in, *a)

                def loss(rays_in, *a, _fn=fn):
                    return jnp.sum(
                        a[-1] * run(_fn, rays_in, *a[:-1])
                    )

                jitted[nm] = (
                    jax.jit(fw),
                    jax.jit(jax.grad(
                        loss, argnums=tuple(i for i in argnums)
                    )),
                )
            fwj, gradj = jitted[nm]
            outs[nm] = fwj(*args)
            grads[nm] = gradj(*args, proj)

        def cmp(name, a, b):
            # input_grid grads arrive as a grid-LIST (3 unequal-shaped
            # planes for triplanes) — compare per sub-grid
            if isinstance(a, (list, tuple)):
                for i, (x, y) in enumerate(zip(a, b)):
                    cmp(f"{name}[{i}]", x, y)
                return
            try:
                compare_one(a, b, name)
            except AssertionError as e:
                failures.append(str(e))

        cmp(f"s{seed}/grid", outs["naive"], outs["fused"])
        for name, a, b in zip(names, grads["naive"], grads["fused"]):
            cmp(f"s{seed}/grad_{name}", a, b)
    return failures


def np_prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


@pytest.mark.skipif(
    not os.environ.get("LT_EXHAUSTIVE"),
    reason="exhaustive cartesian sweep is opt-in: set LT_EXHAUSTIVE=1",
)
def test_exhaustive_splatter_parity():
    configs = splatter_exhaustive_configs()
    sel = _shard_select(configs, os.environ.get("LT_EXHAUSTIVE_SHARD", ""))
    limit = int(os.environ.get("LT_EXHAUSTIVE_LIMIT", "0"))
    if limit:
        sel = sel[:limit]
    seeds = int(os.environ.get("LT_EXHAUSTIVE_SEEDS", "3"))
    all_failures = {}
    for ci, cfg in sel:
        fails = run_one_splatter_config(cfg, seeds)
        if fails:
            all_failures[ci] = (cfg, fails)
    assert not all_failures, (
        f"{len(all_failures)} / {len(sel)} splatter configs failed: "
        + json.dumps(
            {str(k): v[1] for k, v in list(all_failures.items())[:10]},
            indent=2, default=str,
        )
    )


if __name__ == "__main__":
    import sys

    # run on CPU with the same env the conftest forces for the suite
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.exit(main())
