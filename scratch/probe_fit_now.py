"""Why is the W3 fit flag false for the renderer_speed 64^3 bench rig?
Replicates the bench rays on CPU and evaluates w3_plan fits for fw and bw
at several budgets."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
import lightplane_tpu as lt
from benchmarks.renderer_speed import make_inputs
from lightplane_tpu.ops import renderer as ops_r
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from lightplane_tpu.ops.kernels import renderer_w3 as rw3

rays, grid, dp = make_inputs(
    jax.random.PRNGKey(0), 256, res=64, grid_kind="voxel",
    tile_order=True,
)
cfg = ops_r._make_cfg(
    rays, grid, None, dp, num_samples=256, gain=1.0,
) if hasattr(ops_r, "_make_cfg") else None
print("have _make_cfg:", cfg is not None)

# fall back: construct cfg the way the functional API does
if cfg is None:
    import dataclasses
    import inspect
    src = [n for n, _ in inspect.getmembers(ops_r)]
    print([s for s in src if "cfg" in s.lower()])
    sys.exit(0)
