import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from lightplane_tpu.ops.kernels import renderer_pallas as rp
rp.INTERPRET = True
import test_pallas_tpu as t
sys.path.insert(0, "/root/repo/scratch")
t.run_case("combo", grid_type="voxel", res=6, batch=2, mask=True, ni=2, noise=0.1)
