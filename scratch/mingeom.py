import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lightplane_tpu.ops.kernels import renderer_pallas as rp

B, K, S = 512, 8, 256

class Cfg:
    num_samples = S
    num_samples_inf = 0
    disparity_at_inf = 1e-5
    tot_num_samples = S
    contract_coords = False
    inject_noise_sigma = 0.0
cfg = Cfg()

def try_k(name, use_geom):
    def kernel(o_ref, d_ref, n_ref, f_ref, out_ref):
        cr = rp._ChunkRays(cfg, K, o_ref[:], d_ref[:], n_ref[:], f_ref[:],
                           jnp.zeros((B,1), jnp.int32), jnp.zeros((B,8), jnp.float32), None)
        def body(ci, acc):
            valid, t, delta, pts, _ = rp._chunk_geom(cfg, cr, lambda k: ci * K + k)
            if use_geom == "full":
                return acc + jnp.sum(pts[:B] * 0.0 + 1.0, axis=1, keepdims=True) + jnp.sum(valid*t*delta, axis=1, keepdims=True)
            if use_geom == "nopts":
                return acc + jnp.sum(valid * t * delta, axis=1, keepdims=True)
            if use_geom == "ptsonly":
                return acc + jnp.sum(pts[:B], axis=1, keepdims=True)
        acc = jax.lax.fori_loop(0, S // K, body, jnp.zeros((B, 1), jnp.float32))
        out_ref[:] = acc
    o = jnp.ones((B, 3)); d = jnp.ones((B, 3))
    n = jnp.full((B, 1), 1.0); f = jnp.full((B, 1), 3.0)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(a.shape, lambda: (0, 0), memory_space=pltpu.VMEM) for a in (o, d, n, f)],
            out_specs=pl.BlockSpec((B, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        )(o, d, n, f)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e)
        key = "Check failed" if "SIGABRT" in msg else msg[:90]
        print(f"{name}: FAIL {key}", flush=True)

try_k("nopts", "nopts")
try_k("ptsonly", "ptsonly")
try_k("full", "full")
