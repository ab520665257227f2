import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lightplane_tpu.ops.kernels import renderer_pallas as rp

B, K, S = 512, 8, 256
M = B * K
V = 1024

class Cfg:
    num_samples = S
    num_samples_inf = 0
    disparity_at_inf = 1e-5
    tot_num_samples = S
    contract_coords = False
    inject_noise_sigma = 0.0
cfg = Cfg()
info = rp._GridInfo(0, 1, 1, 32, 32)

def try_k(name, mode):
    def kernel(o_ref, d_ref, n_ref, f_ref, g_ref, out_ref):
        cr = rp._ChunkRays(cfg, K, o_ref[:], d_ref[:], n_ref[:], f_ref[:],
                           jnp.zeros((B,1), jnp.int32), jnp.zeros((B,8), jnp.float32), None)
        iotas = rp._make_iotas(info)
        def body(ci, acc):
            valid, t, delta, pts, _ = rp._chunk_geom(cfg, cr, lambda k: ci * K + k)
            if mode == "stencil":
                st = rp._stencil(info, iotas, pts, cr.gsel)
                smp = jnp.dot(st, g_ref[:], preferred_element_type=jnp.float32)
                return acc + sum(jnp.sum(smp[k*B:(k+1)*B], axis=1, keepdims=True) for k in range(K))
            if mode == "ea":
                sigma = jnp.sum(pts, axis=1, keepdims=True) * 1e-2  # [M,1]
                nlt = acc * 0.0
                dep = acc * 0.0
                for k in range(K):
                    r = slice(k*B, (k+1)*B)
                    sig_k = sigma[r] * valid[:, k:k+1]
                    nlt = nlt + sig_k * delta[:, k:k+1]
                    w = jnp.exp(-nlt)
                    dep = dep + w * t[:, k:k+1]
                return acc + dep
            if mode == "eaconcat":
                sigma = jnp.sum(pts, axis=1, keepdims=True) * 1e-2
                gs = []
                for k in range(K):
                    r = slice(k*B, (k+1)*B)
                    gs.append(sigma[r] * delta[:, k:k+1] * valid[:, k:k+1])
                g = jnp.concatenate(gs, axis=0)
                return acc + sum(g[k*B:(k+1)*B] for k in range(K))
        acc = jax.lax.fori_loop(0, S // K, body, jnp.zeros((B, 1), jnp.float32))
        out_ref[:] = acc
    o = jnp.ones((B, 3)) * 0.1; d = jnp.ones((B, 3)) * 0.2
    n = jnp.full((B, 1), 1.0); f = jnp.full((B, 1), 3.0)
    g = jnp.ones((V, 32), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(a.shape, lambda: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM) for a in (o, d, n, f, g)],
            out_specs=pl.BlockSpec((B, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        )(o, d, n, f, g)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e)
        key = "CRASH(limits-check)" if "SIGABRT" in msg else msg.splitlines()[0][:90]
        print(f"{name}: FAIL {key}", flush=True)

try_k("stencil", "stencil")
try_k("ea", "ea")
try_k("eaconcat", "eaconcat")
