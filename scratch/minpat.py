import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K = 512, 8

def try_pat(name, body):
    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])
    x = jnp.ones((B, K), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((B, K), lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B * K, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * K, 1), jnp.float32),
        )(x)
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)

def pat_wheresum(a):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    cols = [jnp.sum(jnp.where(lane == k, a, 0), axis=1, keepdims=True) for k in range(K)]
    return jnp.concatenate(cols, axis=0)

def pat_mulbk(a):
    # per-k [B,1] from slice, used in arithmetic, then concat
    cols = [a[:, k:k+1] * 2.0 + 1.0 for k in range(K)]
    return jnp.concatenate(cols, axis=0)

def pat_dot(a):
    eye = jnp.eye(K, dtype=jnp.float32)
    cols = jnp.dot(a, eye, preferred_element_type=jnp.float32)
    return jnp.concatenate([cols[:, k:k+1] * 2.0 for k in range(K)], axis=0)

def pat_bcast(a):
    s = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    v = jnp.broadcast_to((s >= 2) & (s < 6), (B, K)).astype(jnp.float32)
    return pat_wheresum(a * v)

try_pat("wheresum", pat_wheresum)
try_pat("mul-then-concat", pat_mulbk)
try_pat("dot-cols", pat_dot)
try_pat("bcast-valid", pat_bcast)
