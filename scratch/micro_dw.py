"""Microbench dW-gradient formulations: contract-dim0 dot_general vs
alternatives, and db column sums."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, NCH, NBLK = 512, 8, 32, 128
M = B * K
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def bench(name, body, n_mm=6):
    def kernel(x_ref, g_ref, out_ref):
        def loop(ci, acc):
            x = x_ref[:] + ci.astype(jnp.float32) * 1e-6
            g = g_ref[:]
            return acc + body(x, g)
        acc = jax.lax.fori_loop(0, NCH, loop, jnp.zeros((32, 32), jnp.float32))
        out_ref[:] = acc
    x = jax.random.normal(jax.random.PRNGKey(0), (NBLK * M, 32)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(1), (NBLK * M, 32)) * 0.1
    f = jax.jit(lambda x, g: pl.pallas_call(
        kernel, grid=(NBLK,),
        in_specs=[pl.BlockSpec((M, 32), lambda b: (b, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((32, 32), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 32), jnp.float32),
        compiler_params=CP)(x, g))
    def chain(n):
        xx = x
        for _ in range(n):
            out = f(xx, g)
            xx = xx + out[0, 0] * 1e-30
        return np.asarray(out[:1, :1])
    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(11)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 10
    print(f"{name:44s} {dt*1e3:7.2f} ms", flush=True)

def dw_dim0(x, g):
    # 6 dW-style contract-dim0 products (like _mlp_bwd)
    acc = None
    for i in range(6):
        dw = jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = dw if acc is None else acc + dw
    return acc

def dw_plus_db(x, g):
    acc = None
    for i in range(6):
        dw = jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        db = jnp.sum(g, axis=0, keepdims=True)
        d = dw + db
        acc = d if acc is None else acc + d
    return acc

def db_only(x, g):
    acc = jnp.zeros((32, 32), jnp.float32)
    for i in range(6):
        acc = acc + jnp.sum(g * (1.0 + i), axis=0, keepdims=True)
    return acc

def fw_mm(x, g):
    # reference: 6 forward-style matmuls [M,32]@[32,32]
    acc = jnp.zeros((32, 32), jnp.float32)
    w = g[:32, :]
    for i in range(6):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = acc + y[:32, :]
    return acc

bench("6x dW contract-dim0 [4096,32]x[4096,32]", dw_dim0)
bench("6x (dW + db-sum)", dw_plus_db)
bench("6x db column-sum only", db_only)
bench("6x fw matmul [4096,32]@[32,32] (reference)", fw_mm)
