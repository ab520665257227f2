"""Independent-matmul throughput: f32 vs bf16 operands (per-iteration
work forced via a ci-dependent sublane slice)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, V, C = 4096, 128, 32
NCH, NBLK = 32, 128
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def bench(name, dt_in):
    def kernel(x_ref, g_ref, out_ref):
        g = g_ref[:]
        def loop(ci, acc):
            x = x_ref[pl.ds(ci * 8, M), :]
            s = None
            for i in range(3):
                y = jnp.dot(x, g, preferred_element_type=jnp.float32)
                s = y if s is None else s + y
            return acc + jnp.sum(s[:512], axis=1, keepdims=True)
        acc = jax.lax.fori_loop(0, NCH, loop, jnp.zeros((512, 1), jnp.float32))
        out_ref[:] = acc
    Mp = M + NCH * 8
    x = (jax.random.normal(jax.random.PRNGKey(0), (NBLK * Mp, V)) * 0.1).astype(dt_in)
    g = (jax.random.normal(jax.random.PRNGKey(1), (V, C)) * 0.1).astype(dt_in)
    f = jax.jit(lambda x, g: pl.pallas_call(
        kernel, grid=(NBLK,),
        in_specs=[pl.BlockSpec((Mp, V), lambda b: (b, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((V, C), lambda b: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK * 512, 1), jnp.float32),
        compiler_params=CP)(x, g))
    def chain(n):
        out = None
        xx = x
        for _ in range(n):
            out = f(xx, g)
            xx = jnp.where(out[0, 0] > 1e30, xx, xx)  # dep chain, dtype-safe
        return np.asarray(out[:1])
    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(11)
    t2 = time.perf_counter()
    d = ((t2 - t1) - (t1 - t0)) / 10
    n_mm = 3 * NCH * NBLK
    print(f"{name:26s} {d*1e3:7.2f} ms  ({d/n_mm*1e9:6.1f} ns/matmul)", flush=True)

bench("f32  [4096,128]@[128,32]", jnp.float32)
bench("bf16 [4096,128]@[128,32]", jnp.bfloat16)
