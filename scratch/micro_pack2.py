"""Does packing 4 samples into 128 lanes speed up skinny MLP matmuls?

Compares, per loop iteration over NCH chunks:
  a) narrow:  5x [4096,32]@[32,32] chained
  b) packed:  relayout [4096,32]->[1024,128], then 5x [1024,128]@[128,128]
  c) packed_nore: 5x [1024,128]@[128,128] (no relayout; lower bound)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4096
NCH, NBLK = 32, 64
NLAYER = 5
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def bench(name, mode):
    def kernel(x_ref, w_ref, wb_ref, out_ref):
        w = w_ref[:]
        wb = wb_ref[:]

        def loop(ci, acc):
            x = x_ref[pl.ds(0, M), :] + ci * 1e-20
            if mode == "narrow":
                for _ in range(NLAYER):
                    x = jnp.maximum(
                        jnp.dot(x, w, preferred_element_type=jnp.float32), 0.0)
                return acc + jnp.sum(x[:512], axis=1, keepdims=True)
            if mode == "packed":
                xp = jnp.concatenate(
                    [x[q * (M // 4):(q + 1) * (M // 4)] for q in range(4)],
                    axis=1)
            else:
                xp = x_ref[pl.ds(0, M // 4), :] + ci * 1e-20
                xp = jnp.concatenate([xp] * 4, axis=1)
            for _ in range(NLAYER):
                xp = jnp.maximum(
                    jnp.dot(xp, wb, preferred_element_type=jnp.float32), 0.0)
            return acc + jnp.sum(xp[:512], axis=1, keepdims=True)

        acc = jax.lax.fori_loop(0, NCH, loop,
                                jnp.zeros((512, 1), jnp.float32))
        out_ref[:] = acc

    Mp = M + NCH * 8
    x = jax.random.normal(jax.random.PRNGKey(0), (NBLK * Mp, 32)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 32)) * 0.1
    wb = jnp.zeros((128, 128))
    for p in range(4):
        wb = wb.at[32 * p: 32 * p + 32, 32 * p: 32 * p + 32].set(w)

    f = jax.jit(lambda x, w, wb: pl.pallas_call(
        kernel, grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((Mp, 32), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK * 512, 1), jnp.float32),
        compiler_params=CP)(x, w, wb))

    def chain(n):
        out = None
        for _ in range(n):
            out = f(x + (0.0 if out is None else out[0, 0] * 1e-30), w, wb)
        return np.asarray(out[:1])

    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(6)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 5
    per_mm = dt / (NBLK * NCH * NLAYER) * 1e9
    print(f"{name:12s} {dt*1e3:7.2f} ms   {per_mm:6.0f} ns/matmul", flush=True)


bench("narrow", "narrow")
bench("packed", "packed")
bench("packed_nore", "packed_nore")
