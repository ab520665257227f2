"""Micro-bench: cost of skinny matmul passes inside a Pallas march loop.

The matmul input is made loop-dependent (acc feeds back) so nothing can be
hoisted.  'novpu' baselines the loop + feedback cost without matmuls.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4096
N_ITER = 4096 // 8


def make(fn_body, k_in):
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        w = w_ref[:]

        def body(i, acc):
            # acc feedback makes the chain loop-carried (no hoisting)
            return fn_body(x + acc[:, :k_in] * 1e-9, w)

        o_ref[:] = jax.lax.fori_loop(
            0, N_ITER, body, jnp.zeros((M, k_in), jnp.float32))

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(128,),
            in_specs=[pl.BlockSpec((M, x.shape[1]), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, x.shape[1]), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, x.shape[1]), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)
    return run


def bench(label, run, x, w):
    jax.block_until_ready(run(x, w))
    t0 = time.perf_counter()
    for _ in range(3):
        o = run(x, w)
    jax.block_until_ready(o)
    print(f"{label}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms")


key = jax.random.PRNGKey(0)
x32 = jax.random.normal(key, (M, 32))
w32 = jax.random.normal(key, (32, 32))

which = sys.argv[1:] or ["novpu", "1x32", "6x32", "6x32bf16", "2x64_128"]

if "novpu" in which:
    f = make(lambda x, w: x * 1.000001, 32)
    bench("baseline (no matmul)          ", f, x32, w32)
if "1x32" in which:
    f = make(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
             32)
    bench("1 pass  [4096,32]@[32,32] f32 ", f, x32, w32)
if "6x32" in which:
    def six(x, w):
        y = x
        for _ in range(6):
            y = jnp.dot(y, w, preferred_element_type=jnp.float32)
        return y
    f = make(six, 32)
    bench("6 chain [4096,32]@[32,32] f32 ", f, x32, w32)
if "6x32bf16" in which:
    def sixb(x, w):
        y = x
        for _ in range(6):
            y = jnp.dot(y.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return y
    f = make(sixb, 32)
    bench("6 chain [4096,32]@[32,32] bf16", f, x32, w32)
if "2x64_128" in which:
    w128 = jax.random.normal(key, (128, 128))
    x128 = jax.random.normal(key, (M, 128))
    def two(x, w):
        y = x
        for _ in range(2):
            y = jnp.dot(y, w, preferred_element_type=jnp.float32)
        return y
    f = make(two, 128)
    bench("2 chain [4096,128]@[128,128]  ", f, x128, w128)
