"""Micro-benchmarks of the renderer kernel's cost components.

Each variant runs a Pallas kernel with the same loop structure as the fw
kernel (128 programs x 32 chunks) but only one component's math, to
attribute the 46 ms fw / 131 ms bw time.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512          # rays per block
K = 8            # march chunk
N_CHUNKS = 32    # 256 samples
N_BLOCKS = 128   # 65536 rays
M = B * K
H = 32           # hidden
C = 16           # color channels
VW = 128         # windowed cells per grid
NG = 3           # sub-grids

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


import numpy as _np

def _chain(f, x, rest, n):
    # chain iterations through a data dependency; ONE D2H at the end
    for _ in range(n):
        out = f(x, *rest)
        x = x + jnp.tile(out * 1e-12, (1, x.shape[1]))
    return _np.asarray(out[:1])

def timeit(f, *args, n=20):
    # axon: block_until_ready does NOT wait; a D2H is the only real sync
    # and costs ~40 ms flat over the tunnel -> chain n iters, 1 D2H,
    # subtract the 1-iter (compile+D2H) time.
    x, rest = args[0], args[1:]
    _chain(f, x, rest, 1)
    t0 = time.perf_counter(); _chain(f, x, rest, 1)
    t1 = time.perf_counter(); _chain(f, x, rest, n + 1)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / n


def bench_kernel(name, body, extra_in=()):
    """body(x_ref, outs, ci) -> carry update; runs fori over chunks."""
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        def loop(ci, acc):
            return acc + body(x_ref, refs[:-1], ci)
        acc = jax.lax.fori_loop(0, N_CHUNKS, loop,
                                jnp.zeros((B, 1), jnp.float32))
        out_ref[:] = acc

    x = jax.random.normal(jax.random.PRNGKey(0), (N_BLOCKS * B, H)) * 0.01
    in_specs = [pl.BlockSpec((B, H), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [x]
    for a in extra_in:
        in_specs.append(pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM))
        inputs.append(a)
    f = jax.jit(lambda *i: pl.pallas_call(
        kernel, grid=(N_BLOCKS,), in_specs=in_specs,
        out_specs=pl.BlockSpec((B, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS * B, 1), jnp.float32),
        compiler_params=CP)(*i))
    dt = timeit(f, *inputs)
    print(f"{name:38s} {dt*1e3:8.2f} ms", flush=True)
    return dt


# ---- 1. sequential EA (current style): K steps of [B,1] vector math ----
def ea_seq(x_ref, _, ci):
    x = x_ref[:]
    sigma = jnp.sum(x, axis=1, keepdims=True) + ci.astype(jnp.float32) * 1e-6
    nlt = jnp.zeros((B, 1), jnp.float32)
    depth = jnp.zeros((B, 1), jnp.float32)
    feat = jnp.zeros((B, C), jnp.float32)
    for k in range(K):
        nlt_new = nlt + sigma * 0.01
        w = jnp.exp(-nlt) - jnp.exp(-nlt_new)
        depth = depth + w * 0.5
        feat = feat + w * x[:, :C]
        nlt = nlt_new
    return depth + jnp.sum(feat, axis=1, keepdims=True)


# ---- 2. batched EA: one [B,K] exp + cumsum matmul ----
TRI = jnp.tril(jnp.ones((K, K), jnp.float32))

def ea_batched(x_ref, extra, ci):
    x = x_ref[:]
    tri = extra[0][:]
    s_s = x[:, :K] * 0.01 + ci.astype(jnp.float32) * 1e-6
    cum = jnp.dot(s_s, tri, preferred_element_type=jnp.float32)
    T = jnp.exp(-cum)
    T_prev = jnp.concatenate([jnp.ones((B, 1), jnp.float32), T[:, :-1]],
                             axis=1)
    w = T_prev - T
    depth = jnp.sum(w * 0.5, axis=1, keepdims=True)
    feat = jnp.zeros((B, C), jnp.float32)
    for k in range(K):
        feat = feat + w[:, k:k + 1] * x[:, :C]
    return depth + jnp.sum(feat, axis=1, keepdims=True)


# ---- 3. MLP matmuls: 5 skinny [M,32]@[32,32] ----
def mlp_mm(x_ref, extra, ci):
    w = extra[0][:]
    x = x_ref[:]
    xs = jnp.concatenate([x] * K, axis=0) + ci.astype(jnp.float32) * 1e-6
    for _ in range(5):
        xs = jnp.maximum(jnp.dot(xs, w, preferred_element_type=jnp.float32),
                         0.0)
    return sum(jnp.sum(xs[k * B:(k + 1) * B], axis=1, keepdims=True) for k in range(K))


# ---- 3b. packed MLP: 3 x [M,64]@[64,64] (block-diag heads) ----
def mlp_mm_packed(x_ref, extra, ci):
    w = extra[0][:]  # [64, 64]
    x = x_ref[:]
    xs = jnp.concatenate([x] * K, axis=0) + ci.astype(jnp.float32) * 1e-6
    xs = jnp.concatenate([xs, xs], axis=1)  # [M, 64]
    for _ in range(3):
        xs = jnp.maximum(jnp.dot(xs, w, preferred_element_type=jnp.float32),
                         0.0)
    return sum(jnp.sum(xs[k * B:(k + 1) * B], axis=1, keepdims=True) for k in range(K))


# ---- 4. stencil build + sample matmul: 3 x ([M,VW] build + [M,VW]@[VW,H]) --
def stencil_sample(x_ref, extra, ci):
    g = extra[0][:]  # [VW, H]
    x = x_ref[:]
    pts = jnp.concatenate([x[:, :3]] * K, axis=0) + ci.astype(jnp.float32) * 1e-6
    acc = None
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, VW), 1)
    xv = (iota % 32).astype(jnp.float32)
    yv = (iota // 32).astype(jnp.float32)
    for gi in range(NG):
        fx = (pts[:, 0:1] + 1.0) * 16.0 - 0.5 + gi
        fy = (pts[:, 1:2] + 1.0) * 2.0 - 0.5
        st = jnp.maximum(0.0, 1.0 - jnp.abs(xv - fx)) * \
             jnp.maximum(0.0, 1.0 - jnp.abs(yv - fy))
        s = jnp.dot(st, g, preferred_element_type=jnp.float32)
        acc = s if acc is None else acc + s
    return sum(jnp.sum(acc[k * B:(k + 1) * B], axis=1, keepdims=True) for k in range(K))


# ---- 5. stencil build only ----
def stencil_only(x_ref, extra, ci):
    x = x_ref[:]
    pts = jnp.concatenate([x[:, :3]] * K, axis=0) + ci.astype(jnp.float32) * 1e-6
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, VW), 1)
    xv = (iota % 32).astype(jnp.float32)
    yv = (iota // 32).astype(jnp.float32)
    acc = jnp.zeros((M, 1), jnp.float32)
    for gi in range(NG):
        fx = (pts[:, 0:1] + 1.0) * 16.0 - 0.5 + gi
        fy = (pts[:, 1:2] + 1.0) * 2.0 - 0.5
        st = jnp.maximum(0.0, 1.0 - jnp.abs(xv - fx)) * \
             jnp.maximum(0.0, 1.0 - jnp.abs(yv - fy))
        acc = acc + jnp.sum(st, axis=1, keepdims=True)
    return sum(acc[k * B:(k + 1) * B] for k in range(K))


if __name__ == "__main__":
    bench_kernel("EA sequential (current)", ea_seq)
    bench_kernel("EA batched (cumsum matmul)", ea_batched, (TRI,))
    w32 = jnp.ones((H, H), jnp.float32) * 0.01
    bench_kernel("5x skinny MLP matmul [M,32]@[32,32]", mlp_mm, (w32,))
    w64 = jnp.ones((2 * H, 2 * H), jnp.float32) * 0.01
    bench_kernel("3x packed MLP matmul [M,64]@[64,64]", mlp_mm_packed,
                 (w64,))
    g = jnp.ones((VW, H), jnp.float32) * 0.01
    bench_kernel("3x stencil build+sample [M,128]@[128,32]",
                 stencil_sample, (g,))
    bench_kernel("3x stencil build only", stencil_only)
