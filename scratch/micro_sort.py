"""Microbench: sort / scatter / gather primitives at the splatter chunk
scale (N=4.19M), to pick the Phase-A gen-2 design.  Run alone on chip:
    python scratch/micro_sort.py
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 4_194_304
NK = 8000

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
keys32 = jax.random.randint(k1, (N,), 0, NK, dtype=jnp.int32)
idx = jnp.arange(N, dtype=jnp.int32)
perm = jax.random.permutation(k2, N).astype(jnp.int32)
vals32 = jnp.arange(N, dtype=jnp.int32)


def timeit(name, f, *args, reps=3):
    g = jax.jit(f)
    out = g(*args)
    jax.block_until_ready(out)

    def chain(n):
        a = args
        for _ in range(n):
            o = g(*a)
            # chain a data dependency through the first arg
            a = (a[0] + jnp.ravel(o[0] if isinstance(o, tuple) else o)[0]
                 * 0,) + a[1:]
        return np.asarray(
            jnp.ravel(o[0] if isinstance(o, tuple) else o)[:1]
        )

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(reps + 1); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


# 1. baseline: 2-stream u32 sort
timeit("sort (i32 key, i32 payload)",
       lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=False),
       keys32, idx)

# 2. single-stream packed sort: key in high 13 bits. idx needs 23 bits
#    -> doesn't fit; just measure a single-stream sort for the network cost
timeit("sort single i32 stream",
       lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0],
       keys32)

# 3. 16-bit key, 32-bit payload
keys16 = keys32.astype(jnp.int16)
timeit("sort (i16 key, i32 payload)",
       lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=False),
       keys16, idx)

# 4. batched segmented sort [8, N/8] single stream
kb = keys32.reshape(8, N // 8)
timeit("sort batched [8, N/8] single",
       lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False,
                              dimension=1)[0],
       kb)
kb2 = keys32.reshape(8, N // 8)
ib2 = jnp.broadcast_to(jnp.arange(N // 8, dtype=jnp.int32)[None], (8, N // 8))
timeit("sort batched [8, N/8] 2-stream",
       lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=False,
                                 dimension=1),
       kb2, ib2)

# 5. unique-index scatter (permutation inverse) — the sort-2 replacement
def inv_scatter(p, v):
    return jnp.zeros((N,), jnp.int32).at[p].set(
        v, unique_indices=True, mode="drop"
    )

timeit("scatter inverse-permutation i32", inv_scatter, perm, vals32)

# 6. row gathers at various lane widths
for W in (128, 72, 64, 32):
    src = jnp.zeros((N + 1, W), jnp.float32)
    timeit(f"gather rows [N, {W}]",
           lambda p, s: jnp.take(s, p, axis=0), perm, src)

# 7. gather + ray-sum (the bw unsort shape): [N, 64] -> [R, S, 64] sum S
R, S = 43691, 96
pos = jax.random.randint(k2, (R * S,), 0, N, dtype=jnp.int32)
src64 = jnp.zeros((N + 1, 64), jnp.float32)
timeit("unsort gather+sum [R*S,64]->[R,64]",
       lambda p, s: jnp.take(s, p, axis=0).reshape(R, S, 64).sum(axis=1),
       pos, src64)

# 8. blocked-histogram cumsum cost (rank-by-key scheme feasibility)
H = jnp.zeros((4096, NK), jnp.float32)
timeit("cumsum [4096, 8000] axis0",
       lambda h: jnp.cumsum(h, axis=0), H)
