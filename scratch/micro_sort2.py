"""Microbench 2: per-op costs of sorted_plan's building blocks.
Run alone on chip: python scratch/micro_sort2.py
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
NPAD = 5_300_224          # ~ n_groups_cap * GBINS * BIN at bench config
R, S = 43691, 96

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
keys32 = jnp.sort(jax.random.randint(k1, (N,), 0, NK, dtype=jnp.int32))
perm = jax.random.permutation(k2, N).astype(jnp.int32)
perm_pad = jax.random.permutation(k3, NPAD).astype(jnp.int32)
tbl = jnp.arange(NK + 1, dtype=jnp.int32)


def timeit(name, f, *args, reps=3):
    g = jax.jit(f)
    out = g(*args)
    jax.block_until_ready(out)

    def dep(o):
        x = jnp.ravel(o[0] if isinstance(o, (tuple, list)) else o)[0]
        return (x * 0).astype(args[0].dtype)

    def chain(n):
        a = args
        for _ in range(n):
            o = g(*a)
            a = (a[0] + dep(o),) + a[1:]
        return np.asarray(
            jnp.ravel(o[0] if isinstance(o, (tuple, list)) else o)[:1]
        )

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(reps + 1); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


# A. small-table gather: [N] indices into an 8k table (the rank/pos ops)
timeit("take(tbl[8k], sorted_keys[N])",
       lambda k, t: jnp.take(t, k), keys32, tbl)
timeit("take(tbl[8k], random[N])",
       lambda p, t: jnp.take(t, p % NK), perm, tbl)

# B. large-source scalar gather: [Npad] indices into [N] (slot_sample)
big = jnp.arange(N + 1, dtype=jnp.int32)
timeit("take(big[N], idx[Npad])",
       lambda p, b: jnp.take(b, p % (N + 1)), perm_pad, big)

# C. row gathers at lane widths (vals / unsort shapes)
for W in (128, 72, 64, 32, 9):
    src = jnp.zeros((R + 1, W), jnp.float32)
    timeit(f"row gather [{R}+1,{W}] by [Npad]",
           lambda p, s: jnp.take(s, p % (R + 1), axis=0), perm_pad, src)

src64 = jnp.zeros((N + 1, 64), jnp.float32)
timeit("row gather [N+1,64] by [N] (unsort C=64)",
       lambda p, s: jnp.take(s, p, axis=0), perm, src64)
src128 = jnp.zeros((N + 1, 128), jnp.float32)
timeit("row gather [N+1,128] by [N] (unsort CPAD)",
       lambda p, s: jnp.take(s, p, axis=0), perm, src128)

# D. unsort gather + per-ray sum fused
timeit("unsort [N+1,64] gather + reshape-sum S",
       lambda p, s: jnp.take(s, p[: R * S], axis=0)
       .reshape(R, S, 64).sum(axis=1), perm, src64)

# E. the groupT transpose: [Npad] -> [ngc*BIN, GBINS]
ngc = NPAD // (32 * 128)
timeit("groupT transpose [Npad]",
       lambda c: c.reshape(ngc, 32, 128).transpose(0, 2, 1)
       .reshape(ngc * 128, 32), perm_pad.astype(jnp.float32))

# F. searchsorted: 8k boundaries over sorted [N]
bnd = jnp.arange(NK + 1, dtype=jnp.int32)
timeit("searchsorted(sorted[N], 8k bounds)",
       lambda k, b: jnp.searchsorted(k, b, side="left"), keys32, bnd)

# G. elementwise coord recompute proxy: ~30 flops over [Npad, 3]
g9 = jnp.zeros((R + 1, 9), jnp.float32)
def coord_re(p, g):
    rows = jnp.take(g, p % (R + 1), axis=0)     # [Npad, 9]
    t = rows[:, 6] + rows[:, 7] * 0.5
    pts = rows[:, 0:3] + t[:, None] * rows[:, 3:6]
    return ((pts + 1.0) * 0.5) * 160.0 - 0.5
timeit("g9 row gather + coord math [Npad]", coord_re, perm_pad, g9)

# H. sort again for reference at exactly this N
idx = jnp.arange(N, dtype=jnp.int32)
timeit("sort (i32,i32) [N]",
       lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=False),
       perm, idx)
