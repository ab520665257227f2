"""Tiny on-chip probe: does the new sorted_plan compile+run at all, and
how do its two gather formulations execute?  Small shapes to bound remote
compile time.  Run: python scratch/probe_plan_tpu.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

# --- micro: vmap(dynamic_slice) rows vs scalar take, in isolation -------
N = 1 << 20
nbp = N // 128
x = jnp.arange(N + 128, dtype=jnp.int32)
starts = jnp.arange(nbp, dtype=jnp.int32) * 128  # aligned, but traced


@jax.jit
def rows_ds(x, starts):
    rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(x, (s,), (128,))
    )(starts)
    return jnp.sum(rows)


@jax.jit
def rows_take(x, starts):
    j = jnp.arange(128, dtype=jnp.int32)[None]
    idx = (starts[:, None] + j).reshape(-1)
    return jnp.sum(jnp.take(x, idx))


def timeit(name, f, *args):
    t0 = time.perf_counter()
    o = f(*args)
    o1 = float(np.asarray(o))
    t1 = time.perf_counter()
    print(f"{name}: first(run+compile) {t1-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(*args)
    _ = float(np.asarray(o))
    t1 = time.perf_counter()
    print(f"{name}: steady {(t1-t0)/5*1e3:.2f} ms", flush=True)
    return o1


timeit("vmap(dynamic_slice)", rows_ds, x, starts)
timeit("scalar take        ", rows_take, x, starts)
