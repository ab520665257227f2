"""On-chip probe: compile+run cost of cumulative-max formulations at the
plan's real size (4.2M).  Run: python scratch/probe_scan_tpu.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

N = 4_194_304
x = jnp.ones((N,), jnp.int32)


@jax.jit
def f_assoc(x):
    iota = jnp.arange(N, dtype=jnp.int32)
    v = jnp.where(x > 0, iota, 0)
    return jnp.sum(jax.lax.associative_scan(jnp.maximum, v))


@jax.jit
def f_cummax(x):
    iota = jnp.arange(N, dtype=jnp.int32)
    v = jnp.where(x > 0, iota, 0)
    return jnp.sum(jax.lax.cummax(v))


def timeit(name, f, *args):
    t0 = time.perf_counter()
    o = float(np.asarray(f(*args)))
    t1 = time.perf_counter()
    print(f"{name}: first(run+compile) {t1-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(*args)
    _ = float(np.asarray(o))
    t1 = time.perf_counter()
    print(f"{name}: steady {(t1-t0)/5*1e3:.2f} ms", flush=True)


timeit("lax.cummax        ", f_cummax, x)
timeit("associative_scan  ", f_assoc, x)
