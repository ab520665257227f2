"""Gather cost vs row width on TPU (axon-safe chained timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 4_194_304
NPAD = 5_627_904
R = 43_691
N_ITER = 8


def chain_time(label, step, d2h):
    out = step(None)
    d2h(out)
    t0 = time.perf_counter()
    d2h(step(None))
    t1 = time.perf_counter()
    out = None
    for _ in range(N_ITER + 1):
        out = step(out)
    d2h(out)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / N_ITER
    print(f"{label:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    src_n = jnp.asarray(rng.integers(0, N, NPAD, dtype=np.int32))
    src_r = jnp.asarray(rng.integers(0, R, NPAD, dtype=np.int32))
    src_sorted = jnp.sort(src_n)

    def mk(label, source_rows, width, idx, dtype=jnp.float32):
        a = jnp.asarray(rng.random((source_rows, width), dtype=np.float32)
                        ).astype(dtype)
        g = jax.jit(lambda arr, i: jnp.take(arr, i, axis=0))

        def step(prev):
            i = idx if prev is None else idx + (
                prev.ravel()[0] * 0).astype(jnp.int32)
            return g(a, i)

        chain_time(label, step, lambda o: np.asarray(o[:1, :1]))

    def mk1(label, source_rows, idx):
        a = jnp.asarray(rng.random(source_rows, dtype=np.float32))
        g = jax.jit(lambda arr, i: jnp.take(arr, i))

        def step(prev):
            i = idx if prev is None else idx + (prev[0] * 0).astype(jnp.int32)
            return g(a, i)

        chain_time(label, step, lambda o: np.asarray(o[:1]))

    mk1("scalar [N]->[Npad]", N, src_n)
    mk1("scalar [R]->[Npad]", R, src_r)
    mk1("scalar [N]->[Npad] sorted", N, src_sorted)
    mk("row3  [N,3]->[Npad,3]", N, 3, src_n)
    mk("row8  [N,8]->[Npad,8]", N, 8, src_n)
    mk("row32 [N,32]->[Npad,32]", N, 32, src_n)
    mk("row128[N,128]->[Npad,128]", N, 128, src_n)
    mk("row128 bf16", N, 128, src_n, jnp.bfloat16)
    mk("row128 [R,128]->[Npad,128]", R, 128, src_r)

    # 3 separate scalar gathers fused in one jit
    a3 = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(3)]
    g3 = jax.jit(lambda x, y, z, i: (jnp.take(x, i), jnp.take(y, i),
                                     jnp.take(z, i)))

    def step3(prev):
        i = src_n if prev is None else src_n + (prev[0][0] * 0).astype(
            jnp.int32)
        return g3(*a3, i)

    chain_time("3x scalar one jit", step3, lambda o: np.asarray(o[0][:1]))


if __name__ == "__main__":
    main()
