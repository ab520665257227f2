"""Probe Mosaic legality/cost of the folded-lane splat kernel pieces:
rank-3 HBM box DMA (y sublane slices of odd size), 80-lane static slice,
pltpu.repeat lane replication at period 80, factored matmul, dynamic
128-aligned lane-slice RMW.  Run alone on chip.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# variant: full | norep (CPAD=128, no repeat) | statdx (dx=0 static)
#          | normw (write to static window, no dynamic offsets at all)
VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
CPAD = 128 if VARIANT == "norep" else 80
WX = 16
L = WX * CPAD       # 1280
BIN = 128
WZ, WY = 9, 9
ZY = WZ * WY
BZ, BY = 17, 24   # BY rounded to the sublane tile (8)
PXp = 168
PZ, PY = 161, 168  # PY padded so by + BY stays in range
NG = 8              # groups (small probe)
GB = 32             # bins/group


def kernel(tab_ref, fzT_ref, fyT_ref, fxT_ref, vals_ref, _acc_in, acc_out,
           scratch, sem):
    g = pl.program_id(0)
    r = g % 8
    bz = tab_ref[r, 0]
    by = tab_ref[r, 1]

    @pl.when(tab_ref[r, 2] == 1)
    def _():
        cp = pltpu.make_async_copy(
            acc_out.at[pl.ds(bz, BZ),
                       pl.ds(pl.multiple_of(by, 8), BY), slice(None)],
            scratch, sem,
        )
        cp.start()
        cp.wait()

    li = jax.lax.broadcasted_iota(jnp.int32, (1, ZY), 1)
    zr = (li // WY).astype(jnp.float32)
    yr = (li % WY).astype(jnp.float32)
    lx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    x_of_l = (lx // CPAD).astype(jnp.float32)

    for q in range(GB):
        fz = fzT_ref[:, q:q + 1]
        fy = fyT_ref[:, q:q + 1]
        fx = fxT_ref[:, q:q + 1]
        dz = tab_ref[r, 5 + q]
        dy = tab_ref[r, 5 + GB + q]
        dx = tab_ref[r, 5 + 2 * GB + q]
        hz = jnp.maximum(0.0, 1.0 - jnp.abs(
            zr + (bz + dz).astype(jnp.float32) - fz))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(
            yr + (by + dy).astype(jnp.float32) - fy))
        st_zy = hz * hy                                   # [BIN, ZY]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(
            x_of_l + dx.astype(jnp.float32) - fx))        # [BIN, L]
        vals_q = vals_ref[q * BIN:(q + 1) * BIN, 0:CPAD]
        if VARIANT == "norep":
            vx = hx * jnp.concatenate([vals_q] * WX, axis=1)
        else:
            vx = hx * pltpu.repeat(vals_q, WX, axis=1)    # [BIN, L]
        upd = jax.lax.dot_general(
            st_zy, vx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [ZY, L]
        if VARIANT == "normw":
            scratch[0:WZ, 0:WY, 0:L] += upd.reshape(WZ, WY, L)
        elif VARIANT == "statdx":
            scratch[
                pl.ds(dz, WZ), pl.ds(pl.multiple_of(dy, 8), WY), 0:L
            ] += upd.reshape(WZ, WY, L)
        else:
            scratch[
                pl.ds(dz, WZ), pl.ds(pl.multiple_of(dy, 8), WY),
                pl.ds(pl.multiple_of(dx * CPAD, 128), L),
            ] += upd.reshape(WZ, WY, L)

    @pl.when(tab_ref[r, 3] == 1)
    def _():
        cp = pltpu.make_async_copy(
            scratch,
            acc_out.at[pl.ds(bz, BZ),
                       pl.ds(pl.multiple_of(by, 8), BY), slice(None)],
            sem,
        )
        cp.start()
        cp.wait()


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ngc8 = NG
    tab = np.zeros((ngc8, 128), np.int32)
    tab[:, 0] = 16   # bz (16-aligned)
    tab[:, 1] = 32   # by
    tab[0, 2] = 1
    tab[-1, 3] = 1
    tab[:, 4] = 1
    rng = np.random.default_rng(0)
    tab[:, 5:5 + GB] = rng.integers(0, 2, (ngc8, GB)) * 8        # dz
    tab[:, 5 + GB:5 + 2 * GB] = rng.integers(0, 2, (ngc8, GB)) * 8
    tab[:, 5 + 2 * GB:5 + 3 * GB] = rng.integers(0, 18, (ngc8, GB)) * 8
    tab = jnp.asarray(tab)
    fzT = jax.random.uniform(k1, (NG * BIN, GB)) * 30 + 16
    fyT = jax.random.uniform(k2, (NG * BIN, GB)) * 30 + 32
    fxT = jax.random.uniform(k1, (NG * BIN, GB)) * 150
    vals = jax.random.normal(k2, (NG * GB * BIN, 128))
    acc = jnp.zeros((PZ, PY, PXp * CPAD), jnp.float32)

    smem = pl.BlockSpec((8, 128), lambda g: (g // 8, 0),
                        memory_space=pltpu.SMEM)
    cspec = pl.BlockSpec((BIN, GB), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=[
            smem, cspec, cspec, cspec,
            pl.BlockSpec((GB * BIN, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((PZ, PY, PXp * CPAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BZ, BY, PXp * CPAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    g = jax.jit(
        lambda a: f(tab, fzT, fyT, fxT, vals, a), donate_argnums=0
    )
    out = g(acc)
    jax.block_until_ready(out)
    print("folded kernel compiled + ran", flush=True)

    # thread the DONATED accumulator through iterations (no copies, no
    # harness adds — mirrors the real chunk scan); sync via tiny D2H
    def chain(n, a):
        for _ in range(n):
            a = g(a)
        np.asarray(a[:1, :1, :1])
        return a

    a = chain(1, jnp.zeros_like(acc))
    t0 = time.perf_counter(); a = chain(1, a); t1 = time.perf_counter()
    a = chain(10, a); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 9
    print(f"{NG} groups x {GB} bins: {dt*1e3:.2f} ms "
          f"({dt/(NG*GB)*1e6:.2f} us/bin)", flush=True)


if __name__ == "__main__":
    main()
