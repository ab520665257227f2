"""Probe W3 design B: HBM [D, H, W*C] layout; per-chunk DMA of a z/y-box
with a 128-aligned dynamic LANE slice (x-window); two-stage sample:
st_zy [M, 64] @ g_win [64, wx*C] then strided x-hat contraction; bw RMW.
Numerics vs numpy."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

p = argparse.ArgumentParser()
p.add_argument("--D", type=int, default=64)
p.add_argument("--C", type=int, default=32)
p.add_argument("--M", type=int, default=512)
p.add_argument("--iters", type=int, default=32)
args = p.parse_args()

D = H = W = args.D
C = args.C
WZ, WY, WX = 8, 8, 8
M = args.M


def kernel(tab_ref, pts_ref, grid_hbm, _gz, out_ref, gout_hbm, box, gbox,
           sem):
    zy_li = jax.lax.broadcasted_iota(jnp.int32, (1, WZ * WY), 1)
    yv0 = (zy_li % WY).astype(jnp.float32)
    zv0 = (zy_li // WY).astype(jnp.float32)
    xc_li = jax.lax.broadcasted_iota(jnp.int32, (1, WX), 1)

    def body(ci, acc):
        z0 = tab_ref[0, 3 * ci]
        y0 = tab_ref[0, 3 * ci + 1]
        x0 = tab_ref[0, 3 * ci + 2]          # multiple of 4 (128/C)
        cp = pltpu.make_async_copy(
            grid_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY),
                        pl.ds(x0 * C, WX * C)],
            box, sem)
        cp.start()
        cp.wait()
        g_win = box[...].reshape(WZ * WY, WX * C)
        f = pts_ref[:, :] + ci.astype(jnp.float32) * 0.1
        fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
        st_zy = (jnp.maximum(0.0, 1.0 - jnp.abs(
                     yv0 + y0.astype(jnp.float32) - fy))
                 * jnp.maximum(0.0, 1.0 - jnp.abs(
                     zv0 + z0.astype(jnp.float32) - fz)))
        s1 = jnp.dot(st_zy, g_win, preferred_element_type=jnp.float32)
        # x-hat contraction: sum_xc hx[:, xc] * s1[:, xc*C:(xc+1)*C]
        smp = None
        for xc in range(WX):
            hx = jnp.maximum(
                0.0, 1.0 - jnp.abs(x0.astype(jnp.float32) + xc - fx))
            t = hx * s1[:, xc * C:(xc + 1) * C]
            smp = t if smp is None else smp + t
        # ---- bw: splat smp back (self-adjoint toy) ----
        # s1_grad[m, (xc, c)] = hx[m, xc] * dval[m, c]
        s1g = None
        pieces = []
        for xc in range(WX):
            hx = jnp.maximum(
                0.0, 1.0 - jnp.abs(x0.astype(jnp.float32) + xc - fx))
            pieces.append(hx * smp)
        s1g = jnp.concatenate(pieces, axis=1)          # [M, WX*C]
        upd = jax.lax.dot_general(
            st_zy, s1g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [WZ*WY, WX*C]
        cp2 = pltpu.make_async_copy(
            gout_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY),
                        pl.ds(x0 * C, WX * C)], gbox, sem)
        cp2.start()
        cp2.wait()
        gbox[...] += upd.reshape(WZ, WY, WX * C)
        cp3 = pltpu.make_async_copy(
            gbox, gout_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY),
                              pl.ds(x0 * C, WX * C)], sem)
        cp3.start()
        cp3.wait()
        return acc + smp

    acc = jax.lax.fori_loop(
        0, args.iters, body, jnp.zeros((M, C), jnp.float32),
        unroll=False)
    out_ref[:, :] = acc


grid = jax.random.normal(jax.random.PRNGKey(0), (D, H, W * C))
gz = jnp.zeros((D, H, W * C))
pts = jax.random.uniform(jax.random.PRNGKey(1), (M, 3)) * (WX - 2) + 1.0
tab = jax.random.randint(jax.random.PRNGKey(2), (1, 3 * args.iters), 0,
                         (D - 8) // 4, dtype=jnp.int32) * 4

f = jax.jit(lambda t_, p_, g_, z_: pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pl.ANY)],
    out_shape=[jax.ShapeDtypeStruct((M, C), jnp.float32),
               jax.ShapeDtypeStruct((D, H, W * C), jnp.float32)],
    scratch_shapes=[pltpu.VMEM((WZ, WY, WX * C), jnp.float32),
                    pltpu.VMEM((WZ, WY, WX * C), jnp.float32),
                    pltpu.SemaphoreType.DMA],
    input_output_aliases={3: 1},
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
)(t_, p_, g_, z_))

out, gout = f(tab, pts, grid, gz)
jax.block_until_ready(out)

gnp = np.asarray(grid).reshape(D, H, W, C)
tabn = np.asarray(tab)[0]
ptsn = np.asarray(pts)
acc = np.zeros((M, C), np.float32)
gnp_out = np.zeros((D, H, W, C), np.float32)
for ci in range(args.iters):
    z0, y0, x0 = tabn[3 * ci], tabn[3 * ci + 1], tabn[3 * ci + 2]
    win = gnp[z0:z0 + WZ, y0:y0 + WY, x0:x0 + WX].reshape(-1, C)
    li = np.arange(WZ * WY * WX)
    xv = (li % WX) + x0
    yv = ((li // WX) % WY) + y0
    zv = (li // (WX * WY)) + z0
    fpt = ptsn + ci * 0.1
    st = (np.maximum(0, 1 - np.abs(xv[None] - fpt[:, 0:1]))
          * np.maximum(0, 1 - np.abs(yv[None] - fpt[:, 1:2]))
          * np.maximum(0, 1 - np.abs(zv[None] - fpt[:, 2:3])))
    smp = st @ win
    acc += smp
    gnp_out[z0:z0 + WZ, y0:y0 + WY, x0:x0 + WX] += (
        (st.T @ smp).reshape(WZ, WY, WX, C))

err = np.abs(np.asarray(out) - acc).max() / (np.abs(acc).max() + 1e-9)
gerr = np.abs(np.asarray(gout).reshape(D, H, W, C) - gnp_out).max() / (
    np.abs(gnp_out).max() + 1e-9)
print(f"sample rel err: {err:.2e}   splat rel err: {gerr:.2e}")

t0 = time.perf_counter()
for _ in range(5):
    out, gout = f(tab, pts, grid, gz)
jax.block_until_ready(out)
t = (time.perf_counter() - t0) / 5 / args.iters
print(f"per chunk (fw+bw sampling, M={M}): {t*1e6:.2f} us  "
      f"-> per sample {t/M*1e9:.2f} ns "
      f"(256^2x256smp => {t/M*16.8e6*1e3:.1f} ms for fw+bw sampling)")
