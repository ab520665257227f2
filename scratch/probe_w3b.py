"""Probe the W3 kernel building blocks end-to-end in one toy kernel:
HBM 4D grid -> per-chunk box DMA -> x-window slice + reshape -> stencil
matmul -> (bw) RMW splat back to HBM.  Checks numerics vs numpy."""
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
p.add_argument("--M", type=int, default=1024)
p.add_argument("--iters", type=int, default=32)
p.add_argument("--interpret", action="store_true")
args = p.parse_args()

D = H = W = args.D
C = args.C
WZ = WY = WX = 8
CELLS = WZ * WY * WX
M = args.M


def kernel(tab_ref, pts_ref, grid_hbm, _gz_hbm, out_ref, gout_hbm, box,
           gbox, sem):
    def body(ci, acc):
        z0 = tab_ref[0, 3 * ci]
        y0 = tab_ref[0, 3 * ci + 1]
        x0 = tab_ref[0, 3 * ci + 2]
        cp = pltpu.make_async_copy(
            grid_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], box, sem)
        cp.start()
        cp.wait()
        g_win = box[:, :, pl.ds(x0, WX), :].reshape(CELLS, C)
        li = jax.lax.broadcasted_iota(jnp.int32, (1, CELLS), 1)
        xv = (li % WX).astype(jnp.float32) + x0.astype(jnp.float32)
        yv = ((li // WX) % WY).astype(jnp.float32) + y0.astype(jnp.float32)
        zv = (li // (WX * WY)).astype(jnp.float32) + z0.astype(jnp.float32)
        f = pts_ref[:, :] + ci.astype(jnp.float32) * 0.1
        fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
        st = (jnp.maximum(0.0, 1.0 - jnp.abs(xv - fx))
              * jnp.maximum(0.0, 1.0 - jnp.abs(yv - fy))
              * jnp.maximum(0.0, 1.0 - jnp.abs(zv - fz)))
        smp = jnp.dot(st, g_win, preferred_element_type=jnp.float32)
        # splat side: RMW the gradient box in HBM
        upd = jax.lax.dot_general(
            st, smp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cp2 = pltpu.make_async_copy(
            gout_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], gbox, sem)
        cp2.start()
        cp2.wait()
        gbox[:, :, pl.ds(x0, WX), :] += upd.reshape(WZ, WY, WX, C)
        cp3 = pltpu.make_async_copy(
            gbox, gout_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], sem)
        cp3.start()
        cp3.wait()
        return acc + smp

    acc = jax.lax.fori_loop(
        0, args.iters, body, jnp.zeros((M, C), jnp.float32))
    out_ref[:, :] = acc


grid = jax.random.normal(jax.random.PRNGKey(0), (D, H, W, C))
gz = jnp.zeros((D, H, W, C))
pts = jax.random.uniform(jax.random.PRNGKey(1), (M, 3)) * (WX - 2) + 1.0
tab = jax.random.randint(jax.random.PRNGKey(2), (1, 3 * args.iters), 0,
                         D - 8, dtype=jnp.int32)
tab = ((tab // 1) * 1)

f = jax.jit(lambda t_, p_, g_, z_: pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY),
              ],
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pl.ANY)],
    out_shape=[jax.ShapeDtypeStruct((M, C), jnp.float32),
               jax.ShapeDtypeStruct((D, H, W, C), jnp.float32)],
    scratch_shapes=[pltpu.VMEM((WZ, WY, W, C), jnp.float32),
                    pltpu.VMEM((WZ, WY, W, C), jnp.float32),
                    pltpu.SemaphoreType.DMA],
    input_output_aliases={3: 1},
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
    interpret=args.interpret,
)(t_, p_, g_, z_))

out, gout = f(tab, pts, grid, gz)
jax.block_until_ready(out)

# numpy check
gnp = np.asarray(grid)
tabn = np.asarray(tab)[0]
ptsn = np.asarray(pts)
acc = np.zeros((M, C), np.float32)
gnp_out = np.zeros((D, H, W, C), np.float32)
for ci in range(args.iters):
    z0, y0, x0 = tabn[3 * ci], tabn[3 * ci + 1], tabn[3 * ci + 2]
    win = gnp[z0:z0 + WZ, y0:y0 + WY, x0:x0 + WX].reshape(CELLS, C)
    li = np.arange(CELLS)
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
gerr = np.abs(np.asarray(gout) - gnp_out).max() / (
    np.abs(gnp_out).max() + 1e-9)
print(f"sample rel err: {err:.2e}   splat rel err: {gerr:.2e}")

t0 = time.perf_counter()
for _ in range(5):
    out, gout = f(tab, pts, grid, gz)
jax.block_until_ready(out)
t = (time.perf_counter() - t0) / 5 / args.iters
print(f"per chunk (DMA x3 + slice + stencil + 2 matmuls + RMW): "
      f"{t*1e6:.2f} us  -> per sample {t/M*1e9:.2f} ns")
