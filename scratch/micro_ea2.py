"""Prototype: EA in [Mq, P]-native packed layout vs current sequential EA.

Backlog #1 from PERF_NOTES: the current EA extracts per-step [B, 1]
columns from the packed decoder output (P masked reduces + sublane
slices) and runs a K-step serial chain (exp-carry).  The native variant
keeps everything in the decoder's packed [Mq, P] layout: a two-level
prefix (running adds over the Kp row blocks + one tiny strict-triangular
lane matmul over the P pack columns), TWO [Mq, P] exps per chunk, and a
direct w_pack -> w_exp expansion matmul for the color reduction.

Headline bench geometry: B=256 rays/block, K=16 chunk, P=4 packs,
Kp=4, Mq=1024, 16 chunks (256 samples), 256 blocks (65536 rays).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as _np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
K = 16
P = 4
Kp = K // P
Mq = Kp * B
N_CHUNKS = 16
N_BLOCKS = 256
Nc = 16

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _chain(f, x, rest, n):
    for _ in range(n):
        out = f(x, *rest)
        x = x + jnp.tile(out * 1e-12,
                         (x.shape[0] // out.shape[0], x.shape[1]))
    return _np.asarray(out[:1])


def timeit(f, *args, n=20):
    x, rest = args[0], args[1:]
    _chain(f, x, rest, 1)
    t0 = time.perf_counter(); _chain(f, x, rest, 1)
    t1 = time.perf_counter(); _chain(f, x, rest, n + 1)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / n


def bench_kernel(name, body, extra_in=()):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]

        def loop(ci, acc):
            return acc + body(x_ref, refs[:-1], ci)

        acc = jax.lax.fori_loop(
            0, N_CHUNKS, loop, jnp.zeros((B, 1), jnp.float32)
        )
        out_ref[:] = acc

    x = jax.random.normal(jax.random.PRNGKey(0), (N_BLOCKS * Mq, P)) * 0.01
    in_specs = [pl.BlockSpec((Mq, P), lambda b: (b, 0),
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
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def _bk_cols(a_bk):
    Kl = a_bk.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Kl), 1)
    return [
        jnp.sum(jnp.where(lane == k, a_bk, 0), axis=1, keepdims=True)
        for k in range(Kl)
    ]


def _block_row(q, w):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P * w), 1)
    return ((lane >= q * w) & (lane < (q + 1) * w)).astype(jnp.float32)


# color_pack and reduce matrix shared by both variants
def _reduce_mat(w):
    r = jax.lax.broadcasted_iota(jnp.int32, (P * w, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (P * w, w), 1)
    return (r % w == c).astype(jnp.float32)


# ---- 1. current EA: extract per-step [B,1] cols, serial exp-carry ----
def ea_current(x_ref, extra, ci):
    color_pack = extra[0][:]
    sigma_cols = x_ref[:] + ci.astype(jnp.float32) * 1e-6   # [Mq, P]
    sig_q = _bk_cols(sigma_cols)
    nlt = jnp.zeros((B, 1), jnp.float32)
    depth = jnp.zeros((B, 1), jnp.float32)
    w_ks = []
    T_carry = jnp.exp(-nlt)
    for k in range(K):
        q, j = k // Kp, k % Kp
        sig_k = sig_q[q][j * B: (j + 1) * B]
        nlt = nlt + sig_k * 0.01
        T_new = jnp.exp(-nlt)
        w = T_carry - T_new
        T_carry = T_new
        depth = depth + w * 0.5
        w_ks.append(w)
    # _packed_ea_color: stack K cols -> P cols [Mq,1], expand over Nc
    cols_q = [
        jnp.concatenate(w_ks[q * Kp: (q + 1) * Kp], axis=0)
        for q in range(P)
    ]
    w_exp = None
    for q, cq in enumerate(cols_q):
        t = cq * _block_row(q, Nc)
        w_exp = t if w_exp is None else w_exp + t
    red = jnp.dot(w_exp * color_pack, _reduce_mat(Nc),
                  preferred_element_type=jnp.float32)
    out = None
    for j in range(Kp):
        t = red[j * B: (j + 1) * B]
        out = t if out is None else out + t
    return depth + jnp.sum(out, axis=1, keepdims=True)


# ---- 2. [Mq, P]-native EA: two-level prefix, 2 exps ----
def _strict_tri():
    r = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    return (r < c).astype(jnp.float32)


def _expander():
    # [P, P*Nc]: column q -> block q's Nc lanes
    r = jax.lax.broadcasted_iota(jnp.int32, (P, P * Nc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (P, P * Nc), 1)
    return (c // Nc == r).astype(jnp.float32)


def _exact_dot(x, m):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return (
        jnp.dot(hi, m, preferred_element_type=jnp.float32)
        + jnp.dot(x - hi, m, preferred_element_type=jnp.float32)
    )


def ea_native(x_ref, extra, ci):
    color_pack = extra[0][:]
    X = (x_ref[:] + ci.astype(jnp.float32) * 1e-6) * 0.01   # [Mq, P]
    # within-pack running sums over the Kp row blocks (inclusive)
    blocks = [X[j * B: (j + 1) * B] for j in range(Kp)]
    run = []
    s = None
    for j in range(Kp):
        s = blocks[j] if s is None else s + blocks[j]
        run.append(s)
    tot = s                                                # [B, P]
    # strict cumsum over pack columns (earlier packs hold earlier steps)
    cum_q = _exact_dot(tot, _strict_tri())                 # [B, P]
    incl = jnp.concatenate([r + cum_q for r in run], axis=0)  # [Mq, P]
    excl = incl - X
    T_in = jnp.exp(-incl)
    T_ex = jnp.exp(-excl)
    w_pack = T_ex - T_in                                   # [Mq, P]
    # depth: sum over all steps (block rows + pack lanes)
    dsum = None
    wt = w_pack * 0.5
    for j in range(Kp):
        t = wt[j * B: (j + 1) * B]
        dsum = t if dsum is None else dsum + t
    depth = jnp.sum(dsum, axis=1, keepdims=True)
    # color: expand w_pack over Nc lanes with one placement matmul
    w_exp = _exact_dot(w_pack, _expander())                # [Mq, P*Nc]
    red = jnp.dot(w_exp * color_pack, _reduce_mat(Nc),
                  preferred_element_type=jnp.float32)
    out = None
    for j in range(Kp):
        t = red[j * B: (j + 1) * B]
        out = t if out is None else out + t
    return depth + jnp.sum(out, axis=1, keepdims=True)


# ---- 3. native, default-precision matmuls (no bf16x2 split) ----
def ea_native_fast(x_ref, extra, ci):
    color_pack = extra[0][:]
    X = (x_ref[:] + ci.astype(jnp.float32) * 1e-6) * 0.01
    blocks = [X[j * B: (j + 1) * B] for j in range(Kp)]
    run = []
    s = None
    for j in range(Kp):
        s = blocks[j] if s is None else s + blocks[j]
        run.append(s)
    cum_q = jnp.dot(s, _strict_tri(), preferred_element_type=jnp.float32)
    incl = jnp.concatenate([r + cum_q for r in run], axis=0)
    excl = incl - X
    w_pack = jnp.exp(-excl) - jnp.exp(-incl)
    wt = w_pack * 0.5
    dsum = None
    for j in range(Kp):
        t = wt[j * B: (j + 1) * B]
        dsum = t if dsum is None else dsum + t
    depth = jnp.sum(dsum, axis=1, keepdims=True)
    w_exp = jnp.dot(w_pack, _expander(), preferred_element_type=jnp.float32)
    red = jnp.dot(w_exp * color_pack, _reduce_mat(Nc),
                  preferred_element_type=jnp.float32)
    out = None
    for j in range(Kp):
        t = red[j * B: (j + 1) * B]
        out = t if out is None else out + t
    return depth + jnp.sum(out, axis=1, keepdims=True)


if __name__ == "__main__":
    cp = jnp.ones((Mq, P * Nc), jnp.float32) * 0.01
    bench_kernel("EA current (extract + serial exp-carry)", ea_current,
                 (cp,))
    bench_kernel("EA [Mq,P]-native (bf16x2 matmuls)", ea_native, (cp,))
    bench_kernel("EA [Mq,P]-native (default precision)", ea_native_fast,
                 (cp,))
