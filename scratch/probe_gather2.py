import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def report(name, fn):
    try:
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK] {name} ({time.time()-t0:.1f}s) -> {jnp.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split('\n')[0][:220]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False

def mk_lane_gather(V, R=128, C=8):
    # table [C, V], idx [C, R] -> out [C, R]  via take_along_axis on last axis
    def k(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=1)
    def t():
        table = jnp.arange(C*V, dtype=jnp.float32).reshape(C, V)
        idx = jnp.broadcast_to((jnp.arange(R, dtype=jnp.int32) * 97) % V, (C, R))
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((C, R), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)
    return t

report("lane-gather V=128", mk_lane_gather(128))
report("lane-gather V=1024", mk_lane_gather(1024))
report("lane-gather V=32768", mk_lane_gather(32768))
report("lane-gather V=32768 C=32", mk_lane_gather(32768, C=32))

# sublane gather: table [V, 128], idx [8, 128], gather rows where V==8? same-shape only?
def k_sub(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)
def t_sub():
    table = jnp.arange(8*128, dtype=jnp.float32).reshape(8, 128)
    idx = (jnp.arange(8*128, dtype=jnp.int32).reshape(8,128)*3) % 8
    return pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
report("sublane same-shape gather 8x128", t_sub)

# one-hot matmul gather timing for comparison (V=1024, C=32, R=128, 100 iters in-kernel)
def k_onehot(table_ref, idx_ref, out_ref):
    idx = idx_ref[:]  # [1, R]
    V = table_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, V), 1)
    onehot = (iota == idx.reshape(128, 1)).astype(jnp.float32)
    out_ref[:] = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)
def t_onehot():
    table = jnp.arange(1024*32, dtype=jnp.float32).reshape(1024, 32)
    idx = (jnp.arange(128, dtype=jnp.int32) * 97) % 1024
    return pl.pallas_call(
        k_onehot,
        out_shape=jax.ShapeDtypeStruct((128, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
report("one-hot matmul gather V=1024 C=32", t_onehot)
