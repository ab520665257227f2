"""Probe Mosaic capabilities needed for the renderer kernel design."""
import functools, time
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
        msg = str(e).split('\n')[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False

# 1) dynamic gather via jnp.take from VMEM table (vector of row indices)
def k_take(table_ref, idx_ref, out_ref):
    idx = idx_ref[:]                      # [128] int32
    out_ref[:] = jnp.take(table_ref[:], idx, axis=0)  # [128, 128]

def t_take():
    table = jnp.arange(1024*128, dtype=jnp.float32).reshape(1024, 128)
    idx = jnp.arange(128, dtype=jnp.int32) * 7 % 1024
    return pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

# 2) gather with 2D idx via take_along_axis (per-element)
def k_taa(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

def t_taa():
    table = jnp.arange(1024*128, dtype=jnp.float32).reshape(1024, 128)
    idx = (jnp.arange(128*128, dtype=jnp.int32).reshape(128,128) * 13) % 1024
    return pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

# 3) gather from a 1-lane-shaped flat table [V, 1]? (flat scalar-ish gather)
def k_take_flat(table_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    out_ref[:] = jnp.take(table_ref[:], idx, axis=0)

def t_take_flat():
    table = jnp.arange(32768, dtype=jnp.float32).reshape(32768, 1)
    idx = (jnp.arange(128, dtype=jnp.int32) * 251) % 32768
    return pl.pallas_call(
        k_take_flat,
        out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

# 4) scatter-add into VMEM ref with dynamic vector idx: out[idx] += val
def k_scatter(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    idx = idx_ref[:]
    cur = jnp.take(out_ref[:], idx, axis=0)
    # note: real scatter needs add at indices; try .at[].add on a value then write back
    out_ref[:] = jnp.zeros_like(out_ref).at[idx].add(val_ref[:])

def t_scatter():
    idx = (jnp.arange(128, dtype=jnp.int32) * 3) % 256
    val = jnp.ones((128, 128), jnp.float32)
    return pl.pallas_call(
        k_scatter,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, val)

report("take(table[1024,128], idx[128])", t_take)
report("take_along_axis(table, idx[128,128])", t_taa)
report("take(flat[32768,1], idx[128])", t_take_flat)
report("vmem scatter-add .at[idx].add", t_scatter)
