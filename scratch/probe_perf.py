import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(name, fn, *args, iters=5):
    fn = jax.jit(fn)
    try:
        out = fn(*args); jax.block_until_ready(out)
        t0=time.perf_counter()
        for _ in range(iters): out = fn(*args)
        jax.block_until_ready(out)
        dt=(time.perf_counter()-t0)/iters
        print(f"[TIME] {name}: {dt*1e3:.2f} ms")
        return dt
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e).splitlines()[0][:150]}")

R, S8, V, C = 65536, 8, 3072, 32   # one march step: R rays, 8 corners..., triplane V
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (R*8,), 0, V)
vals = jax.random.normal(key, (R*8, C))
table = jax.random.normal(key, (V, C))

bench("XLA gather R*8 rows from [3072,32]", lambda i: jnp.take(table, i, axis=0), idx)
bench("XLA scatter-add R*8 rows into [3072,32]", 
      lambda i, v: jnp.zeros((V, C)).at[i].add(v), idx, vals)
bench("XLA segment_sum R*8 into [3072,32]",
      lambda i, v: jax.ops.segment_sum(v, i, num_segments=V), idx, vals)
idx_sorted = jnp.sort(idx)
bench("XLA scatter-add SORTED idx", lambda i, v: jnp.zeros((V, C)).at[i].add(v), idx_sorted, vals)
# big voxel
V2 = 160*160*160
idx2 = jax.random.randint(key, (R*8,), 0, V2)
table2 = jax.random.normal(key, (V2, 64))
vals2 = jax.random.normal(key, (R*8, 64))
bench("XLA gather R*8 rows from [160^3,64]", lambda i: jnp.take(table2, i, axis=0), idx2)
bench("XLA scatter-add R*8 into [160^3,64]", lambda i, v: jnp.zeros((V2, 64)).at[i].add(v), idx2, vals2)

# Mosaic gather shape probes
def probe(name, k, out_shape, *inputs):
    try:
        r = pl.pallas_call(k, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*inputs)
        jax.block_until_ready(r); print(f"[OK] {name}")
        return True
    except Exception as e:
        print(f"[FAIL] {name}: {str(e).splitlines()[0][:120]}")

def k1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
t = jnp.arange(32*1024, dtype=jnp.float32).reshape(32, 1024)
i = (jnp.arange(32*1024, dtype=jnp.int32).reshape(32,1024)*7) % 1024
probe("taa same-shape [32,1024] axis=1", k1, jax.ShapeDtypeStruct((32,1024), jnp.float32), t, i)

def k2(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
t2 = jnp.arange(1024*128, dtype=jnp.float32).reshape(1024, 128)
i2 = (jnp.arange(1024*128, dtype=jnp.int32).reshape(1024,128)*7) % 1024
probe("taa same-shape [1024,128] axis=0", k2, jax.ShapeDtypeStruct((1024,128), jnp.float32), t2, i2)
