import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, k, out_shape, *inputs, check=None, time_it=False):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(k, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*a))
        r = f(*inputs); jax.block_until_ready(r)
        ok = "OK"
        if check is not None:
            ok = "OK+CORRECT" if np.allclose(np.asarray(r), check) else "OK but WRONG VALUES"
        msg = f"[{ok}] {name}"
        if time_it:
            t0 = time.perf_counter()
            for _ in range(20):
                r = f(*inputs)
            jax.block_until_ready(r)
            msg += f" ({(time.perf_counter()-t0)/20*1e6:.0f} us)"
        print(msg)
    except Exception as e:
        print(f"[FAIL] {name}: {str(e).splitlines()[0][:130]}")

def k_taa1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

for V in [256, 1024, 8192, 32768]:
    C = 8
    t = jnp.arange(C*V, dtype=jnp.float32).reshape(C, V)
    idx = ((jnp.arange(V, dtype=jnp.int32) * 48271) % V)[None, :]
    idx = jnp.broadcast_to(idx, (C, V)).astype(jnp.int32)
    expect = np.asarray(t)[np.arange(C)[:, None], np.asarray(idx)]
    probe(f"taa lanes same-shape [C=8,{V}]", k_taa1,
          jax.ShapeDtypeStruct((C, V), jnp.float32), t, idx,
          check=expect, time_it=True)

def k_taa2(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

for V in [1024, 32768]:
    C, B = 32, 1024
    t = jnp.arange(C*V, dtype=jnp.float32).reshape(C, V)
    idx = jnp.broadcast_to(((jnp.arange(B, dtype=jnp.int32)*7919) % V)[None, :], (C, B)).astype(jnp.int32)
    probe(f"taa table [32,{V}] idx [32,1024]", k_taa2,
          jax.ShapeDtypeStruct((C, B), jnp.float32), t, idx)
