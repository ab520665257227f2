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
            ok = "OK+CORRECT" if np.allclose(np.asarray(r), check) else "OK but WRONG"
    except Exception as e:
        print(f"[FAIL] {name}: {str(e).splitlines()[0][:120]}")
        return
    msg = f"[{ok}] {name}"
    if time_it:
        t0 = time.perf_counter()
        for _ in range(50):
            r = f(*inputs)
        jax.block_until_ready(r)
        msg += f" ({(time.perf_counter()-t0)/50*1e6:.0f} us/call)"
    print(msg)

def k_sub(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

for V, C in [(1024, 128), (1024, 32), (4096, 128), (32768, 128)]:
    t = (jnp.arange(V, dtype=jnp.float32)[:, None]
         + jnp.zeros((1, C)))  # row r filled with value r
    rowidx = (jnp.arange(V, dtype=jnp.int32) * 48271) % V
    idx = jnp.broadcast_to(rowidx[:, None], (V, C)).astype(jnp.int32)
    expect = np.asarray(rowidx, dtype=np.float32)[:, None] + np.zeros((1, C), np.float32)
    probe(f"taa sublanes same-shape [{V},{C}] axis=0", k_sub,
          jax.ShapeDtypeStruct((V, C), jnp.float32), t, idx,
          check=expect, time_it=True)

# 32 separate loop-gathers inside one kernel (march-step simulation):
# 1024x128 gather repeated 32 times with different idx
def k_loop(t_ref, i_ref, o_ref):
    def body(s, acc):
        idx = (i_ref[:] + s) % t_ref.shape[0]
        return acc + jnp.take_along_axis(t_ref[:], idx, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, 32, body, jnp.zeros_like(t_ref))

V, C = 1024, 128
t = jnp.arange(V*C, dtype=jnp.float32).reshape(V, C)
idx = jnp.broadcast_to(((jnp.arange(V, dtype=jnp.int32)*48271) % V)[:, None], (V, C)).astype(jnp.int32)
probe("32x looped sublane gathers [1024,128]", k_loop,
      jax.ShapeDtypeStruct((V, C), jnp.float32), t, idx, time_it=True)
