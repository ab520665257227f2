import time, jax, jax.numpy as jnp, dataclasses, sys
sys.path.insert(0, "/root/repo")
import lightplane_tpu as lt
from benchmarks.splatter_speed import make_rays
from benchmarks.renderer_speed import peak_mem_mb

d = jax.devices()[0]
try:
    ms = d.memory_stats()
    print("HBM bytes_limit:", ms.get("bytes_limit"), "in_use:", ms.get("bytes_in_use"))
except Exception as e:
    print("memstats err", e)

for nv in [4, 16]:
    rays = make_rays(jax.random.PRNGKey(0), nv, 128, 64)
    sizes = [(1, 160, 160, 160, 64)]
    def fwd(enc):
        r = dataclasses.replace(rays, encoding=enc)
        return lt.lightplane_splatter(r, sizes, num_samples=96, return_list=False, impl="auto")
    f = jax.jit(fwd)
    try:
        out = f(rays.encoding); jax.block_until_ready(out)
        t0=time.perf_counter()
        out = f(rays.encoding); jax.block_until_ready(out)
        dt=time.perf_counter()-t0
        print(f"views={nv} fw ok {dt*1e3:.1f} ms peak={peak_mem_mb():.0f} MB")
    except Exception as e:
        print(f"views={nv} fw FAIL {type(e).__name__}: {str(e)[:200]}")
    del f
