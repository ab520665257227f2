import time, sys, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import lightplane_tpu as lt
from benchmarks.splatter_speed import make_rays

nv = 16
rays = make_rays(jax.random.PRNGKey(0), nv, 128, 64)
sizes = [(1, 160, 160, 160, 64)]
for impl in (sys.argv[1:] or ["big", "sorted"]):
    def fwd(enc):
        r = dataclasses.replace(rays, encoding=enc)
        return lt.lightplane_splatter(r, sizes, num_samples=96,
                                      return_list=False, impl=impl)
    f = jax.jit(fwd)
    t0 = time.perf_counter()
    try:
        out = f(rays.encoding); jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(rays.encoding); jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"[{impl}] fw OK compile={tc:.0f}s run={dt*1e3:.1f}ms", flush=True)
    except Exception as e:
        print(f"[{impl}] FAIL {type(e).__name__}: {' '.join(str(e).split())[:300]}", flush=True)
    del f, fwd
