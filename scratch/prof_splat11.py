"""Old (round-3) sorted_plan timing under the clean harness."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")
import jax, jax.numpy as jnp, numpy as np
import old_ss as ss
from lightplane_tpu.ops.splatter import _SplatCfg, _sorted_chunk_shape
from benchmarks.splatter_speed import make_rays

GRID, CHN, NS, VIEWS = 160, 64, 96, 16
rays = make_rays(jax.random.PRNGKey(0), VIEWS, 128, CHN)
R = rays.directions.shape[0]
cfg = _SplatCfg(num_samples=NS, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, output_grid_sizes=((1, GRID, GRID, GRID, CHN),),
    input_grid_sizes=None, n_hidden=())
(geo,) = ss.sorted_geos(cfg)
n_chunks, chunk_r = _sorted_chunk_shape(R, NS)
valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)
enc_c = rays.encoding[:chunk_r]
print(f"OLD chunk_r={chunk_r} chunks={n_chunks}", flush=True)

def bench(name, fn, n=6):
    fn(); fn()
    t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
    for _ in range(n): fn()
    t2 = time.perf_counter()
    print(f"{name}: {(t2-t1)/n*1e3:.1f} ms (single {(t1-t0)*1e3:.1f})",
          flush=True)

plan_j = jax.jit(lambda *g: ss.sorted_plan(cfg, geo, g, want_pos=True))
def run_plan():
    p = plan_j(*geom_c)
    np.asarray(p["fzT"][:1, :1])
bench("OLD plan (want_pos)", run_plan)

planv_j = jax.jit(lambda *g: (
    lambda p: (p, ss.sorted_vals(geo, p, g[-1], g[5]))
)(ss.sorted_plan(cfg, geo, g[:-1], want_pos=True)))
def run_planv():
    p, v = planv_j(*(geom_c + (enc_c,)))
    np.asarray(p["fzT"][:1, :1])
bench("OLD plan+vals (want_pos)", run_planv)

# old fw kernel with donated acc
plan = plan_j(*geom_c)
plan = {k: jax.device_put(v) for k, v in plan.items()}
vals = jax.jit(lambda e: ss.sorted_vals(geo, plan, e, valid))(enc_c)
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
fwk = jax.jit(lambda a, v: ss.sorted_splat_acc(cfg, geo, plan, v, a),
              donate_argnums=0)
st = {"a": fwk(acc0, vals)}
jax.block_until_ready(st["a"])
def run_fwk():
    st["a"] = fwk(st["a"], vals)
    np.asarray(st["a"][:1, :1, :1, :1])
bench("OLD fw kernel (donated)", run_fwk)
