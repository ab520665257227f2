import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _run_splatter, lightplane_splatter_raw

rng = np.random.default_rng(0)

R = 16
gs = (1, 48, 40, 56, 8)
origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
d = targets - origins
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = Rays(
    directions=jnp.asarray(d),
    origins=jnp.asarray(origins),
    grid_idx=jnp.zeros((R,), jnp.int32),
    near=jnp.full((R,), 0.1, jnp.float32),
    far=jnp.full((R,), 3.0, jnp.float32),
    encoding=jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32)),
)


def raw(impl):
    return lightplane_splatter_raw(
        rays, [gs], num_samples=33, num_samples_inf=0,
        mask_out_of_bounds_samples=True, impl=impl,
    )


f_ref, w_ref = jax.jit(lambda: raw("naive"))()
f_srt, w_srt = jax.jit(lambda: raw("sorted"))()
f_ref, w_ref, f_srt, w_srt = map(np.asarray, (f_ref, w_ref, f_srt, w_srt))

for name, a, b in (("feat", f_ref, f_srt), ("weight", w_ref, w_srt)):
    d_ = np.abs(a - b)
    print(f"{name}: max|d|={d_.max():.3e} mean|d|={d_.mean():.3e} "
          f"ref_sum={a.sum():.4f} srt_sum={b.sum():.4f} "
          f"nnz_ref={(np.abs(a).sum(1) > 0).sum()} nnz_srt={(np.abs(b).sum(1) > 0).sum()}")

D, H, W = 48, 40, 56
bad = np.argwhere(np.abs(w_ref - w_srt)[:, 0] > 1e-4)[:20, 0]
for v in bad[:12]:
    z, y, x = v // (H * W), (v // W) % H, v % W
    print(f"cell z={z} y={y} x={x}: w_ref={w_ref[v,0]:.4f} w_srt={w_srt[v,0]:.4f}")
