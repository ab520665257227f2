"""Is the relu_field g_mlp diff fp noise or a pallas bug?  Compare both
f32 paths against a float64 scan oracle (CPU), on IDENTICAL inputs."""
import dataclasses, os, pickle, sys

mode = sys.argv[1]  # "tpu" (dump inputs + f32 grads) or "cpu64" (compare)
if mode == "cpu64":
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import lightplane_tpu as lt

if mode == "cpu64":
    jax.config.update("jax_enable_x64", True)

PKL = "/tmp/relufield_io.pkl"


def build_loss(rays, grid, cgrid, dp, dtype):
    def loss(impl, mp):
        r = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, rays)
        g = [x.astype(dtype) for x in grid]
        cg = [x.astype(dtype) for x in cgrid]
        d = dataclasses.replace(dp, mlp_params=mp.astype(dtype))
        out = lt.lightplane_renderer(
            r, g, d, num_samples=8, gain=1.3, color_grid=cg, impl=impl)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out))
    return loss


if mode == "tpu":
    sys.path.insert(0, "/root/repo/tests")
    from utils import random_rays, random_grid, random_decoder_params

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dp = random_decoder_params(k3, input_chn=16, hidden_chn=16,
                               n_layers_trunk=0,
                               use_separate_color_grid=True)
    rays = random_rays(k1, 600, 1, encoding_dim=dp.n_hidden_color[0])
    grid = random_grid(k2, 1, 16, 8, "triplane", scale=0.5)
    cgrid = random_grid(k4, 1, 16, 8, "triplane", scale=0.5)

    loss = build_loss(rays, grid, cgrid, dp, jnp.float32)
    g_scan = jax.jit(jax.grad(lambda mp: loss("scan", mp)))(dp.mlp_params)
    g_pall = jax.jit(jax.grad(lambda mp: loss("pallas", mp)))(dp.mlp_params)
    blob = {
        "rays": jax.tree_util.tree_map(np.asarray, rays),
        "grid": [np.asarray(x) for x in grid],
        "cgrid": [np.asarray(x) for x in cgrid],
        "dp_nh": (dp.n_hidden_trunk, dp.n_hidden_opacity,
                  dp.n_hidden_color, dp.color_chn),
        "mlp": np.asarray(dp.mlp_params),
        "scan": np.asarray(g_scan),
        "pallas": np.asarray(g_pall),
    }
    with open(PKL, "wb") as f:
        pickle.dump(blob, f)
    print("dumped inputs + f32 grads")
else:
    from lightplane_tpu.ops.mlp_utils import DecoderParams

    with open(PKL, "rb") as f:
        blob = pickle.load(f)
    rays = jax.tree_util.tree_map(jnp.asarray, blob["rays"])
    grid = [jnp.asarray(x) for x in blob["grid"]]
    cgrid = [jnp.asarray(x) for x in blob["cgrid"]]
    nh_t, nh_o, nh_c, cchn = blob["dp_nh"]
    dp = DecoderParams(jnp.asarray(blob["mlp"]), nh_t, nh_o, nh_c,
                       color_chn=cchn)
    loss = build_loss(rays, grid, cgrid, dp, jnp.float64)
    g64 = jax.jit(jax.grad(lambda mp: loss("scan", mp)))(dp.mlp_params)
    g64 = np.asarray(g64, np.float64)
    print("g64 dtype-magnitude:", np.abs(g64).max())
    for nm in ("scan", "pallas"):
        diff = np.abs(blob[nm].astype(np.float64) - g64)
        print(f"{nm} vs f64: max {diff.max():.4e} mean {diff.mean():.4e}")
    dd = np.abs(blob["scan"].astype(np.float64) - blob["pallas"])
    print(f"scan vs pallas: max {dd.max():.4e} mean {dd.mean():.4e}")
