"""Packing round-trips and shape bookkeeping for the MLP parameter ABI."""

import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu import (
    MIN_BLOCK_SIZE,
    calc_harmonic_embedding,
    calc_harmonic_embedding_dim,
    flatten_decoder_params,
    flattened_decoder_params_to_list,
    flattened_triton_decoder_to_list,
    get_triton_function_input_dims,
    init_decoder_params,
    init_splatter_params,
)
from lightplane_tpu.ops.mlp_utils import _flattened_one_mlp_params_to_list


def test_decoder_roundtrip():
    key = jax.random.PRNGKey(0)
    dp = init_decoder_params(
        key, n_layers_opacity=2, n_layers_trunk=3, n_layers_color=2,
        input_chn=16, hidden_chn=32, color_chn=3,
    )
    assert dp.n_hidden_trunk == (16, 32, 32, 32)
    assert dp.n_hidden_opacity == (32, 32, 1)
    # color output padded to MIN_BLOCK_SIZE
    assert dp.n_hidden_color == (32, 32, MIN_BLOCK_SIZE)
    assert dp.color_chn == 3

    wt, bt, wo, bo, wc, bc = flattened_decoder_params_to_list(
        dp.mlp_params, dp.n_hidden_trunk, dp.n_hidden_opacity,
        dp.n_hidden_color,
    )
    assert [w.shape for w in wt] == [(16, 32), (32, 32), (32, 32)]
    assert [w.shape for w in wo] == [(32, 32), (32, 1)]
    assert [w.shape for w in wc] == [(32, 32), (32, 16)]
    # padded color rows are zero
    assert np.allclose(np.asarray(wc[-1])[:, 3:], 0.0)
    assert np.allclose(np.asarray(bc[-1])[3:], 0.0)

    flat2, nt, no, nc = flatten_decoder_params(
        wt, bt, wo, bo, wc, bc, pad_color_channels_to_min_block_size=False
    )
    assert np.allclose(np.asarray(flat2), np.asarray(dp.mlp_params))
    assert (nt, no, nc) == (
        dp.n_hidden_trunk, dp.n_hidden_opacity, dp.n_hidden_color
    )


def test_no_trunk_decoder():
    dp = init_decoder_params(
        jax.random.PRNGKey(1), n_layers_opacity=2, n_layers_trunk=0,
        n_layers_color=2, input_chn=16, hidden_chn=32, color_chn=4,
        use_separate_color_grid=True,
    )
    assert dp.n_hidden_trunk == ()
    assert dp.n_hidden_opacity[0] == 16  # reads grid features directly
    dims = get_triton_function_input_dims(
        dp.n_hidden_trunk, dp.n_hidden_opacity, dp.n_hidden_color
    )
    assert dims[3] == 0  # no trunk layers
    assert dims[4] == 2 and dims[5] == 2
    assert dims[6] == MIN_BLOCK_SIZE


def test_splatter_roundtrip():
    sp = init_splatter_params(
        jax.random.PRNGKey(2), n_layers=3, input_chn=8, hidden_chn=16,
        out_chn=32,
    )
    assert sp.n_hidden == (8, 16, 16, 32)
    w, b = _flattened_one_mlp_params_to_list(sp.mlp_params, sp.n_hidden)
    assert [x.shape for x in w] == [(8, 16), (16, 16), (16, 32)]
    assert [x.shape for x in b] == [(16,), (16,), (32,)]


def test_triton_decoder_to_list_parity():
    dp = init_decoder_params(
        jax.random.PRNGKey(3), n_layers_opacity=2, n_layers_trunk=2,
        n_layers_color=2, input_chn=8, hidden_chn=16, color_chn=3,
    )
    a = flattened_decoder_params_to_list(
        dp.mlp_params, dp.n_hidden_trunk, dp.n_hidden_opacity,
        dp.n_hidden_color,
    )
    b = flattened_triton_decoder_to_list(
        dp.mlp_params, 2, 2, 2, input_chn=8, hidden_chn=16,
        color_chn=MIN_BLOCK_SIZE,
    )
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert np.allclose(np.asarray(x), np.asarray(y))


def test_harmonic_embedding():
    d = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    for n in [0, 2, 3]:
        e = calc_harmonic_embedding(d, n)
        assert e.shape == (5, calc_harmonic_embedding_dim(n))
    # n=0 returns directions unchanged
    assert np.allclose(np.asarray(calc_harmonic_embedding(d, 0)), d)
