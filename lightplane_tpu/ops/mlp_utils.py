"""Decoder / splatter MLP parameter packing.

The tiny in-loop MLPs (trunk / opacity / color for the renderer, one MLP for
the splatter) are stored as a single flat 1-D ``mlp_params`` vector — the same
ABI as the reference (``lightplane/mlp_utils.py:20-185``) — plus *static*
layer-shape tuples (``n_hidden_*``).  Keeping the shapes static (pytree aux
data, not arrays) means every distinct MLP architecture specializes the jitted
kernels exactly like the reference's COG codegen variants, with JAX's
compilation cache playing the role of the generated-file cache
(SURVEY.md §7 "no runtime codegen").

Weight layout per MLP (right-multiplying, ``out = in @ W + b``)::

    [W_0.flatten(), ..., W_{L-1}.flatten(), b_0, ..., b_{L-1}]

and the decoder concatenates trunk, opacity, color in that order.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .const import MIN_BLOCK_SIZE

NHidden = Tuple[int, ...]


def _as_static_n_hidden(n_hidden) -> NHidden:
    """Accept tuples/lists/arrays and normalize to a static tuple of ints."""
    if n_hidden is None:
        return ()
    if hasattr(n_hidden, "tolist"):
        n_hidden = np.asarray(n_hidden).tolist()
    return tuple(int(x) for x in n_hidden)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecoderParams:
    """Learnable parameters of the Lightplane Renderer decoder.

    ``mlp_params`` is the flat parameter vector (a pytree leaf, hence
    differentiable/optimizable); ``n_hidden_trunk`` / ``n_hidden_opacity`` /
    ``n_hidden_color`` are static tuples ``(c_in, h_1, ..., c_out)`` per MLP
    (empty tuple = no trunk MLP, the separate-color-grid mode), and
    ``color_chn`` is the number of *effective* rendered channels (the color
    MLP output may be zero-padded up to ``MIN_BLOCK_SIZE``).

    Mirrors reference ``mlp_utils.py:20-128``.
    """

    mlp_params: jnp.ndarray
    n_hidden_trunk: NHidden = dataclasses.field(metadata=dict(static=True))
    n_hidden_opacity: NHidden = dataclasses.field(metadata=dict(static=True))
    n_hidden_color: NHidden = dataclasses.field(metadata=dict(static=True))
    color_chn: int = dataclasses.field(metadata=dict(static=True))

    def __post_init__(self):
        self.n_hidden_trunk = _as_static_n_hidden(self.n_hidden_trunk)
        self.n_hidden_opacity = _as_static_n_hidden(self.n_hidden_opacity)
        self.n_hidden_color = _as_static_n_hidden(self.n_hidden_color)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplatterParams:
    """Learnable parameters of the Lightplane Splatter MLP; the MLP maps
    ``feature_grid[x] + splatting_feature[u]`` to the vector splatted at
    ``x``.  Mirrors reference ``mlp_utils.py:131-185``."""

    mlp_params: jnp.ndarray
    n_hidden: NHidden = dataclasses.field(metadata=dict(static=True))

    def __post_init__(self):
        self.n_hidden = _as_static_n_hidden(self.n_hidden)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _xavier_init_mlp_params(
    key: jax.Array,
    n_layers: int,
    input_chn: int,
    hidden_chn: int,
    output_chn: int,
    last_bias: float = 0.0,
    dtype=jnp.float32,
):
    """Xavier-uniform weights (relu gain), zero biases except the last,
    as in reference ``mlp_utils.py:757-815``."""
    weights, biases = [], []
    keys = jax.random.split(key, max(n_layers, 1))
    gain = float(np.sqrt(2.0))  # torch relu gain
    for l in range(n_layers):
        d_in = input_chn if l == 0 else hidden_chn
        d_out = output_chn if l == n_layers - 1 else hidden_chn
        bound = gain * float(np.sqrt(6.0 / (d_in + d_out)))
        w = jax.random.uniform(
            keys[l], (d_in, d_out), dtype, minval=-bound, maxval=bound
        )
        b = (
            jnp.full((d_out,), last_bias, dtype)
            if l == n_layers - 1
            else jnp.zeros((d_out,), dtype)
        )
        weights.append(w)
        biases.append(b)
    return weights, biases


def init_decoder_params(
    key: jax.Array,
    n_layers_opacity: int,
    n_layers_trunk: int,
    n_layers_color: int,
    input_chn: int = 32,
    hidden_chn: int = 32,
    color_chn: int = 3,
    opacity_init_bias: float = 0.0,
    pad_color_channels_to_min_block_size: bool = True,
    use_separate_color_grid: bool = False,
    dtype=jnp.float32,
) -> DecoderParams:
    """Initialize renderer decoder MLPs (reference ``mlp_utils.py:188-295``).

    With ``use_separate_color_grid=True`` the trunk MLP is omitted and the
    opacity/color MLPs read the grid feature directly.
    """
    k_trunk, k_op, k_col = jax.random.split(key, 3)
    if n_layers_trunk > 0:
        assert not use_separate_color_grid, (
            "Cannot use trunk MLP with a separate color grid."
            " Please set n_layers_trunk==0."
        )
        weights_trunk, biases_trunk = _xavier_init_mlp_params(
            k_trunk, n_layers_trunk, input_chn, hidden_chn, hidden_chn,
            dtype=dtype,
        )
    else:
        weights_trunk, biases_trunk = [], []

    weights_opacity, biases_opacity = _xavier_init_mlp_params(
        k_op,
        n_layers_opacity,
        input_chn if use_separate_color_grid else hidden_chn,
        hidden_chn,
        1,
        last_bias=opacity_init_bias,
        dtype=dtype,
    )
    weights_color, biases_color = _xavier_init_mlp_params(
        k_col,
        n_layers_color,
        input_chn if use_separate_color_grid else hidden_chn,
        hidden_chn,
        color_chn,
        dtype=dtype,
    )

    mlp_params, n_hidden_trunk, n_hidden_opacity, n_hidden_color = (
        flatten_decoder_params(
            weights_trunk,
            biases_trunk,
            weights_opacity,
            biases_opacity,
            weights_color,
            biases_color,
            pad_color_channels_to_min_block_size,
        )
    )
    return DecoderParams(
        mlp_params, n_hidden_trunk, n_hidden_opacity, n_hidden_color, color_chn
    )


def init_splatter_params(
    key: jax.Array,
    n_layers: int,
    input_chn: int = 32,
    hidden_chn: int = 32,
    out_chn: int = 16,
    dtype=jnp.float32,
) -> SplatterParams:
    """Initialize the splatter MLP (reference ``mlp_utils.py:298-339``)."""
    weights, biases = _xavier_init_mlp_params(
        key, n_layers, input_chn, hidden_chn, out_chn, dtype=dtype
    )
    mlp_params, n_hidden = flatten_splatter_params(weights, biases)
    return SplatterParams(mlp_params, n_hidden)


# ---------------------------------------------------------------------------
# Flatten / unflatten
# ---------------------------------------------------------------------------


def _pad_color_mlp_params(weights, biases, n_pad):
    weights = list(weights)
    biases = list(biases)
    weights[-1] = jnp.pad(weights[-1], [(0, 0), (0, n_pad)])
    biases[-1] = jnp.pad(biases[-1], [(0, n_pad)])
    return weights, biases


def _get_n_hidden(weights) -> NHidden:
    if len(weights) == 0:
        return ()
    return tuple([int(weights[0].shape[0])] + [int(w.shape[1]) for w in weights])


def flatten_decoder_params(
    weights_trunk,
    biases_trunk,
    weights_opacity,
    biases_opacity,
    weights_color,
    biases_color,
    pad_color_channels_to_min_block_size: bool = True,
):
    """Flatten the three decoder MLPs into one 1-D vector + static shape
    tuples (reference ``mlp_utils.py:390-456``)."""
    if pad_color_channels_to_min_block_size:
        color_chn = int(biases_color[-1].size)
        n_pad = max(MIN_BLOCK_SIZE - color_chn, 0)
        if n_pad > 0:
            weights_color, biases_color = _pad_color_mlp_params(
                weights_color, biases_color, n_pad
            )

    mlp_params = jnp.concatenate(
        [
            t.reshape(-1)
            for group in [
                weights_trunk, biases_trunk,
                weights_opacity, biases_opacity,
                weights_color, biases_color,
            ]
            for t in group
        ],
        axis=0,
    )
    n_hidden_trunk = _get_n_hidden(weights_trunk)
    n_hidden_opacity = _get_n_hidden(weights_opacity)
    n_hidden_color = _get_n_hidden(weights_color)
    return mlp_params, n_hidden_trunk, n_hidden_opacity, n_hidden_color


def flatten_splatter_params(weights, biases):
    """Flatten the splatter MLP (reference ``mlp_utils.py:459-486``)."""
    mlp_params = jnp.concatenate(
        [t.reshape(-1) for group in [weights, biases] for t in group], axis=0
    )
    return mlp_params, _get_n_hidden(weights)


def _mlp_numel(n_hidden: NHidden) -> int:
    n_hidden = _as_static_n_hidden(n_hidden)
    if len(n_hidden) == 0:
        return 0
    w = sum(a * b for a, b in zip(n_hidden[:-1], n_hidden[1:]))
    b = sum(n_hidden[1:])
    return w + b


def _flattened_one_mlp_params_to_list(
    mlp_params: jnp.ndarray,
    n_hidden: NHidden,
    transpose: bool = False,
):
    """Slice one MLP's weights/biases out of its flat segment (reference
    ``mlp_utils.py:691-721``)."""
    n_hidden = _as_static_n_hidden(n_hidden)
    nl = len(n_hidden) - 1
    if nl < 1:
        return [], []
    weights, biases = [], []
    off = 0
    for l in range(nl):
        d_in, d_out = n_hidden[l], n_hidden[l + 1]
        weights.append(mlp_params[off: off + d_in * d_out].reshape(d_in, d_out))
        off += d_in * d_out
    for l in range(nl):
        d_out = n_hidden[l + 1]
        biases.append(mlp_params[off: off + d_out])
        off += d_out
    if transpose:
        weights = [w.T for w in weights]
    return weights, biases


def flattened_decoder_params_to_list(
    mlp_params: jnp.ndarray,
    n_hidden_trunk,
    n_hidden_opacity,
    n_hidden_color,
    transpose: bool = False,
):
    """Inverse of :func:`flatten_decoder_params` (reference
    ``mlp_utils.py:489-560``)."""
    n_hidden_trunk = _as_static_n_hidden(n_hidden_trunk)
    n_hidden_opacity = _as_static_n_hidden(n_hidden_opacity)
    n_hidden_color = _as_static_n_hidden(n_hidden_color)
    numel_trunk = _mlp_numel(n_hidden_trunk)
    numel_opacity = _mlp_numel(n_hidden_opacity)
    weights_trunk, biases_trunk = _flattened_one_mlp_params_to_list(
        mlp_params[:numel_trunk], n_hidden_trunk, transpose
    )
    weights_opacity, biases_opacity = _flattened_one_mlp_params_to_list(
        mlp_params[numel_trunk: numel_trunk + numel_opacity],
        n_hidden_opacity,
        transpose,
    )
    weights_color, biases_color = _flattened_one_mlp_params_to_list(
        mlp_params[numel_trunk + numel_opacity:], n_hidden_color, transpose
    )
    return (
        weights_trunk, biases_trunk,
        weights_opacity, biases_opacity,
        weights_color, biases_color,
    )


def flattened_triton_decoder_to_list(
    mlp_params: jnp.ndarray,
    n_layers_trunk: int,
    n_layers_opacity: int,
    n_layers_color: int,
    input_chn: int,
    hidden_chn: int,
    color_chn: int,
):
    """Build ``n_hidden`` tuples from layer counts and unflatten (API parity
    with reference ``mlp_utils.py:563-605``)."""

    def _make(d_in, d_hidden, d_out, n_layers):
        if n_layers == 0:
            return ()
        return tuple([d_in] + [d_hidden] * (n_layers - 1) + [d_out])

    return flattened_decoder_params_to_list(
        mlp_params,
        _make(input_chn, hidden_chn, hidden_chn, n_layers_trunk),
        _make(hidden_chn, hidden_chn, 1, n_layers_opacity),
        _make(hidden_chn, hidden_chn, color_chn, n_layers_color),
    )


def get_triton_function_input_dims(
    n_hidden_trunk,
    n_hidden_opacity,
    n_hidden_color,
):
    """Extract (hidden dims, layer counts, render channels) from the static
    shape tuples (API parity with reference ``mlp_utils.py:342-382``)."""
    n_hidden_trunk = _as_static_n_hidden(n_hidden_trunk)
    n_hidden_opacity = _as_static_n_hidden(n_hidden_opacity)
    n_hidden_color = _as_static_n_hidden(n_hidden_color)
    if len(n_hidden_trunk) == 0:
        mlp_n_layers_trunk = 0
        mlp_dim_hidden_trunk = 0
        mlp_dim_hidden_opacity = n_hidden_opacity[1]
        mlp_dim_hidden_color = n_hidden_color[1]
    else:
        mlp_dim_hidden_trunk = n_hidden_trunk[1]
        mlp_dim_hidden_opacity = n_hidden_opacity[1]
        mlp_dim_hidden_color = n_hidden_color[1]
        assert all(h == mlp_dim_hidden_trunk for h in n_hidden_trunk[1:])
        mlp_n_layers_trunk = len(n_hidden_trunk) - 1
    if len(n_hidden_opacity) > 3:
        assert all(h == mlp_dim_hidden_opacity for h in n_hidden_opacity[1:-1])
    if len(n_hidden_color) > 3:
        assert all(h == mlp_dim_hidden_color for h in n_hidden_color[1:-1])
    num_render_channels = n_hidden_color[-1]
    mlp_n_layers_opacity = len(n_hidden_opacity) - 1
    mlp_n_layers_color = len(n_hidden_color) - 1
    return (
        mlp_dim_hidden_trunk,
        mlp_dim_hidden_opacity,
        mlp_dim_hidden_color,
        mlp_n_layers_trunk,
        mlp_n_layers_opacity,
        mlp_n_layers_color,
        num_render_channels,
    )
