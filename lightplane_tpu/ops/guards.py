"""Debug-gated numerical guards.

The reference asserts every gradient is finite after each backward pass
(``lightplane_renderer.py:719-722``, ``lightplane_splatter.py:671-675``) —
cheap there because the tensors are already on the host path.  Under
``jit`` an unconditional device->host sync per step would serialize the
pipeline, so the TPU-native equivalent is opt-in: set
``LIGHTPLANE_CHECK_GRADS=1`` and every fused-operator backward verifies all
produced gradients on the host (via ``jax.debug.callback``), raising
``FloatingPointError`` on any NaN/Inf.  With the flag unset the guard is a
trace-time no-op (zero overhead).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def check_grads_enabled() -> bool:
    return os.environ.get("LIGHTPLANE_CHECK_GRADS", "0") not in ("", "0")


def _host_assert_finite(count, label):
    if int(count):
        raise FloatingPointError(
            f"lightplane_tpu: {int(count)} non-finite gradient value(s) "
            f"after the {label} backward pass "
            "(LIGHTPLANE_CHECK_GRADS=1)"
        )


def assert_grads_finite(grads, label: str):
    """Return ``grads`` unchanged; when ``LIGHTPLANE_CHECK_GRADS=1``, also
    enqueue a host-side finiteness assertion over every floating leaf."""
    if not check_grads_enabled():
        return grads
    bad = jnp.zeros((), jnp.int32)
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            bad = bad + jnp.sum(
                ~jnp.isfinite(leaf), dtype=jnp.int32
            )
    jax.debug.callback(_host_assert_finite, bad, label)
    return grads
