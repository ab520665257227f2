"""Counter-based Gaussian RNG shared by the oracle and the kernels.

A stateless int-hash + Box-Muller normal generator: two integer counters are
avalanched to uniform uint32s, mapped to (0, 1], and combined into one
N(0, 1) sample.  Because it is pure int32/float math it runs identically in
plain JAX (the oracle path) and inside Pallas kernels, which makes
noise-injection parity tests exact.

Behavioral reference: ``lightplane/triton_src/shared/rand_util.py:38-87``
(Triton) and ``:110-145`` (PyTorch mirror).  This is a re-implementation of
the same published hash construction (stackoverflow.com/a/12996028,
stackoverflow.com/a/30057527), not a translation of the kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

INT32_PRIME = 105097564
MAX_INT_32_F = 2147483647.0
MAX_UINT_32_F = 4294967295.0
MAX_UINT_32_F_EPS = 3.0
_TWO_PI = 6.28318530718


def _hash(x: jnp.ndarray) -> jnp.ndarray:
    """Int32 avalanche hash; input/output int32 (wrapping arithmetic)."""
    x = ((x >> 16) ^ x) * np.int32(0x45D9F3B)
    x = ((x >> 16) ^ x) * np.int32(0x45D9F3B)
    x = (x >> 16) ^ x
    return x


def _pair_hash(x, h):
    """Combine hash ``h`` with value ``x`` (int32, wrapping)."""
    h = h ^ x
    h = (h << 24) + h * np.int32(0x193)
    return h


def _seed_hash(seed: int) -> np.int32:
    """Host-side fold of the scalar seed: pair_hash(INT32_PRIME, seed)."""
    with np.errstate(over="ignore"):
        h = np.int32(INT32_PRIME) ^ np.int32(seed)
        return np.int32((np.int64(h) << np.int64(24)) + np.int64(h) * np.int64(0x193))


def int_to_randn(x1: jnp.ndarray, x2: jnp.ndarray, seed) -> jnp.ndarray:
    """Map two integer arrays + a seed to N(0, 1) float32 samples.

    1) hash both ints to uniformly distributed int32s,
    2) mix in the seed,
    3) map to (0, 1],
    4) Box-Muller transform to N(0, 1).
    """
    x1 = x1.astype(jnp.int32)
    x2 = x2.astype(jnp.int32)
    seed = jnp.asarray(seed, dtype=jnp.int32)
    h1 = _pair_hash(_pair_hash(jnp.int32(INT32_PRIME), seed), _hash(x1))
    h2 = _pair_hash(_pair_hash(jnp.int32(INT32_PRIME), seed + 1), _hash(x2))
    u1 = (h1.astype(jnp.float32) + MAX_INT_32_F + MAX_UINT_32_F_EPS) / (
        MAX_UINT_32_F + MAX_UINT_32_F_EPS
    )
    u2 = (h2.astype(jnp.float32) + MAX_INT_32_F + MAX_UINT_32_F_EPS) / (
        MAX_UINT_32_F + MAX_UINT_32_F_EPS
    )
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


# API-parity alias: the reference exposes a "naive" (PyTorch) mirror of the
# kernel RNG; here oracle and kernel share one function.
int_to_randn_naive = int_to_randn


def get_sample_randn(num_samples: int, num_rays: int, seed, min_block: int = 16):
    """Per-(ray, step) noise table, shape [num_rays, num_samples].

    Index scheme matches the reference so that the same (ray, step) gets the
    same counter pair on every path (``naive_renderer.py:779-793``):
    ``i1 = ray * S + step + 1``, ``i2 = i1 + max(R, MIN_BLOCK)*S``.
    """
    num_rays_pad = max(num_rays, min_block)
    i1 = (
        num_samples * jnp.arange(num_rays, dtype=jnp.int32)[:, None]
        + jnp.arange(num_samples, dtype=jnp.int32)[None]
        + 1
    )
    i2 = i1 + num_rays_pad * num_samples
    return int_to_randn(i1, i2, seed)
