"""Wall-time and device-memory measurement helpers.

Counterpart of the reference's CUDA-event ``Timer`` / ``Memory`` context
managers (``tests/utils.py:33-78``) and its module-level ``PROFILE`` wall
-time prints (``lightplane_renderer.py:29, 347-349``), expressed the JAX
way: ``jax.block_until_ready`` fences instead of ``cuda.synchronize`` and
PJRT ``memory_stats`` instead of ``torch.cuda`` allocator stats.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax

# Set LIGHTPLANE_PROFILE=1 to make Timer print on exit (the reference's
# module-level PROFILE flag).
PROFILE = os.environ.get("LIGHTPLANE_PROFILE", "0") not in ("0", "", "false")


class Timer:
    """Context manager measuring device wall time.

    The device queue is fenced on entry and the ``fence`` pytree (or all
    live computations when None) is blocked on exit, so the interval
    covers exactly the work issued inside the block::

        with Timer("render") as t:
            out = render(...)
            t.fence = out
        print(t.ms)
    """

    def __init__(self, name: str = "", fence=None):
        self.name = name
        self.fence = fence
        self.ms: Optional[float] = None

    def __enter__(self):
        jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.fence is not None:
            jax.block_until_ready(self.fence)
        else:
            jax.effects_barrier()
        self.ms = (time.perf_counter() - self._t0) * 1e3
        if PROFILE and self.name:
            print(f"[lightplane profile] {self.name}: {self.ms:.2f} ms")
        return False


def device_memory_stats(device=None) -> dict:
    """PJRT memory stats of a device (empty dict when the backend does
    not expose them — e.g. tunneled/remote devices)."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


class Memory:
    """Context manager reporting bytes-in-use delta and peak (when the
    backend exposes allocator stats; reference ``tests/utils.py:33-55``)."""

    def __init__(self, name: str = "", device=None):
        self.name = name
        self.device = device
        self.delta_mb: Optional[float] = None
        self.peak_mb: Optional[float] = None

    def __enter__(self):
        self._before = device_memory_stats(self.device)
        return self

    def __exit__(self, *exc):
        jax.effects_barrier()
        after = device_memory_stats(self.device)
        if "bytes_in_use" in after and "bytes_in_use" in self._before:
            self.delta_mb = (
                after["bytes_in_use"] - self._before["bytes_in_use"]
            ) / 2**20
        if "peak_bytes_in_use" in after:
            self.peak_mb = after["peak_bytes_in_use"] / 2**20
        if PROFILE and self.name:
            print(f"[lightplane profile] {self.name}: "
                  f"delta {self.delta_mb} MB, peak {self.peak_mb} MB")
        return False
