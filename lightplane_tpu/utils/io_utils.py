"""IO helpers: image/depth dumps and video writing.

Counterpart of reference ``examples/utils/util/io_util.py`` (depth colormap,
mp4 writer).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def colorize_depth(
    depth: np.ndarray,
    near: Optional[float] = None,
    far: Optional[float] = None,
    cmap: str = "magma",
) -> np.ndarray:
    """Map a depth image to an RGB uint8 colormap visualization."""
    import matplotlib.cm as cm

    d = np.asarray(depth, np.float32)
    lo = np.percentile(d, 1) if near is None else near
    hi = np.percentile(d, 99) if far is None else far
    dn = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    rgba = cm.get_cmap(cmap)(dn)
    return (rgba[..., :3] * 255).astype(np.uint8)


def save_image(path: str, img: np.ndarray):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    imageio.imwrite(path, arr)


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 20):
    """Write an mp4 (falls back to gif when no ffmpeg backend exists)."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [
        f if f.dtype == np.uint8 else to_uint8(f) for f in frames
    ]
    try:
        imageio.mimwrite(path, frames, fps=fps)
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(alt, frames, duration=1.0 / fps)
        return alt
    return path
