"""Posed-image datasets -> per-pixel ray batches.

Counterpart of reference ``examples/utils/dataloader/`` (~2.1k LoC): loaders
for NeRF-synthetic (Blender), LLFF, and NSVF scene formats, auto-detection,
plus a procedurally generated synthetic scene so the training example runs
without downloading data.  Loads with numpy/PIL instead of torch;
ray generation uses ``lightplane_tpu.utils.cameras``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from lightplane_tpu.utils.cameras import (
    camera_rays,
    look_at_c2w,
    sphere_cameras,
)


@dataclasses.dataclass
class RayDataset:
    """Flattened per-pixel rays with ground-truth colors.

    Counterpart of the reference's ``Rays{origins, dirs, gt}`` batch
    dataclass (``dataloader/util.py:22-41``) + ``DatasetBase.gen_rays``.
    """

    origins: np.ndarray     # [N, 3]
    directions: np.ndarray  # [N, 3]
    gt: np.ndarray          # [N, 3]
    near: float
    far: float
    height: int
    width: int
    n_images: int

    def image(self, i: int):
        hw = self.height * self.width
        sl = slice(i * hw, (i + 1) * hw)
        return (
            self.origins[sl], self.directions[sl],
            self.gt[sl].reshape(self.height, self.width, 3),
        )


def _load_image(path: str, downsample: int = 1) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if downsample > 1:
        img = img.resize(
            (img.width // downsample, img.height // downsample),
            Image.LANCZOS,
        )
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.shape[-1] == 4:  # composite alpha over white
        arr = arr[..., :3] * arr[..., 3:] + (1.0 - arr[..., 3:])
    return arr


def load_nerf_synthetic(
    root: str,
    split: str = "train",
    downsample: int = 1,
    near: float = 2.0,
    far: float = 6.0,
) -> RayDataset:
    """Blender NeRF-synthetic format: ``transforms_{split}.json`` +
    ``{split}/r_*.png`` (reference ``dataloader/nerf_dataset.py``)."""
    with open(os.path.join(root, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    frames = meta["frames"]
    imgs, c2ws = [], []
    for fr in frames:
        fp = os.path.join(root, fr["file_path"] + ".png")
        if not os.path.exists(fp):
            fp = os.path.join(root, fr["file_path"])
        imgs.append(_load_image(fp, downsample))
        c2ws.append(np.asarray(fr["transform_matrix"], np.float32))
    H, W = imgs[0].shape[:2]
    focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
    return _build_dataset(imgs, c2ws, focal, near, far)


def load_llff(
    root: str,
    downsample: int = 4,
    holdout_every: int = 8,
    split: str = "train",
) -> RayDataset:
    """LLFF format: ``poses_bounds.npy`` + ``images*/`` (reference
    ``dataloader/llff_dataset.py`` / ``load_llff.py``).  Poses are converted
    from LLFF's [down right back] to OpenGL [right up back] and recentered."""
    poses_bounds = np.load(os.path.join(root, "poses_bounds.npy"))
    poses = poses_bounds[:, :-2].reshape(-1, 3, 5)
    bounds = poses_bounds[:, -2:]

    img_dir = None
    for cand in (f"images_{downsample}", "images"):
        d = os.path.join(root, cand)
        if os.path.isdir(d):
            img_dir = d
            break
    assert img_dir is not None, f"no images dir under {root}"
    files = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    ds = 1 if img_dir.endswith(f"_{downsample}") else downsample
    imgs = [_load_image(os.path.join(img_dir, f), ds) for f in files]
    H, W = imgs[0].shape[:2]

    # LLFF pose: [down, right, back] -> OpenGL [right, up, back]
    c2ws = []
    for p in poses:
        m = np.eye(4, dtype=np.float32)
        m[:3, :4] = np.concatenate(
            [p[:, 1:2], -p[:, 0:1], p[:, 2:3], p[:, 3:4]], axis=1
        )
        c2ws.append(m)
    # rescale so the scene fits in roughly unit scale
    scale = 1.0 / (float(bounds.min()) * 0.75)
    for m in c2ws:
        m[:3, 3] *= scale
    near = float(bounds.min()) * scale * 0.9
    far = float(bounds.max()) * scale * 1.1
    focal = float(poses[0, 2, 4]) / ds

    sel = [
        i for i in range(len(imgs))
        if (i % holdout_every != 0) == (split == "train")
    ]
    return _build_dataset(
        [imgs[i] for i in sel], [c2ws[i] for i in sel], focal, near, far
    )


def load_nsvf(
    root: str,
    split: str = "train",
    downsample: int = 1,
    near: float = 0.5,
    far: float = 6.0,
) -> RayDataset:
    """NSVF format: ``intrinsics.txt`` + ``pose/*.txt`` + ``rgb/*.png``
    with split encoded in the filename prefix (0_=train, 1_=val, 2_=test)
    (reference ``dataloader/nsvf_dataset.py``)."""
    with open(os.path.join(root, "intrinsics.txt")) as f:
        focal = float(f.readline().split()[0]) / downsample
    prefix = {"train": "0_", "val": "1_", "test": "2_"}[split]
    pose_dir = os.path.join(root, "pose")
    rgb_dir = os.path.join(root, "rgb")
    names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(pose_dir)
        if f.startswith(prefix)
    )
    imgs, c2ws = [], []
    for n in names:
        c2ws.append(
            np.loadtxt(os.path.join(pose_dir, n + ".txt")).astype(np.float32)
        )
        for ext in (".png", ".jpg"):
            fp = os.path.join(rgb_dir, n + ext)
            if os.path.exists(fp):
                imgs.append(_load_image(fp, downsample))
                break
    return _build_dataset(imgs, c2ws, focal, near, far)


def make_synthetic_scene(
    n_views: int = 24,
    image_size: int = 64,
    near: float = 1.0,
    far: float = 5.0,
    seed: int = 0,
) -> RayDataset:
    """A procedurally rendered scene (soft colored blobs, analytic EA
    rendering) so the fitting example runs with zero downloads."""
    rng = np.random.RandomState(seed)
    n_blobs = 6
    centers = rng.uniform(-0.5, 0.5, (n_blobs, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, (n_blobs, 3)).astype(np.float32)
    radii = rng.uniform(0.15, 0.3, (n_blobs,)).astype(np.float32)

    c2ws = sphere_cameras(n_views, radius=3.0)
    focal = image_size * 1.2
    imgs = []
    n_steps = 64
    for c2w in c2ws:
        o, d = camera_rays(c2w, image_size, image_size, focal, near, far)
        ts = np.linspace(near, far, n_steps, dtype=np.float32)
        delta = ts[1] - ts[0]
        pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
        sigma = np.zeros(pts.shape[:2], np.float32)
        rgb = np.zeros(pts.shape[:2] + (3,), np.float32)
        wsum = np.zeros(pts.shape[:2], np.float32)
        for c, col, r in zip(centers, colors, radii):
            d2 = np.sum((pts - c) ** 2, -1)
            blob = np.exp(-d2 / (2 * r**2)).astype(np.float32)
            sigma += 25.0 * blob
            rgb += blob[..., None] * col
            wsum += blob
        rgb = rgb / np.maximum(wsum[..., None], 1e-6)
        nlt = np.cumsum(sigma * delta, -1)
        T = np.exp(-np.concatenate(
            [np.zeros_like(nlt[:, :1]), nlt], axis=-1))
        w = T[:, :-1] - T[:, 1:]
        img = (w[..., None] * rgb).sum(1) + T[:, -1:]  # white bg
        imgs.append(img.reshape(image_size, image_size, 3))
    return _build_dataset(imgs, list(c2ws), focal, near, far)


def _build_dataset(imgs, c2ws, focal, near, far) -> RayDataset:
    H, W = imgs[0].shape[:2]
    all_o, all_d, all_gt = [], [], []
    for img, c2w in zip(imgs, c2ws):
        o, d = camera_rays(c2w, H, W, focal, near, far)
        all_o.append(o)
        all_d.append(d)
        all_gt.append(img.reshape(-1, 3).astype(np.float32))
    return RayDataset(
        origins=np.concatenate(all_o),
        directions=np.concatenate(all_d),
        gt=np.concatenate(all_gt),
        near=near,
        far=far,
        height=H,
        width=W,
        n_images=len(imgs),
    )


def auto_dataset(root: Optional[str], dataset_type: str = "auto", **kwargs):
    """Detect the dataset format from the directory contents (reference
    ``dataloader/dataset.py:16-39``); ``root=None`` -> synthetic scene."""
    if root is None or dataset_type == "synthetic":
        return make_synthetic_scene(**kwargs)
    if dataset_type == "auto":
        if os.path.exists(os.path.join(root, "transforms_train.json")):
            dataset_type = "nerf"
        elif os.path.exists(os.path.join(root, "poses_bounds.npy")):
            dataset_type = "llff"
        elif os.path.exists(os.path.join(root, "intrinsics.txt")):
            dataset_type = "nsvf"
        else:
            raise ValueError(f"cannot detect dataset type under {root}")
    loader = {
        "nerf": load_nerf_synthetic,
        "llff": load_llff,
        "nsvf": load_nsvf,
    }[dataset_type]
    return loader(root, **kwargs)
