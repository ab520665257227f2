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

    ``frame_hw`` (``[n_images, 2]`` int) records per-frame image sizes for
    loaders that keep each frame's native resolution (CO3D, matching the
    reference's per-frame handling in ``dataloader/co3d_dataset.py:30-270``).
    ``None`` means every frame is ``height x width``; when set,
    ``height``/``width`` hold the FIRST frame's size and consumers that
    need a uniform raster should either use :meth:`image` (per-frame
    shapes) or load with a uniform-size option.
    """

    origins: np.ndarray     # [N, 3]
    directions: np.ndarray  # [N, 3]
    gt: np.ndarray          # [N, 3]
    near: float
    far: float
    height: int
    width: int
    n_images: int
    frame_hw: Optional[np.ndarray] = None   # [n_images, 2] int, or None

    def frame_offsets(self) -> np.ndarray:
        """Start ray index of each image (length ``n_images + 1``)."""
        if self.frame_hw is None:
            hw = self.height * self.width
            return np.arange(self.n_images + 1, dtype=np.int64) * hw
        return np.concatenate(
            [[0], np.cumsum(self.frame_hw.prod(axis=1).astype(np.int64))]
        )

    def image(self, i: int):
        off = self.frame_offsets()
        sl = slice(int(off[i]), int(off[i + 1]))
        if self.frame_hw is None:
            h, w = self.height, self.width
        else:
            h, w = (int(x) for x in self.frame_hw[i])
        return (
            self.origins[sl], self.directions[sl],
            self.gt[sl].reshape(h, w, 3),
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


def similarity_from_cameras(c2w: np.ndarray):
    """Similarity transform normalizing a camera set (OpenCV convention):
    rotate the average camera-up to world +z-up, recenter on the median
    closest-point of the center rays, scale to median-unit camera distance
    (reference ``dataloader/util.py:331-386``)."""
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]

    up_camspace = np.array([0.0, -1.0, 0.0])
    world_up = np.mean(np.sum(R * up_camspace, axis=-1), axis=0)
    world_up /= np.linalg.norm(world_up)

    c = float((up_camspace * world_up).sum())
    cross = np.cross(world_up, up_camspace)
    skew = np.array([
        [0.0, -cross[2], cross[1]],
        [cross[2], 0.0, -cross[0]],
        [-cross[1], cross[0], 0.0],
    ])
    if c > -1:
        R_align = np.eye(3) + skew + (skew @ skew) / (1 + c)
    else:
        R_align = np.diag([-1.0, 1.0, 1.0])

    R = R_align @ R
    fwds = np.sum(R * np.array([0.0, 0.0, 1.0]), axis=-1)
    t = (R_align @ t[..., None])[..., 0]

    nearest = t + (fwds * -t).sum(-1)[:, None] * fwds
    translate = -np.median(nearest, axis=0)

    transform = np.eye(4)
    transform[:3, 3] = translate
    transform[:3, :3] = R_align
    scale = 1.0 / np.median(np.linalg.norm(t + translate, axis=-1))
    return transform, scale


def load_co3d(
    root: str,
    split: str = "train",
    seq_id: int = 0,
    max_image_dim: int = 800,
    max_pose_dist: float = 5.0,
    cam_scale_factor: float = 0.95,
    hold_every: int = 8,
    near: float = 0.1,
    far: float = 6.0,
    downsample: int = 1,
    keep_frame_sizes: bool = True,
) -> RayDataset:
    """CO3D format: per-category ``frame_annotations.jgz`` with PyTorch3D
    viewpoints (reference ``dataloader/co3d_dataset.py:30-270``) — no
    PyTorch3D dependency here; the viewpoint (R, T, ndc focal/principal
    point) is converted to an OpenCV-convention c2w + pixel intrinsics
    directly, then normalized with :func:`similarity_from_cameras`.

    ``seq_id`` selects which sequence (sorted by category, then name).

    ``keep_frame_sizes=True`` (default, matching the reference's per-frame
    handling): each frame keeps its native resolution, only down-scaled
    aspect-preserving when its longest side exceeds ``max_image_dim``; the
    per-frame sizes land in ``RayDataset.frame_hw`` and the per-frame
    intrinsics are scaled by each frame's own factor.  ``False`` resizes
    every frame to the first kept frame's (bounded) resolution — for
    consumers that need one uniform raster (e.g. the fit example's patch
    sampler)."""
    import gzip

    if max_image_dim and downsample > 1:
        max_image_dim = max_image_dim // downsample

    cats = sorted(
        x for x in os.listdir(root)
        if os.path.isdir(os.path.join(root, x))
    )
    assert cats, f"no category directories under {root}"

    # index frames by sequence; poses in OpenCV c2w (ref co3d_dataset.py:90-136)
    cam_trans = np.diag(np.array([-1, -1, 1, 1], np.float64))
    seqs: dict = {}
    for cat in cats:
        ann = os.path.join(root, cat, "frame_annotations.jgz")
        if not os.path.exists(ann):
            continue
        with gzip.open(ann, "r") as f:
            frames = json.load(f)
        for fr in frames:
            key = (cat, fr["sequence_name"])
            H, W = fr["image"]["size"]
            half_wh = np.array([W * 0.5, H * 0.5], np.float64)
            R = np.asarray(fr["viewpoint"]["R"], np.float64)
            T = np.asarray(fr["viewpoint"]["T"], np.float64)
            pose = np.eye(4)
            pose[:3, :3] = R
            pose[:3, 3] = -R @ T
            pose = pose @ cam_trans
            seqs.setdefault(key, []).append(dict(
                frame_number=fr["frame_number"],
                image_path=fr["image"]["path"],
                pose=pose,
                # ndc -> pixel intrinsics
                fxy=np.asarray(fr["viewpoint"]["focal_length"]) * half_wh,
                cxy=-(np.asarray(fr["viewpoint"]["principal_point"]) - 1.0)
                * half_wh,
            ))
    keys = sorted(seqs.keys())
    assert 0 <= seq_id < len(keys), (
        f"seq_id {seq_id} out of range ({len(keys)} sequences)"
    )
    fd = sorted(seqs[keys[seq_id]], key=lambda x: x["frame_number"])

    ref_c2ws = np.stack([x["pose"] for x in fd])
    keep = [
        i for i in range(len(fd))
        if (i % hold_every != 0) == (split.endswith("train"))
    ]

    imgs, c2ws, intrins = [], [], []
    target_hw = None
    for i in keep:
        img = _load_image(os.path.join(root, fd[i]["image_path"]))
        h, w = img.shape[:2]
        scale0 = min(1.0, max_image_dim / max(h, w))
        if keep_frame_sizes:
            # per-frame native resolution (reference co3d_dataset.py keeps
            # per-frame sizes): aspect-preserving bound to max_image_dim
            out_hw = (max(1, round(h * scale0)), max(1, round(w * scale0)))
        else:
            if target_hw is None:
                target_hw = (int(h * scale0), int(w * scale0))
            out_hw = target_hw
        sc = np.array([out_hw[1] / w, out_hw[0] / h], np.float32)
        if out_hw != (h, w):
            import cv2

            img = cv2.resize(
                img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA
            )
        imgs.append(img)
        c2ws.append(fd[i]["pose"])
        intrins.append((fd[i]["fxy"] * sc, fd[i]["cxy"] * sc))
    c2w = np.stack(c2ws)

    # drop outlier poses (ref co3d_dataset.py:231-239)
    dists = np.linalg.norm(
        c2w[:, :3, 3] - np.median(c2w[:, :3, 3], axis=0), axis=-1
    )
    good = dists < np.median(dists) * max_pose_dist
    imgs = [im for im, g in zip(imgs, good) if g]
    intrins = [x for x, g in zip(intrins, good) if g]
    c2w = c2w[good]

    T_sim, sscale = similarity_from_cameras(ref_c2ws)
    c2w = T_sim @ c2w
    c2w[:, :3, 3] *= cam_scale_factor * sscale

    all_o, all_d, all_gt = [], [], []
    frame_hw = []
    for img, pose, (fxy, cxy) in zip(imgs, c2w, intrins):
        H, W = img.shape[:2]
        frame_hw.append((H, W))
        i, j = np.meshgrid(
            np.arange(W, dtype=np.float32),
            np.arange(H, dtype=np.float32),
            indexing="xy",
        )
        # OpenCV convention: +z forward, +y down
        dirs_cam = np.stack(
            [(i - cxy[0]) / fxy[0], (j - cxy[1]) / fxy[1], np.ones_like(i)],
            axis=-1,
        ).reshape(-1, 3)
        dirs = dirs_cam @ pose[:3, :3].T.astype(np.float32)
        all_o.append(
            np.broadcast_to(
                pose[:3, 3].astype(np.float32), dirs.shape
            ).copy()
        )
        all_d.append(dirs.astype(np.float32))
        all_gt.append(img.reshape(-1, 3).astype(np.float32))
    frame_hw = np.asarray(frame_hw, np.int64)
    uniform = bool((frame_hw == frame_hw[0]).all())
    return RayDataset(
        origins=np.concatenate(all_o),
        directions=np.concatenate(all_d),
        gt=np.concatenate(all_gt),
        near=near,
        far=far,
        height=int(frame_hw[0, 0]),
        width=int(frame_hw[0, 1]),
        n_images=len(imgs),
        frame_hw=None if uniform else frame_hw,
    )


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
    import inspect

    _ALL_LOADERS = (
        make_synthetic_scene, load_nerf_synthetic, load_llff, load_nsvf,
        load_co3d,
    )
    _KNOWN = set().union(
        *(set(inspect.signature(f).parameters) for f in _ALL_LOADERS)
    )

    def _call(loader, *args, **kw):
        # cross-loader options (e.g. keep_frame_sizes with
        # dataset_type="auto") are dropped when the RESOLVED loader does
        # not take them — but a kwarg unknown to EVERY loader is a typo
        # and still raises
        unknown = set(kw) - _KNOWN
        if unknown:
            raise TypeError(
                f"auto_dataset got kwargs unknown to every loader: "
                f"{sorted(unknown)}"
            )
        accepted = set(inspect.signature(loader).parameters)
        return loader(*args, **{k: v for k, v in kw.items()
                                if k in accepted})

    if root is None or dataset_type == "synthetic":
        return _call(make_synthetic_scene, **kwargs)
    if dataset_type == "auto":
        if os.path.exists(os.path.join(root, "transforms_train.json")):
            dataset_type = "nerf"
        elif os.path.exists(os.path.join(root, "poses_bounds.npy")):
            dataset_type = "llff"
        elif os.path.exists(os.path.join(root, "intrinsics.txt")):
            dataset_type = "nsvf"
        elif any(
            os.path.exists(os.path.join(root, d, "frame_annotations.jgz"))
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        ):
            dataset_type = "co3d"
        else:
            raise ValueError(f"cannot detect dataset type under {root}")
    loader = {
        "nerf": load_nerf_synthetic,
        "llff": load_llff,
        "nsvf": load_nsvf,
        "co3d": load_co3d,
    }[dataset_type]
    # drop kwargs the resolved loader does not take (callers can pass
    # loader-specific options like keep_frame_sizes with dataset_type=auto)
    return _call(loader, root, **kwargs)
