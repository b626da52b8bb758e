"""LLFF forward-facing dataset loader (poses_bounds.npy + images/).

BASELINE.json north-star config 3 names "LLFF forward-facing (fern) with NDC
ray parameterization and real-capture pose loading". The NeRF-Sys reference
has no LLFF path; this is a fresh implementation of the public format:

  root/poses_bounds.npy    (N, 17): 15 = 3x5 [R | t | hwf] + 2 = [near, far]
  root/images/*.{jpg,png}  capture images, sorted order == pose order

LLFF stores rotation columns as [down, right, back]; they are converted here
to this package's [right, up, back] (the standard permutation
[c1, -c0, c2]). Poses are optionally recentered so the average camera sits at
the origin looking down -z — the frame the NDC parameterization
(ops/rays.ndc_rays) assumes.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image as PILImage


@dataclasses.dataclass
class LLFFScene:
    images: np.ndarray  # (N, H, W, 3) float32 [0, 1]
    c2ws: np.ndarray  # (N, 3, 4) float32, [right, up, back]
    bounds: np.ndarray  # (N, 2) float32 [near, far] per image (rescaled)
    H: int
    W: int
    focal: float
    test_ids: np.ndarray  # holdout image indices (every llff_hold-th)

    @property
    def intrinsics(self):
        return (self.focal, self.focal, self.W / 2.0, self.H / 2.0)

    @property
    def train_ids(self) -> np.ndarray:
        mask = np.ones(len(self.images), bool)
        mask[self.test_ids] = False
        return np.nonzero(mask)[0]


def _list_images(d: Path) -> List[Path]:
    exts = (".jpg", ".jpeg", ".png")
    return sorted(p for p in d.iterdir() if p.suffix.lower() in exts)


def recenter_poses(c2ws: np.ndarray) -> np.ndarray:
    """Rigidly move all poses so their average is the identity pose.

    Average translation -> origin; average viewing direction -> -z; average
    up -> +y (Gram-Schmidt, the standard LLFF poses_avg construction).
    """
    center = c2ws[:, :3, 3].mean(0)
    back = _normalize(c2ws[:, :3, 2].sum(0))  # mean back (+z) axis
    up = c2ws[:, :3, 1].sum(0)
    right = _normalize(np.cross(up, back))
    up = np.cross(back, right)
    avg = np.stack([right, up, back, center], axis=1)  # (3, 4)

    avg4 = np.eye(4, dtype=c2ws.dtype)
    avg4[:3] = avg
    inv = np.linalg.inv(avg4)
    out = []
    for m in c2ws:
        m4 = np.eye(4, dtype=c2ws.dtype)
        m4[:3] = m
        out.append((inv @ m4)[:3])
    return np.stack(out).astype(c2ws.dtype)


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / max(float(np.linalg.norm(v)), 1e-12)


def load_llff_scene(
    root: str | Path,
    downscale: int = 1,
    recenter: bool = True,
    bd_factor: float = 0.75,
    llff_hold: int = 8,
    cap_images: Optional[int] = None,
) -> LLFFScene:
    root = Path(root)
    pb = np.load(root / "poses_bounds.npy")  # (N, 17)
    poses = pb[:, :15].reshape(-1, 3, 5).astype(np.float32)
    bounds = pb[:, 15:17].astype(np.float32)

    img_dir = root / (f"images_{downscale}" if downscale != 1 else "images")
    use_predownscaled = img_dir.exists()
    if not use_predownscaled:
        img_dir = root / "images"
    files = _list_images(img_dir)
    if len(files) != len(poses):
        raise ValueError(
            f"{len(files)} images in {img_dir} vs {len(poses)} poses"
        )
    if cap_images is not None:
        files, poses, bounds = (
            files[:cap_images], poses[:cap_images], bounds[:cap_images]
        )

    images = []
    for p in files:
        img = PILImage.open(p).convert("RGB")
        if downscale != 1 and not use_predownscaled:
            img = img.resize(
                (img.size[0] // downscale, img.size[1] // downscale),
                PILImage.LANCZOS,
            )
        images.append(np.asarray(img, np.float32) / 255.0)
    images = np.stack(images)
    H, W = images.shape[1:3]

    hwf = poses[0, :, 4]  # stored [h, w, f] at capture resolution
    focal = float(hwf[2]) * (W / float(hwf[1]))

    # [down, right, back] -> [right, up, back]
    c2ws = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:4]], axis=2
    )

    # rescale so the nearest bound sits at ~1/bd_factor (the LLFF protocol;
    # keeps NDC's near plane placement consistent across captures)
    if bd_factor:
        sc = 1.0 / (float(bounds.min()) * bd_factor)
        c2ws = c2ws.copy()
        c2ws[:, :3, 3] *= sc
        bounds = bounds * sc

    if recenter:
        c2ws = recenter_poses(c2ws)

    n = len(images)
    test_ids = (
        np.arange(n)[::llff_hold] if llff_hold > 0 else np.array([], np.int64)
    )
    return LLFFScene(
        images=images,
        c2ws=c2ws.astype(np.float32),
        bounds=bounds,
        H=H,
        W=W,
        focal=focal,
        test_ids=test_ids,
    )


def write_llff_scene(
    root: str | Path,
    images: np.ndarray,  # (N, H, W, 3) float [0,1] or uint8
    c2ws_drb: np.ndarray,  # (N, 3, 4) in LLFF's [down, right, back] columns
    hwf: np.ndarray,  # (3,) [H, W, focal]
    bounds: np.ndarray,  # (N, 2)
) -> Path:
    """Emit the literal LLFF layout (fixture writer for tests/procedural
    scenes — the inverse of load_llff_scene's parsing)."""
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    if images.dtype != np.uint8:
        images = (np.clip(images, 0.0, 1.0) * 255).astype(np.uint8)
    for i, im in enumerate(images):
        PILImage.fromarray(im, "RGB").save(root / f"images/im_{i:04d}.png")
    n = len(images)
    hwf_col = np.broadcast_to(
        np.asarray(hwf, np.float64).reshape(1, 3, 1), (n, 3, 1)
    )
    mats = np.concatenate([np.asarray(c2ws_drb, np.float64), hwf_col], axis=2)
    pb = np.concatenate(
        [mats.reshape(n, 15), np.asarray(bounds, np.float64)], axis=1
    )
    out = root / "poses_bounds.npy"
    np.save(out, pb)
    return out
