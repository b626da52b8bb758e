"""NeRF-synthetic (Blender) dataset loader.

BASELINE.json north-star configs 1-2 name Blender lego; the NeRF-Sys
reference ships no loader for this format (its datasets are aerial COLMAP
captures), so this is a fresh implementation of the public format:

  root/
    transforms_train.json   {"camera_angle_x": f, "frames": [
                              {"file_path": "./train/r_0",
                               "transform_matrix": 4x4 c2w}, ...]}
    train/r_0.png           RGBA, alpha = object mask

The c2w matrices are OpenGL-convention [right, up, back] — identical to this
package's camera convention (ops/rays.get_ray_directions), so they feed
get_rays unchanged. All arrays are host numpy; device placement is the
trainer's job.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image as PILImage


@dataclasses.dataclass
class BlenderScene:
    images: np.ndarray  # (N, H, W, 3) float32 in [0, 1], bg-composited
    alphas: np.ndarray  # (N, H, W) float32 in [0, 1]
    c2ws: np.ndarray  # (N, 3, 4) float32, [right, up, back] camera-to-world
    H: int
    W: int
    focal: float
    near: float
    far: float
    file_paths: List[str]

    @property
    def intrinsics(self):
        """(fx, fy, cx, cy) pinhole tuple for ops.rays.get_ray_directions."""
        return (self.focal, self.focal, self.W / 2.0, self.H / 2.0)


def load_blender_scene(
    root: str | Path,
    split: str = "train",
    downscale: int = 1,
    white_bg: bool = True,
    cap_images: Optional[int] = None,
    near: float = 2.0,
    far: float = 6.0,
) -> BlenderScene:
    """Load transforms_{split}.json + its frames.

    RGBA images are composited onto a white (or black) background — the
    standard Blender-synthetic training protocol; `alphas` keeps the mask so
    trainers can supervise with random backgrounds instead. near/far default
    to the lego convention (2, 6).
    """
    root = Path(root)
    meta = json.loads((root / f"transforms_{split}.json").read_text())
    frames = meta["frames"]
    if cap_images is not None:
        frames = frames[:cap_images]

    images, alphas, c2ws, paths = [], [], [], []
    W0 = H0 = None
    for fr in frames:
        fp = fr["file_path"]
        p = root / fp
        if p.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            p = p.with_suffix(".png")
        img = PILImage.open(p).convert("RGBA")
        if W0 is None:
            W0, H0 = img.size
        elif img.size != (W0, H0):
            # one camera model (camera_angle_x) covers the whole split —
            # silently resampling a mismatched frame to the first frame's
            # dims would distort it against its own intrinsics
            raise ValueError(
                f"blender frame {p} is {img.size}, split is {(W0, H0)}")
        if downscale != 1:
            img = img.resize(
                (W0 // downscale, H0 // downscale), PILImage.LANCZOS
            )
        arr = np.asarray(img, dtype=np.float32) / 255.0
        rgb, a = arr[..., :3], arr[..., 3]
        bg = 1.0 if white_bg else 0.0
        images.append(rgb * a[..., None] + bg * (1.0 - a[..., None]))
        alphas.append(a)
        c2ws.append(np.asarray(fr["transform_matrix"], np.float32)[:3, :4])
        paths.append(str(p))

    H, W = images[0].shape[:2]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    return BlenderScene(
        images=np.stack(images),
        alphas=np.stack(alphas),
        c2ws=np.stack(c2ws),
        H=H,
        W=W,
        focal=float(focal),
        near=float(meta.get("near", near)),
        far=float(meta.get("far", far)),
        file_paths=paths,
    )


def write_blender_scene(
    root: str | Path,
    images_rgba: np.ndarray,  # (N, H, W, 4) float [0,1] or uint8
    c2ws: np.ndarray,  # (N, 3, 4) or (N, 4, 4)
    camera_angle_x: float,
    split: str = "train",
) -> Path:
    """Emit a dataset in the literal Blender-synthetic layout.

    Lets procedural scenes (scripts/measure_fit.py) exercise the real loader
    end-to-end, and gives tests a format-true fixture writer.
    """
    root = Path(root)
    (root / split).mkdir(parents=True, exist_ok=True)
    if images_rgba.dtype != np.uint8:
        images_rgba = (np.clip(images_rgba, 0.0, 1.0) * 255).astype(np.uint8)
    frames = []
    for i, (im, c2w) in enumerate(zip(images_rgba, c2ws)):
        rel = f"./{split}/r_{i}"
        PILImage.fromarray(im, "RGBA").save(root / f"{split}/r_{i}.png")
        m = np.eye(4, dtype=np.float64)
        m[:3, :4] = np.asarray(c2w, np.float64)[:3, :4]
        frames.append({"file_path": rel, "transform_matrix": m.tolist()})
    out = root / f"transforms_{split}.json"
    out.write_text(
        json.dumps({"camera_angle_x": float(camera_angle_x), "frames": frames})
    )
    return out
