"""Viewer-side geometry helpers and continual-batch validation.

Counterpart of /root/reference/adaptive_nerf/viewer/utils.py:18-247:
RUB<->DRB basis changes used to turn a web-client camera into a scene ray
origin, look-at pose construction for the camera buttons, input sanitizers,
and the Scan & Verify structural validation of continual batches.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

# Column basis changes between RUB (viewer/camera world) and DRB (scene
# world: Down, Right, Back). DRB axes expressed in RUB: D=-U, R=+R, B=+B.
RUB_TO_DRB = np.array(
    [
        [0.0, -1.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)
DRB_TO_RUB = RUB_TO_DRB.T.copy()


def rub_pose_to_drb(c2w_rub: np.ndarray) -> np.ndarray:
    """(3,4) or (4,4) camera-to-world in RUB world -> (3,4) in DRB world.

    Rotation columns stay RUB camera axes (the ray convention expects
    RUB-camera -> DRB-world, see data/transformations and ops/rays).
    """
    c2w = np.asarray(c2w_rub, np.float32)
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = RUB_TO_DRB @ c2w[:3, :3]
    out[:, 3] = RUB_TO_DRB @ c2w[:3, 3]
    return out


def normalize_position(
    t_world: np.ndarray, origin: np.ndarray, pose_scale_factor: float
) -> np.ndarray:
    """Metric world translation -> normalized scene coordinates."""
    return (np.asarray(t_world, np.float32) - np.asarray(origin, np.float32)) / float(
        pose_scale_factor
    )


def look_at_rub(
    eye: np.ndarray, target: np.ndarray, up: Optional[np.ndarray] = None
) -> np.ndarray:
    """Build a (3,4) RUB camera-to-world looking from eye at target."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up if up is not None else [0.0, 1.0, 0.0], np.float64)

    back = eye - target  # RUB: camera looks along -z (back = +z)
    back = back / max(np.linalg.norm(back), 1e-12)
    right = np.cross(up, back)
    nr = np.linalg.norm(right)
    if nr < 1e-9:  # degenerate up: pick any perpendicular
        alt = np.array([1.0, 0.0, 0.0])
        if abs(back @ alt) > 0.9:
            alt = np.array([0.0, 0.0, 1.0])
        right = np.cross(alt, back)
        nr = np.linalg.norm(right)
    right = right / nr
    true_up = np.cross(back, right)
    c2w = np.zeros((3, 4), np.float32)
    c2w[:, 0] = right
    c2w[:, 1] = true_up
    c2w[:, 2] = back
    c2w[:, 3] = eye
    return c2w


def pose_look_center(
    c2w_rub: np.ndarray, center: np.ndarray, up: Optional[np.ndarray] = None
) -> np.ndarray:
    """Re-aim the camera at the scene center, keeping its position
    (reference viewer.py:241-245)."""
    eye = np.asarray(c2w_rub, np.float32)[:3, 3]
    return look_at_rub(eye, center, up)


def pose_snap_dir(c2w_rub: np.ndarray, fwd_rub: np.ndarray) -> np.ndarray:
    """Snap the view direction to a world axis, keeping position
    (reference viewer.py:247-250: Look Front/Right/Down)."""
    eye = np.asarray(c2w_rub, np.float32)[:3, 3]
    return look_at_rub(eye, eye + np.asarray(fwd_rub, np.float32))


def pose_dolly(c2w_rub: np.ndarray, *, forward: bool, step: float) -> np.ndarray:
    """Translate along the view direction by `step` world units
    (reference viewer.py:252-261: Dolly In/Out)."""
    c2w = np.asarray(c2w_rub, np.float32).copy()
    back = c2w[:3, 2]
    c2w[:3, 3] += (-back if forward else back) * float(step)
    return c2w


def safe_bg(policy: str, allowed=("white", "black", "random", "last_sample",
                                  "none", "nerf")) -> str:
    """Clamp a GUI background policy string to the supported set."""
    p = str(policy).strip().lower()
    return p if p in allowed else "white"


def safe_active_module(idx, num_experts: int) -> Optional[int]:
    """GUI expert selector -> int in [0, K) or None for 'all'."""
    try:
        i = int(idx)
    except (TypeError, ValueError):
        return None
    if 0 <= i < int(num_experts):
        return i
    return None


# --------------------------- continual batch validation ----------------------
_REQUIRED_META_KEYS = ("H", "W", "c2w", "intrinsics")


def verify_continual_batch_dir(batch_dir) -> Tuple[bool, List[str], Dict]:
    """Structural validation of a continual batch directory
    (reference viewer/utils.py:126-247 'Scan & Verify').

    Checks: manifest.json exists and parses; rgbs/ and metadata/ exist;
    every manifest item has both files; a spot-checked metadata .pt has the
    required schema (H, W int; c2w (3,4); intrinsics (>=4,)).

    Returns (ok, problems, summary).
    """
    problems: List[str] = []
    batch_dir = Path(batch_dir)
    summary: Dict = {"batch_dir": str(batch_dir), "count": 0}

    if not batch_dir.is_dir():
        return False, [f"not a directory: {batch_dir}"], summary

    manifest_path = batch_dir / "manifest.json"
    manifest = None
    if not manifest_path.exists():
        problems.append("manifest.json missing")
    else:
        try:
            manifest = json.loads(manifest_path.read_text())
        except Exception as e:
            problems.append(f"manifest.json unreadable: {e}")

    meta_dir = batch_dir / "metadata"
    rgb_dir = batch_dir / "rgbs"
    if not meta_dir.is_dir():
        problems.append("metadata/ missing")
    if not rgb_dir.is_dir():
        problems.append("rgbs/ missing")
    if problems:
        return False, problems, summary

    ids: List[str] = []
    if manifest is not None and isinstance(manifest.get("items"), list):
        ids = [str(it.get("id")) for it in manifest["items"] if it.get("id")]
        declared = manifest.get("count")
        if declared is not None and int(declared) != len(manifest["items"]):
            problems.append(
                f"manifest count {declared} != items {len(manifest['items'])}"
            )
    if not ids:  # fall back to directory scan
        ids = sorted(p.stem for p in meta_dir.glob("*.pt"))
    summary["count"] = len(ids)
    if not ids:
        problems.append("no images declared or found")
        return False, problems, summary

    for img_id in ids:
        if not (meta_dir / f"{img_id}.pt").exists():
            problems.append(f"metadata/{img_id}.pt missing")
        if not any(
            (rgb_dir / f"{img_id}{ext}").exists()
            for ext in (".jpg", ".JPG", ".png", ".PNG")
        ):
            problems.append(f"rgbs/{img_id}.* missing")
        if len(problems) > 20:
            problems.append("... (truncated)")
            break

    # schema spot check on the first metadata file
    if not problems:
        from nerfsys_tpu.data.image_metadata import load_pt

        try:
            md = load_pt(meta_dir / f"{ids[0]}.pt")
            for k in _REQUIRED_META_KEYS:
                if k not in md:
                    problems.append(f"metadata schema: missing key {k!r}")
            if "c2w" in md and tuple(np.asarray(md["c2w"]).shape) != (3, 4):
                problems.append(
                    f"metadata schema: c2w shape {np.asarray(md['c2w']).shape}"
                    " != (3, 4)"
                )
            if "intrinsics" in md and np.asarray(md["intrinsics"]).size < 4:
                problems.append("metadata schema: intrinsics has < 4 entries")
        except Exception as e:
            problems.append(f"metadata spot check failed: {e}")

    return (not problems), problems, summary


def load_continual_batch_metadata(batch_dir, scale_factor: float = 1.0):
    """Continual batch dir -> List[ImageMetadata] (viewer adaptation input)."""
    from nerfsys_tpu.data.dataset import _list_metadata_files, get_metadata_item

    batch_dir = Path(batch_dir)
    out = []
    for i, p in enumerate(_list_metadata_files(batch_dir / "metadata")):
        md = get_metadata_item(p, i, scale_factor, is_val=False)
        if md is not None:
            out.append(md)
    return out
