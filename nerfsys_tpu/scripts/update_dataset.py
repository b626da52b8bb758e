"""Incremental dataset update: append NEW images into continual/<batch>/.

Counterpart of /root/reference/adaptive_nerf/scripts/update_dataset.py.
Reads an updated COLMAP model, keeps ONLY images absent from the prepared
dataset's mappings.txt, reprojects them with the scene's STORED
origin/scale/ENU reference (so poses land in the same normalized DRB space),
and writes continual/<batch_tag>/{rgbs,metadata,manifest.json}.

Overflow policy: normalized translations outside [-1, 1] mean the new capture
left the original scene envelope — abort (default) or clip.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.colmap_utils import (
    get_cam_intrinsics,
    qvec2rotmat,
    read_model,
)
from nerfsys_tpu.data.image_metadata import load_pt
from nerfsys_tpu.data.transformations import (
    ENU_TO_DRB,
    RDF_TO_RUB,
    ecef_to_enu,
    ecef_to_enu_rot,
    is_likely_ecef,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Append new images to a prepared dataset")
    p.add_argument("--data_path", required=True,
                   help="dir with the UPDATED COLMAP model/ and images/")
    p.add_argument("--prepared_dir", required=True,
                   help="existing prepared dataset root")
    p.add_argument("--batch_tag", default=None,
                   help="continual batch name; default batch_NNNN auto")
    p.add_argument("--on_overflow", default="abort", choices=["abort", "clip"])
    p.add_argument("--ecef_to_enu", action="store_true")
    return p.parse_args(argv)


def _known_names(prepared_dir: Path) -> set:
    mp = prepared_dir / "mappings.txt"
    names = set()
    if mp.exists():
        for line in mp.read_text().splitlines():
            if "," in line:
                names.add(line.split(",", 1)[0])
    # include names already added by previous continual batches
    cont = prepared_dir / "continual"
    if cont.exists():
        for mf in cont.glob("*/manifest.json"):
            for item in json.loads(mf.read_text()).get("items", []):
                names.add(item["image_name"])
    return names


def _next_ids(prepared_dir: Path) -> int:
    """First unused numeric image id across base splits + continual batches."""
    mx = -1
    for split in ("train", "val"):
        for f in (prepared_dir / split / "metadata").glob("*.pt"):
            mx = max(mx, int(f.stem))
    cont = prepared_dir / "continual"
    if cont.exists():
        for f in cont.glob("*/metadata/*.pt"):
            mx = max(mx, int(f.stem))
    return mx + 1


def main(hp=None):
    import torch

    hp = hp or parse_args()
    prepared = Path(hp.prepared_dir)
    coord = load_pt(prepared / "coordinates.pt")
    origin = np.asarray(coord["origin_drb"], np.float64)
    scale = float(coord["pose_scale_factor"])
    enu_ref = coord.get("enu_ref_coords")

    cameras, images, _ = read_model(str(Path(hp.data_path) / "model"))
    known = _known_names(prepared)
    new_imgs = sorted(
        (im for im in images.values() if im.name not in known),
        key=lambda im: im.name,
    )
    print(f"{len(new_imgs)} new images (of {len(images)} in model)")
    if not new_imgs:
        print("Nothing to do.")
        return None

    cont = prepared / "continual"
    if hp.batch_tag is None:
        n_existing = len(list(cont.glob("batch_*"))) if cont.exists() else 0
        hp.batch_tag = f"batch_{n_existing + 1:04d}"
    batch_dir = cont / hp.batch_tag
    (batch_dir / "metadata").mkdir(parents=True, exist_ok=True)
    (batch_dir / "rgbs").mkdir(parents=True, exist_ok=True)

    try:
        import cv2
    except ImportError:
        cv2 = None

    next_id = _next_ids(prepared)
    manifest_items = []
    for j, img in enumerate(new_imgs):
        R_w2c = np.asarray(qvec2rotmat(img.qvec), np.float64)
        t = np.asarray(img.tvec, np.float64)
        C = -R_w2c.T @ t
        R_c2w = R_w2c.T

        if hp.ecef_to_enu:
            if enu_ref is None:
                raise ValueError(
                    "--ecef_to_enu requested but coordinates.pt stores no "
                    "enu_ref_coords"
                )
            lat0, lon0, h0 = enu_ref
            C = ecef_to_enu(C[0], C[1], C[2], lat0, lon0, h0)
            R_c2w = ecef_to_enu_rot(lat0, lon0) @ R_c2w
        elif is_likely_ecef(C[None]):
            print(f"[WARN] {img.name}: center looks ECEF but --ecef_to_enu not set")

        t_drb = ENU_TO_DRB @ np.asarray(C, np.float64).reshape(3)
        R_rub_drb = (ENU_TO_DRB @ R_c2w @ RDF_TO_RUB).astype(np.float32)
        t_norm = (t_drb - origin) / scale

        max_abs = float(np.abs(t_norm).max())
        if max_abs > 1.0 + 1e-6:
            if hp.on_overflow == "abort":
                raise SystemExit(
                    f"[ABORT] {img.name}: |t_norm|={max_abs:.3f} > 1. New capture "
                    "leaves the scene envelope — recompute origin/scale with "
                    "old+new, or rerun with --on_overflow clip."
                )
            print(f"[CLIP] {img.name}: |t_norm|={max_abs:.3f} clipped to [-1,1]")
            t_norm = np.clip(t_norm, -1.0, 1.0)

        cam = cameras[img.camera_id]
        intr, distortion, dist_how = get_cam_intrinsics(cam)
        K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])

        src = Path(hp.data_path) / "images" / img.name
        img_id = f"{next_id + j:06d}"
        if cv2 is not None:
            raw = cv2.imread(str(src))
            if raw is None:
                raise FileNotFoundError(src)
            if dist_how == "fisheye":
                und = cv2.fisheye.undistortImage(raw, K, distortion)
            elif dist_how == "opencv":
                und = cv2.undistort(raw, K, distortion)
            else:
                und = raw
            H, W = und.shape[:2]
            cv2.imwrite(str(batch_dir / "rgbs" / f"{img_id}.jpg"), und)
        else:
            from PIL import Image as PILImage

            im = PILImage.open(src)
            W, H = im.size
            im.convert("RGB").save(batch_dir / "rgbs" / f"{img_id}.jpg")

        c2w = np.zeros((3, 4), np.float32)
        c2w[:, :3] = R_rub_drb
        c2w[:, 3] = t_norm.astype(np.float32)
        torch.save(
            {
                "H": H,
                "W": W,
                "c2w": torch.from_numpy(c2w),
                "intrinsics": torch.tensor(intr, dtype=torch.float32),
                "distortion": torch.tensor(distortion, dtype=torch.float32),
            },
            batch_dir / "metadata" / f"{img_id}.pt",
        )
        manifest_items.append(
            {
                "image_name": img.name,
                "id": img_id,
                "camera_id": int(img.camera_id),
                "undistort": dist_how,
                "pose_rev": 0,
            }
        )

    manifest = {
        "batch_tag": hp.batch_tag,
        "count": len(manifest_items),
        "items": manifest_items,
    }
    (batch_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"Wrote {len(manifest_items)} images to {batch_dir}")
    return batch_dir


if __name__ == "__main__":
    main()
