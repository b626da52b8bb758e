"""Dataset diagnostics report: poses, altitudes, FOV, roll distribution.

Counterpart of /root/reference/adaptive_nerf/scripts/log_dataset_info.py
(:155-382). Prints a structured audit of a prepared dataset: per-split
counts, normalized camera ranges, metric altitude quantiles, field of view,
camera roll distribution, near/far coverage against a scene box.
"""
from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.dataset import get_image_metadata, load_coordinates
from nerfsys_tpu.data.ram_rays import np_ray_aabb_intersect, np_ray_directions


def analyze_split(name, metas, coord, scene_aabb=None):
    if not metas:
        print(f"[{name}] empty")
        return
    c2ws = np.stack([m.c2w for m in metas])
    t = c2ws[:, :, 3]  # (N, 3) normalized DRB
    scale = float(coord["pose_scale_factor"])
    origin = np.asarray(coord["origin_drb"])
    t_m = t * scale + origin

    print(f"\n[{name}] {len(metas)} images")
    print(f"  resolution: {metas[0].W}x{metas[0].H} (scaled)")
    for axis, label in enumerate(["Down", "Right", "Back"]):
        print(f"  {label:5s} norm [{t[:, axis].min():+.3f}, {t[:, axis].max():+.3f}]"
              f"  metric [{t_m[:, axis].min():.1f}, {t_m[:, axis].max():.1f}] m")

    alt_m = -t_m[:, 0]  # Up = -Down
    qs = np.quantile(alt_m, [0.0, 0.25, 0.5, 0.75, 1.0])
    print(f"  altitude quantiles (m, Up): "
          + " ".join(f"{q:.1f}" for q in qs))

    # FOV from intrinsics
    fovs = []
    for m in metas:
        fx = float(m.intrinsics[0])
        fovs.append(2 * math.degrees(math.atan(m.W / (2 * fx))))
    print(f"  horizontal FOV: {np.mean(fovs):.1f}° "
          f"(min {np.min(fovs):.1f}, max {np.max(fovs):.1f})")

    # roll: angle of camera right axis vs world horizontal plane (DRB: D is
    # vertical). right = c2w[:, 0]
    rights = c2ws[:, :, 0]
    roll = np.degrees(np.arcsin(np.clip(rights[:, 0], -1, 1)))
    print(f"  roll (deg): mean {roll.mean():+.2f}, std {roll.std():.2f}, "
          f"max |roll| {np.abs(roll).max():.2f}")

    # down-tilt: forward = -back = -c2w[:, 2]; component along Down axis
    fwd = -c2ws[:, :, 2]
    pitch = np.degrees(np.arcsin(np.clip(fwd[:, 0], -1, 1)))
    print(f"  downward pitch (deg): mean {pitch.mean():+.1f}, "
          f"min {pitch.min():+.1f}, max {pitch.max():+.1f}")

    if scene_aabb is not None:
        # near/far coverage for center rays
        hits = 0
        for m in metas[:64]:
            fx, fy, cx, cy = m.intrinsics[:4]
            d = np_ray_directions(1, 1, fx, fy, cx - m.W / 2, cy - m.H / 2)[0, 0]
            dw = m.c2w[:, :3] @ d
            tmin, tmax = np_ray_aabb_intersect(
                scene_aabb, m.c2w[:, 3][None], dw[None]
            )
            hits += int(tmax[0] < 1e9)
        print(f"  center-ray scene-box hits: {hits}/{min(len(metas), 64)}")


def log_dataset_info(data_path, downscale: float = 1.0, mask_dirname=None):
    root = Path(data_path)
    coord = load_coordinates(root)
    print(f"Dataset: {root}")
    print(f"  pose_scale_factor: {coord['pose_scale_factor']:.4f} m")
    print(f"  origin_drb (m): {np.asarray(coord['origin_drb']).tolist()}")
    if coord.get("altitude_range_enu") is not None:
        print(f"  altitude_range_enu (m): "
              f"{np.asarray(coord['altitude_range_enu']).tolist()}")
    if coord.get("enu_ref_coords"):
        print(f"  enu_ref_coords: {coord['enu_ref_coords']}")

    scene_aabb = None
    if mask_dirname:
        from nerfsys_tpu.data.dataset import load_scene_boxes

        scene_aabb, expert_aabbs = load_scene_boxes(root / "masks" / mask_dirname)
        print(f"  global scene box: {scene_aabb.tolist()}")
        print(f"  experts: {expert_aabbs.shape[0]}")

    train, val = get_image_metadata(root, downscale)
    analyze_split("train", train, coord, scene_aabb)
    analyze_split("val", val, coord, scene_aabb)

    cont = root / "continual"
    if cont.exists():
        batches = sorted(cont.glob("batch_*"))
        print(f"\n[continual] {len(batches)} batches: "
              + ", ".join(b.name for b in batches))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--downscale", type=float, default=1.0)
    p.add_argument("--mask_dirname", default=None)
    a = p.parse_args(argv)
    log_dataset_info(a.data_path, a.downscale, a.mask_dirname)


if __name__ == "__main__":
    main()
