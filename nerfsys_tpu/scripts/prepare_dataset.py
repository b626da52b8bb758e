"""COLMAP model -> prepared dataset (the on-disk format everything consumes).

Counterpart of /root/reference/adaptive_nerf/scripts/prepare_dataset.py.
Pipeline: read COLMAP -> camera centers + consistency residuals -> optional
ECEF->ENU (centers, rotations, points3D) -> altitude range from points3D
percentile bounded by camera heights -> ENU->DRB translations and RUB->DRB
rotations -> origin/scale normalization -> evenly-spaced val split ->
per-image undistort -> write rgbs/metadata/mappings/coordinates.

Output (format identical to the reference; .pt written via torch so either
framework can consume it):
    out/<name>/{train,val}/metadata/NNNNNN.pt   {H, W, c2w(3,4), intrinsics, distortion}
    out/<name>/{train,val}/rgbs/NNNNNN.jpg
    out/<name>/coordinates.pt                   {origin_drb, pose_scale_factor,
                                                 altitude_range_enu, enu_ref_coords}
    out/<name>/mappings.txt
"""
from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.colmap_utils import (
    get_cam_intrinsics,
    qvec2rotmat,
    read_model,
)
from nerfsys_tpu.data.transformations import (
    ENU_TO_DRB,
    RDF_TO_RUB,
    choose_enu_origin,
    ecef_to_enu,
    ecef_to_enu_rot,
    ecef_to_geodetic,
    enu_span_meters,
    enu_to_geodetic,
    is_likely_ecef,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="COLMAP -> prepared NeRF dataset")
    p.add_argument("--data_path", required=True,
                   help="dir containing model/ and images/")
    p.add_argument("--output_path", required=True)
    p.add_argument("--val_split", type=float, default=0.25)
    p.add_argument("--ecef_to_enu", action="store_true")
    p.add_argument("--enu_ref", default="mean",
                   choices=["first", "mean", "median", "custom"])
    p.add_argument("--enu_ref_lat", type=float, default=None)
    p.add_argument("--enu_ref_lon", type=float, default=None)
    p.add_argument("--enu_ref_alt", type=float, default=None)
    p.add_argument("--scale_strategy", default="camera_max",
                   choices=["camera_max", "camera_p99", "bbox_diag"])
    p.add_argument("--points_low_alt_percentile", type=float, default=0.05)
    p.add_argument("--maximum_allowed_height", type=float, default=150.0)
    p.add_argument("--verify_enu_geodetic", action="store_true")
    p.add_argument("--yes", action="store_true",
                   help="overwrite output dir without prompting")
    return p.parse_args(argv)


def compute_poses(hparams, cameras, images, points3D):
    """Camera geometry pipeline -> (T_drb (N,3) m, R_rub_to_drb (N,3,3),
    coordinates dict). Pure, testable core of the script."""
    images_ordered = sorted(images.values(), key=lambda x: x.id)
    ordered_indices = np.arange(len(images_ordered))

    centers, R_w2c_list = [], []
    for img in images_ordered:
        R_w2c = np.asarray(qvec2rotmat(img.qvec), np.float64)
        t = np.asarray(img.tvec, np.float64)
        C = -R_w2c.T @ t
        residual = R_w2c @ C + t
        if np.linalg.norm(residual) > 1e-6:
            print(f"[WARN] COLMAP consistency residual {img.id}: "
                  f"{np.linalg.norm(residual):.3e}")
        centers.append(C)
        R_w2c_list.append(R_w2c)
    centers = np.stack(centers)
    R_c2w_rdf = np.transpose(np.stack(R_w2c_list), (0, 2, 1))

    mean_radius = np.linalg.norm(centers, axis=1).mean()
    print(f"Mean radius (ECEF heuristic): {mean_radius:.1f} m "
          f"(ECEF? {'YES' if is_likely_ecef(centers) else 'NO'})")

    pts_xyz = (
        np.stack([np.asarray(p.xyz, np.float64) for p in points3D.values()])
        if points3D else None
    )

    enu_ref_coords = None
    if hparams.ecef_to_enu:
        lats, lons, alts = ecef_to_geodetic(
            centers[:, 0], centers[:, 1], centers[:, 2]
        )
        dlat_m, dlon_m = enu_span_meters(
            lats.min(), lats.max(), lons.min(), lons.max(),
            lats.mean(), lons.mean(), alts.mean(),
        )
        print(f"Geodetic spans: lat ~{dlat_m:.1f} m, lon ~{dlon_m:.1f} m, "
              f"alt {alts.max() - alts.min():.2f} m")
        custom = (hparams.enu_ref_lat, hparams.enu_ref_lon, hparams.enu_ref_alt)
        lat0, lon0, h0, desc = choose_enu_origin(
            hparams.enu_ref, lats, lons, alts, ordered_indices, custom
        )
        print(f"ENU origin ({desc}): {lat0:.8f}, {lon0:.8f}, {h0:.3f}")
        cam_enu = ecef_to_enu(
            centers[:, 0], centers[:, 1], centers[:, 2], lat0, lon0, h0
        )
        Q = ecef_to_enu_rot(lat0, lon0)
        R_c2w_rdf = Q @ R_c2w_rdf
        pts_up = (
            ecef_to_enu(pts_xyz[:, 0], pts_xyz[:, 1], pts_xyz[:, 2],
                        lat0, lon0, h0)[:, 2]
            if pts_xyz is not None else None
        )
        enu_ref_coords = (float(lat0), float(lon0), float(h0))
    else:
        cam_enu = centers.copy()
        pts_up = pts_xyz[:, 2] if pts_xyz is not None else None
        print("[INFO] Assuming input world is already ENU (East, North, Up).")

    # altitude range: points3D low percentile, bounded below by cameras
    cam_up = cam_enu[:, 2]
    lowest_acceptable = float(cam_up.min()) - hparams.maximum_allowed_height
    if pts_up is not None and pts_up.size:
        p_low = float(np.quantile(pts_up, hparams.points_low_alt_percentile))
        lowest_point = max(p_low, lowest_acceptable)
    else:
        lowest_point = lowest_acceptable
        print("[WARN] empty points3D; altitude floor from cameras only")
    altitude_range_enu = np.array([lowest_point, float(cam_up.max())], np.float32)

    # ENU -> DRB translations; RUB -> DRB rotations
    T_drb = cam_enu @ ENU_TO_DRB.T
    R_rub_to_drb = (ENU_TO_DRB @ R_c2w_rdf @ RDF_TO_RUB).astype(np.float32)

    # sanity: R and T live in the same world basis (reference exit code 3)
    if not np.allclose(ENU_TO_DRB @ cam_enu[0], T_drb[0], atol=1e-6):
        print("[ERR] R/T world-basis mismatch.")
        sys.exit(3)

    # origin / scale
    max_vals, min_vals = T_drb.max(0), T_drb.min(0)
    origin_drb = 0.5 * (max_vals + min_vals)
    dists = np.linalg.norm(T_drb - origin_drb, axis=1)
    if hparams.scale_strategy == "camera_max":
        scale = float(dists.max())
    elif hparams.scale_strategy == "camera_p99":
        scale = float(np.quantile(dists, 0.99))
    else:
        scale = float(max(np.linalg.norm(max_vals - min_vals) * 0.5, 1e-8))
    print(f"Origin (DRB, m): {origin_drb.tolist()}  scale: {scale:.6f}")

    coordinates = {
        "origin_drb": origin_drb.astype(np.float32),
        "pose_scale_factor": scale,
        "altitude_range_enu": altitude_range_enu,
        "enu_ref_coords": enu_ref_coords,
    }
    return images_ordered, T_drb, R_rub_to_drb, coordinates, cam_enu


def main(hparams=None):
    import torch  # .pt output for format parity

    hparams = hparams or parse_args()
    cameras, images, points3D = read_model(str(Path(hparams.data_path) / "model"))
    print(f"Loaded {len(images)} images, {len(points3D)} points3D, "
          f"{len(cameras)} cameras.")

    images_ordered, T_drb, R_rub_to_drb, coordinates, cam_enu = compute_poses(
        hparams, cameras, images, points3D
    )

    out_dir = Path(hparams.output_path)
    if out_dir.exists():
        if not hparams.yes:
            resp = input(f"[WARNING] {out_dir} exists. Overwrite? [y/N]: ")
            if resp.strip().lower() not in ("y", "yes"):
                print("Aborting.")
                return
        shutil.rmtree(out_dir)
    for split in ("train", "val"):
        (out_dir / split / "metadata").mkdir(parents=True, exist_ok=True)
        (out_dir / split / "rgbs").mkdir(parents=True, exist_ok=True)

    # deterministic name-sorted order; evenly-spaced val split
    all_by_name = sorted(images.values(), key=lambda x: x.name)
    N = len(all_by_name)
    num_val = max(0, int(round(hparams.val_split * N)))
    val_ids = (
        set(np.round(np.linspace(0, N - 1, num=num_val)).astype(int).tolist())
        if num_val else set()
    )
    print(f"{num_val} images reserved for validation (evenly spaced).")

    index_by_name = {img.name: i for i, img in enumerate(images_ordered)}
    origin = coordinates["origin_drb"]
    scale = coordinates["pose_scale_factor"]

    try:
        import cv2
    except ImportError:
        cv2 = None
        print("[WARN] cv2 unavailable: images copied without undistortion")

    with (out_dir / "mappings.txt").open("w") as mappings_f:
        for i, img in enumerate(all_by_name):
            split_dir = out_dir / ("val" if i in val_ids else "train")
            cam = cameras[img.camera_id]
            intr, distortion, dist_how = get_cam_intrinsics(cam)
            K = np.array(
                [[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]]
            )

            src = Path(hparams.data_path) / "images" / img.name
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
                cv2.imwrite(str(split_dir / "rgbs" / f"{i:06d}.jpg"), und)
            else:
                from PIL import Image as PILImage

                im = PILImage.open(src)
                W, H = im.size
                im.convert("RGB").save(split_dir / "rgbs" / f"{i:06d}.jpg")

            j = index_by_name[img.name]
            t_norm = (T_drb[j].astype(np.float32) - origin) / scale
            c2w = np.zeros((3, 4), np.float32)
            c2w[:, :3] = R_rub_to_drb[j]
            c2w[:, 3] = t_norm

            torch.save(
                {
                    "H": H,
                    "W": W,
                    "c2w": torch.from_numpy(c2w),
                    "intrinsics": torch.tensor(intr, dtype=torch.float32),
                    "distortion": torch.tensor(distortion, dtype=torch.float32),
                },
                split_dir / "metadata" / f"{i:06d}.pt",
            )
            mappings_f.write(f"{img.name},{i:06d}.pt\n")

    torch.save(
        {
            "origin_drb": torch.from_numpy(coordinates["origin_drb"]),
            "pose_scale_factor": coordinates["pose_scale_factor"],
            "altitude_range_enu": torch.from_numpy(
                coordinates["altitude_range_enu"]
            ),
            "enu_ref_coords": coordinates["enu_ref_coords"],
        },
        out_dir / "coordinates.pt",
    )
    print("Dataset preparation complete.")

    if hparams.verify_enu_geodetic and hparams.ecef_to_enu:
        lat0, lon0, h0 = coordinates["enu_ref_coords"]
        geo = np.stack(
            enu_to_geodetic(cam_enu[:, 0], cam_enu[:, 1], cam_enu[:, 2],
                            lat0, lon0, h0), -1,
        )
        print(f"[VERIFY] ENU->geodetic lat range "
              f"{geo[:, 0].min():.8f}..{geo[:, 0].max():.8f}, "
              f"alt {geo[:, 2].min():.2f}..{geo[:, 2].max():.2f}")


if __name__ == "__main__":
    main()
