"""Dataset diagnostics report: poses, altitudes, FOV, roll distribution.

Counterpart of /root/reference/adaptive_nerf/scripts/log_dataset_info.py
(:155-382), section for section: dataset overview, pose normalization, ray
counts, resolution histogram, camera positions in normalized DRB and world
meters (percentile tables, out-of-range warning, bbox diagonal, pairwise
baseline distances), rotation consistency (determinant / orthogonality,
pitch bands from Down, signed roll about forward, yaw), and intrinsics/FOV
stats with the principal-point and non-square-pixel warnings. Also audits
the optional mask dir and continual batches (TPU-build extras).

Writes <ds_root>/info.txt like the reference when the directory is
writable; always prints to stdout.
"""
from __future__ import annotations

import argparse
import math
from collections import Counter
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.dataset import get_image_metadata, load_coordinates

_PCT = [0, 1, 5, 50, 95, 99, 100]


class _Report:
    """stdout + optional file sink (reference Logger, log_dataset_info.py:157)."""

    def __init__(self, path=None):
        self._fh = None
        if path is not None:
            try:
                self._fh = open(path, "w")
            except OSError:
                print(f"[info] {path} not writable; stdout only")

    def write(self, s: str = ""):
        print(s)
        if self._fh:
            self._fh.write(s + "\n")

    def hdr(self, s: str):
        self.write("\n" + s)
        self.write("-" * len(s))

    def close(self):
        if self._fh:
            self._fh.close()


def _range_mean_std(v: np.ndarray) -> str:
    return (f"min={v.min():.6f}, max={v.max():.6f}, "
            f"mean={v.mean():.6f}, std={v.std():.6f}")


def _quantiles(v: np.ndarray, pct) -> list:
    return [float(q) for q in np.percentile(v, pct)]


def _fov_deg(W, H, fx, fy):
    return (2.0 * math.degrees(math.atan2(0.5 * W, fx)),
            2.0 * math.degrees(math.atan2(0.5 * H, fy)))


def _signed_roll_deg(R_stack: np.ndarray) -> np.ndarray:
    """Signed roll (deg) about the camera forward axis vs projected world-up
    (reference log_dataset_info.py:130-152). R_stack: (N,3,3) RUB->DRB."""
    fwd = -R_stack[:, :, 2]
    up = R_stack[:, :, 1]
    world_up = np.array([-1.0, 0.0, 0.0])  # DRB Up = -Down(+X)

    def proj(v, n):
        return v - np.sum(v * n, axis=1, keepdims=True) * n

    def normalize(v):
        return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)

    u_proj = normalize(proj(up, fwd))
    w_proj = normalize(proj(np.broadcast_to(world_up, up.shape), fwd))
    cross_uw = np.cross(w_proj, u_proj)
    sin_th = np.sum(cross_uw * fwd, axis=1)
    cos_th = np.clip(np.sum(w_proj * u_proj, axis=1), -1, 1)
    return np.degrees(np.arctan2(sin_th, cos_th))


def log_dataset_info(data_path, downscale: float = 1.0, mask_dirname=None,
                     out_path=None):
    root = Path(data_path)
    coord = load_coordinates(root)
    rep = _Report(out_path if out_path is not None else root / "info.txt")

    train, val = get_image_metadata(root, downscale)
    all_meta = list(train) + list(val)
    scale = float(coord["pose_scale_factor"])
    origin = np.asarray(coord["origin_drb"], np.float32)

    # ---------------- Dataset / pose normalization ----------------
    rep.hdr("Dataset")
    rep.write(f"path                : {root}")
    rep.write(f"images (train/val)  : {len(train)} / {len(val)} "
              f"(total={len(all_meta)})")

    rep.hdr("Pose normalization")
    rep.write(f"origin_drb (m)      : {origin.tolist()}")
    rep.write(f"pose_scale_factor   : {scale:.6f}")
    if coord.get("altitude_range_enu") is not None:
        band = np.asarray(coord["altitude_range_enu"], np.float32)
        rep.write(f"altitude_range_enu (m): [{band[0]:.3f}, {band[1]:.3f}]")

    # ---------------- Collect ----------------
    res_ct = Counter()
    rays_train = sum(m.W * m.H for m in train)
    rays_val = sum(m.W * m.H for m in val)
    for m in all_meta:
        res_ct[(m.W, m.H)] += 1
    cams_drb = (np.stack([m.c2w[:, 3] for m in all_meta])
                if all_meta else np.zeros((0, 3), np.float32))
    R_stack = (np.stack([m.c2w[:, :3] for m in all_meta])
               if all_meta else np.zeros((0, 3, 3), np.float32))
    intr = (np.stack([np.asarray(m.intrinsics[:4], np.float32)
                      for m in all_meta])
            if all_meta else np.zeros((0, 4), np.float32))

    # ---------------- Ray counts / resolutions ----------------
    rep.hdr("Ray counts")
    total = rays_train + rays_val
    rep.write(f"train rays          : {rays_train:,} (~{rays_train/1e6:.3f} M)")
    rep.write(f"val rays            : {rays_val:,}   (~{rays_val/1e6:.3f} M)")
    rep.write(f"total rays          : {total:,} (~{total/1e6:.3f} M)")

    rep.hdr("Image resolutions (WxH : count)")
    for (W, H), c in sorted(res_ct.items()):
        rep.write(f"{W}x{H} : {c}")

    # ---------------- Camera positions ----------------
    rep.hdr("Camera positions — normalized DRB")
    if cams_drb.size == 0:
        rep.write("no cameras found")
    else:
        for label, v in zip(("Down(+X)", "Right(+Y)", "Back(+Z)"),
                            cams_drb.T):
            rep.write(f"{label}: {_range_mean_std(v)}")
            rep.write(f"{label} pct {_PCT}: "
                      f"{[round(x, 6) for x in _quantiles(v, _PCT)]}")
        oor = int((np.abs(cams_drb) > 1.0001).any(axis=1).sum())
        if oor:
            rep.write(f"WARNING: {oor} camera translations fall outside "
                      f"[-1,1] after normalization.")

    cams_world = cams_drb * scale + origin
    rep.hdr("Camera positions — world meters")
    if cams_world.size == 0:
        rep.write("no cameras found")
    else:
        for label, v in zip(("Down(+X)", "Right(+Y)", "Back(+Z)"),
                            cams_world.T):
            rep.write(f"{label}(m): {_range_mean_std(v)}")
            rep.write(f"{label} pct(m) {_PCT}: "
                      f"{[round(x, 3) for x in _quantiles(v, _PCT)]}")
        bbox_diag = float(np.linalg.norm(cams_world.max(0) - cams_world.min(0)))
        rep.write(f"\nScene extent (world m): bbox diag={bbox_diag:.3f}")
        if len(cams_world) > 1:
            rng = np.random.default_rng(0)
            idx = rng.permutation(len(cams_world))[: min(500, len(cams_world))]
            sub = cams_world[idx]
            d = np.linalg.norm(sub[:, None] - sub[None], axis=-1)
            d = d[d > 0]
            if d.size:
                q = np.quantile(d, [0.05, 0.5, 0.95])
                rep.write(
                    f"Baseline distance among cameras (m): min={d.min():.3f},"
                    f" p05={q[0]:.3f}, med={q[1]:.3f}, p95={q[2]:.3f},"
                    f" max={d.max():.3f}")

    # ---------------- Rotation consistency ----------------
    rep.hdr("Rotation consistency — DRB")
    if len(R_stack):
        dets = np.linalg.det(R_stack)
        ortho = np.linalg.norm(
            np.swapaxes(R_stack, 1, 2) @ R_stack - np.eye(3), axis=(1, 2)
        )
        rep.write(f"det(R_drb): mean={dets.mean():.6f}, "
                  f"min={dets.min():.6f}, max={dets.max():.6f}")
        rep.write(f"orthogonality ||R^T R - I||_F: mean={ortho.mean():.2e}, "
                  f"p95={np.quantile(ortho, 0.95):.2e}, max={ortho.max():.2e}")

        forwards = -R_stack[:, :, 2]
        rep.write(f"Mean forward vector (DRB frame): "
                  f"{forwards.mean(0).tolist()}")

        # pitch: angle to Down(+X); 0 = nadir, 90 = horizontal, 180 = up
        pitch = np.degrees(np.arccos(np.clip(forwards[:, 0], -1, 1)))
        yaw = np.degrees(np.arctan2(forwards[:, 2], forwards[:, 1]))
        roll = _signed_roll_deg(R_stack)

        bands = [5, 15, 30, 45, 60]
        edges = [0] + bands + [180]
        fracs = [float(((pitch >= lo) & (pitch < hi)).mean())
                 for lo, hi in zip(edges[:-1], edges[1:])]
        labels = ["<5°", "5–15°", "15–30°", "30-45°", "45–60°", "≥60°"]
        rep.write("Pitch from Down (DRB): " + ", ".join(
            f"{l} {100*f:.1f}%" for l, f in zip(labels, fracs)))
        rep.write(f"Pitch stats (deg): mean={pitch.mean():.2f}, "
                  f"median={np.median(pitch):.2f}, "
                  f"p95={np.quantile(pitch, 0.95):.2f}")
        rep.write(f"Roll  stats (deg): mean={roll.mean():.2f}, "
                  f"median={np.median(roll):.2f}, "
                  f"p95={np.quantile(roll, 0.95):.2f}")
        rep.write(f"Yaw   stats (deg): mean={yaw.mean():.2f}, "
                  f"std={yaw.std():.2f}")

    # ---------------- Intrinsics & FOV ----------------
    rep.hdr("Intrinsics & FOV")
    if len(intr):
        fx, fy, cx, cy = intr.T
        rep.write(f"fx: {_range_mean_std(fx)}")
        rep.write(f"fy: {_range_mean_std(fy)}")
        rep.write(f"cx: {_range_mean_std(cx)}")
        rep.write(f"cy: {_range_mean_std(cy)}")
        fovs = np.array([_fov_deg(m.W, m.H, i[0], i[1])
                         for m, i in zip(all_meta, intr)])
        rep.write(f"FOVx(deg): {_range_mean_std(fovs[:, 0])}")
        rep.write(f"FOVy(deg): {_range_mean_std(fovs[:, 1])}")

        W0, H0 = all_meta[0].W, all_meta[0].H
        cx_rel = float(np.abs(cx / max(W0, 1e-8) - 0.5).mean())
        cy_rel = float(np.abs(cy / max(H0, 1e-8) - 0.5).mean())
        rep.write(f"Principal point offset (mean abs): "
                  f"|cx/W-0.5|={cx_rel:.4f}, |cy/H-0.5|={cy_rel:.4f}")
        if abs(fx.mean() - fy.mean()) / max(1e-8, fy.mean()) > 0.1:
            rep.write("WARNING: fx and fy differ by >10% (non-square pixels).")

    # ---------------- TPU-build extras: masks + continual ----------------
    if mask_dirname:
        from nerfsys_tpu.data.dataset import load_scene_boxes

        rep.hdr("Clustering masks")
        scene_aabb, expert_aabbs = load_scene_boxes(root / "masks" / mask_dirname)
        rep.write(f"global scene box: {np.asarray(scene_aabb).tolist()}")
        rep.write(f"experts: {np.asarray(expert_aabbs).shape[0]}")

    cont = root / "continual"
    if cont.exists():
        batches = sorted(cont.glob("batch_*"))
        rep.hdr("Continual batches")
        rep.write(f"{len(batches)} batches: "
                  + ", ".join(b.name for b in batches))

    rep.write("\nDataset statistics complete.")
    rep.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--downscale", type=float, default=1.0)
    p.add_argument("--mask_dirname", default=None)
    p.add_argument("--out", default=None,
                   help="report file (default <data_path>/info.txt)")
    a = p.parse_args(argv)
    log_dataset_info(a.data_path, a.downscale, a.mask_dirname, a.out)


if __name__ == "__main__":
    main()
