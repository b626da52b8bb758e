"""Clustering preprocessor: route every pixel ray to spatial experts.

Counterpart of /root/reference/adaptive_nerf/scripts/create_clusters.py
(Mega-NeRF-style Voronoi masks). For every image, every pixel ray is sampled
at S uniform points within its global-SceneBox [near, far] span; a pixel
belongs to expert c iff  min_x d²(x, c) <= margin² · min_{c'} min_x d²(x, c')
(strict argmin when margin == 1). Outputs the exact reference mask format:

    masks/<tag>/params.pt        clustering meta (format_version 3)
    masks/<tag>/scene_boxes.pt   global + streamed per-expert AABBs
    masks/<tag>/<cid>/NNNNNN.pt  zip-compressed per-image boolean masks

TPU-native redesign of the compute: the routing core is one batched
x²+c²-2xc GEMM per ray chunk, jitted — it runs the same on CPU or a TPU
chip. Distribution replaces torch.distributed/NCCL with jax.distributed:
images stride by jax.process_index(), and the final AABB/count/stat
reductions go through multihost_utils (psum/pmin/pmax semantics); on one
process they are identity.
"""
from __future__ import annotations

import argparse
import zipfile
from functools import partial
from pathlib import Path
from typing import List, Optional

import numpy as np

from nerfsys_tpu.data.image_metadata import load_pt
from nerfsys_tpu.data.ram_rays import np_clamp_rays, np_get_rays, np_ray_directions


# ------------------------------- io helpers ----------------------------------
def save_zip_mask(path: Path, mask: np.ndarray) -> None:
    """Zip-compressed torch .pt bool tensor (reference mask format)."""
    import io

    import torch

    path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.BytesIO()
    torch.save(torch.from_numpy(np.ascontiguousarray(mask)), buf)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(path.name, buf.getvalue())


def zip_mask_ok(path: Path) -> bool:
    if not path.exists():
        return False
    try:
        import torch

        with zipfile.ZipFile(path, "r") as zf:
            with zf.open(zf.namelist()[0]) as f:
                torch.load(f, map_location="cpu")
        return True
    except Exception:
        return False


def all_ok_for_image(K: int, out_dir: Path, filename: str) -> bool:
    return all(zip_mask_ok(out_dir / str(cid) / filename) for cid in range(K))


def meta_list(ds_root: Path, split: str) -> List[Path]:
    return sorted((ds_root / split / "metadata").glob("*.pt"))


# ------------------------------- centroids ------------------------------------
def grid_centroids(cam_pos: np.ndarray, gx: int, gy: int, gz: int,
                   cluster_2d: bool) -> np.ndarray:
    """Regular grid of centroids over the camera bounding box
    (reference :298-324)."""
    if cam_pos.size == 0:
        C = (gy * gz) if cluster_2d else (gx * gy * gz)
        return np.zeros((C, 3), np.float32)
    minp, maxp = cam_pos.min(0), cam_pos.max(0)
    if cluster_2d:
        x_c = 0.5 * (minp[0] + maxp[0])
        Y = minp[1] + (np.arange(gy) + 0.5) * (maxp[1] - minp[1]) / gy
        Z = minp[2] + (np.arange(gz) + 0.5) * (maxp[2] - minp[2]) / gz
        YY, ZZ = np.meshgrid(Y, Z, indexing="ij")
        return np.stack(
            [np.full_like(YY, x_c), YY, ZZ], -1
        ).reshape(-1, 3).astype(np.float32)
    X = minp[0] + (np.arange(gx) + 0.5) * (maxp[0] - minp[0]) / max(gx, 1)
    Y = minp[1] + (np.arange(gy) + 0.5) * (maxp[1] - minp[1]) / max(gy, 1)
    Z = minp[2] + (np.arange(gz) + 0.5) * (maxp[2] - minp[2]) / max(gz, 1)
    XX, YY, ZZ = np.meshgrid(X, Y, Z, indexing="ij")
    return np.stack([XX, YY, ZZ], -1).reshape(-1, 3).astype(np.float32)


def kmeans_centroids(
    points: np.ndarray, K: int, iters: int = 25, seed: int = 0,
    init: str = "kmeans++", weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Weighted Lloyd k-means with k-means++ init (reference :326-378)."""
    rng = np.random.default_rng(seed)
    n = points.shape[0]
    w = weights if weights is not None else np.ones(n, np.float64)

    if init == "random":
        centers = points[rng.permutation(n)[:K]].copy()
    else:  # kmeans++
        centers = np.empty((K, points.shape[1]), points.dtype)
        p0 = w / w.sum()
        centers[0] = points[rng.choice(n, p=p0)]
        for k in range(1, K):
            d2 = ((points[:, None] - centers[None, :k]) ** 2).sum(-1).min(1)
            probs = np.maximum(d2 * w, 1e-12)
            centers[k] = points[rng.choice(n, p=probs / probs.sum())]

    for _ in range(max(1, iters)):
        d2 = ((points[:, None] - centers[None]) ** 2).sum(-1)  # (n, K)
        a = d2.argmin(1)
        for k in range(K):
            m = a == k
            if not m.any():
                centers[k] = points[d2[:, k].argmax()]
            else:
                centers[k] = (w[m, None] * points[m]).sum(0) / w[m].sum()
    return centers.astype(np.float32)


# ------------------------------- routing core ---------------------------------
def _make_routing_fn(ray_samples: int, cluster_2d: bool, boundary_margin: float):
    """Jitted Voronoi routing over one ray chunk. Pure GEMM formulation:
    d² = |x|² + |c|² − 2·x·cᵀ, then per-ray any-over-samples reduction."""
    import jax
    import jax.numpy as jnp

    start = 1 if cluster_2d else 0
    m2 = float(boundary_margin) ** 2

    @jax.jit
    def route(rays, cents):
        o, d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6], rays[:, 7]
        ok_ray = jnp.isfinite(near) & jnp.isfinite(far) & (far > near)
        near = jnp.where(ok_ray, near, 0.0)
        far = jnp.where(ok_ray, far, 0.0)
        z = jnp.linspace(0.0, 1.0, ray_samples, dtype=rays.dtype)
        t = near[:, None] * (1 - z)[None] + far[:, None] * z[None]  # (R, S)
        x = o[:, None, :] + d[:, None, :] * t[..., None]  # (R, S, 3)
        xs = x[..., start:]  # cluster coords
        cs = cents[:, start:]
        x2 = jnp.sum(xs**2, -1)  # (R, S)
        c2 = jnp.sum(cs**2, -1)  # (C,)
        ip = jnp.einsum("rsk,ck->rsc", xs, cs)
        d2 = jnp.maximum(x2[..., None] + c2[None, None] - 2.0 * ip, 0.0)
        if m2 <= 1.0:
            nn = jnp.argmin(d2, -1)  # (R, S)
            assign = jax.nn.one_hot(nn, cents.shape[0], dtype=bool)  # (R,S,C)
        else:
            d2min = jnp.min(d2, -1, keepdims=True)
            assign = d2 <= m2 * d2min  # (R, S, C)
        mask = jnp.any(assign, axis=1) & ok_ray[:, None]  # (R, C)
        # streamed per-expert AABB stats over assigned sample points
        big = jnp.float32(1e10)
        sel = assign & ok_ray[:, None, None]  # (R,S,C)
        xe = x[..., None, :]  # (R,S,1,3)
        mins = jnp.min(jnp.where(sel[..., None], xe, big), axis=(0, 1))  # (C,3)
        maxs = jnp.max(jnp.where(sel[..., None], xe, -big), axis=(0, 1))
        counts = jnp.sum(sel, axis=(0, 1)).astype(jnp.int64)  # (C,)
        return mask, mins, maxs, counts

    return route


def compute_voronoi(
    rays: np.ndarray,  # (N, 8)
    centroids: np.ndarray,  # (C, 3)
    *,
    ray_samples: int,
    cluster_2d: bool,
    boundary_margin: float,
    ray_chunk_size: int = 131072,
    mins_out: Optional[np.ndarray] = None,  # (C, 3) accumulated in place
    maxs_out: Optional[np.ndarray] = None,
    counts_out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(N, C) bool pixel->expert mask + streamed AABB stats."""
    import jax.numpy as jnp

    route = _make_routing_fn(ray_samples, cluster_2d, boundary_margin)
    cents = jnp.asarray(centroids, jnp.float32)
    N, C = rays.shape[0], centroids.shape[0]
    out = np.zeros((N, C), bool)
    for s in range(0, N, ray_chunk_size):
        chunk = rays[s : s + ray_chunk_size].astype(np.float32)
        pad = 0
        if chunk.shape[0] < ray_chunk_size and N > ray_chunk_size:
            pad = ray_chunk_size - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.full((pad, 8), np.inf, np.float32)], 0
            )
        mask, mins, maxs, counts = route(jnp.asarray(chunk), cents)
        m = chunk.shape[0] - pad
        out[s : s + m] = np.asarray(mask)[:m]
        if mins_out is not None:
            np.minimum(mins_out, np.asarray(mins), out=mins_out)
            np.maximum(maxs_out, np.asarray(maxs), out=maxs_out)
            counts_out += np.asarray(counts)
    return out


# ------------------------------- main ------------------------------------------
def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Create expert cluster masks")
    p.add_argument("--data_path", type=Path, required=True,
                   help="prepared dataset root (contains coordinates.pt)")
    p.add_argument("--output", type=str, required=True,
                   help="mask tag dir name under masks/")
    p.add_argument("--grid_dim", type=int, nargs="+", default=[2, 2])
    p.add_argument("--cluster_2d", action="store_true", default=True)
    p.add_argument("--no_cluster_2d", dest="cluster_2d", action="store_false")
    p.add_argument("--centroid_mode", default="grid", choices=["grid", "kmeans"])
    p.add_argument("--kmeans_iters", type=int, default=25)
    p.add_argument("--kmeans_seed", type=int, default=0)
    p.add_argument("--kmeans_init", default="kmeans++",
                   choices=["kmeans++", "random"])
    p.add_argument("--kmeans_weight_by_pixels", action="store_true")
    p.add_argument("--boundary_margin", type=float, default=1.1)
    p.add_argument("--ray_samples", type=int, default=256)
    p.add_argument("--ray_chunk_size", type=int, default=131072)
    p.add_argument("--scene_scale", type=float, default=1.1)
    p.add_argument("--altitude_range", type=float, nargs=2, default=None)
    p.add_argument("--altitude_pad", type=float, default=0.0)
    p.add_argument("--box_margin", type=float, default=0.0)
    p.add_argument("--near", type=float, default=None)
    p.add_argument("--far", type=float, default=None)
    p.add_argument("--center_pixels", action="store_true", default=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--downscale", type=float, default=1.0,
                   help="mask resolution scale (1.0 = native)")
    return p.parse_args(argv)


def _dist_info():
    """(rank, world) from jax process topology; (0, 1) single-process."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def _all_reduce(mins, maxs, counts, stats):
    """Cross-process MIN/MAX/SUM reductions (psum/pmin/pmax over hosts)."""
    rank, world = _dist_info()
    if world == 1:
        return mins, maxs, counts, stats
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        {"mins": mins, "maxs": maxs, "counts": counts, "stats": stats}
    )
    return (
        gathered["mins"].min(0),
        gathered["maxs"].max(0),
        gathered["counts"].sum(0),
        gathered["stats"].sum(0),
    )


def main(h=None):
    import torch  # .pt output compatibility

    h = h or parse_args()
    ds = Path(h.data_path)
    out = ds / "masks" / h.output
    rank, world = _dist_info()

    coord = load_pt(ds / "coordinates.pt")
    pose_scale = float(coord.get("pose_scale_factor", 1.0))
    origin_x = float(np.asarray(coord.get("origin_drb", [0, 0, 0]))[0])

    # altitude band: ENU Up (m) -> normalized DRB Down
    if h.altitude_range is not None:
        min_enu, max_enu = sorted(map(float, h.altitude_range))
    elif "altitude_range_enu" in coord:
        min_enu, max_enu = sorted(map(float, np.asarray(coord["altitude_range_enu"])))
    else:
        min_enu = max_enu = 0.0
    x_lo = (-max_enu - origin_x) / pose_scale
    x_hi = (-min_enu - origin_x) / pose_scale
    pad = h.altitude_pad / pose_scale
    aabb_global = np.array(
        [[x_lo - pad, -h.scene_scale, -h.scene_scale],
         [x_hi + pad, h.scene_scale, h.scene_scale]], np.float32,
    )
    print(f"[rank {rank}/{world}] global AABB: {aabb_global.tolist()}")

    train_meta, val_meta = meta_list(ds, "train"), meta_list(ds, "val")
    all_meta = train_meta + val_meta
    if not all_meta:
        raise RuntimeError(f"No metadata under {ds}/{{train,val}}/metadata")

    dims = list(map(int, h.grid_dim))
    if h.cluster_2d:
        gx, gy, gz = 1, dims[0], dims[1]
    else:
        gx, gy, gz = dims if len(dims) == 3 else (1, dims[0], dims[1])
    K = gx * gy * gz

    cams = np.stack(
        [np.asarray(load_pt(p)["c2w"])[:3, 3] for p in all_meta]
    ).astype(np.float32)
    if h.centroid_mode == "grid":
        cents = grid_centroids(cams, gx, gy, gz, h.cluster_2d)
    else:
        wts = None
        if h.kmeans_weight_by_pixels:
            wts = np.array(
                [load_pt(p)["H"] * load_pt(p)["W"] for p in all_meta], np.float64
            )
        if h.cluster_2d:
            cyz = kmeans_centroids(cams[:, 1:], K, h.kmeans_iters, h.kmeans_seed,
                                   h.kmeans_init, wts)
            x_mid = 0.5 * (cams[:, 0].min() + cams[:, 0].max())
            cents = np.concatenate(
                [np.full((K, 1), x_mid, np.float32), cyz], 1
            )
        else:
            cents = kmeans_centroids(cams, K, h.kmeans_iters, h.kmeans_seed,
                                     h.kmeans_init, wts)

    if rank == 0:
        out.mkdir(parents=True, exist_ok=True)
        torch.save(
            {
                "format_version": 3,
                "centroid_mode": h.centroid_mode,
                "centroids": torch.from_numpy(cents),
                "grid_dim": (gx, gy, gz),
                "cluster_2d": bool(h.cluster_2d),
                "boundary_margin": float(h.boundary_margin),
                "ray_samples": int(h.ray_samples),
                "aabb_global": torch.from_numpy(aabb_global),
                "scene_scale": float(h.scene_scale),
                "near_far_override_m": (
                    float(h.near) if h.near is not None else None,
                    float(h.far) if h.far is not None else None,
                ),
            },
            out / "params.pt",
        )

    nf_override = (
        h.near / pose_scale if h.near is not None else None,
        h.far / pose_scale if h.far is not None else None,
    )

    mins = np.full((K, 3), np.inf, np.float32)
    maxs = np.full((K, 3), -np.inf, np.float32)
    cnts = np.zeros(K, np.int64)
    stats = np.zeros(4, np.int64)  # tot_pix, rays_total, rays_intersect, imgs

    for split in ("train", "val"):
        metas = meta_list(ds, split)
        idxs = np.arange(rank, len(metas), world)
        print(f"[{split}] {len(metas)} images, rank {rank} handles {len(idxs)}")
        for i in idxs:
            mp = metas[int(i)]
            fname = mp.stem + ".pt"
            if h.resume and all_ok_for_image(K, out, fname):
                continue
            md = load_pt(mp)
            H = int(round(md["H"] * h.downscale))
            W = int(round(md["W"] * h.downscale))
            fx, fy, cx, cy = np.asarray(md["intrinsics"]) * h.downscale
            dirs = np_ray_directions(H, W, fx, fy, cx, cy, h.center_pixels)
            rays = np_get_rays(
                dirs, np.asarray(md["c2w"]), aabb=aabb_global
            ).reshape(-1, 8)
            rays, valid = np_clamp_rays(rays, *nf_override)
            stats[1] += rays.shape[0]
            stats[2] += int(valid.sum())
            stats[0] += H * W

            mask = compute_voronoi(
                rays, cents, ray_samples=h.ray_samples,
                cluster_2d=h.cluster_2d, boundary_margin=h.boundary_margin,
                ray_chunk_size=h.ray_chunk_size,
                mins_out=mins, maxs_out=maxs, counts_out=cnts,
            )
            mask = mask & valid[:, None]
            for cid in range(K):
                save_zip_mask(
                    out / str(cid) / fname, mask[:, cid].reshape(H, W)
                )
            stats[3] += 1

    mins, maxs, cnts, stats = _all_reduce(mins, maxs, cnts, stats)

    # clamp to global; epsilon boxes for empty experts; unified altitude
    mins = np.maximum(mins, aabb_global[0])
    maxs = np.minimum(maxs, aabb_global[1])
    empties = cnts == 0
    if empties.any():
        eps = np.maximum(np.abs(aabb_global[1] - aabb_global[0]) * 1e-6, 1e-7)
        cc = np.clip(cents, aabb_global[0], aabb_global[1])
        mins[empties] = np.maximum(cc[empties] - eps, aabb_global[0])
        maxs[empties] = np.minimum(cc[empties] + eps, aabb_global[1])
    if h.box_margin > 0:
        margin = h.box_margin / pose_scale
        mins = np.maximum(mins - margin, aabb_global[0])
        maxs = np.minimum(maxs + margin, aabb_global[1])
    mins[:, 0] = aabb_global[0, 0]  # altitude unified across experts
    maxs[:, 0] = aabb_global[1, 0]

    if rank == 0:
        torch.save(
            {
                "format_version": 3,
                "aabb_global": torch.from_numpy(aabb_global),
                "mins": torch.from_numpy(mins),
                "maxs": torch.from_numpy(maxs),
                "counts": torch.from_numpy(cnts),
                "centroids": torch.from_numpy(cents),
                "grid_dim": (gx, gy, gz),
                "cluster_2d": bool(h.cluster_2d),
                "boundary_margin": float(h.boundary_margin),
                "ray_samples": int(h.ray_samples),
                "scene_scale": float(h.scene_scale),
            },
            out / "scene_boxes.pt",
        )
        lines = ["==== GLOBAL ====",
                 f"global.min = {np.round(aabb_global[0], 6).tolist()}",
                 f"global.max = {np.round(aabb_global[1], 6).tolist()}", "",
                 "==== PER-EXPERT LOCAL BOXES (normalized DRB) ===="]
        for cid in range(K):
            lines.append(
                f"[{cid:03d}] count={int(cnts[cid]):9d}  "
                f"centroid={np.round(cents[cid], 6).tolist()}  "
                f"min={np.round(mins[cid], 6).tolist()}  "
                f"max={np.round(maxs[cid], 6).tolist()}"
            )
        (out / "scene_boxes.txt").write_text("\n".join(lines))
        cov = stats[2] / max(stats[1], 1) * 100
        print(f"ray coverage {cov:.2f}% | experts with samples: "
              f"{int((cnts > 0).sum())}/{K}")
        print(f"Done. Masks saved to: {out}")


if __name__ == "__main__":
    main()
