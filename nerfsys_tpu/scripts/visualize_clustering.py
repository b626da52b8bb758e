"""Clustering visualizations: camera/centroid scatter, per-region views,
mask overlays.

Counterpart of /root/reference/adaptive_nerf/scripts/visualize_clustering.py
(:166-446). Produces matplotlib PNGs:
  - overview: camera positions (R/B ground plane) + centroids + expert boxes
  - per-region: cameras contributing pixels to each expert
  - overlays: per-image mask color overlays
"""
from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.dataset import get_image_metadata, load_scene_boxes
from nerfsys_tpu.data.image_metadata import load_pt


def _load_mask(path: Path) -> np.ndarray:
    try:
        return np.asarray(load_pt(path)).astype(bool)
    except Exception:
        with zipfile.ZipFile(path) as zf:
            with zf.open(zf.namelist()[0]) as f:
                return np.asarray(load_pt(f)).astype(bool)


_COLORS = np.array(
    [[0.90, 0.10, 0.10], [0.10, 0.60, 0.90], [0.10, 0.80, 0.20],
     [0.95, 0.70, 0.10], [0.60, 0.20, 0.80], [0.10, 0.80, 0.80],
     [0.90, 0.40, 0.60], [0.50, 0.50, 0.50]]
)


def _plane_coords(pts: np.ndarray, cluster_2d: bool):
    """Project 3D DRB points to the clustering plane (reference
    visualize_clustering.py:172-179): YZ when cluster_2d else XZ."""
    return pts[:, 1:] if cluster_2d else pts[:, [0, 2]]


def save_region_viz2d(out_path, centroids, cams=None, *, cluster_2d=True,
                      boundary_margin=1.0, res=600):
    """Per-region 2D routing map (reference :224-321): grid colored by
    nearest centroid, boundary-margin membership contours when soft routing
    is on, cameras + centroids overlaid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    cents2 = _plane_coords(np.asarray(centroids, np.float32), cluster_2d)
    cams2 = (
        _plane_coords(np.asarray(cams, np.float32), cluster_2d)
        if cams is not None and len(cams) else None
    )
    xlabel, ylabel = ("Y", "Z") if cluster_2d else ("X", "Z")

    if cams2 is not None and cams2.size:
        lo, hi = cams2.min(0), cams2.max(0)
        pad = 0.02 * (hi - lo + 1e-9)
        lo, hi = lo - pad, hi + pad
    else:
        lo, hi = cents2.min(0) - 1.0, cents2.max(0) + 1.0

    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    X, Y = np.meshgrid(xs, ys)
    G = np.stack([X.ravel(), Y.ravel()], 1)
    dists = np.linalg.norm(G[:, None] - cents2[None], axis=2)
    dmin = dists.min(1, keepdims=True)
    Z = dists.argmin(1).reshape(res, res)

    colors = [_COLORS[i % len(_COLORS)] for i in range(len(cents2))]
    fig, ax = plt.subplots(figsize=(7, 7), dpi=140)
    ax.imshow(Z, origin="lower", extent=[lo[0], hi[0], lo[1], hi[1]],
              interpolation="nearest", alpha=0.25,
              cmap=ListedColormap(colors))
    if boundary_margin > 1.0:
        # soft-routing membership boundary per expert: d_k/d_min <= margin
        ratio = dists / (dmin + 1e-8)
        for k in range(len(cents2)):
            Mk = (ratio[:, k] <= boundary_margin).reshape(res, res)
            ax.contour(xs, ys, Mk.astype(np.uint8), levels=[0.5],
                       linewidths=1.0, alpha=0.8)
    if cams2 is not None and cams2.size:
        ax.scatter(cams2[:, 0], cams2[:, 1], s=8, alpha=0.6, c="black",
                   label="cameras")
    ax.scatter(cents2[:, 0], cents2[:, 1], s=40, marker="x", linewidths=1.8,
               color="black", label="centroids")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title("Routing regions (Voronoi / overlap)")
    ax.legend(loc="best", fontsize=10, framealpha=0.8)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_overview(data_path, mask_dirname, out_path, downscale=0.25):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root = Path(data_path)
    mask_dir = root / "masks" / mask_dirname
    params = load_pt(mask_dir / "params.pt")
    cents = np.asarray(params["centroids"])
    cluster_2d = bool(params.get("cluster_2d", True))
    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)

    train, val = get_image_metadata(root, downscale)
    cams = np.stack([m.c2w[:, 3] for m in train + val])

    # color cameras by nearest centroid in the clustering plane
    # (reference save_overview_scatter, :181-203)
    cams2 = _plane_coords(cams, cluster_2d)
    cents2 = _plane_coords(cents, cluster_2d)
    assign = np.linalg.norm(
        cams2[:, None] - cents2[None], axis=2
    ).argmin(1)

    fig, ax = plt.subplots(figsize=(9, 9))
    # ground plane: Right (y) vs Back (z)
    for k in range(len(cents)):
        sel = assign == k
        if sel.any():
            ax.scatter(cams[sel, 1], cams[sel, 2], s=10, alpha=0.8,
                       c=[_COLORS[k % len(_COLORS)]], label=f"mod {k} cams")
    for i, c in enumerate(cents):
        col = _COLORS[i % len(_COLORS)]
        ax.scatter([c[1]], [c[2]], s=180, c=[col], marker="*",
                   edgecolors="k", label=f"expert {i}")
        box = expert_aabbs[i]
        ax.add_patch(plt.Rectangle(
            (box[0, 1], box[0, 2]), box[1, 1] - box[0, 1], box[1, 2] - box[0, 2],
            fill=False, edgecolor=col, linewidth=1.5,
        ))
    g = global_aabb
    ax.add_patch(plt.Rectangle(
        (g[0, 1], g[0, 2]), g[1, 1] - g[0, 1], g[1, 2] - g[0, 2],
        fill=False, edgecolor="k", linestyle="--", linewidth=1.0,
    ))
    ax.set_xlabel("Right (normalized DRB)")
    ax.set_ylabel("Back (normalized DRB)")
    ax.set_title(f"Clustering overview: {mask_dirname}")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_mask_overlays(data_path, mask_dirname, out_dir, image_ids,
                       downscale=0.25):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root = Path(data_path)
    mask_dir = root / "masks" / mask_dirname
    cids = sorted(
        int(d.name) for d in mask_dir.iterdir() if d.is_dir() and d.name.isdigit()
    )
    train, val = get_image_metadata(root, downscale)
    by_stem = {m.image_path.stem: m for m in train + val}

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    outs = []
    for stem in image_ids:
        md = by_stem.get(stem)
        if md is None:
            continue
        img = md.load_image().astype(np.float32) / 255.0
        overlay = img.copy()
        for c in cids:
            mp = mask_dir / str(c) / f"{stem}.pt"
            if not mp.exists():
                continue
            m = _load_mask(mp)
            if m.ndim == 1:
                m = m.reshape(-1)
                side = int(np.sqrt(m.size / (img.shape[0] * img.shape[1])))
                m = m.reshape(img.shape[0] * side if side else img.shape[0], -1)
            if m.shape != img.shape[:2]:
                from nerfsys_tpu.data.image_metadata import _nearest_resize_bool

                m = _nearest_resize_bool(m.reshape(m.shape[0], -1),
                                         img.shape[0], img.shape[1])
            col = _COLORS[c % len(_COLORS)]
            overlay[m] = 0.5 * overlay[m] + 0.5 * col
        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        axes[0].imshow(img)
        axes[0].set_title(stem)
        axes[1].imshow(overlay)
        axes[1].set_title("expert masks")
        for ax in axes:
            ax.axis("off")
        out = out_dir / f"overlay_{stem}.png"
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        outs.append(out)
    return outs


def run_visualize(data_path, mask_dirname, out_dir, n_overlays=3,
                  downscale=0.25):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ov = plot_overview(data_path, mask_dirname, out_dir / "overview.png",
                       downscale)
    print(f"wrote {ov}")
    mask_dir = Path(data_path) / "masks" / mask_dirname
    params = load_pt(mask_dir / "params.pt")
    train, val = get_image_metadata(Path(data_path), downscale)
    rv = save_region_viz2d(
        out_dir / "regions.png", np.asarray(params["centroids"]),
        np.stack([m.c2w[:, 3] for m in train + val]),
        cluster_2d=bool(params.get("cluster_2d", True)),
        boundary_margin=float(params.get("boundary_margin", 1.0)),
    )
    print(f"wrote {rv}")
    first_cell = mask_dir / "0"
    stems = sorted(f.stem for f in first_cell.glob("*.pt"))[:n_overlays]
    for o in plot_mask_overlays(data_path, mask_dirname, out_dir, stems,
                                downscale):
        print(f"wrote {o}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--mask_dirname", required=True)
    p.add_argument("--out_dir", default="cluster_viz")
    p.add_argument("--n_overlays", type=int, default=3)
    p.add_argument("--downscale", type=float, default=0.25)
    a = p.parse_args(argv)
    run_visualize(a.data_path, a.mask_dirname, a.out_dir, a.n_overlays,
                  a.downscale)


if __name__ == "__main__":
    main()
