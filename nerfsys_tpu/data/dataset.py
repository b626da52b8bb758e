"""Prepared-dataset factory: metadata discovery, scene boxes, ray datasets.

Counterpart of /root/reference/adaptive_nerf/data/dataset.py:11-291 plus the
clustering-meta loaders from adaptive_nerf/utils.py:649-705. Consumes the
reference's on-disk prepared-dataset format unchanged (SURVEY.md §1):

  <root>/coordinates.pt, mappings.txt
  <root>/{train,val}/{metadata,rgbs}/NNNNNN.*          (split layout)
  <root>/{metadata,rgbs}/                              (flat layout)
  <root>/masks/<tag>/{params.pt, scene_boxes.pt, <cid>/NNNNNN.pt}
  <root>/continual/<batch>/{rgbs,metadata,manifest.json}
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from nerfsys_tpu.data.image_metadata import ImageMetadata, load_pt
from nerfsys_tpu.data.ram_rays import RamRaysDataset


# --------------------------- clustering meta ---------------------------------
def discover_cluster_cells(mask_root: Path) -> int:
    """Count numeric per-cell mask subdirectories under a mask tag dir."""
    mask_root = Path(mask_root)
    return len([d for d in mask_root.iterdir() if d.is_dir() and d.name.isdigit()])


def load_clustering_meta(mask_dir: Path) -> dict:
    """Load masks/<tag>/params.pt (centroids, grid_dim, cluster_2d, ...)."""
    return load_pt(Path(mask_dir) / "params.pt")


def load_scene_boxes(mask_dir: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Load masks/<tag>/scene_boxes.pt -> (global_aabb (2,3), expert_aabbs (K,2,3))."""
    sb = load_pt(Path(mask_dir) / "scene_boxes.pt")
    global_aabb = np.asarray(sb["aabb_global"], dtype=np.float32)
    mins = np.asarray(sb["mins"], dtype=np.float32)
    maxs = np.asarray(sb["maxs"], dtype=np.float32)
    expert_aabbs = np.stack([mins, maxs], axis=1)  # (K, 2, 3)
    return global_aabb, expert_aabbs


def load_coordinates(data_path: Path) -> dict:
    """Load <root>/coordinates.pt: origin_drb, pose_scale_factor, ..."""
    return load_pt(Path(data_path) / "coordinates.pt")


# --------------------------- metadata discovery -------------------------------
def _list_metadata_files(d: Path) -> List[Path]:
    if not d.exists():
        return []
    return sorted(p for p in d.iterdir() if p.suffix == ".pt")


def get_metadata_item(
    metadata_path: Path,
    image_index: int,
    scale_factor: float,
    is_val: bool = False,
    mask_dir: Optional[Path] = None,
) -> Optional[ImageMetadata]:
    """One ImageMetadata from its .pt + sibling rgbs image (dataset.py:257-291)."""
    image_path = None
    for ext in (".jpg", ".JPG", ".png", ".PNG"):
        cand = metadata_path.parent.parent / "rgbs" / f"{metadata_path.stem}{ext}"
        if cand.exists():
            image_path = cand
            break
    if image_path is None:
        return None
    md = load_pt(metadata_path)
    return ImageMetadata(
        image_path,
        np.asarray(md["c2w"], dtype=np.float32),
        int(round(md["W"] * scale_factor)),
        int(round(md["H"] * scale_factor)),
        np.asarray(md["intrinsics"], dtype=np.float32) * scale_factor,
        image_index,
        is_val,
        mask_dir,
    )


def get_image_metadata(
    data_path,
    scale_factor: float,
    mask_dir: Optional[Path] = None,
    only_test: bool = False,
) -> Tuple[List[ImageMetadata], List[ImageMetadata]]:
    """Discover metadata in flat or split layout (dataset.py:185-254).

    Flat layout (<root>/{metadata,rgbs}) -> everything as val.
    Split layout (<root>/train + val|test) -> (train, val) with image indices
    assigned over the filename-sorted union.
    """
    root = Path(data_path)

    flat_meta = _list_metadata_files(root / "metadata")
    if flat_meta and (root / "rgbs").exists():
        order = {p.name: i for i, p in enumerate(sorted(flat_meta, key=lambda x: x.name))}
        val = [
            m
            for p in flat_meta
            if (m := get_metadata_item(p, order[p.name], scale_factor, True, mask_dir))
        ]
        return [], val

    train_paths = _list_metadata_files(root / "train" / "metadata")
    eval_paths = _list_metadata_files(root / "val" / "metadata") or _list_metadata_files(
        root / "test" / "metadata"
    )
    if train_paths or eval_paths:
        all_paths = sorted(train_paths + eval_paths, key=lambda x: x.name)
        order = {p.name: i for i, p in enumerate(all_paths)}
        train = (
            [
                m
                for p in train_paths
                if (m := get_metadata_item(p, order[p.name], scale_factor, False, mask_dir))
            ]
            if not only_test
            else []
        )
        val = [
            m
            for p in eval_paths
            if (m := get_metadata_item(p, order[p.name], scale_factor, True, mask_dir))
        ]
        return train, val

    return [], []


def cap_metadata(items: List[ImageMetadata], cap: int) -> List[ImageMetadata]:
    """Evenly subsample at most `cap` items (dataset.py:148-156)."""
    if cap is None or len(items) <= cap:
        return items
    idx = np.linspace(0, len(items) - 1, cap).round().astype(int)
    return [items[i] for i in idx]


# --------------------------- dataset factory ----------------------------------
@dataclasses.dataclass
class DatasetBundle:
    """Everything the pipelines need from one prepared dataset."""

    coordinate_info: dict
    global_aabb: Optional[np.ndarray] = None
    expert_aabbs: Optional[np.ndarray] = None
    clustering: Optional[dict] = None
    train_sets: Optional[List[RamRaysDataset]] = None  # per-expert (masked mode)
    val_sets: Optional[List[RamRaysDataset]] = None
    train_set: Optional[RamRaysDataset] = None  # flat mode
    val_set: Optional[RamRaysDataset] = None
    train_metadata: Optional[List[ImageMetadata]] = None  # cameras (occ premark)


def get_dataset(
    data_path,
    downscale: float = 1.0,
    mask_dirname: Optional[str] = None,
    num_submodules: Optional[int] = None,
    cap_images: Optional[int] = None,
    near_far_override: Optional[Tuple] = None,
    val_balancing: bool = False,
    only_test: bool = False,
    num_workers: Optional[int] = None,
) -> DatasetBundle:
    """Build ray datasets in flat (single scene) or masked per-cell layout.

    Mirrors the reference get_dataset (dataset.py:11-143): without a mask dir,
    one RamRaysDataset pair over the whole scene; with one, a RamRaysDataset
    per expert using that expert's SceneBox and pixel masks.
    """
    root = Path(data_path)
    bundle = DatasetBundle(coordinate_info=load_coordinates(root))

    if mask_dirname is None:
        train_md, val_md = get_image_metadata(root, downscale)
        if cap_images is not None:
            train_md = cap_metadata(train_md, cap_images)
            val_md = cap_metadata(val_md, cap_images)
        bundle.train_metadata = train_md
        # Flat mode uses camera-pose-derived bounds only when explicit near/far
        # are not given; rays fall back to near/far override entirely.
        bundle.train_set = (
            RamRaysDataset(
                train_md, val_balancing=False, scene_aabb=None,
                near_far_override=near_far_override, num_workers=num_workers,
            )
            if not only_test
            else None
        )
        bundle.val_set = RamRaysDataset(
            val_md, val_balancing=val_balancing, scene_aabb=None,
            near_far_override=near_far_override, num_workers=num_workers,
        )
        return bundle

    mask_root = root / "masks" / mask_dirname
    n_cells = discover_cluster_cells(mask_root)
    if num_submodules is not None and n_cells != num_submodules:
        raise ValueError(
            f"Mask dir has {n_cells} regions but num_submodules={num_submodules}"
        )
    bundle.clustering = load_clustering_meta(mask_root)
    bundle.global_aabb, bundle.expert_aabbs = load_scene_boxes(mask_root)

    # camera metadata for occupancy visibility premark (mask-independent)
    all_train_md, _ = get_image_metadata(root, downscale)
    if cap_images is not None:
        all_train_md = cap_metadata(all_train_md, cap_images)
    bundle.train_metadata = all_train_md

    train_sets, val_sets = [], []
    for cid in range(n_cells):
        cell_mask_dir = mask_root / str(cid)
        train_md, val_md = get_image_metadata(root, downscale, cell_mask_dir, only_test)
        if not train_md and not val_md:
            continue
        if cap_images is not None:
            train_md = cap_metadata(train_md, cap_images)
            val_md = cap_metadata(val_md, cap_images)
        aabb = bundle.expert_aabbs[cid]
        if not only_test:
            ds = RamRaysDataset(
                train_md, scene_aabb=aabb, near_far_override=near_far_override,
                num_workers=num_workers,
            )
            if len(ds) > 0:
                train_sets.append(ds)
        if val_md:
            vs = RamRaysDataset(
                val_md, val_balancing=val_balancing, scene_aabb=aabb,
                near_far_override=near_far_override, num_workers=num_workers,
            )
            if len(vs) > 0:
                val_sets.append(vs)
    bundle.train_sets = train_sets
    bundle.val_sets = val_sets
    return bundle
