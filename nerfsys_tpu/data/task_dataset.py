"""Episodic support/query task sampling over a region's ray pool.

Counterpart of the reference TaskDataset
(/root/reference/adaptive_nerf/data/task_dataset.py:28-1004), rebuilt as a
vectorized numpy sampler that emits FIXED-SHAPE episode tensors ready for the
jitted meta step (padding/masking instead of variable-length tasks).

Semantics preserved:
  - The region's AABB is subdivided into a micro-cell grid cells=(1, cd, cd)
    (full extent along x=Down; grid over the ground plane).
  - Every ray is routed to the micro-cell it overlaps MOST, estimated by
    uniform sampling along [near, far] and majority vote over per-sample cell
    ids (the reference's sampled-overlap policy; its DDA traversal is an exact
    variant of the same argmax).
  - Cells with too few rays or too few distinct images are ineligible.
  - An episode picks an eligible cell, splits that cell's images into
    IMAGE-DISJOINT support/query subsets, samples S support rays (per-image
    cap) and Q query rays that are RAY-DISJOINT from the support set, with
    borrow-with-replacement fallback when pools run short.
  - Deterministic per-seed RNG (task_dataset.py:815-821).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from nerfsys_tpu.data.ram_rays import RamRaysDataset


@dataclasses.dataclass
class Task:
    """One episode: support/query ray+rgb dicts (reference Task, :10-22)."""

    support: Dict[str, np.ndarray]
    query: Dict[str, np.ndarray]


def route_rays_to_cells(
    rays: np.ndarray,  # (N, 8)
    aabb: np.ndarray,  # (2, 3) region box
    cells: Tuple[int, int, int],
    samples_per_ray: int = 16,
    rng: Optional[np.random.Generator] = None,
    chunk: int = 500_000,
) -> np.ndarray:
    """Max-overlap micro-cell id per ray (N,), -1 for rays missing the box."""
    rng = rng or np.random.default_rng(0)
    dims = np.asarray(cells, dtype=np.int64)
    n_cells = int(dims.prod())
    lo = aabb[0].astype(np.float32)
    extent = np.maximum(aabb[1] - aabb[0], 1e-8).astype(np.float32)

    out = np.full(rays.shape[0], -1, dtype=np.int64)
    ts = rng.uniform(0.0, 1.0, size=samples_per_ray).astype(np.float32)

    # native C++ fast path (data/native): the numpy version below broadcasts
    # (N, P, 3) temporaries, which is brutal on small hosts
    from nerfsys_tpu.data import native as _native

    if _native.native_available():
        routed = _native.route_rays_native(
            rays.astype(np.float32, copy=False), np.asarray(aabb, np.float32),
            tuple(int(c) for c in cells), ts,
        )
        if routed is not None:
            return routed
    for s in range(0, rays.shape[0], chunk):
        r = rays[s : s + chunk]
        o, d = r[:, :3], r[:, 3:6]
        near = np.nan_to_num(r[:, 6], nan=0.0, posinf=0.0)
        far = np.nan_to_num(r[:, 7], nan=0.0, posinf=0.0)
        valid = far > near
        t = near[:, None] + (far - near)[:, None] * ts[None, :]  # (M, P)
        pts = o[:, None, :] + d[:, None, :] * t[..., None]  # (M, P, 3)
        ijk = np.floor((pts - lo) / extent * dims).astype(np.int64)
        inside = ((ijk >= 0) & (ijk < dims)).all(-1)  # (M, P)
        ijk = np.clip(ijk, 0, dims - 1)
        flat = (ijk[..., 0] * dims[1] + ijk[..., 1]) * dims[2] + ijk[..., 2]
        flat = np.where(inside, flat, n_cells)  # out-of-box -> overflow bin
        # per-ray majority vote over cells: one flat bincount (np.add.at is
        # ~100x slower on scattered updates at this scale)
        M = flat.shape[0]
        rows = np.repeat(np.arange(M, dtype=np.int64), flat.shape[1])
        comb = rows * (n_cells + 1) + flat.reshape(-1)
        counts = np.bincount(comb, minlength=M * (n_cells + 1)).reshape(
            M, n_cells + 1
        )
        counts[:, n_cells] = 0  # never pick the overflow bin
        best = counts.argmax(1)
        hit = counts[np.arange(M), best] > 0
        out[s : s + chunk] = np.where(valid & hit, best, -1)
    return out


class TaskDataset:
    """Endless episodic sampler for one region (expert)."""

    def __init__(
        self,
        dataset: RamRaysDataset,
        region_aabb: np.ndarray,  # (2, 3)
        support_rays: int = 4000,
        query_rays: int = 2000,
        cell_dim: int = 5,
        samples_per_ray: int = 16,
        min_rays_per_cell: Optional[int] = None,
        min_images_per_cell: int = 2,
        max_support_rays_per_image: Optional[int] = None,
        seed: int = 0,
        debug_checks: bool = False,
    ):
        self.ds = dataset
        self.S = int(support_rays)
        self.Q = int(query_rays)
        self.debug_checks = debug_checks
        self.rng = np.random.default_rng(seed)
        self.cells = (1, int(cell_dim), int(cell_dim))
        self.max_sup_per_img = max_support_rays_per_image
        min_rays = (
            min_rays_per_cell
            if min_rays_per_cell is not None
            else (self.S + self.Q) // 2
        )

        cell_of = route_rays_to_cells(
            dataset.rays, np.asarray(region_aabb, np.float32), self.cells,
            samples_per_ray, self.rng,
        )

        # per-cell pools: ray indices grouped by image id
        self.cell_pools: List[Dict[int, np.ndarray]] = []
        self.eligible: List[int] = []
        n_cells = int(np.prod(self.cells))
        for c in range(n_cells):
            idx = np.nonzero(cell_of == c)[0]
            pool: Dict[int, np.ndarray] = {}
            if idx.size:
                imgs = dataset.img_indices[idx]
                for img in np.unique(imgs):
                    pool[int(img)] = idx[imgs == img]
            self.cell_pools.append(pool)
            if idx.size >= min_rays and len(pool) >= min_images_per_cell:
                self.eligible.append(c)
        if not self.eligible:
            # degenerate region: fall back to one pool over everything
            idx = np.nonzero(cell_of >= 0)[0]
            if idx.size == 0:
                idx = np.arange(len(dataset))
            pool = {}
            imgs = dataset.img_indices[idx]
            for img in np.unique(imgs):
                pool[int(img)] = idx[imgs == img]
            self.cell_pools = [pool]
            self.eligible = [0] if len(pool) else []
        self.routing_hit_rate = float((cell_of >= 0).mean()) if len(cell_of) else 0.0

    # ------------------------- episode sampling -------------------------
    def _sample_from_images(
        self, pool: Dict[int, np.ndarray], images: List[int], n: int,
        per_image_cap: Optional[int], exclude: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Sample n ray indices from the given images' pools."""
        cand_list = [pool[i] for i in images]
        cand = np.concatenate(cand_list) if cand_list else np.zeros(0, np.int64)
        if exclude is not None and exclude.size:
            cand = np.setdiff1d(cand, exclude, assume_unique=False)
        if per_image_cap is not None and len(images) > 1:
            capped = []
            for i in images:
                c = pool[i]
                if exclude is not None and exclude.size:
                    c = np.setdiff1d(c, exclude, assume_unique=False)
                if c.size > per_image_cap:
                    c = self.rng.choice(c, per_image_cap, replace=False)
                capped.append(c)
            cand = np.concatenate(capped) if capped else cand
        if cand.size == 0:
            return np.zeros(0, dtype=np.int64)
        replace = cand.size < n  # borrow fallback
        return self.rng.choice(cand, n, replace=replace)

    def sample_task(self) -> Optional[Task]:
        if not self.eligible:
            return None
        cell = int(self.rng.choice(self.eligible))
        pool = self.cell_pools[cell]
        images = sorted(pool.keys())
        if len(images) < 2:
            # cannot be image-disjoint; split the single image's rays instead
            sup_imgs = qry_imgs = images
        else:
            perm = self.rng.permutation(len(images))
            n_sup = max(1, len(images) // 2)
            sup_imgs = [images[i] for i in perm[:n_sup]]
            qry_imgs = [images[i] for i in perm[n_sup:]]

        sup_idx = self._sample_from_images(pool, sup_imgs, self.S, self.max_sup_per_img)
        if sup_idx.size == 0:
            return None
        qry_idx = self._sample_from_images(
            pool, qry_imgs, self.Q, None,
            exclude=sup_idx if sup_imgs is qry_imgs else None,
        )
        if qry_idx.size == 0:
            return None

        if self.debug_checks:
            if sup_imgs is not qry_imgs:
                assert not set(np.unique(self.ds.img_indices[sup_idx])) & set(
                    np.unique(self.ds.img_indices[qry_idx])
                ), "support/query images overlap"
            else:
                assert not set(sup_idx.tolist()) & set(qry_idx.tolist())

        return Task(
            support={
                "rays": self.ds.rays[sup_idx],
                "rgbs": self.ds.rgbs[sup_idx],
                "img_indices": self.ds.img_indices[sup_idx],
            },
            query={
                "rays": self.ds.rays[qry_idx],
                "rgbs": self.ds.rgbs[qry_idx],
                "img_indices": self.ds.img_indices[qry_idx],
            },
        )

    def __iter__(self):
        while True:
            t = self.sample_task()
            if t is not None:
                yield t
