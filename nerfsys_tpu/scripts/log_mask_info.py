"""Mask diagnostics: per-expert coverage, overlap combos, exclusivity.

Counterpart of /root/reference/adaptive_nerf/scripts/log_mask_info.py
(:142-344). Audits a masks/<tag>/ directory: per-expert pixel coverage,
images contributing to each expert, pairwise/combination overlap statistics
(soft-routing margin produces intentional overlap), and pixels claimed by
no expert.
"""
from __future__ import annotations

import argparse
import itertools
import zipfile
from pathlib import Path

import numpy as np

from nerfsys_tpu.data.image_metadata import load_pt


def _load_mask(path: Path) -> np.ndarray:
    try:
        return np.asarray(load_pt(path)).astype(bool)
    except Exception:
        with zipfile.ZipFile(path) as zf:
            with zf.open(zf.namelist()[0]) as f:
                return np.asarray(load_pt(f)).astype(bool)


def gen_mask_stats(mask_dir, max_images: int = None, verbose: bool = True):
    mask_dir = Path(mask_dir)
    params = load_pt(mask_dir / "params.pt")
    cids = sorted(
        int(d.name) for d in mask_dir.iterdir() if d.is_dir() and d.name.isdigit()
    )
    K = len(cids)
    print(f"Masks: {mask_dir}")
    print(f"  experts: {K}  boundary_margin: {params.get('boundary_margin')}  "
          f"cluster_2d: {params.get('cluster_2d')}  "
          f"grid_dim: {params.get('grid_dim')}")

    files = sorted(f.name for f in (mask_dir / str(cids[0])).glob("*.pt"))
    if max_images:
        files = files[:max_images]

    pix_per = np.zeros(K, np.int64)
    imgs_with = np.zeros(K, np.int64)
    combo_counts = {}
    total_pix = 0
    unclaimed = 0

    for fname in files:
        masks = np.stack([_load_mask(mask_dir / str(c) / fname) for c in cids])
        masks = masks.reshape(K, -1)
        total_pix += masks.shape[1]
        pix_per += masks.sum(1)
        imgs_with += masks.any(1)
        n_owners = masks.sum(0)
        unclaimed += int((n_owners == 0).sum())
        # overlap combos (which expert sets co-own pixels)
        for r in range(2, min(K, 3) + 1):
            for combo in itertools.combinations(range(K), r):
                inter = masks[list(combo)].all(0).sum()
                if inter:
                    combo_counts[combo] = combo_counts.get(combo, 0) + int(inter)

    print(f"  images audited: {len(files)}  total pixels: {total_pix:,}")
    for i, c in enumerate(cids):
        pct = pix_per[i] / max(total_pix, 1) * 100
        print(f"  expert {c}: {pix_per[i]:,} px ({pct:.2f}%), "
              f"in {imgs_with[i]}/{len(files)} images")
    print(f"  unclaimed pixels: {unclaimed:,} "
          f"({unclaimed / max(total_pix, 1) * 100:.2f}%)")
    if combo_counts and verbose:
        print("  overlap combos:")
        for combo, n in sorted(combo_counts.items(), key=lambda kv: -kv[1])[:10]:
            print(f"    {combo}: {n:,} px ({n / max(total_pix, 1) * 100:.3f}%)")
    exclusive = total_pix - unclaimed - sum(
        n for c, n in combo_counts.items() if len(c) == 2
    )
    return {
        "pixels_per_expert": pix_per.tolist(),
        "images_with_pixels": imgs_with.tolist(),
        "total_pixels": total_pix,
        "unclaimed": unclaimed,
        "overlaps": {str(k): v for k, v in combo_counts.items()},
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--max_images", type=int, default=None)
    a = p.parse_args(argv)
    gen_mask_stats(a.mask_dir, a.max_images)


if __name__ == "__main__":
    main()
