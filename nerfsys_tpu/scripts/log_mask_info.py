"""Mask diagnostics: per-expert coverage, overlap combos, exclusivity.

Counterpart of /root/reference/adaptive_nerf/scripts/log_mask_info.py
(:142-344), report for report: per-image pixel bitmask histogram over the
expert set (0 = unassigned, powers of two = exclusive, others = overlap
combos printed as "a&b: pct"), per-submodule coverage totals, aggregate
sum=0 / sum=1 / sum>1 pixel distribution, top-k images ranked by overlap
fraction, and an optional exclusivity check with the reference's exit
codes (0 ok, 1 exclusivity violated, 2 bad directory).

Writes <mask_dir>/stats.txt like the reference when writable; always
prints to stdout.
"""
from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path
from typing import Dict, List

import numpy as np

from nerfsys_tpu.data.image_metadata import load_pt

MAX_OVERLAP_LINES = 8


class _Report:
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

    def close(self):
        if self._fh:
            self._fh.close()


def _load_mask(path: Path) -> np.ndarray:
    try:
        return np.asarray(load_pt(path)).astype(bool)
    except Exception:
        with zipfile.ZipFile(path) as zf:
            with zf.open(zf.namelist()[0]) as f:
                return np.asarray(load_pt(f)).astype(bool)


def _index_submodule_files(mask_dir: Path):
    """Sorted submodule ids + per-submodule {image_stem: path} maps
    (reference :103-121)."""
    submods = sorted(
        int(d.name) for d in mask_dir.iterdir()
        if d.is_dir() and d.name.isdigit()
    )
    files: Dict[int, Dict[str, Path]] = {}
    for sid in submods:
        files[sid] = {
            f.stem: f
            for f in (mask_dir / str(sid)).iterdir()
            if f.suffix in (".pt", ".npy", ".zip")
        }
    return submods, files


def _format_combo(code: int, submods: List[int]) -> str:
    return "&".join(str(sid) for i, sid in enumerate(submods)
                    if code & (1 << i))


def gen_mask_stats(mask_dir, expect_exclusive: bool = False, topk: int = 10,
                   max_images: int = None, out_path=None) -> int:
    """Returns 0 on success, 1 on exclusivity violation, 2 on bad layout."""
    mask_dir = Path(mask_dir)
    rep = _Report(out_path if out_path is not None else mask_dir / "stats.txt")
    try:
        try:
            params = load_pt(mask_dir / "params.pt")
            rep.write(
                f"[INFO] boundary_margin: {params.get('boundary_margin')}  "
                f"cluster_2d: {params.get('cluster_2d')}  "
                f"grid_dim: {params.get('grid_dim')}"
            )
        except Exception:
            params = {}

        submods, files = _index_submodule_files(mask_dir)
        if not submods:
            rep.write(f"No submodule dirs found under {mask_dir}")
            return 2
        image_ids = sorted(
            {k for m in files.values() for k in m},
            key=lambda x: (len(x), x),
        )
        if not image_ids:
            rep.write(f"No mask files found under submodule dirs at {mask_dir}")
            return 2
        if max_images:
            image_ids = image_ids[:max_images]

        rep.write(f"[INFO] Found {len(submods)} submodules: {submods}")
        rep.write(f"[INFO] Found {len(image_ids)} images across submodules.")

        K = len(submods)
        if K >= 62:
            raise RuntimeError(
                f"Too many submodules ({K}); 64-bit bitmask would overflow."
            )

        coverage = {sid: 0 for sid in submods}
        per_image_stats = []
        ref_shape = None

        for img_id in image_ids:
            masks, shapes = [], set()
            for sid in submods:
                path = files[sid].get(img_id)
                if path is None:
                    masks.append(None)
                    continue
                m = _load_mask(path)
                shapes.add(m.shape)
                masks.append(m)
            if not shapes:
                rep.write(f"[WARN] {img_id}: missing in all submodules; "
                          f"skipping")
                continue
            ref_shape = max(shapes, key=lambda s: sum(
                1 for m in masks if m is not None and m.shape == s
            ))

            stack_list = []
            for sid, m in zip(submods, masks):
                if m is None:
                    stack_list.append(np.zeros(ref_shape, bool))
                    continue
                if m.shape != ref_shape:
                    rep.write(f"[WARN] {img_id}: submodule {sid} shape "
                              f"{m.shape} != ref {ref_shape} (cropped)")
                    H = min(m.shape[0], ref_shape[0])
                    W = min(m.shape[1], ref_shape[1])
                    tmp = np.zeros(ref_shape, bool)
                    tmp[:H, :W] = m[:H, :W]
                    m = tmp
                stack_list.append(m)
                coverage[sid] += int(m.sum())

            stack = np.stack(stack_list).astype(np.int64)  # (K, H, W)
            nt = int(np.prod(ref_shape))
            weights = (1 << np.arange(K, dtype=np.int64)).reshape(-1, 1, 1)
            codes = (stack * weights).sum(0).reshape(-1)
            hist = np.bincount(codes, minlength=1 << K)

            n0 = int(hist[0])
            singleton = {submods[i]: int(hist[1 << i]) for i in range(K)}
            overlap = int(sum(
                hist[c] for c in range(1, 1 << K) if c & (c - 1)
            ))
            n1 = sum(singleton.values())
            per_image_stats.append((img_id, n0, n1, overlap, nt))

            items = [(str(sid), 100.0 * singleton[sid] / max(nt, 1))
                     for sid in submods]
            items.append(("overlap", 100.0 * overlap / max(nt, 1)))
            if n0:
                items.append(("unassigned", 100.0 * n0 / max(nt, 1)))
            rep.write(
                f"[IMG {img_id}] {{"
                + ", ".join(f"{k}: {v:.2f}" for k, v in items) + "}"
            )
            combo_rows = sorted(
                ((100.0 * hist[c] / max(nt, 1), c)
                 for c in range(1, 1 << K) if c & (c - 1) and hist[c] > 0),
                reverse=True,
            )
            if combo_rows:
                rep.write("          overlaps: " + " | ".join(
                    f"{_format_combo(c, submods)}: {pct:.2f}%"
                    for pct, c in combo_rows[:MAX_OVERLAP_LINES]
                ))

        total0 = sum(a for _, a, _, _, _ in per_image_stats)
        total1 = sum(b for _, _, b, _, _ in per_image_stats)
        totalg = sum(c for _, _, _, c, _ in per_image_stats)
        totalt = sum(t for _, _, _, _, t in per_image_stats)

        rep.write("\n=== SUMMARY ===")
        rep.write(f"Images checked: {len(per_image_stats)}")
        rep.write("Per-submodule coverage (True pixels across all images):")
        for sid in submods:
            rep.write(f"  - submodule {sid}: {coverage[sid]:,}")
        if totalt > 0:
            rep.write("Aggregate pixel distribution:")
            rep.write(f"  sum=0 : {total0:,} ({100.0*total0/totalt:.2f}%)")
            rep.write(f"  sum=1 : {total1:,} ({100.0*total1/totalt:.2f}%)")
            rep.write(f"  sum>1 : {totalg:,} ({100.0*totalg/totalt:.2f}%)")

        ranked = sorted(per_image_stats,
                        key=lambda t: t[3] / max(1, t[4]), reverse=True)
        rep.write("\nTop images by overlap (sum>1):")
        for i, (img_id, n0, n1, ngt, nt) in enumerate(ranked[:topk]):
            rep.write(f"  {i+1:2d}. {img_id}: overlap {ngt}/{nt} = "
                      f"{100.0*ngt/max(1, nt):.2f}% | unique {n1} | zero {n0}")

        if expect_exclusive and totalg > 0:
            rep.write(f"\n[FAIL] Exclusive check enabled but found "
                      f"{totalg:,} overlapped pixels (sum>1).")
            return 1
        rep.write("\n[OK] Exclusive constraint satisfied."
                  if expect_exclusive
                  else "\n[OK] Completed (exclusivity not enforced).")
        return 0
    finally:
        rep.close()


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Summarize and verify mask overlaps."
    )
    p.add_argument("--mask_path", "--mask_dir", dest="mask_path",
                   required=True)
    p.add_argument("--expect_exclusive", action="store_true")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--out", default=None,
                   help="report file (default <mask_path>/stats.txt)")
    a = p.parse_args(argv)
    return gen_mask_stats(a.mask_path, a.expect_exclusive, a.topk,
                          a.max_images, a.out)


if __name__ == "__main__":
    sys.exit(main())
