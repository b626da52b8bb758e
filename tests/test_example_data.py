"""Contract tests against the reference's bundled example dataset.

These lock in the on-disk prepared-dataset format (SURVEY.md §1): metadata
.pt schema, coordinates.pt, clustering params/scene_boxes, per-expert zipped
pixel masks, and the flat/split discovery logic — exactly what a user
switching from the reference brings along. Skipped when the reference tree
is not mounted.
"""
from pathlib import Path

import numpy as np
import pytest

EXAMPLE = Path("/root/reference/adaptive_nerf/data/drz/out/example")

pytestmark = pytest.mark.skipif(
    not EXAMPLE.exists(), reason="reference example dataset not mounted"
)


def test_coordinates_and_clustering_meta():
    from nerfsys_tpu.data.dataset import (
        load_clustering_meta,
        load_coordinates,
        load_scene_boxes,
    )

    coords = load_coordinates(EXAMPLE)
    assert {"origin_drb", "pose_scale_factor"} <= set(coords)
    assert float(coords["pose_scale_factor"]) > 0

    mask_dir = EXAMPLE / "masks" / "g22_grid_bm110_ss11"
    meta = load_clustering_meta(mask_dir)
    assert meta["centroids"].shape[1] == 3
    assert meta["boundary_margin"] >= 1.0

    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)
    assert global_aabb.shape == (2, 3)
    assert expert_aabbs.shape == (len(meta["centroids"]), 2, 3)
    assert (expert_aabbs[:, 1] >= expert_aabbs[:, 0]).all()


def test_split_metadata_discovery_and_masks():
    from nerfsys_tpu.data.dataset import get_image_metadata

    train, val = get_image_metadata(EXAMPLE, 0.125)
    assert len(train) > 100 and len(val) > 10
    md = train[0]
    assert md.c2w.shape == (3, 4)
    assert md.intrinsics.shape[0] >= 4
    # normalized translations stay in the unit envelope
    assert np.abs(md.c2w[:, 3]).max() <= 1.0 + 1e-5

    # per-expert masks load and match image resolution
    mask_dir = EXAMPLE / "masks" / "g22_grid_bm110_ss11" / "0"
    train_m, _ = get_image_metadata(EXAMPLE, 0.125, mask_dir)
    keep = train_m[0].load_mask()
    assert keep is not None
    assert keep.shape == (train_m[0].H, train_m[0].W)
    assert keep.dtype == bool


def test_masked_ray_dataset_small():
    from nerfsys_tpu.data.dataset import get_dataset

    bundle = get_dataset(
        EXAMPLE, 0.0625, "g22_grid_bm110_ss11", 4, cap_images=4
    )
    assert len(bundle.train_sets) == 4
    for ds in bundle.train_sets:
        assert len(ds) > 0
        nf = ds.rays[:, 6:8]
        finite = np.isfinite(nf).all(axis=1)
        assert finite.all()  # invalid rays are filtered at build time
        assert (nf[:, 1] > nf[:, 0]).all()
        assert ds.rgbs.min() >= 0.0 and ds.rgbs.max() <= 1.0


def test_continual_batch_verifies():
    from nerfsys_tpu.viewer.utils import verify_continual_batch_dir

    batches = sorted((EXAMPLE / "continual").glob("batch_*"))
    assert batches, "example dataset ships a continual batch"
    ok, problems, summary = verify_continual_batch_dir(batches[0])
    assert ok, problems
    assert summary["count"] > 0
