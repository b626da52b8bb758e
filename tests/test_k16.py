"""K=16 city-scale demo harness (scripts/measure_k16.py): sharded-vs-
unsharded loss parity over a {data:2, expert:4} mesh, and the scene/GT
generators' invariants. The TPU throughput/eval/render numbers live in
BASELINE.md; this pins the correctness half on the CPU mesh."""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def test_scene_generators():
    from nerfsys_tpu.scripts.measure_k16 import (
        _centroids,
        _colors,
        _expert_rays,
        _gt_march,
    )

    c = _centroids()
    assert c.shape == (16, 3)
    cols = _colors(16)
    assert cols.shape == (16, 3) and cols.min() >= 0.15 and cols.max() <= 1.0
    assert len(np.unique((cols * 255).astype(int), axis=0)) == 16

    rng = np.random.default_rng(0)
    rays = _expert_rays(5, 256, rng)
    rgb, hit = _gt_march(rays[:, 0:3], rays[:, 3:6])
    # rays aimed at the expert's sphere: most hit, and hits carry its color
    assert hit.mean() > 0.25  # jittered aim: many rays graze past
    hit_cols = np.unique((rgb[hit.astype(bool)] * 255).astype(int), axis=0)
    want = (cols[5] * 255).astype(int)
    assert any((h == want).all() for h in hit_cols)


def test_k16_sharded_parity():
    from nerfsys_tpu.scripts.measure_k16 import main

    main(["--parity"])  # raises SystemExit(1) on parity failure
