"""TaskDataset reference-fidelity: exact DDA routing (native vs numpy
parity, geometric correctness), weak-overlap filtering, and episode
statistics (image constraints, per-image caps, disjointness, ratio split)
matching /root/reference/adaptive_nerf/data/task_dataset.py semantics."""
import numpy as np
import pytest

from nerfsys_tpu.data.task_dataset import (
    TaskDataset,
    _alpha_route_numpy,
    _dda_route_numpy,
    build_cell_bounds,
    route_rays_exact,
)


def _mkrays(o, d, near, far):
    o = np.asarray(o, np.float32).reshape(-1, 3)
    d = np.asarray(d, np.float32).reshape(-1, 3)
    n = o.shape[0]
    nf = np.stack([np.full(n, near, np.float32), np.full(n, far, np.float32)], 1)
    return np.concatenate([o, d, nf], 1)


AABB = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]], np.float32)
CELLS = (1, 4, 4)


def _random_rays(n, seed=0, aabb=AABB):
    rng = np.random.default_rng(seed)
    center = (aabb[0] + aabb[1]) / 2
    span = aabb[1] - aabb[0]
    o = center + rng.normal(0, 1.2, (n, 3)).astype(np.float32) * span
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    near = rng.uniform(0.0, 0.5, n).astype(np.float32)
    far = near + rng.uniform(0.5, 6.0, n).astype(np.float32)
    return np.concatenate([o, d, near[:, None], far[:, None]], 1)


# --------------------------- routing correctness -----------------------------
def test_dda_routes_to_max_overlap_cell():
    """Rays starting at t0=0 route to their true max-overlap cell when one
    cell strictly dominates (exact full-cell ties fall to float noise, as
    in the reference's float32 DDA)."""
    # far=0.8 clips the traversal at y=0.8: cell 0 holds y in [0, 0.5)
    # (len 0.5), cell 1 only [0.5, 0.8) (len 0.3) -> cell 0 dominates
    rays = _mkrays([0.5, 0.0, 0.25], [0.0, 1.0, 0.0], 0.0, 0.8)
    assert _dda_route_numpy(rays, AABB, CELLS)[0] == 0


def test_dda_reference_t0_shift_quirk():
    """REFERENCE QUIRK replicated exactly: _dda_init computes tMax relative
    to t0+eps but _dda_maxoverlap compares it against the ABSOLUTE t1
    (task_dataset.py:252-349), so rays with t0 > 0 traverse shifted; the
    weak-overlap filter (:589-599) then drops rays whose shifted winner has
    ~zero true overlap. Episode-statistics parity requires keeping this."""
    # near=1.2 puts the true segment at y in [0.2, 0.5] (cell 0), but the
    # shifted traversal credits cell 1, which the ray never touches within
    # [near, far] -> weak filter rejects -> -1, exactly as the reference
    rays = _mkrays([0.5, -1.0, 0.25], [0.0, 1.0, 0.0], 1.2, 1.5)
    out = _dda_route_numpy(rays, AABB, CELLS)
    assert out[0] == -1
    # native kernel reproduces the same quirk
    from nerfsys_tpu.data import native

    if native.native_available():
        got = native.dda_route_native(rays, AABB, CELLS)
        assert got[0] == -1


def test_dda_diagonal_ray_picks_longest_segment():
    rays = _mkrays([0.5, 0.05, 1.9], [0.0, 1.0, -0.25], 0.0, 10.0)
    out = _dda_route_numpy(rays, AABB, CELLS)
    # verify against brute force: overlap with every cell
    from nerfsys_tpu.data.task_dataset import _overlap_len_with_cells

    cb = build_cell_bounds(AABB, CELLS)
    lens = np.array(
        [_overlap_len_with_cells(rays, cb[c])[0] for c in range(cb.shape[0])]
    )
    assert out[0] == lens.argmax()


def test_dda_miss_and_invalid_rays():
    miss = _mkrays([5.0, 5.0, 5.0], [1.0, 0.0, 0.0], 0.0, 10.0)
    assert _dda_route_numpy(miss, AABB, CELLS)[0] == -1
    inf_rays = _mkrays([0.5, 0.5, 0.5], [0.0, 1.0, 0.0], np.inf, np.inf)
    assert _dda_route_numpy(inf_rays, AABB, CELLS)[0] == -1


def test_weak_overlap_filter_drops_grazing_rays():
    # ray that just grazes a cell corner: overlap ~ 0 -> filtered
    eps = 1e-9
    graze = _mkrays([0.5, -1.0, 0.5 - eps], [0.0, 1.0, 0.0], 0.0, 1.0 + eps)
    out = _dda_route_numpy(graze, AABB, (1, 1, 4))
    # it DOES overlap cell 0 fully along y though; use a z-aligned graze:
    graze2 = _mkrays([0.5, 0.25, 2.0], [0.0, 0.0, -1.0], 0.0, 1e-8)
    out2 = _dda_route_numpy(graze2, AABB, CELLS)
    assert out2[0] == -1  # segment shorter than tolerance


def test_native_dda_matches_numpy():
    from nerfsys_tpu.data import native

    if not native.native_available():
        pytest.skip("no native lib")
    rays = _random_rays(20000, seed=3)
    got = native.dda_route_native(rays, AABB, CELLS)
    want = _dda_route_numpy(rays, AABB, CELLS)
    frac = (got == want).mean()
    # float associativity can flip exact boundary ties on a handful of rays
    assert frac > 0.999, f"native/numpy DDA agree on only {frac:.4%}"
    # and on rays fully inside with clean geometry they agree exactly
    inside = _mkrays(
        np.tile([[0.5, 0.1, 0.3]], (4, 1)) + np.arange(4)[:, None] * 0.11,
        np.tile([[0.0, 0.7, 0.714]], (4, 1)),
        0.0, 3.0,
    )
    np.testing.assert_array_equal(
        native.dda_route_native(inside, AABB, CELLS),
        _dda_route_numpy(inside, AABB, CELLS),
    )


def test_alpha_policy_agrees_with_dda_on_clean_geometry():
    """Alpha routing is the approximate policy; on rays dominated by one
    cell both policies must pick that cell."""
    rays = _mkrays([0.5, 0.3, 0.25], [1.0, 0.0, 0.0], 0.0, 10.0)  # x-aligned
    a = _alpha_route_numpy(rays, AABB, CELLS, alpha=0.7)
    d = _dda_route_numpy(rays, AABB, CELLS)
    assert a[0] == d[0]


def test_route_rays_exact_dispatch():
    rays = _random_rays(256, seed=5)
    for policy in ("dda", "alpha", "sampled"):
        out = route_rays_exact(rays, AABB, CELLS, policy=policy)
        assert out.shape == (256,)
    with pytest.raises(ValueError):
        route_rays_exact(rays, AABB, CELLS, policy="bogus")


# --------------------------- episode statistics ------------------------------
class _FakeRam:
    """Minimal RamRaysDataset stand-in: rays crossing a 2x2-ish scene from
    many images."""

    def __init__(self, n_imgs=20, rays_per_img=600, seed=0):
        rng = np.random.default_rng(seed)
        rays, imgs = [], []
        for i in range(n_imgs):
            # each image looks at a slightly different part of the box
            tgt = rng.uniform([0.2, 0.3, 0.3], [0.8, 1.7, 1.7], (rays_per_img, 3))
            o = np.array([0.5, 1.0, 4.0]) + rng.normal(0, 0.3, 3)
            d = tgt - o
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            near = np.full(rays_per_img, 1.0)
            far = np.full(rays_per_img, 6.0)
            rays.append(
                np.concatenate(
                    [np.tile(o, (rays_per_img, 1)), d, near[:, None],
                     far[:, None]], 1
                ).astype(np.float32)
            )
            imgs.append(np.full(rays_per_img, i, np.int64))
        self.rays = np.concatenate(rays)
        self.rgbs = np.zeros((len(self.rays), 3), np.float32)
        self.img_indices = np.concatenate(imgs)

    def __len__(self):
        return len(self.rays)


def _td(**kw):
    ds = _FakeRam()
    args = dict(
        dataset=ds, region_aabb=AABB, support_rays=400, query_rays=200,
        cell_dim=3, seed=7, debug_checks=True, pad_to_target=False,
    )
    args.update(kw)
    return TaskDataset(**args)


def test_episode_constraints_reference_semantics():
    td = _td()
    n_checked = 0
    for _ in range(30):
        t = td.sample_task()
        if t is None:
            continue
        n_checked += 1
        s_imgs = np.unique(t.support["img_indices"])
        q_imgs = np.unique(t.query["img_indices"])
        # max-image constraints (8 support / 4 query)
        assert len(s_imgs) <= 8
        assert len(q_imgs) <= 4 or t.metrics["image_disjoint_ok"] == 0.0
        # ray-level disjointness always
        assert not np.isin(t.support["idx"], t.query["idx"]).any()
        # image disjointness unless the fallback borrowed
        if t.metrics["image_disjoint_ok"] == 1.0:
            assert not np.isin(s_imgs, q_imgs).any()
        # per-image support cap: ceil(0.4 * need)
        need = int(t.metrics["S"])
        cap = int(np.ceil(0.4 * need))
        _, counts = np.unique(t.support["img_indices"], return_counts=True)
        assert counts.max() <= cap
    assert n_checked >= 25


def test_ratio_preserving_underfill():
    # tiny pools: cells underfilled -> S:Q ratio ~2:1 preserved
    td = _td(support_rays=100000, query_rays=50000, min_rays_per_cell=100)
    t = td.sample_task()
    assert t is not None
    S, Q = t.metrics["S"], t.metrics["Q"]
    assert S + Q <= t.metrics["total_cell"]
    assert 1.2 < S / max(Q, 1) < 3.2  # ratio target 2.0, query borrow skews up


def test_pad_to_target_fixed_shapes():
    td = _td(pad_to_target=True, debug_checks=False)
    t = td.sample_task()
    assert t.support["rays"].shape == (400, 8)
    assert t.query["rays"].shape == (200, 8)


def test_deterministic_per_seed():
    t1 = _td().sample_task()
    t2 = _td().sample_task()
    np.testing.assert_array_equal(t1.support["idx"], t2.support["idx"])
    np.testing.assert_array_equal(t1.query["idx"], t2.query["idx"])
    t3 = _td(seed=8).sample_task()
    assert not np.array_equal(t1.support["idx"], t3.support["idx"])


def test_region_aabb_inferred_from_near_points():
    ds = _FakeRam()
    td = TaskDataset(ds, region_aabb=None, support_rays=400, query_rays=200,
                     cell_dim=3, seed=1, pad_to_target=False)
    pts = ds.rays[:, :3] + ds.rays[:, 3:6] * ds.rays[:, 6:7]
    np.testing.assert_allclose(td.aabb[0], pts.min(0), rtol=1e-5)
    np.testing.assert_allclose(td.aabb[1], pts.max(0), rtol=1e-5)
    assert td.sample_task() is not None


def test_sequential_cell_pick_cycles():
    td = _td(cell_pick="sequential", debug_checks=False)
    if len(td.eligible_cells) < 2:
        pytest.skip("needs >=2 eligible cells")
    seen = [td.sample_task().block_id for _ in range(len(td.eligible_cells))]
    assert seen == td.eligible_cells


def test_cell_hit_geometry_assert():
    """debug_checks exercises the reference's >=99% cell-hit assert."""
    td = _td(debug_checks=True)
    for _ in range(5):
        td.sample_task()  # raises if selected rays don't overlap their cell
