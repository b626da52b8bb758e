import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.models.occupancy import (
    expert_render_step_sizes,
    make_occ_update_fn,
    make_render_rays,
    occ_ready,
    premark_invisible_expert_cells,
    render_rays_occ,
    union_binary_fn,
)
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.ops.occupancy import (
    OccGridConfig,
    anneal_alpha_thre,
    init_occ_state,
    level_aabbs,
    mark_invisible_cells,
    occupancy_sample_tvals,
    query_binary,
    update_occ_grid,
)

OCC = OccGridConfig(resolution=16, levels=2, warmup_steps=4, update_interval=2)
AABB = jnp.array([[-1.0, -1, -1], [1, 1, 1]])


def test_level_aabbs_doubling():
    la = level_aabbs(AABB, 3)
    np.testing.assert_allclose(la[0], AABB)
    np.testing.assert_allclose(la[1], [[-2, -2, -2], [2, 2, 2]])
    np.testing.assert_allclose(la[2], [[-4, -4, -4], [4, 4, 4]])


def test_anneal_alpha_thre():
    cfg = OccGridConfig(alpha_thre_start=0.0, alpha_thre_end=0.01,
                        warmup_steps=100, cosine_anneal=True)
    assert float(anneal_alpha_thre(cfg, 0)) == 0.0
    assert abs(float(anneal_alpha_thre(cfg, 100)) - 0.01) < 1e-8
    mid = float(anneal_alpha_thre(cfg, 50))
    assert 0.004 < mid < 0.006


def test_query_binary_finest_level_wins():
    R, L = 16, 2
    binary = jnp.zeros((L, R, R, R), bool)
    # level 1 (coarse) fully occupied; level 0 empty
    binary = binary.at[1].set(True)
    # point inside level-0 box -> finest level (0) decides -> unoccupied
    inside = query_binary(binary, AABB, jnp.array([[0.0, 0, 0]]))
    assert not bool(inside[0])
    # point outside level 0 but inside level 1 -> occupied
    out = query_binary(binary, AABB, jnp.array([[1.5, 0, 0]]))
    assert bool(out[0])
    # point outside all levels -> False
    far = query_binary(binary, AABB, jnp.array([[10.0, 0, 0]]))
    assert not bool(far[0])


def test_query_single_gather_matches_per_level_reference():
    """The level-concatenated single-gather layout must equal the naive
    per-level walk (finest containing level decides) bit-for-bit — the
    transaction-count optimization may not move any value."""
    from nerfsys_tpu.ops.occupancy import level_aabbs, query_values

    rng = np.random.default_rng(3)
    R, L = 8, 3
    binary = jnp.asarray(rng.random((L, R, R, R)) < 0.3)
    occs = jnp.asarray(
        rng.normal(size=(L, R, R, R)).astype(np.float32)
    )  # incl. negatives (invisible tags)
    pts = jnp.asarray(
        rng.uniform(-9, 9, size=(4096, 3)).astype(np.float32)
    )  # spans inside level 0, the halos, and outside all levels

    def ref_binary(b, aabb, p):
        la = np.asarray(level_aabbs(aabb, L))
        res = np.zeros(p.shape[0], bool)
        dec = np.zeros(p.shape[0], bool)
        for l in range(L):
            rel = (np.asarray(p) - la[l, 0]) / (la[l, 1] - la[l, 0])
            ins = np.all((rel >= 0) & (rel < 1), axis=-1)
            ijk = np.clip((rel * R).astype(np.int32), 0, R - 1)
            v = np.asarray(b).reshape(L, -1)[
                l, (ijk[:, 0] * R + ijk[:, 1]) * R + ijk[:, 2]
            ]
            res = np.where(~dec & ins, v, res)
            dec |= ins
        return res

    got = np.asarray(query_binary(binary, AABB, pts))
    np.testing.assert_array_equal(got, ref_binary(binary, AABB, pts))

    def ref_values(o, aabb, p):
        la = np.asarray(level_aabbs(aabb, L))
        res = np.zeros(p.shape[0], np.float32)
        dec = np.zeros(p.shape[0], bool)
        for l in range(L):
            rel = (np.asarray(p) - la[l, 0]) / (la[l, 1] - la[l, 0])
            ins = np.all((rel >= 0) & (rel < 1), axis=-1)
            ijk = np.clip((rel * R).astype(np.int32), 0, R - 1)
            v = np.asarray(o).reshape(L, -1)[
                l, (ijk[:, 0] * R + ijk[:, 1]) * R + ijk[:, 2]
            ]
            res = np.where(~dec & ins, v, res)
            dec |= ins
        return np.maximum(res, 0.0)

    got_v = np.asarray(query_values(occs, AABB, pts))
    np.testing.assert_array_equal(got_v, ref_values(occs, AABB, pts))


def test_subset_update_strided_coverage_and_invisible():
    """Post-warmup updates touch exactly the strided 1/m subset (the field
    is only evaluated there), cover every cell across phases, and never
    resurrect premarked invisible cells."""
    from nerfsys_tpu.ops.occupancy import update_occ_grid

    cfg = OccGridConfig(resolution=8, levels=2, sample_fraction=0.5,
                        ema_decay=0.5, occ_thre=1e-2)
    n = 8 ** 3
    occs = jnp.full((2, 8, 8, 8), 0.5, jnp.float32)
    occs = occs.at[0, 0, 0, 0].set(-1.0)  # invisible tag
    state = {"occs": occs, "binary": jnp.zeros((2, 8, 8, 8), bool)}

    def density(pts):
        return jnp.full(pts.shape[:-1], 100.0)

    touched = np.zeros(n, bool)
    for trial in range(8):  # random phases; m=2 -> two lattices
        out = update_occ_grid(state, AABB, density, 1.0, cfg,
                              jax.random.PRNGKey(trial),
                              warmup=jnp.array(False))
        new = np.asarray(out["occs"]).reshape(2, -1)
        old = np.asarray(occs).reshape(2, -1)
        changed = new[1] != old[1]  # level 1 has no invisible cell
        assert changed.sum() == n // 2  # exactly the strided half
        # the changed set is one of the two parity lattices
        par = np.flatnonzero(changed) % 2
        assert (par == par[0]).all()
        touched |= changed
        # invisible cell never resurrects
        assert np.asarray(out["occs"])[0, 0, 0, 0] == -1.0
        assert not bool(np.asarray(out["binary"])[0, 0, 0, 0])
    assert touched.all()  # both phases drawn across trials


def test_query_pair_matches_separate_queries():
    """query_pair's fused 2-wide row must reproduce query_binary and
    query_values exactly, and the probe CDF built from pair_fn must equal
    the separate binary+weight build bit-for-bit."""
    from nerfsys_tpu.ops.occupancy import (
        occupancy_probe_cdf,
        query_pair,
        query_values,
    )

    rng = np.random.default_rng(5)
    R, L = 8, 2
    binary = jnp.asarray(rng.random((L, R, R, R)) < 0.4)
    occs = jnp.asarray(rng.normal(size=(L, R, R, R)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-5, 5, size=(2048, 3)).astype(np.float32))

    occ, val = query_pair(occs, binary, AABB, pts)
    np.testing.assert_array_equal(
        np.asarray(occ), np.asarray(query_binary(binary, AABB, pts))
    )
    np.testing.assert_array_equal(
        np.asarray(val), np.asarray(query_values(occs, AABB, pts))
    )

    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    near = jnp.full((64,), 0.1)
    far = jnp.full((64,), 4.0)
    sep = occupancy_probe_cdf(
        lambda p: query_binary(binary, AABB, p), o, d, near, far, 32,
        weight_fn=lambda p: query_values(occs, AABB, p), ray_floor=0.25,
    )
    fused = occupancy_probe_cdf(
        None, o, d, near, far, 32, ray_floor=0.25,
        pair_fn=lambda p: query_pair(occs, binary, AABB, p),
    )
    for k in ("cdf", "alive", "occ"):
        np.testing.assert_array_equal(np.asarray(sep[k]), np.asarray(fused[k]))


def test_probe_lowering_gather_counts():
    """Structural lock on the transaction optimizations: the lowered HLO of
    a probe pass must contain exactly ONE gather op — finest-level select
    is arithmetic (no per-level gathers) and importance probing rides the
    fused (binary, value) pair row. The union probe over K experts must
    also lower to ONE op (row_gather's batching rule collapses the expert
    axis into the row axis)."""
    import re

    from nerfsys_tpu.ops.occupancy import occupancy_probe_cdf, query_pair

    def count_gathers(fn, *args):
        txt = jax.jit(fn).lower(*args).as_text()
        return len(re.findall(r'"stablehlo\.gather"\(', txt))

    R, L, K = 8, 4, 3
    binary = jnp.zeros((L, R, R, R), bool)
    occs = jnp.zeros((L, R, R, R), jnp.float32)
    o = jnp.zeros((64, 3))
    d = jnp.ones((64, 3))
    near = jnp.zeros(64)
    far = jnp.ones(64)

    def fused(o, d, near, far, occs, binary):
        return occupancy_probe_cdf(
            None, o, d, near, far, 32,
            pair_fn=lambda p: query_pair(occs, binary, AABB, p),
        )

    assert count_gathers(fused, o, d, near, far, occs, binary) == 1

    def binary_only(o, d, near, far, binary):
        return occupancy_probe_cdf(
            lambda p: query_binary(binary, AABB, p), o, d, near, far, 32
        )

    assert count_gathers(binary_only, o, d, near, far, binary) == 1

    # union pair over K stacked experts: still one (collapsed) gather op
    from nerfsys_tpu.models.container import ContainerStatics
    from nerfsys_tpu.models.occupancy import union_pair_fn

    occ_state = {
        "occs": jnp.zeros((K, L, R, R, R), jnp.float32),
        "binary": jnp.zeros((K, L, R, R, R), bool),
    }
    statics = ContainerStatics(
        jnp.zeros((K, 3)),
        jnp.broadcast_to(AABB, (K, 2, 3)),
        AABB,
    )

    def union(o, d, near, far, occ_state):
        return occupancy_probe_cdf(
            None, o, d, near, far, 32,
            pair_fn=union_pair_fn(occ_state, statics),
        )

    assert count_gathers(union, o, d, near, far, occ_state) == 1


def test_update_occ_grid_marks_dense_region():
    state = {
        "occs": jnp.zeros((OCC.levels, 16, 16, 16)),
        "binary": jnp.zeros((OCC.levels, 16, 16, 16), bool),
    }

    def density(pts):  # dense ball at origin, radius .4
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.4, 100.0, 0.0)

    out = update_occ_grid(state, AABB, density, 1.0, OCC,
                          jax.random.PRNGKey(0), warmup=jnp.array(True))
    assert bool(out["binary"].any())
    # center cell occupied, corner cell not
    c = query_binary(out["binary"], AABB, jnp.array([[0.0, 0, 0]]))
    k = query_binary(out["binary"], AABB, jnp.array([[0.9, 0.9, 0.9]]))
    assert bool(c[0]) and not bool(k[0])


def test_update_preserves_invisible_cells():
    occs = jnp.full((OCC.levels, 16, 16, 16), -1.0)
    state = {"occs": occs, "binary": jnp.zeros_like(occs, bool)}
    out = update_occ_grid(state, AABB, lambda p: jnp.full(p.shape[:-1], 100.0),
                          1.0, OCC, jax.random.PRNGKey(0), jnp.array(True))
    np.testing.assert_allclose(out["occs"], -1.0)
    assert not bool(out["binary"].any())


def test_mark_invisible_cells():
    # one camera at z=3 looking down -z: only cells in front and in-frustum
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [3.0]])], 1)[None]
    intr = jnp.array([[20.0, 20.0, 16.0, 16.0]])
    wh = jnp.array([[32, 32]])
    occs = mark_invisible_cells(AABB, OCC, c2w, intr, wh)
    assert occs.shape == (2, 16, 16, 16)
    # center of the scene is visible
    centers_visible = occs[0, 8, 8, 8]
    assert float(centers_visible) == 0.0
    # some cells are invisible (outside the frustum on the coarse level)
    assert float((occs < 0).mean()) > 0.05
    # all invisible cells are on the coarse level or scene edges, none where
    # the camera clearly looks (the central column of level 0)
    assert float((occs[0, 6:10, 6:10, 6:10] < 0).mean()) == 0.0


def test_occupancy_sample_tvals_concentrates():
    # occupied only in a z-slab [0.5, 1.0] along the ray
    def bin_fn(pts):
        return (pts[:, 2] > 0.5) & (pts[:, 2] < 1.0)

    o = jnp.array([[0.0, 0, 3.0]])
    d = jnp.array([[0.0, 0, -1.0]])
    near = jnp.array([0.1])
    far = jnp.array([5.0])
    t, alive = occupancy_sample_tvals(bin_fn, o, d, near, far, 32, n_probes=256)
    assert bool(alive[0])
    z = 3.0 - np.asarray(t[0])
    frac_inside = ((z > 0.45) & (z < 1.05)).mean()
    assert frac_inside > 0.95
    # monotone
    assert (np.diff(np.asarray(t[0])) >= 0).all()


def test_occupancy_sample_dead_ray():
    def bin_fn(pts):
        return jnp.zeros(pts.shape[:-1], bool)

    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (2, 1))
    t, alive = occupancy_sample_tvals(bin_fn, o, d, jnp.ones(2), 2 * jnp.ones(2), 8)
    assert not bool(alive.any())
    assert np.isfinite(np.asarray(t)).all()


EXPERT = NGPConfig(
    hidden=16, sigma_depth=1, color_hidden=16, color_depth=1, geo_feat_dim=7,
    hash=HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
)


def make_setup(K=2):
    cents = jnp.array([[0.0, -1, 0], [0.0, 1, 0]], dtype=jnp.float32)[:K]
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    st = ContainerStatics(cents, boxes, jnp.array([[-2.0, -2, -2], [2, 2, 2]]))
    cfg = ContainerConfig(num_experts=K, expert=EXPERT, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    return cfg, st, params


def test_occ_update_fn_interval_and_ready():
    cfg, st, params = make_setup()
    occ = init_occ_state(OCC, 2)
    upd = make_occ_update_fn(cfg, OCC)
    key = jax.random.PRNGKey(0)
    assert not bool(occ_ready(occ))
    occ1 = upd(occ, params, st, jnp.array(1), key)  # 1 % 2 != 0 -> no-op
    assert int(occ1["num_updates"]) == 0
    occ2 = upd(occ, params, st, jnp.array(2), key)  # due
    assert int(occ2["num_updates"]) == 1
    # warmup gate: OCC warmup=4/interval=2 -> ready only after 2 updates
    assert int(occ2["ready_after"]) == 2
    assert not bool(occ_ready(occ2))
    occ3 = upd(occ2, params, st, jnp.array(4), key)
    assert int(occ3["num_updates"]) == 2
    # a fresh NGP has near-uniform small sigma; binary may or may not fire.
    # past the warmup gate: ready iff any binary cell is occupied.
    assert bool(occ_ready(occ3)) == bool(occ3["binary"].any())


def test_render_rays_occ_shapes_and_dispatch():
    cfg, st, params = make_setup()
    occ = init_occ_state(OCC, 2)
    # occupy everything so the renderer integrates normally
    occ = {**occ, "binary": jnp.ones_like(occ["binary"]),
           "num_updates": jnp.array(1)}
    rays = jnp.array([[0, -1, 3, 0, 0, -1, 1.0, 5.0],
                      [0, 1, 3, 0, 0, -1, 1.0, 5.0]], dtype=jnp.float32)
    rgb, depth, w, acc = render_rays_occ(
        params, cfg, st, occ, rays, 16, jax.random.PRNGKey(0), n_probes=32
    )
    assert rgb.shape == (2, 3) and np.isfinite(np.asarray(rgb)).all()

    render = make_render_rays(cfg, ray_samples=16, n_probes=32)
    out_occ = render(params, st, occ, rays, jax.random.PRNGKey(1))
    empty = init_occ_state(OCC, 2)
    out_strat = render(params, st, empty, rays, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out_occ[0])).all()
    assert np.isfinite(np.asarray(out_strat[0])).all()


def test_render_rays_occ_empty_grid_gives_background():
    cfg, st, params = make_setup()
    occ = init_occ_state(OCC, 2)  # all unoccupied
    rays = jnp.array([[0, -1, 3, 0, 0, -1, 1.0, 5.0]], dtype=jnp.float32)
    rgb, depth, w, acc = render_rays_occ(
        params, cfg, st, occ, rays, 16, jax.random.PRNGKey(0), n_probes=32,
        use_bg_fn=False, bg_policy="black",
    )
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-6)


def test_premark_and_step_sizes():
    cfg, st, params = make_setup()
    occ = init_occ_state(OCC, 2)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [5.0]])], 1)[None]
    occ = premark_invisible_expert_cells(
        occ, st, OCC, c2w, jnp.array([[20.0, 20, 16, 16]]), jnp.array([[32, 32]])
    )
    assert occ["occs"].shape == (2, 2, 16, 16, 16)
    assert bool((occ["occs"] < 0).any())
    ss = expert_render_step_sizes(st)
    np.testing.assert_allclose(np.asarray(ss), np.sqrt(12) / 1000, rtol=1e-5)


def test_online_adapt_and_render_with_occ():
    """make_adapt_step / make_chunk_renderer with an occupancy state."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig, ContainerStatics, init_container_params,
        param_group_labels,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        make_adapt_step, make_chunk_renderer,
    )
    from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(hidden=8, sigma_depth=1, color_hidden=8,
                         color_depth=1, geo_feat_dim=3,
                         hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                             log2_hashmap_size=8)),
        bg_hidden=8,
    )
    cents = jnp.array([[0.0, -1, 0], [0.0, 1, 0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    statics = ContainerStatics(cents, boxes,
                               jnp.array([[-3.0, -3, -3], [3, 3, 3]]))
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=2), 2)
    occ = {**occ, "binary": jnp.ones_like(occ["binary"]),
           "num_updates": jnp.asarray(1)}

    n = 64
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    nf = np.tile(np.array([0.5, 2.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))
    rgbs = jnp.full((n, 3), 0.4)

    tx = build_optimizer(OptimConfig(use_scheduler=False),
                         param_group_labels(params))
    st = make_adapt_step(cfg, tx, ray_samples=8)
    p2, opt2, loss = st(params, tx.init(params), statics, rays, rgbs,
                        jax.random.PRNGKey(1), occ)
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(p2["experts"]["sigma_head"]["w"]),
        np.asarray(params["experts"]["sigma_head"]["w"]))

    r = make_chunk_renderer(cfg, ray_samples=8, occ_state=occ)
    rgb, depth, acc = r(p2, statics, rays)
    assert rgb.shape == (n, 3) and np.isfinite(np.asarray(rgb)).all()


# --------------------------- importance sampling ------------------------------
def test_query_values_finest_level_and_clamping():
    from nerfsys_tpu.ops.occupancy import query_values

    R, L = 16, 2
    occs = jnp.zeros((L, R, R, R), jnp.float32)
    occs = occs.at[1].set(0.5)          # coarse level everywhere
    occs = occs.at[0, 8, 8, 8].set(2.0)  # one hot fine cell near center
    occs = occs.at[0, 0, 0, 0].set(-1.0)  # invisible tag must clamp to 0

    # center of the hot fine cell: (8.5/16)*2-1 per axis
    c = (8.5 / 16) * 2.0 - 1.0
    v = query_values(occs, AABB, jnp.array([[c, c, c]]))
    assert float(v[0]) == 2.0
    # a point in the invisible-tagged fine cell -> clamped to 0 (not -1)
    lo = (0.5 / 16) * 2.0 - 1.0
    v = query_values(occs, AABB, jnp.array([[lo, lo, lo]]))
    assert float(v[0]) == 0.0
    # outside level 0 but inside level 1 -> coarse value
    v = query_values(occs, AABB, jnp.array([[1.5, 0.0, 0.0]]))
    assert float(v[0]) == 0.5
    # outside all levels -> 0
    v = query_values(occs, AABB, jnp.array([[10.0, 0.0, 0.0]]))
    assert float(v[0]) == 0.0


def test_importance_sampling_concentrates_on_high_density():
    """Two occupied slabs, one with 9x the EMA density: the weighted sampler
    must place ~(0.75*0.9 + 0.25*0.5) of samples in the heavy slab while the
    uniform floor keeps the light slab populated."""
    def bin_fn(pts):
        z = pts[..., 2]
        return (jnp.abs(z - 0.5) < 0.25) | (jnp.abs(z + 0.5) < 0.25)

    def val_fn(pts):
        z = pts[..., 2]
        return jnp.where(jnp.abs(z - 0.5) < 0.25, 9.0,
                         jnp.where(jnp.abs(z + 0.5) < 0.25, 1.0, 0.0))

    N, S = 64, 256
    o = jnp.tile(jnp.asarray([[0.0, 0, 2.0]], jnp.float32), (N, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0, -1.0]], jnp.float32), (N, 1))
    near, far = jnp.full((N,), 0.0), jnp.full((N,), 4.0)

    t, alive = occupancy_sample_tvals(
        bin_fn, o, d, near, far, S, n_probes=256, weight_fn=val_fn,
        uniform_frac=0.25, key=jax.random.PRNGKey(0), randomized=True,
    )
    z = 2.0 - np.asarray(t)
    assert bool(np.asarray(alive).all())
    heavy = (np.abs(z - 0.5) < 0.25 + 4.0 / 256).mean()
    light = (np.abs(z + 0.5) < 0.25 + 4.0 / 256).mean()
    # expected heavy fraction = 0.75*0.9 + 0.25*0.5 = 0.8
    assert 0.72 < heavy < 0.88, heavy
    assert light > 0.1  # uniform floor keeps the light slab reachable
    assert abs(heavy + light - 1.0) < 0.02  # nothing lands outside slabs


def test_render_rays_occ_importance_finite_and_dispatch():
    """MoE occ render with importance=True stays finite and matches the
    binary-only sampler's dead-ray semantics."""
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=2, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    cents = jnp.asarray([[0.0, 0, -0.5], [0.0, 0, 0.5]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 0.6, c + 0.6]) for c in cents])
    statics = ContainerStatics(cents, boxes,
                               jnp.asarray([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]]))
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    occ = init_occ_state(OCC, 2)
    occ = {**occ,
           "binary": occ["binary"].at[:, :, 4:12, 4:12, 4:12].set(True),
           "occs": occ["occs"].at[:, :, 6:10, 6:10, 6:10].set(0.3),
           "num_updates": jnp.asarray(5, jnp.int32)}

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 0.1 + [0, 0, 1.5], jnp.float32)
    d = jnp.asarray(np.tile([[0.0, 0, -1.0]], (32, 1)), jnp.float32)
    rays = jnp.concatenate([o, d, jnp.full((32, 1), 0.1),
                            jnp.full((32, 1), 3.0)], axis=1)
    for imp in (False, True):
        rgb, depth, w, acc = render_rays_occ(
            params, cfg, statics, occ, rays, 16,
            key=jax.random.PRNGKey(1), randomized=True, importance=imp,
        )
        assert np.isfinite(np.asarray(rgb)).all()
        assert np.isfinite(np.asarray(depth)).all()
        assert np.isfinite(np.asarray(acc)).all()


def test_dilate_binary_semantics():
    from nerfsys_tpu.ops.occupancy import dilate_binary

    b = jnp.zeros((1, 5, 5, 5), bool).at[0, 2, 2, 2].set(True)
    d1 = dilate_binary(b, 1)
    # one pass = full 3^3 box around the seed
    assert int(d1.sum()) == 27
    assert bool(d1[0, 1, 1, 1]) and bool(d1[0, 3, 3, 3])
    assert not bool(d1[0, 0, 2, 2])
    # edges clamp, never wrap
    e = jnp.zeros((1, 4, 4, 4), bool).at[0, 0, 0, 0].set(True)
    de = dilate_binary(e, 1)
    assert int(de.sum()) == 8  # 2x2x2 corner box
    assert not bool(de[0, 3, 3, 3])
    # 0 passes = identity
    assert bool((dilate_binary(b, 0) == b).all())


def test_update_occ_grid_dilation_applied():
    import dataclasses

    from nerfsys_tpu.ops.occupancy import update_occ_grid

    cfg = dataclasses.replace(OCC, dilate=1, occ_thre=0.5)
    R, L = cfg.resolution, cfg.levels
    state = {"occs": jnp.zeros((L, R, R, R), jnp.float32),
             "binary": jnp.zeros((L, R, R, R), bool)}

    # density spike only in one cell near the aabb center
    center = jnp.asarray([0.0, 0.0, 0.0])

    def density(pts):
        return jnp.where(jnp.linalg.norm(pts - center, axis=-1) < 0.25,
                         100.0, 0.0)

    out = update_occ_grid(state, AABB, density, 1.0, cfg,
                          jax.random.PRNGKey(0), warmup=jnp.asarray(True))
    occupied = int(out["binary"][0].sum())
    raw = int((out["occs"][0] > 0.5).sum())
    assert occupied > raw  # dilation strictly grows the binary support


def test_probe_mask_matches_requery_on_interval_aligned_grid():
    """When occupancy is constant within probe intervals, the probe-interval
    mask equals the per-sample grid re-query and renders identically."""
    from nerfsys_tpu.ops.occupancy import render_rays_occ_field

    # slab aligned exactly to probe-interval boundaries: near=0, far=1,
    # 128 probes -> intervals of 1/128; slab [0.25, 0.5] covers intervals
    # 32..63 exactly
    def bin_fn(pts):
        return (pts[:, 2] >= 0.25) & (pts[:, 2] < 0.5)

    def field(pts, dirs):
        rgb = jnp.tile(jnp.array([[0.8, 0.2, 0.1]]), (pts.shape[0], 1))
        sigma = jnp.full((pts.shape[0],), 5.0)
        return rgb, sigma

    n = 16
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0, 1.0]], np.float32), (n, 1))
    nf = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))

    outs = {}
    for probe_mask in (False, True):
        outs[probe_mask] = render_rays_occ_field(
            field, bin_fn, rays, 32, jax.random.PRNGKey(0),
            randomized=True, mask_from_probes=probe_mask,
        )
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_probe_mask_is_conservative_superset():
    """Interval masking keeps sigma wherever the probe saw occupancy, so
    accumulated opacity can only be >= the point-masked render."""
    from nerfsys_tpu.ops.occupancy import render_rays_occ_field

    # thin unaligned slab: point re-query zeroes samples that drift out of
    # the slab inside an occupied interval; interval masking keeps them
    def bin_fn(pts):
        return (pts[:, 2] >= 0.301) & (pts[:, 2] < 0.317)

    def field(pts, dirs):
        return (jnp.ones((pts.shape[0], 3)) * 0.5,
                jnp.full((pts.shape[0],), 50.0))

    n = 8
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0, 1.0]], np.float32), (n, 1))
    nf = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))

    accs = {}
    for probe_mask in (False, True):
        _, _, _, acc = render_rays_occ_field(
            field, bin_fn, rays, 16, jax.random.PRNGKey(3),
            randomized=True, mask_from_probes=probe_mask,
        )
        accs[probe_mask] = np.asarray(acc)
    assert (accs[True] >= accs[False] - 1e-6).all()
    assert accs[True].max() > 0


def test_no_hard_mask_keeps_density_outside_grid():
    """Pure importance mode: the grid steers samples but never deletes
    density — a field with geometry OUTSIDE the marked region still
    renders opacity there (hard mask would zero it)."""
    from nerfsys_tpu.ops.occupancy import render_rays_occ_field

    # grid marks only z in [0.6, 0.8]; the field's real density is at
    # z in [0.2, 0.4] (a stale/imperfect grid)
    def bin_fn(pts):
        return (pts[:, 2] >= 0.6) & (pts[:, 2] < 0.8)

    def field(pts, dirs):
        sig = jnp.where((pts[:, 2] >= 0.2) & (pts[:, 2] < 0.4), 50.0, 0.0)
        return jnp.ones((pts.shape[0], 3)) * 0.5, sig

    n = 8
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0, 1.0]], np.float32), (n, 1))
    nf = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))

    _, _, _, acc_hard = render_rays_occ_field(
        field, bin_fn, rays, 32, jax.random.PRNGKey(0), randomized=True,
        hard_mask=True,
    )
    _, _, _, acc_soft = render_rays_occ_field(
        field, bin_fn, rays, 32, jax.random.PRNGKey(0), randomized=True,
        hard_mask=False,
    )
    assert float(np.asarray(acc_hard).max()) < 1e-3  # geometry deleted
    # soft mode: the whole-ray pdf floor (ray_floor) keeps unmarked space
    # sampled -> the real geometry still produces opacity
    assert float(np.asarray(acc_soft).max()) > 0.1


def test_soft_mode_gradient_reaches_unmarked_space():
    """The point of the soft mode: density OUTSIDE marked cells must
    receive loss gradient (so a wrong grid is self-correcting), while the
    hard mask provably blocks it."""
    from nerfsys_tpu.ops.losses import compute_mse_loss

    def bin_fn(pts):
        return (pts[:, 2] >= 0.6) & (pts[:, 2] < 0.8)

    n = 16
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0, 1.0]], np.float32), (n, 1))
    nf = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))
    gt = jnp.zeros((n, 3))  # target: black -> wants density somewhere

    def loss_of(theta, hard):
        # theta parameterizes density ONLY inside the unmarked band
        def field(pts, dirs):
            sig = jnp.where(
                (pts[:, 2] >= 0.2) & (pts[:, 2] < 0.4), theta, 0.0
            )
            return jnp.zeros((pts.shape[0], 3)), sig

        loss, _ = compute_mse_loss(
            field, rays, gt, ray_samples=32, key=jax.random.PRNGKey(1),
            randomized=True, bg_policy="white", binary_fn=bin_fn,
            occ_hard_mask=hard,
        )
        return loss

    g_hard = jax.grad(loss_of)(5.0, True)
    g_soft = jax.grad(loss_of)(5.0, False)
    assert float(np.abs(np.asarray(g_hard))) < 1e-9
    assert float(np.abs(np.asarray(g_soft))) > 1e-5


def test_occ_update_expert_map_matches_vmap():
    """over_experts dispatch (lax.map vs vmap) is value-identical in the
    EMA occupancy update."""
    import dataclasses as _dc

    cfg, st, params = make_setup()
    cfg_v = _dc.replace(cfg, expert_map=False)
    occ = init_occ_state(OCC, 2)
    key = jax.random.PRNGKey(3)
    out_m = make_occ_update_fn(cfg, OCC)(occ, params, st, jnp.array(2), key)
    out_v = make_occ_update_fn(cfg_v, OCC)(occ, params, st, jnp.array(2), key)
    occs_m, occs_v = np.asarray(out_m["occs"]), np.asarray(out_v["occs"])
    np.testing.assert_allclose(occs_m, occs_v, rtol=1e-4, atol=1e-6)
    # binary thresholds the EMA: the two program structures accumulate the
    # density eval in different orders, so cells within float noise of the
    # threshold may legitimately flip — require agreement elsewhere
    bin_m, bin_v = np.asarray(out_m["binary"]), np.asarray(out_v["binary"])
    disagree = bin_m != bin_v
    assert disagree.mean() < 0.005, f"{disagree.sum()} cells flipped"
