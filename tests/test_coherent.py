"""Coherent-expert dispatch exactness (the honest fast top-1 live path).

Contract: coherent_dispatch output == the full routed render for every
ray, while most rays of a spatially-clustered frame render through the
one-expert program (1/K the field evals). The packed rays are those
where the routed blend provably equals the single-expert field
(models/container.routing_coherent_expert), so this is an equality
test, not a tolerance-on-quality test.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
    routing_coherent_expert,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.pipelines.online.runtime_adapt import (
    coherent_dispatch,
    make_chunk_renderer,
    make_coherent_renderer,
    render_rays_chunked,
)


def _setup(K=2, margin=1.1, seed=0):
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)[:K]
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-2.5, -2.5, -2.5], [2.5, 2.5, 2.5]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=K, expert=expert,
                          boundary_margin=margin, bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(seed), cfg)
    return cfg, st, params


def _mixed_rays(rng, n):
    """Some rays deep inside one expert's region, some crossing the
    boundary plane y=0 (incoherent by construction)."""
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 3.0
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    # thirds: aimed at expert 0, expert 1, and across the boundary
    o[: n // 3, 1] = -1.0
    o[n // 3: 2 * n // 3, 1] = 1.0
    d[2 * n // 3:, 1] = rng.uniform(-0.6, 0.6, n - 2 * n // 3)
    o[2 * n // 3:, 1] = -rng.uniform(0.5, 1.5, n - 2 * n // 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile([0.5, 6.0], (n, 1)).astype(np.float32)
    rays = np.concatenate([o, d, nf], 1).astype(np.float32)
    rays[7] = [0, 0, 3, 0, 0, -1, np.inf, np.inf]  # one invalid ray
    return rays


def test_routing_coherent_expert_soft_and_hard():
    for margin in (1.1, 1.0):
        cfg, st, _ = _setup(margin=margin)
        pts = np.zeros((3, 4, 3), np.float32)
        pts[0, :, 1] = -1.0  # all samples deep in expert 0
        pts[1, :, 1] = 1.0   # expert 1
        pts[2, :, 1] = [-1.0, -0.02, 0.02, 1.0]  # crosses the boundary
        kid = np.asarray(routing_coherent_expert(st, cfg, jnp.asarray(pts)))
        assert kid[0] == 0 and kid[1] == 1
        assert kid[2] == -1  # boundary samples: near-tie (soft: in-margin)


def test_coherent_dispatch_exact_vs_full():
    rng = np.random.default_rng(0)
    for K, margin in ((2, 1.1), (2, 1.0)):
        cfg, st, params = _setup(K=K, margin=margin)
        rays = _mixed_rays(rng, 300)
        full = make_chunk_renderer(cfg, ray_samples=8)
        ref = render_rays_chunked(full, params, st, rays, 128)

        ren = make_coherent_renderer(cfg, ray_samples=8)
        stats = {}
        out = np.zeros_like(ref)
        for ids, dev in coherent_dispatch(ren, params, st, rays, 128,
                                          stats=stats):
            cols = np.concatenate(
                [np.asarray(d)[: len(ids)].reshape(len(ids), -1)
                 for d in dev], 1)
            out[ids] = cols
        assert stats["n_coherent"] > 150, stats  # most rays pack
        assert stats["n_boundary"] > 10, stats   # boundary rays exist
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_coherent_single_program_is_traced_over_experts():
    """One compiled program serves every expert id (k is traced)."""
    cfg, st, params = _setup(K=2)
    ren = make_coherent_renderer(cfg, ray_samples=8)
    rng = np.random.default_rng(1)
    rays = jnp.asarray(_mixed_rays(rng, 128))
    r0 = ren.single(params, st, rays, jnp.asarray(0, jnp.int32))
    r1 = ren.single(params, st, rays, jnp.asarray(1, jnp.int32))
    assert ren.single._cache_size() == 1  # same compiled executable
    assert not np.allclose(np.asarray(r0[0]), np.asarray(r1[0]))


def _ready_occ(K, seed=3):
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    rng = np.random.default_rng(seed)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=2), K)
    occ["binary"] = jnp.asarray(
        rng.uniform(size=np.asarray(occ["binary"]).shape) > 0.4)
    occ["occs"] = jnp.asarray(
        rng.uniform(size=np.asarray(occ["occs"]).shape).astype(np.float32))
    occ["num_updates"] = occ["ready_after"]
    return occ


def test_coherent_dispatch_exact_vs_full_occ():
    """Occupancy-guided coherent mode: every program probes the UNION
    grids (identical CDF -> identical sample placement + hard-mask
    semantics), only the field eval narrows — so dispatch must equal the
    full occ render bit-for-bit, for both hard and soft modes."""
    rng = np.random.default_rng(0)
    for hard in (True, False):
        cfg, st, params = _setup(K=2)
        occ = _ready_occ(2)
        rays = _mixed_rays(rng, 300)
        full = make_chunk_renderer(
            cfg, ray_samples=8, occ_state=occ, occ_importance=True,
            occ_hard_mask=hard)
        ref = render_rays_chunked(full, params, st, rays, 128)

        ren = make_coherent_renderer(
            cfg, ray_samples=8, occ_state=occ, occ_importance=True,
            occ_hard_mask=hard)
        stats = {}
        out = np.zeros_like(ref)
        for ids, dev in coherent_dispatch(ren, params, st, rays, 128,
                                          stats=stats):
            cols = np.concatenate(
                [np.asarray(d)[: len(ids)].reshape(len(ids), -1)
                 for d in dev], 1)
            out[ids] = cols
        assert stats["n_coherent"] > 150, stats
        assert stats["n_boundary"] > 10, stats
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_coherent_dispatch_exact_with_union_probe_grid():
    """Coherent + union-probe combo (the probe-bound rung's fix): every
    program — probe, single-expert, full — probes the ONE resampled union
    grid, so the CDF is identical everywhere and packing stays an
    EQUALITY against the combo's full program. (The union grid itself is
    an honest approximation vs exact per-expert probing — that delta is
    owned by build_union_probe_grid's contract, not this dispatch.)"""
    rng = np.random.default_rng(0)
    for hard in (True, False):
        cfg, st, params = _setup(K=2)
        occ = _ready_occ(2)
        rays = _mixed_rays(rng, 300)
        ren = make_coherent_renderer(
            cfg, ray_samples=8, occ_state=occ, occ_importance=True,
            occ_hard_mask=hard, occ_probe_grid_res=16)
        # oracle: the combo's own full routed program, chunk-for-chunk
        ref = render_rays_chunked(ren.full, params, st, rays, 128)

        stats = {}
        out = np.zeros_like(ref)
        for ids, dev in coherent_dispatch(ren, params, st, rays, 128,
                                          stats=stats):
            cols = np.concatenate(
                [np.asarray(d)[: len(ids)].reshape(len(ids), -1)
                 for d in dev], 1)
            out[ids] = cols
        assert stats["n_coherent"] > 150, stats
        assert stats["n_boundary"] > 10, stats
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_coherent_union_probe_positions_match_full_program():
    """The dispatch probe and the render programs must derive sample
    positions from the SAME union grid: a coherent ray rendered through
    its single-expert program equals the full program's output for that
    ray (row-for-row on a pure chunk), which fails if either side probed
    a different grid."""
    cfg, st, params = _setup(K=2)
    occ = _ready_occ(2)
    rng = np.random.default_rng(4)
    n = 64
    rays = np.zeros((n, 8), np.float32)  # all deep in expert 0, straight -z
    rays[:, 0:3] = [0.0, -1.0, 3.0]
    rays[:, 1] += rng.uniform(-0.2, 0.2, n)
    rays[:, 3:6] = [0.0, 0.0, -1.0]
    rays[:, 6], rays[:, 7] = 0.5, 6.0
    ren = make_coherent_renderer(
        cfg, ray_samples=8, occ_state=occ, occ_importance=True,
        occ_probe_grid_res=16)
    kid = np.asarray(ren.probe(st, jnp.asarray(rays)))
    assert (kid == 0).all(), kid
    full = [np.asarray(x) for x in ren.full(params, st, jnp.asarray(rays))]
    single = [np.asarray(x) for x in
              ren.single(params, st, jnp.asarray(rays),
                         jnp.asarray(0, jnp.int32))]
    for f, s in zip(full, single):
        np.testing.assert_allclose(s, f, rtol=1e-6, atol=1e-6)


def test_coherent_occ_single_program_traced_and_distinct():
    cfg, st, params = _setup(K=2)
    occ = _ready_occ(2)
    ren = make_coherent_renderer(cfg, ray_samples=8, occ_state=occ,
                                 occ_importance=True)
    rng = np.random.default_rng(1)
    rays = jnp.asarray(_mixed_rays(rng, 128))
    r0 = ren.single(params, st, rays, jnp.asarray(0, jnp.int32))
    r1 = ren.single(params, st, rays, jnp.asarray(1, jnp.int32))
    assert ren.single._cache_size() == 1
    assert not np.allclose(np.asarray(r0[0]), np.asarray(r1[0]))


def test_render_rays_chunked_routes_coherent_bundle():
    """render_rays_chunked duck-types the coherent bundle (the
    --render_coherent eval path): same (n, 5) output as the plain chunk
    renderer, via coherent_dispatch with device-packed fetches."""
    rng = np.random.default_rng(2)
    cfg, st, params = _setup(K=2)
    rays = _mixed_rays(rng, 300)
    full = make_chunk_renderer(cfg, ray_samples=8)
    ref = render_rays_chunked(full, params, st, rays, 128)

    ren = make_coherent_renderer(cfg, ray_samples=8)
    stats = {}
    out = render_rays_chunked(ren, params, st, rays, 128, stats=stats)
    assert stats["mode"] == "coherent" and stats["n_coherent"] > 150
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
