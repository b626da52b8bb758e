"""Mesh-sharded full-frame rendering: chunk rays shard over the 'data'
axis, params replicated — same renderer, scaled across devices."""
import dataclasses as _dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.parallel.mesh import make_mesh
from nerfsys_tpu.pipelines.online.runtime_adapt import make_chunk_renderer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(K=2, seed=0):
    rng = np.random.default_rng(seed)
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)[:K]
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-2.5, -2.5, -2.5], [2.5, 2.5, 2.5]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(seed), cfg)

    n = 1024
    o = np.tile([0.0, 0.0, 2.0], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile([0.1, 4.0], (n, 1)).astype(np.float32)
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))
    return cfg, st, params, rays


def test_sharded_render_matches_single_device():
    cfg, st, params, rays = _setup()
    mesh = make_mesh("8")

    single = make_chunk_renderer(cfg, ray_samples=16, bg_policy="white")
    sharded = make_chunk_renderer(cfg, ray_samples=16, bg_policy="white",
                                  mesh=mesh)
    rgb_s, depth_s, acc_s = single(params, st, rays)
    rgb_m, depth_m, acc_m = sharded(params, st, rays)

    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_s), np.asarray(depth_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_m),
                               rtol=1e-5, atol=1e-5)
    # output really is laid out across the mesh's data axis
    assert rgb_m.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)), rgb_m.ndim)
    assert len(rgb_m.addressable_shards) == 8


def test_sharded_render_occ_path():
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    cfg, st, params, rays = _setup()
    mesh = make_mesh("8")
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1,
                                       warmup_steps=0), cfg.num_experts)
    occ["binary"] = jnp.ones_like(occ["binary"])
    occ["num_updates"] = jnp.asarray(10, jnp.int32)

    single = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                 occ_importance=True)
    sharded = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                  occ_importance=True, mesh=mesh)
    rgb_s, _, acc_s = single(params, st, rays)
    rgb_m, _, acc_m = sharded(params, st, rays)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_m),
                               rtol=1e-5, atol=1e-5)


def test_sharded_two_wave_matches_single_device():
    """Occ + mesh: the sharded renderer is two-wave too — render_rays_chunked
    (probe/skip/pack over sharded chunks) matches the single-device frame."""
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        TwoWaveOccRenderer,
        render_rays_chunked,
    )

    cfg, st, params, rays = _setup()
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1,
                                       warmup_steps=0), cfg.num_experts)
    # only expert 0 occupied: rays toward expert 1's box are dead
    binary = np.zeros(occ["binary"].shape, bool)
    binary[0] = True
    occ["binary"] = jnp.asarray(binary)
    occ["num_updates"] = jnp.asarray(10, jnp.int32)

    mesh = make_mesh("8")
    single = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                 occ_importance=True)
    sharded = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                  occ_importance=True, mesh=mesh)
    assert isinstance(sharded, TwoWaveOccRenderer)

    # mix of alive and dead rays so both wave-2 programs execute
    r = np.array(rays)
    r[::2, 3:5] = 0.0
    r[::2, 5] = 1.0  # straight up: misses both boxes
    r[::2, 0:3] = [0.0, 0.0, 2.0]
    stats_s, stats_m = {}, {}
    out_s = render_rays_chunked(single, params, st, r.astype(np.float32),
                                256, stats=stats_s)
    out_m = render_rays_chunked(sharded, params, st, r.astype(np.float32),
                                256, stats=stats_m)
    assert stats_m["mode"] in ("packed", "two_wave"), stats_m
    assert stats_m["mode"] == stats_s["mode"]
    np.testing.assert_allclose(out_m, out_s, rtol=1e-5, atol=1e-5)


def test_expert_sharded_rebind_preserves_soft_mask():
    """The expert_map->vmap mesh rebind must carry occ_hard_mask through:
    a soft-trained checkpoint rendered over a DxE mesh matches the
    single-device SOFT render (regression: the recursion once dropped the
    kwarg and silently hard-masked)."""
    import dataclasses as _dc2

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.pipelines.online.runtime_adapt import TwoWaveOccRenderer

    cfg, st, params, rays = _setup()
    cfg = _dc2.replace(cfg, expert_map=True)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1,
                                       warmup_steps=0), cfg.num_experts)
    binary = np.zeros(occ["binary"].shape, bool)
    binary[0] = True  # expert 1 unmarked: hard vs soft visibly differ
    occ["binary"] = jnp.asarray(binary)
    occ["num_updates"] = jnp.asarray(10, jnp.int32)

    single = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                 occ_hard_mask=False)
    sharded = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                  occ_hard_mask=False, mesh=make_mesh("4x2"))
    assert not isinstance(single, TwoWaveOccRenderer)
    assert not isinstance(sharded, TwoWaveOccRenderer)
    rgb_s, _, acc_s = single(params, st, rays)
    rgb_m, _, acc_m = sharded(params, st, rays)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_m),
                               rtol=1e-4, atol=1e-4)
    # soft really kept unmarked density: hard render differs
    hard = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ)
    rgb_h, _, acc_h = hard.full(params, st, rays)
    assert float(jnp.max(jnp.abs(acc_h - acc_s))) > 1e-4


def test_sharded_render_bucketed_top1():
    """The block-sparse dispatch also lays out over the data axis."""
    cfg, st, params, rays = _setup()
    cfg_b = _dc.replace(cfg, bucketed=True, experts_per_point=1,
                        capacity_factor=2.0)
    mesh = make_mesh("8")
    single = make_chunk_renderer(cfg_b, ray_samples=16)
    sharded = make_chunk_renderer(cfg_b, ray_samples=16, mesh=mesh)
    rgb_s, _, _ = single(params, st, rays)
    rgb_m, _, _ = sharded(params, st, rays)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                               rtol=1e-4, atol=1e-4)


def test_runner_maybe_render_mesh_flag():
    from types import SimpleNamespace

    from nerfsys_tpu.parallel.mesh import maybe_render_mesh

    assert maybe_render_mesh(SimpleNamespace(mesh_shape=None)) is None
    mesh = maybe_render_mesh(SimpleNamespace(mesh_shape="8"))
    assert mesh is not None and dict(mesh.shape) == {"data": 8, "expert": 1}


def test_sharded_renderer_rejects_indivisible_chunk():
    cfg, st, params, rays = _setup()
    sharded = make_chunk_renderer(cfg, ray_samples=16, mesh=make_mesh("8"))
    with pytest.raises(ValueError, match="divide"):
        sharded(params, st, rays[:1023])


def test_expert_sharded_render_matches_single_device():
    """2x4 ('data' x 'expert') mesh with K=8: expert tables shard across
    devices, dense and bucketed renders match the single-device output."""
    rng = np.random.default_rng(7)
    K = 8
    cents = jnp.asarray(rng.uniform(-2, 2, (K, 3)), jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-3.5, -3.5, -3.5], [3.5, 3.5, 3.5]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(7), cfg)

    n = 512
    o = np.tile([0.0, 0.0, 3.0], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.tile([0.1, 6.0], (n, 1)).astype(np.float32)], 1))

    mesh = make_mesh("2x4")
    for c in (cfg, _dc.replace(cfg, bucketed=True, experts_per_point=2,
                               capacity_factor=3.0)):
        single = make_chunk_renderer(c, ray_samples=16)
        sharded = make_chunk_renderer(c, ray_samples=16, mesh=mesh)
        rgb_s, _, acc_s = single(params, st, rays)
        rgb_m, _, acc_m = sharded(params, st, rays)
        np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_m),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_baked_render_matches_single_device():
    """Baked snapshot renderer under a mesh: rays shard over 'data',
    table/params replicate; outputs match the unsharded render, including
    the internal pad-to-data-axis path (n not divisible by 8)."""
    from nerfsys_tpu.models.baked import (
        BakedConfig,
        bake_field,
        make_baked_chunk_renderer,
    )

    cfg, st, params, rays = _setup()
    mesh = make_mesh("8")
    bcfg = BakedConfig(resolution=16, sh_levels=2)
    baked = bake_field(params, cfg, st, bcfg)

    single = make_baked_chunk_renderer(baked, bcfg, cfg, ray_samples=16)
    sharded = make_baked_chunk_renderer(baked, bcfg, cfg, ray_samples=16,
                                        mesh=mesh)
    # 1021 rays: NOT a multiple of the data axis — exercises pad + slice
    r = rays[:1021]
    rgb_s, depth_s, acc_s = single(params, st, r)
    rgb_m, depth_m, acc_m = sharded(params, st, r)

    assert rgb_m.shape == (1021, 3)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_s), np.asarray(depth_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_m),
                               rtol=1e-5, atol=1e-5)

    # a second call with the SAME params object reuses the replication
    # cache (no fresh device_put of the table per chunk)
    rgb_m2, _, _ = sharded(params, st, rays)
    np.testing.assert_allclose(
        np.asarray(rgb_m2[:1021]), np.asarray(rgb_m), rtol=1e-5, atol=1e-5)
