"""Exact empty-chunk skipping in the occupancy render path.

Wave 1 probes each render chunk (cheap grid gathers only) and wave 2 skips
the field eval for chunks with zero alive rays — their render_rays_occ
output is exactly the background fill (dead/invalid rays get sigma zeroed).
These tests pin the equivalences the skip relies on:
  - probe + render_from_cdf == the one-shot occ render (the CDF hoist);
  - render_rays_occ_dead == the one-shot render on an all-dead chunk;
  - render_image's two-wave path == its plain per-chunk path, with both
    alive and dead chunks present in the frame.
"""
from pathlib import Path

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
from nerfsys_tpu.models.occupancy import (
    probe_rays_occ,
    render_rays_occ,
    render_rays_occ_dead,
)
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
from nerfsys_tpu.pipelines.online.runtime_adapt import (
    TwoWaveOccRenderer,
    make_chunk_renderer,
    render_image,
)


def _setup(K=2, seed=0, occupied_experts=(0,)):
    """Two experts at y=-1 / y=+1; only `occupied_experts` have marked
    cells, so rays aimed at the other box (or past both) are dead."""
    rng = np.random.default_rng(seed)
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)[:K]
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-2.5, -2.5, -2.5], [2.5, 2.5, 2.5]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(seed), cfg)

    occ = init_occ_state(OccGridConfig(resolution=8, levels=1,
                                       warmup_steps=0), K)
    binary = np.zeros(occ["binary"].shape, bool)
    for k in occupied_experts:
        binary[k] = True
    occ["binary"] = jnp.asarray(binary)
    occ["occs"] = jnp.where(occ["binary"], 0.5, 0.0)
    occ["num_updates"] = jnp.asarray(10, jnp.int32)
    return cfg, st, params, occ, rng


def _rays_at(rng, n, target_y, spread=0.3):
    """Rays from above aimed at (0, target_y, 0)."""
    o = np.tile([0.0, float(target_y), 3.0], (n, 1)).astype(np.float32)
    o[:, :2] += rng.normal(scale=0.1, size=(n, 2))
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    d[:, :2] = rng.normal(scale=spread, size=(n, 2))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile([0.5, 6.0], (n, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d, nf], 1))


def test_probe_then_render_matches_one_shot():
    cfg, st, params, occ, rng = _setup()
    rays = _rays_at(rng, 256, target_y=-1.0)

    full = jax.jit(lambda p, s, r: render_rays_occ(
        p, cfg, s, occ, r, 16, bg_policy="white", importance=True))
    cdf_state, alive = jax.jit(lambda s, r: probe_rays_occ(
        s, occ, r, importance=True))(st, rays)
    assert bool(alive)
    split = jax.jit(lambda p, s, r, c: render_rays_occ(
        p, cfg, s, occ, r, 16, bg_policy="white", importance=True,
        cdf_state=c))
    rgb_f, depth_f, _, acc_f = full(params, st, rays)
    rgb_s, depth_s, _, acc_s = split(params, st, rays, cdf_state)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_s),
                               rtol=1e-6, atol=1e-6)


def test_dead_chunk_program_matches_full_render():
    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    # aim every ray at the UNoccupied expert's box: probes all miss
    rays = _rays_at(rng, 256, target_y=1.0, spread=0.05)
    _, alive = probe_rays_occ(st, occ, rays, importance=True)
    assert not bool(alive)

    rgb_f, depth_f, _, acc_f = render_rays_occ(
        params, cfg, st, occ, rays, 16, bg_policy="white", importance=True)
    rgb_d, depth_d, _, acc_d = render_rays_occ_dead(
        params, cfg, st, rays, 16, bg_policy="white")
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_d))
    np.testing.assert_array_equal(np.asarray(depth_f), np.asarray(depth_d))
    np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_d))


def test_dead_chunk_invalid_rays_and_bg_nerf():
    """Padding rays (all-zero => invalid) and the learned background both go
    through the dead program unchanged."""
    cfg, st, params, occ, rng = _setup()
    rays = np.array(_rays_at(rng, 64, target_y=1.0, spread=0.05))
    rays[::3] = 0.0  # invalid padding rays
    rays = jnp.asarray(rays)
    _, alive = probe_rays_occ(st, occ, rays)
    assert not bool(alive)
    assert cfg.use_bg_nerf and "bg" in params
    rgb_f, depth_f, _, acc_f = render_rays_occ(
        params, cfg, st, occ, rays, 16)
    rgb_d, depth_d, _, acc_d = render_rays_occ_dead(
        params, cfg, st, rays, 16)
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_d))
    np.testing.assert_array_equal(np.asarray(depth_f), np.asarray(depth_d))
    np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_d))


def test_render_image_two_wave_matches_plain():
    from nerfsys_tpu.data.image_metadata import ImageMetadata

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    renderer = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                   occ_importance=True)
    assert isinstance(renderer, TwoWaveOccRenderer)

    # camera above the scene looking straight down (-z); image rows sweep
    # world y, so some chunks cover only the unoccupied half
    c2w = np.array([[1, 0, 0, 0.0],
                    [0, 1, 0, 0.0],
                    [0, 0, 1, 3.0]], np.float32)
    md = ImageMetadata(image_path=Path("/dev/null"), c2w=c2w, W=16, H=16,
                       intrinsics=np.array([8.0, 8.0, 8.0, 8.0], np.float32),
                       image_index=0)
    aabb = np.asarray(st.global_aabb)

    kw = dict(scene_aabb=aabb, near=0.5, far=8.0, chunk_rays=32)
    rgb2, depth2, acc2 = render_image(renderer, params, st, md, **kw)
    rgb1, depth1, acc1 = render_image(renderer.full, params, st, md, **kw)
    np.testing.assert_allclose(rgb2, rgb1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(depth2, depth1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(acc2, acc1, rtol=1e-6, atol=1e-6)

    # the frame must actually exercise BOTH chunk kinds
    from nerfsys_tpu.data.ram_rays import (
        np_clamp_rays,
        np_get_rays,
        np_ray_directions,
    )

    dirs = np_ray_directions(md.H, md.W, 8.0, 8.0, 8.0, 8.0,
                             center_pixels=True)
    rays = np_get_rays(dirs, md.c2w, aabb=aabb, near=0.5, far=8.0)
    rays, _ = np_clamp_rays(rays.reshape(-1, 8).astype(np.float32), 0.5, 8.0)
    flags = []
    for s in range(0, rays.shape[0], 32):
        _, alive = renderer.probe(st, jnp.asarray(rays[s:s + 32]))
        flags.append(bool(alive))
    assert any(flags) and not all(flags), flags


def test_ray_packing_matches_plain():
    """Sky interleaved WITHIN every chunk: packing re-batches the alive rays
    into fewer field-eval chunks; outputs must match the plain path exactly
    (per-ray work is batch-independent)."""
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    renderer = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                   occ_importance=True)
    assert renderer.packable

    # 4 chunks of 64; in each chunk 1/4 of rays aim at the occupied box,
    # the rest at the empty one — no chunk is dead, so chunk skipping alone
    # would save nothing, but packing folds all alive rays into one chunk
    ground = np.array(_rays_at(rng, 256, target_y=-1.0, spread=0.05))
    sky = np.array(_rays_at(rng, 256, target_y=1.0, spread=0.05))
    take_ground = (np.arange(256) % 4) == 0
    rays = np.where(take_ground[:, None], ground, sky).astype(np.float32)
    rays[7] = 0.0  # an invalid ray inside an alive chunk

    stats = {}
    out_packed = render_rays_chunked(renderer, params, st, rays, 64,
                                     stats=stats)
    assert stats["mode"] == "packed", stats
    assert stats["packed_chunks"] == 1 and stats["alive_chunks"] == 4, stats

    out_plain = render_rays_chunked(renderer.full, params, st, rays, 64)
    np.testing.assert_allclose(out_packed, out_plain, rtol=1e-6, atol=1e-6)

    # forcing the renderer unpackable falls back to the CDF chunk path
    renderer.packable = False
    stats2 = {}
    out_cdf = render_rays_chunked(renderer, params, st, rays, 64,
                                  stats=stats2)
    assert stats2["mode"] == "two_wave" and stats2["chunks_skipped"] == 0
    np.testing.assert_allclose(out_cdf, out_plain, rtol=1e-6, atol=1e-6)


def test_soft_mode_union_probe_engages():
    """--occ_union_probe_res on a SOFT-mode renderer must actually change
    probing (it was a silent no-op before 2026-08-21: the TwoWave probe
    wrapper only exists when dead chunks do). Engagement = sample
    placement moves (output differs from exact-probe soft render) while
    staying close (the union grid is placement-only; sigma is never
    masked in soft mode)."""
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        make_chunk_renderer,
    )

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    # partial occupancy so the union resample actually coarsens the pdf
    binary = np.zeros(np.asarray(occ["binary"]).shape, bool)
    binary[0, :, ::2] = True
    occ["binary"] = jnp.asarray(binary)
    occ["occs"] = jnp.where(occ["binary"], 0.5, 0.0)
    rays = _rays_at(rng, 128, target_y=-1.0)

    exact = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                occ_importance=True, occ_hard_mask=False)
    union = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                occ_importance=True, occ_hard_mask=False,
                                occ_probe_grid_res=16)
    rgb_e = np.asarray(exact(params, st, rays)[0])
    rgb_u = np.asarray(union(params, st, rays)[0])
    assert not np.allclose(rgb_e, rgb_u, atol=1e-7)  # engaged
    assert float(np.abs(rgb_e - rgb_u).mean()) < 0.05  # placement-only


def test_union_probe_grid_marks_centers_and_renders_close():
    """occ_probe_grid_res: wave-1 probes one resampled union grid (K x L
    fewer gather transactions). Placement-only — outputs stay close to
    exact probing on blocky occupancy, sky rays still dead-fill exactly."""
    from nerfsys_tpu.models.occupancy import (
        build_union_probe_grid,
        union_binary_fn,
        union_probe_fns,
    )
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    grid = build_union_probe_grid(occ, st, res=16, importance=True)
    assert grid["binary"].shape == (1, 16, 16, 16)
    assert grid["values"].shape == (1, 16, 16, 16)

    # every cell whose center the exact union marks is marked in the grid
    aabb = np.asarray(st.global_aabb)
    xs = (np.arange(16) + 0.5) / 16
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    centers = aabb[0] + np.stack([gx, gy, gz], -1).reshape(-1, 3) * (
        aabb[1] - aabb[0])
    exact = np.asarray(union_binary_fn(occ, st)(jnp.asarray(
        centers.astype(np.float32))))
    marked = np.asarray(grid["binary"][0]).reshape(-1)
    assert np.all(~exact | marked)

    bin_u, val_u = union_probe_fns(grid)
    assert bool(jnp.any(bin_u(jnp.asarray(centers[:64].astype(np.float32))))
                ) == bool(exact[:64].any())

    # renderer comparison on a mixed frame
    ground = np.array(_rays_at(rng, 128, target_y=-1.0, spread=0.05))
    sky = np.array(_rays_at(rng, 128, target_y=1.0, spread=0.05))
    rays = np.concatenate([ground, sky]).astype(np.float32)

    r_exact = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                  occ_importance=True)
    r_union = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                                  occ_importance=True,
                                  occ_probe_grid_res=32)
    s1, s2 = {}, {}
    out_e = render_rays_chunked(r_exact, params, st, rays, 128, stats=s1)
    out_u = render_rays_chunked(r_union, params, st, rays, 128, stats=s2)
    assert s2["chunks_skipped"] == 1 or s2["mode"] == "packed", s2
    # sky rays: identical background fill either way
    np.testing.assert_array_equal(out_e[128:], out_u[128:])
    # ground rays: same geometry, slightly different sample placement
    assert np.mean(np.abs(out_e[:128, :3] - out_u[:128, :3])) < 0.05

    # stale-grid guard: a new statics rebuilds the union grid
    import dataclasses as _dc  # noqa: F401

    from nerfsys_tpu.models.container import ContainerStatics

    st2 = ContainerStatics(st.centroids, st.expert_aabbs * 0.01,
                           st.global_aabb)
    _, alive1 = r_union.probe(st, jnp.asarray(ground))
    _, alive2 = r_union.probe(st2, jnp.asarray(ground))
    assert bool(alive1) and not bool(alive2)


def test_moe_probe_mask_is_conservative():
    """mask_from_probes (interval-bit masking, zero grid re-queries): never
    darker than point masking — acc can only grow, and matches on a fully
    occupied grid."""
    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    rays = _rays_at(rng, 128, target_y=-1.0)
    _, _, _, acc_pt = render_rays_occ(
        params, cfg, st, occ, rays, 16, importance=True)
    _, _, _, acc_iv = render_rays_occ(
        params, cfg, st, occ, rays, 16, importance=True,
        mask_from_probes=True)
    assert np.all(np.asarray(acc_iv) >= np.asarray(acc_pt) - 1e-6)
    # (no exact-equality case exists: even under an all-ones grid, point
    # masking zeroes samples OUTSIDE the level aabbs while their probe
    # interval — straddling the box edge — stays occupied)

    # renderer-level: cdf path carries the interval bits
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    r = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                            occ_importance=True, occ_probe_mask=True)
    out = render_rays_chunked(r, params, st, np.array(rays), 64)
    assert np.isfinite(out).all()


def test_soft_render_mode_keeps_unmarked_density():
    """occ_hard_mask=False (soft-trained checkpoints): the grid steers
    placement only; density outside the marked cells still composites."""
    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    rays = _rays_at(rng, 128, target_y=1.0, spread=0.05)  # unmarked box
    _, alive = probe_rays_occ(st, occ, rays)
    assert not bool(alive)

    _, _, _, acc_hard = render_rays_occ(
        params, cfg, st, occ, rays, 16, importance=True)
    _, _, _, acc_soft = render_rays_occ(
        params, cfg, st, occ, rays, 16, importance=True, hard_mask=False)
    assert float(jnp.max(acc_hard)) == 0.0  # hard: dead rays fully zeroed
    assert float(jnp.max(acc_soft)) > 0.0  # soft: field density survives

    # soft renderer cannot skip dead chunks (they composite the field)
    r = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                            occ_hard_mask=False)
    assert not isinstance(r, TwoWaveOccRenderer)


def test_probe_cache_reuses_wave1_across_param_updates():
    """The probe is params-independent: with a caller-owned probe_cache the
    dispatcher skips wave 1 on repeat frames and still tracks params."""
    from nerfsys_tpu.pipelines.online.runtime_adapt import two_wave_dispatch

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    renderer = make_chunk_renderer(cfg, ray_samples=8, occ_state=occ,
                                   occ_importance=True)
    ground = np.array(_rays_at(rng, 96, target_y=-1.0, spread=0.1))
    sky = np.array(_rays_at(rng, 96, target_y=1.0, spread=0.05))
    rays = np.concatenate([ground, sky]).astype(np.float32)

    # prime the pack5-mapped renderer the way render_rays_chunked does
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        render_rays_chunked,
    )

    base = render_rays_chunked(renderer, params, st, rays, 64)

    import jax

    cache: dict = {}
    s1, s2 = {}, {}
    packed = renderer._pack5_cache
    out1 = np.zeros((rays.shape[0], 5), np.float32)
    for ids, dev in two_wave_dispatch(packed, params, st, rays, 64,
                                      stats=s1, probe_cache=cache):
        out1[ids] = np.asarray(dev)[: len(ids)]
    assert "probe_cached" not in s1
    np.testing.assert_allclose(out1, base, rtol=1e-6, atol=1e-6)

    # new params (simulated adaptation step), same camera: cached wave 1
    params2 = jax.tree_util.tree_map(lambda x: x * 1.05, params)
    out2 = np.zeros((rays.shape[0], 5), np.float32)
    for ids, dev in two_wave_dispatch(packed, params2, st, rays, 64,
                                      stats=s2, probe_cache=cache):
        out2[ids] = np.asarray(dev)[: len(ids)]
    assert s2.get("probe_cached") is True
    fresh2 = render_rays_chunked(renderer, params2, st, rays, 64)
    np.testing.assert_allclose(out2, fresh2, rtol=1e-6, atol=1e-6)
    assert np.abs(out2 - out1).max() > 1e-6  # params really changed output


def test_segmented_dispatch_matches_plain():
    """Frames beyond the live-CDF budget (>16 chunks) process in segments;
    the output must still match the one-shot program exactly."""
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    renderer = make_chunk_renderer(cfg, ray_samples=8, occ_state=occ,
                                   occ_importance=True)
    ground = np.array(_rays_at(rng, 300, target_y=-1.0, spread=0.2))
    sky = np.array(_rays_at(rng, 300, target_y=1.0, spread=0.05))
    rays = np.concatenate([ground, sky]).astype(np.float32)  # 600 rays

    stats = {}
    out_seg = render_rays_chunked(renderer, params, st, rays, 32,
                                  stats=stats)  # 19 chunks -> 2 segments
    assert stats.get("segments") == 2, stats
    assert stats["chunks_total"] == 19
    out_plain = render_rays_chunked(renderer.full, params, st, rays, 32)
    np.testing.assert_allclose(out_seg, out_plain, rtol=1e-6, atol=1e-6)


def test_dispatch_fuzz_matches_plain():
    """Property check over random ray batches (NaN/inf corruption, random
    grids, odd chunk sizes): the dispatcher — whatever mode it picks —
    always reproduces the one-shot program's frame."""
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    cfg, st, params, occ, rng = _setup(occupied_experts=(0,))
    renderer = make_chunk_renderer(cfg, ray_samples=8, occ_state=occ,
                                   occ_importance=True)
    modes = set()
    for trial in range(4):
        n = int(rng.integers(30, 200))
        rays = np.array(_rays_at(rng, n, target_y=float(rng.uniform(-2, 2)),
                                 spread=float(rng.uniform(0.05, 0.6))))
        # corrupt a few rays: NaN origins, inf far, reversed near/far
        for i in rng.integers(0, n, size=3):
            kind = int(rng.integers(3))
            if kind == 0:
                rays[i, 0] = np.nan
            elif kind == 1:
                rays[i, 7] = np.inf
            else:
                rays[i, 6], rays[i, 7] = 5.0, 1.0
        rays = np.nan_to_num(rays, posinf=1e10, neginf=-1e10).astype(
            np.float32)
        chunk = int(rng.choice([32, 48, 64]))
        stats = {}
        out_d = render_rays_chunked(renderer, params, st, rays, chunk,
                                    stats=stats)
        out_p = render_rays_chunked(renderer.full, params, st, rays, chunk)
        modes.add(stats["mode"])
        np.testing.assert_allclose(out_d, out_p, rtol=1e-6, atol=1e-6,
                                   err_msg=f"trial {trial}: {stats}")
    assert modes - {"plain"}, modes  # at least one non-trivial mode ran


def test_two_wave_gating():
    """last_sample backgrounds read field colors — no skip; mesh path keeps
    the one-shot renderer."""
    cfg, st, params, occ, _ = _setup()
    r = make_chunk_renderer(cfg, ray_samples=16, occ_state=occ,
                            bg_policy="last_sample")
    assert not isinstance(r, TwoWaveOccRenderer)
    assert getattr(r, "probe", None) is None
