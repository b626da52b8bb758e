"""make_live_camera_renderer == the host-ray render path.

The live camera renderer (pose up, frame down) must produce what
frame_rays + make_chunk_renderer + render_rays_chunked produce — the
host-IO cut must never change image content. Parity is to float-noise
tolerance (fusing raygen into the render program changes XLA fusion
order; measured drift ~1e-6 on a handful of pixels). Pins: stratified
and soft-occ parity, the video near_bias transform, invalid-black
masking, the fused u8 tonemap, and fog_stats columns.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.data.ram_rays import frame_rays, np_clamp_rays
from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
from nerfsys_tpu.pipelines.online.runtime_adapt import (
    make_chunk_renderer,
    make_live_camera_renderer,
    render_rays_chunked,
)

H = W = 24
CHUNK = 128  # several chunks + a padded tail (24*24 = 576 = 4*128 + 64)
AABB = np.asarray([[-2.5, -2.5, -2.5], [2.5, 2.5, 2.5]], np.float32)


def _setup(K=2, seed=0):
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)[:K]
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    st = ContainerStatics(cents, boxes, jnp.asarray(AABB))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(seed), cfg)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1,
                                       warmup_steps=0), K)
    occ["binary"] = jnp.ones_like(occ["binary"])
    occ["occs"] = jnp.full_like(occ["occs"], 0.5)
    occ["num_updates"] = jnp.asarray(10, jnp.int32)
    return cfg, st, params, occ


def _cam():
    # camera above the scene looking down -z; frustum covers the box
    c2w = np.array([[1, 0, 0, 0], [0, 1, 0, 0.3], [0, 0, 1, 4.0]],
                   np.float32)
    intr = np.array([W * 0.7, W * 0.7, W / 2.0, H / 2.0], np.float32)
    return c2w, intr


def _host_frame(renderer, params, st, c2w, intr, near_bias=0.0):
    rays, valid = frame_rays(H, W, tuple(intr), c2w, aabb=AABB)
    if near_bias:
        t_near = np.maximum(rays[:, 6], 0.0) + np.float32(near_bias)
        rays[:, 6] = np.minimum(t_near, rays[:, 7] - 1e-4)
        rays, _ = np_clamp_rays(rays)
    out = render_rays_chunked(renderer, params, st, rays, CHUNK)
    return out, valid


def test_stratified_parity_and_u8():
    cfg, st, params, _ = _setup()
    c2w, intr = _cam()
    host = make_chunk_renderer(cfg, ray_samples=8)
    ref, _ = _host_frame(host, params, st, c2w, intr)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        out_u8=False)
    got = cam(params, st, c2w, intr)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    cam8 = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB)
    img = cam8(params, st, c2w, intr)
    assert img.dtype == np.uint8 and img.shape == (H, W, 3)
    want = np.clip(ref[:, 0:3] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img.reshape(-1, 3), want)


def test_soft_occ_parity():
    cfg, st, params, occ = _setup()
    c2w, intr = _cam()
    kw = dict(occ_state=occ, occ_importance=True, occ_hard_mask=False)
    host = make_chunk_renderer(cfg, ray_samples=8, **kw)
    assert getattr(host, "probe", None) is None  # soft mode: one program
    ref, _ = _host_frame(host, params, st, c2w, intr)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        out_u8=False, **kw)
    got = cam(params, st, c2w, intr)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_near_bias_matches_video_host_transform():
    cfg, st, params, _ = _setup()
    c2w, intr = _cam()
    host = make_chunk_renderer(cfg, ray_samples=8, use_bg_fn=False)
    ref, _ = _host_frame(host, params, st, c2w, intr, near_bias=0.05)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        near_bias=0.05, use_bg_fn=False, out_u8=False)
    got = cam(params, st, c2w, intr)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_invalid_black_matches_host_valid_mask():
    cfg, st, params, _ = _setup()
    # camera far off-axis: a good fraction of rays miss the AABB
    c2w = np.array([[1, 0, 0, 4.5], [0, 1, 0, 0], [0, 0, 1, 4.0]],
                   np.float32)
    intr = np.array([W * 0.4, W * 0.4, W / 2.0, H / 2.0], np.float32)
    host = make_chunk_renderer(cfg, ray_samples=8)
    ref, valid = _host_frame(host, params, st, c2w, intr)
    assert 0 < valid.sum() < valid.size  # both kinds present
    masked = np.where(valid[:, None], ref, 0.0)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        invalid_black=True, out_u8=False)
    got = cam(params, st, c2w, intr)
    np.testing.assert_allclose(got, masked, rtol=1e-4, atol=1e-5)


def test_fog_stats_and_map_outputs():
    cfg, st, params, occ = _setup()
    c2w, intr = _cam()
    kw = dict(occ_state=occ, occ_importance=True, occ_hard_mask=False,
              use_bg_fn=False)
    host = make_chunk_renderer(cfg, ray_samples=8, fog_stats=True, **kw)
    rays, _ = frame_rays(H, W, tuple(intr), c2w, aabb=AABB)
    ref = render_rays_chunked(host, params, st, rays, CHUNK, fog_stats=True)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        fog_stats=True, out_u8=False, **kw)
    got = cam(params, st, c2w, intr)
    assert got.shape == (H * W, 7)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # map_outputs fuses a display transform with traced extras
    def tonemap(rgb, depth, acc, wmax, entropy, gain):
        return (jnp.clip(rgb * gain, 0, 1) * 255.0 + 0.5).astype(jnp.uint8)

    cam_u8 = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        fog_stats=True, map_outputs=tonemap, **kw)
    img = cam_u8(params, st, c2w, intr, np.float32(2.0))
    want = (np.clip(ref[:, 0:3] * 2.0, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(img.reshape(-1, 3), want)


def test_union_probe_on_pose_path():
    """--occ_union_probe_res on the pose path: the live camera renderer
    probes the resampled union grid IN-PROGRAM (the one-program analogue
    of the two-wave path's union-CDF reuse — the chunk renderer's soft
    one-shot has no probe wave to switch). Reference: render_rays_occ
    with union_probe_fns over the same grid on the same rays must match
    exactly; previously the pose path silently dropped the flag."""
    import jax

    from nerfsys_tpu.data.ram_rays import frame_rays
    from nerfsys_tpu.models.occupancy import (
        build_union_probe_grid,
        render_rays_occ,
        union_probe_fns,
    )

    cfg, st, params, occ = _setup()
    c2w, intr = _cam()
    kw = dict(occ_state=occ, occ_importance=True, occ_hard_mask=False)

    grid = jax.jit(
        lambda o, s: build_union_probe_grid(o, s, res=8, importance=True)
    )(occ, st)
    rays, _ = frame_rays(H, W, tuple(intr), c2w, aabb=AABB)

    @jax.jit
    def ref_fn(params, st, rays):
        rgb, depth, w, acc = render_rays_occ(
            params, cfg, st, occ, rays, 8, randomized=False,
            bg_policy="white", importance=True, hard_mask=False,
            probe_fns=union_probe_fns(grid),
        )
        return rgb, depth, acc

    refs = []
    for s in range(0, rays.shape[0], CHUNK):
        r = np.asarray(rays[s:s + CHUNK], np.float32)
        pad = CHUNK - r.shape[0]
        if pad:
            r = np.concatenate([r, np.zeros((pad, 8), np.float32)], 0)
        rgb, depth, acc = ref_fn(params, st, jnp.asarray(r))
        refs.append(np.concatenate(
            [np.asarray(rgb), np.asarray(depth)[:, None],
             np.asarray(acc)[:, None]], 1)[:CHUNK - pad if pad else CHUNK])
    ref = np.concatenate(refs, 0)

    cam = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        out_u8=False, occ_probe_grid_res=8, **kw)
    got = cam(params, st, c2w, intr)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # and the union grid actually changes the sampling vs exact probing
    cam0 = make_live_camera_renderer(
        cfg, H=H, W=W, ray_samples=8, chunk_rays=CHUNK, scene_aabb=AABB,
        out_u8=False, **kw)
    base = cam0(params, st, c2w, intr)
    assert not np.allclose(got, base, rtol=1e-6, atol=1e-7)
