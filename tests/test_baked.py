"""Baked SH snapshot renderer (models/baked.py).

No reference analogue (the reference always evaluates the live field); the
contracts pinned here are the bake's own:
  - the SH least-squares projector recovers band-limited radiance exactly;
  - baked_query reproduces a linear-in-position, direction-constant field
    exactly (trilinear interpolation is exact on linear fields);
  - a real container baked at sufficient resolution renders close to the
    live stratified render (resolution-limited approximation, loose bound);
  - the baked chunk renderer is a drop-in for render_rays_chunked and the
    --render_baked eval flag runs end-to-end (test_dataprep_e2e).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.models.baked import (
    BakedConfig,
    _fibonacci_sphere,
    bake_field,
    baked_query,
    make_baked_chunk_renderer,
    render_rays_baked,
    sh_projection_matrix,
)
from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    container_bg_fn,
    container_field_fn,
    init_container_params,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.encodings import HashGridConfig, sh_encode
from nerfsys_tpu.ops.volrend import render_rays_stratified


def test_sh_projection_recovers_bandlimited_radiance():
    levels = 3
    B = levels**2
    rng = np.random.default_rng(0)
    coefs = rng.normal(scale=0.1, size=(B, 3)).astype(np.float32)
    dirs = _fibonacci_sphere(32)
    Y = np.asarray(sh_encode(jnp.asarray(dirs), levels=levels))  # (M, B)
    rgb = Y @ coefs  # (M, 3) — exactly degree-(levels-1) radiance
    P = sh_projection_matrix(levels, dirs)
    np.testing.assert_allclose(P @ rgb, coefs, rtol=1e-4, atol=1e-5)


def test_baked_query_exact_on_linear_field():
    R = 8
    bcfg = BakedConfig(resolution=R, sh_levels=1, dtype="float32")
    C = bcfg.channels  # 1 + 3
    lo = np.array([-1.0, -1.0, -1.0], np.float32)
    hi = np.array([1.0, 1.0, 1.0], np.float32)
    h = (hi - lo) / R

    # linear sigma field + constant-color cells (DC-only SH)
    idx = np.arange(R, dtype=np.float32) + 0.5
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    centers = lo + np.stack([gx, gy, gz], -1) * h
    sigma = (0.3 * centers[..., 0] + 0.5 * centers[..., 1]
             - 0.2 * centers[..., 2] + 1.0)
    rgb_cell = np.stack([
        0.2 + 0.1 * centers[..., 0], np.full_like(sigma, 0.5),
        0.7 - 0.1 * centers[..., 2],
    ], -1)
    dc = rgb_cell / 0.28209479177387814  # Y_0 coefficient giving rgb back
    g = np.concatenate([sigma[..., None], dc], -1).astype(np.float32)
    Cp = bcfg.padded_channels  # blocks pad to the fast-gather width
    g = np.concatenate(
        [g, np.zeros(g.shape[:-1] + (Cp - C,), np.float32)], -1)
    g_next = np.concatenate([g[:, :, 1:], g[:, :, -1:]], axis=2)
    table = np.concatenate([g, g_next], -1).reshape(R**3, 2 * Cp)
    baked = {"table": jnp.asarray(table),
             "aabb": jnp.asarray(np.stack([lo, hi]))}

    rng = np.random.default_rng(1)
    # interior points (>= half a cell from the border: clamp-free region)
    pts = rng.uniform(lo + h, hi - h, size=(256, 3)).astype(np.float32)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    rgb_q, sigma_q = baked_query(baked, bcfg, jnp.asarray(pts),
                                 jnp.asarray(dirs))
    sigma_true = 0.3 * pts[:, 0] + 0.5 * pts[:, 1] - 0.2 * pts[:, 2] + 1.0
    rgb_true = np.stack([
        0.2 + 0.1 * pts[:, 0], np.full(256, 0.5, np.float32),
        0.7 - 0.1 * pts[:, 2],
    ], -1)
    np.testing.assert_allclose(sigma_q, sigma_true, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rgb_q, np.clip(rgb_true, 0, 1), rtol=1e-4,
                               atol=1e-5)


def _tiny_scene(seed=0):
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-2.5, -2.5, -2.5], [2.5, 2.5, 2.5]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    cfg = ContainerConfig(num_experts=2, expert=expert, boundary_margin=1.1,
                          bg_hidden=8)
    params = init_container_params(jax.random.PRNGKey(seed), cfg)
    return cfg, st, params


def _rays(rng, n):
    o = np.tile([0.0, 0.0, 3.0], (n, 1)).astype(np.float32)
    o[:, :2] += rng.normal(scale=0.2, size=(n, 2))
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    d[:, :2] = rng.normal(scale=0.3, size=(n, 2))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile([0.5, 6.0], (n, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d, nf], 1))


def test_container_apply_multidir_matches_apply():
    """The bake's amortized evaluation (encoder/sigma/routing once, color
    head per direction) must equal per-direction container_apply exactly —
    on the fast instant-NGP split AND the fallback (bucketed) path."""
    import dataclasses as dc

    from nerfsys_tpu.models.container import (
        container_apply,
        container_apply_multidir,
    )

    cfg, st, params = _tiny_scene()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-2.0, 2.0, size=(257, 3)).astype(np.float32))
    dirs = jnp.asarray(_fibonacci_sphere(5))

    for c in (cfg, dc.replace(cfg, bucketed=True, experts_per_point=1)):
        rgb_m, sigma = container_apply_multidir(params, c, st, pts, dirs)
        assert rgb_m.shape == (5, 257, 3)
        for m in range(5):
            dd = jnp.broadcast_to(dirs[m][None, :], (257, 3))
            rgb_ref, sigma_ref = container_apply(params, c, st, pts, dd)
            np.testing.assert_allclose(np.asarray(rgb_m[m]),
                                       np.asarray(rgb_ref),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                                       rtol=1e-5, atol=1e-6)


def test_bake_then_render_tracks_live_field():
    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=40, sh_levels=3, n_dirs=16,
                       chunk_cells=16384, dtype="float32")
    baked = bake_field(params, cfg, st, bcfg)
    assert baked["table"].shape == (
        40**3, baked["corner_pack"] * bcfg.padded_channels)

    rng = np.random.default_rng(2)
    rays = _rays(rng, 128)
    rgb_b, depth_b, _, acc_b = render_rays_baked(
        baked, bcfg, rays, 24, bg_policy="white",
        bg_fn=container_bg_fn(params, cfg),
    )
    field = container_field_fn(params, cfg, st)
    rgb_l, depth_l, _, acc_l = render_rays_stratified(
        field, rays, 24, bg_policy="white",
        bg_fn=container_bg_fn(params, cfg),
    )
    err = np.abs(np.asarray(rgb_b) - np.asarray(rgb_l))
    # resolution-limited approximation: the hash field varies at min_res
    # 4-8 over a 5-unit box, the bake at 40³ — close, not exact
    assert err.mean() < 0.05, err.mean()
    assert np.isfinite(np.asarray(depth_b)).all()
    assert (np.abs(np.asarray(acc_b) - np.asarray(acc_l)) < 0.25).mean() > 0.9


def test_baked_camera_renderer_matches_host_raygen_path():
    """On-device frame raygen (ops/rays.frame_chunk_rays inside the jitted
    chunk) must reproduce the host path exactly: frame_rays -> baked chunk
    renderer -> render_rays_chunked, same camera. Also pins the u8 output
    as the quantization of the f32 render, and the non-divisible
    H*W % chunk_rays tail handling."""
    from nerfsys_tpu.data.ram_rays import frame_rays
    from nerfsys_tpu.models.baked import make_baked_camera_renderer
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        render_rays_chunked,
    )

    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=16, sh_levels=2, n_dirs=8,
                       chunk_cells=4096, dtype="float32")
    baked = bake_field(params, cfg, st, bcfg)

    H, W = 23, 31  # 713 pixels: NOT a multiple of chunk_rays=256
    intr = np.array([25.0, 25.0, W / 2, H / 2], np.float32)
    c2w = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 3.0]],
                   np.float32)
    aabb = np.asarray(st.global_aabb)

    # host path: native/numpy raygen -> ray upload -> chunk renderer
    rays, _ = frame_rays(H, W, intr, c2w, aabb=aabb)
    chunk = make_baked_chunk_renderer(baked, bcfg, cfg, ray_samples=16)
    out = render_rays_chunked(chunk, params, st, rays, 256)
    rgb_h = out[:, 0:3].reshape(H, W, 3)
    depth_h = out[:, 3].reshape(H, W)

    # device path: 19 floats up, image down
    cam = make_baked_camera_renderer(
        baked, bcfg, cfg, H=H, W=W, ray_samples=16, chunk_rays=256,
        scene_aabb=aabb, out_u8=False)
    rgb_d, depth_d, acc_d = cam(params, st, c2w, intr)
    np.testing.assert_allclose(rgb_d, rgb_h, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth_d, depth_h, rtol=1e-5, atol=1e-5)
    assert np.isfinite(acc_d).all()

    cam8 = make_baked_camera_renderer(
        baked, bcfg, cfg, H=H, W=W, ray_samples=16, chunk_rays=256,
        scene_aabb=aabb, out_u8=True)
    img = cam8(params, st, c2w, intr)
    assert img.dtype == np.uint8 and img.shape == (H, W, 3)
    ref8 = np.clip(rgb_h * 255.0 + 0.5, 0, 255).astype(np.uint8)
    # identical quantization modulo float rounding at bucket edges
    assert (np.abs(img.astype(int) - ref8.astype(int)) <= 1).all()


def test_baked_chunk_renderer_is_dispatch_compatible():
    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=16, sh_levels=2, n_dirs=8,
                       chunk_cells=4096, dtype="float32")
    baked = bake_field(params, cfg, st, bcfg)
    r = make_baked_chunk_renderer(baked, bcfg, cfg, ray_samples=16)

    rng = np.random.default_rng(3)
    rays = np.array(_rays(rng, 100), np.float32)  # writable copy
    rays[::7] = 0.0  # invalid padding rays must stay finite
    out = render_rays_chunked(r, params, st, rays, 64)
    assert out.shape == (100, 5)
    assert np.isfinite(out).all()

    rgb_d, depth_d, _, acc_d = render_rays_baked(
        baked, bcfg, jnp.asarray(rays), 16, bg_policy="white",
        bg_fn=container_bg_fn(params, cfg),
    )
    np.testing.assert_allclose(out[:, 0:3], np.asarray(rgb_d), rtol=1e-5,
                               atol=1e-5)


def test_bake_occ_skip_all_alive_is_bitexact_dense():
    """Occupancy-aware bake (bake_field occ_state path): when every cell is
    alive (expert rois cover the global box, binary all-True), the sparse
    bake must equal the dense bake BIT-exactly — same points, same chunking,
    same program."""
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    cfg, st, params = _tiny_scene()
    # expert rois = the global box, so the union query is True everywhere
    full = jnp.broadcast_to(st.global_aabb[None], (2, 2, 3))
    st = ContainerStatics(st.centroids, full, st.global_aabb)
    bcfg = BakedConfig(resolution=12, sh_levels=2, n_dirs=8,
                       chunk_cells=1728, dtype="float32")
    dense = bake_field(params, cfg, st, bcfg)

    occ = init_occ_state(OccGridConfig(resolution=8, levels=1), 2)
    occ = dict(occ, binary=jnp.ones_like(occ["binary"]),
               num_updates=occ["ready_after"])
    sparse = bake_field(params, cfg, st, bcfg, occ_state=occ, occ_dilate=1)
    np.testing.assert_array_equal(np.asarray(dense["table"]),
                                  np.asarray(sparse["table"]))


def test_bake_occ_skip_zeroes_dead_cells_and_keeps_alive_exact():
    """Partial occupancy: alive cells (union binary, dilated in bake-grid
    space) reproduce the dense bake exactly; dead cells are all-zero rows
    (the field is never evaluated there). Checked at the packed-row level:
    a row matches dense where both its z-cells are alive, and is zero where
    both are dead."""
    from nerfsys_tpu.models.baked import _np_dilate3
    from nerfsys_tpu.models.occupancy import union_binary_fn
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    cfg, st, params = _tiny_scene()
    R = 12
    bcfg = BakedConfig(resolution=R, sh_levels=2, n_dirs=8,
                       chunk_cells=256, dtype="float32")
    dense = bake_field(params, cfg, st, bcfg)

    occ = init_occ_state(OccGridConfig(resolution=8, levels=1), 2)
    occ = dict(occ, binary=jnp.ones_like(occ["binary"]),
               num_updates=occ["ready_after"])
    sparse = bake_field(params, cfg, st, bcfg, occ_state=occ, occ_dilate=1)

    # recompute the expected alive mask exactly as bake_field does
    lo, hi = np.asarray(st.global_aabb[0]), np.asarray(st.global_aabb[1])
    idx = np.arange(R, dtype=np.float32) + 0.5
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    centers = lo + np.stack([gx, gy, gz], -1).reshape(-1, 3) * (hi - lo) / R
    alive = np.asarray(union_binary_fn(occ, st)(jnp.asarray(centers)))
    alive = _np_dilate3(alive.reshape(R, R, R))
    assert 0 < alive.sum() < alive.size  # the scene must exercise both arms

    # packed rows carry the forward corner neighborhood (corner_pack
    # cells): a row matches dense where EVERY packed corner is alive, and
    # is all-zero where every packed corner is dead
    def fwd(a, axis):
        idx = np.minimum(np.arange(1, R + 1), R - 1)
        return a.take(idx, axis=axis)

    pack = dense["corner_pack"]
    corners = [alive, fwd(alive, 2)]
    if pack >= 4:
        corners += [fwd(c, 1) for c in corners]
    if pack == 8:
        corners += [fwd(c, 0) for c in corners]
    every = np.logical_and.reduce(corners).reshape(-1)
    none = np.logical_and.reduce([~c for c in corners]).reshape(-1)
    assert every.sum() > 0 and none.sum() > 0
    dt, sp = np.asarray(dense["table"]), np.asarray(sparse["table"])
    np.testing.assert_array_equal(dt[every], sp[every])
    assert np.all(sp[none] == 0.0)
    assert not np.all(dt[none] == 0.0)  # the skip actually skipped work


def test_bake_occ_skip_falls_back_dense_when_not_ready():
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=8, sh_levels=1, n_dirs=4,
                       chunk_cells=512, dtype="float32")
    dense = bake_field(params, cfg, st, bcfg)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1), 2)  # 0 updates
    sparse = bake_field(params, cfg, st, bcfg, occ_state=occ, occ_dilate=1)
    np.testing.assert_array_equal(np.asarray(dense["table"]),
                                  np.asarray(sparse["table"]))


def test_corner_pack_variants_agree_and_auto_budget():
    """pack 2 / 4 / 8 are the same field in different row layouts: queries
    must agree to float tolerance (different lerp association order). Auto
    pack resolves against the table budget."""
    cfg, st, params = _tiny_scene()
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1.0, 1.0, size=(512, 3)).astype(np.float32)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    outs = []
    for pack in (2, 4, 8):
        bcfg = BakedConfig(resolution=10, sh_levels=2, n_dirs=8,
                           chunk_cells=512, dtype="float32",
                           corner_pack=pack)
        baked = bake_field(params, cfg, st, bcfg)
        assert baked["table"].shape[1] == pack * bcfg.padded_channels
        rgb, sigma = baked_query(baked, bcfg, jnp.asarray(pts),
                                 jnp.asarray(dirs))
        outs.append((np.asarray(rgb), np.asarray(sigma)))
    for rgb, sigma in outs[1:]:
        np.testing.assert_allclose(rgb, outs[0][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sigma, outs[0][1], rtol=1e-5, atol=1e-6)

    # auto: small grids take the 1-gather layout; a tight budget degrades
    assert BakedConfig(resolution=64).resolved_pack() == 8
    tight = BakedConfig(resolution=256, auto_pack_budget_gb=5.0)
    assert tight.resolved_pack() == 4  # 8.6 GB > 5 GB budget at 256³
    tiny = BakedConfig(resolution=256, auto_pack_budget_gb=0.1)
    assert tiny.resolved_pack() == 2
    with pytest.raises(ValueError):
        BakedConfig(corner_pack=3)


def _random_packed_table(rng, R, bcfg, zero_blocks, B):
    """(R³, pack*Cp) random table with the given blocks zeroed exactly."""
    pack = bcfg.corner_pack
    Cp = bcfg.padded_channels
    t = rng.normal(size=(R**3, pack * Cp)).astype(np.float32)
    Rb = R // B
    t6 = t.reshape(Rb, B, Rb, B, Rb, B, pack * Cp)
    for bx, by, bz in zero_blocks:
        t6[bx, :, by, :, bz, :, :] = 0.0
    return t6.reshape(R**3, pack * Cp)


@pytest.mark.parametrize("pack,block,R,dtype", [
    (8, 4, 8, "float32"), (4, 2, 12, "float32"), (2, 4, 8, "float32"),
    (8, 4, 8, "bfloat16"),  # the shipped table dtype: zero-block
    # detection and the reserved zero block must be bit-faithful in bf16
])
def test_sparse_trilerp_bitexact_vs_dense(pack, block, R, dtype):
    """Block-compacted tables reproduce the dense trilerp BIT-exactly at
    every pack layout: dead blocks alias the reserved zero block (gathering
    it returns the same zero rows), alive blocks keep their rows, and the
    lerp arithmetic is identical. R=12/block=2 gives Rb=6 — NOT a multiple
    of the 4-wide super-block row, exercising the index padding; R=8/
    block=4 gives Rb=2 < 4 (everything in one padded super-row)."""
    from nerfsys_tpu.models.baked import baked_trilerp, compact_baked

    rng = np.random.default_rng(7)
    dense_cfg = BakedConfig(resolution=R, sh_levels=2, dtype=dtype,
                            corner_pack=pack)
    sparse_cfg = BakedConfig(resolution=R, sh_levels=2, dtype=dtype,
                             corner_pack=pack, sparse_block=block)
    Rb = R // block
    # zero out a deterministic half-ish of the blocks
    zero_blocks = [(bx, by, bz)
                   for bx in range(Rb) for by in range(Rb)
                   for bz in range(Rb) if (bx + 2 * by + 3 * bz) % 2]
    table = _random_packed_table(rng, R, dense_cfg, zero_blocks, block)
    table = table.astype(np.dtype(dtype))  # ml_dtypes handles bfloat16
    aabb = jnp.asarray(np.array([[-1.0, -1, -1], [1, 1, 1]], np.float32))
    dense = {"table": jnp.asarray(table), "aabb": aabb}
    sparse = compact_baked(dense, sparse_cfg)

    n_alive = Rb**3 - len(zero_blocks)
    assert sparse["table"].shape == ((n_alive + 1) * block**3,
                                     pack * dense_cfg.padded_channels)
    S = 4
    Rbs = -(-Rb // S)
    assert sparse["block_index"].shape == (Rbs**3, S**3)

    pts = rng.uniform(-1.3, 1.3, size=(4096, 3)).astype(np.float32)
    out_d = np.asarray(baked_trilerp(dense, dense_cfg, jnp.asarray(pts)))
    out_s = np.asarray(baked_trilerp(sparse, sparse_cfg, jnp.asarray(pts)))
    np.testing.assert_array_equal(out_d, out_s)


@pytest.mark.parametrize("pack,dtype", [(8, "bfloat16"), (4, "float32"),
                                        (2, "bfloat16")])
def test_pack_sparse_from_vals_matches_dense_then_compact(pack, dtype):
    """The memory-lean sparse packer (_pack_sparse_from_vals — builds only
    alive blocks, never the dense packed table) is BIT-identical to
    packing dense and running _compact_np: same compacted rows, same
    block index. Includes bf16: aliveness must be tested post-cast (a
    sub-bf16-normal f32 flushes to zero in the table)."""
    from nerfsys_tpu.models.baked import (
        _compact_np,
        _pack_sparse_from_vals,
    )

    R, block = 12, 4
    rng = np.random.default_rng(11)
    bcfg = BakedConfig(resolution=R, sh_levels=2, dtype=dtype,
                       corner_pack=pack, sparse_block=block)
    C = bcfg.channels
    Cp = bcfg.padded_channels
    vals = rng.normal(size=(R, R, R, C)).astype(np.float32)
    # kill most cells (block-granular + ragged), plus one sub-bf16-normal
    # value that must count as DEAD in a bf16 table
    mask = rng.uniform(size=(R, R, R)) < 0.15
    vals[~mask] = 0.0
    vals[0, 0, 0, :] = 0.0
    vals[0, 0, 0, 1] = 1e-45
    vals_t = vals.reshape(-1, C).astype(np.dtype(bcfg.dtype))

    # dense route: pack (same clamped-forward-neighbor layout), compact
    deltas = [(dx, dy, dz)
              for dx in range(2 if pack == 8 else 1)
              for dy in range(2 if pack >= 4 else 1)
              for dz in range(2)]
    g = np.zeros((R, R, R, Cp), vals_t.dtype)
    g[..., :C] = vals_t.reshape(R, R, R, C)
    clamped = np.minimum(np.arange(1, R + 1), R - 1)
    dense = np.empty((R, R, R, pack * Cp), vals_t.dtype)
    for bi, (dx, dy, dz) in enumerate(deltas):
        b = g
        if dz:
            b = b.take(clamped, axis=2)
        if dy:
            b = b.take(clamped, axis=1)
        if dx:
            b = b.take(clamped, axis=0)
        dense[..., bi * Cp:(bi + 1) * Cp] = b
    comp_d, idx_d = _compact_np(dense.reshape(R**3, pack * Cp), bcfg)

    comp_l, idx_l = _pack_sparse_from_vals(vals_t, R, bcfg, pack)
    np.testing.assert_array_equal(
        comp_d.view(np.uint16 if dtype == "bfloat16" else comp_d.dtype),
        comp_l.view(np.uint16 if dtype == "bfloat16" else comp_l.dtype))
    np.testing.assert_array_equal(idx_d, idx_l)


def test_sparse_bake_field_end_to_end_and_guards():
    """bake_field(sparse_block=...) equals compact_baked of the dense bake;
    render_rays_baked through the sparse table matches the dense render
    exactly; config mismatches are refused rather than silently wrong."""
    from dataclasses import replace

    from nerfsys_tpu.models.baked import baked_trilerp, compact_baked
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=12, sh_levels=2, n_dirs=8,
                       chunk_cells=1728, dtype="float32", corner_pack=4)
    scfg = replace(bcfg, sparse_block=4)
    occ = init_occ_state(OccGridConfig(resolution=8, levels=1), 2)
    occ = dict(occ, binary=jnp.ones_like(occ["binary"]),
               num_updates=occ["ready_after"])
    dense = bake_field(params, cfg, st, bcfg, occ_state=occ, occ_dilate=0)
    sparse = bake_field(params, cfg, st, scfg, occ_state=occ, occ_dilate=0)
    np.testing.assert_array_equal(
        np.asarray(compact_baked(dense, scfg)["table"]),
        np.asarray(sparse["table"]))

    rng = np.random.default_rng(5)
    rays = _rays(rng, 64)
    rgb_d, depth_d, _, acc_d = render_rays_baked(
        dense, bcfg, rays, 16, bg_policy="white")
    rgb_s, depth_s, _, acc_s = render_rays_baked(
        sparse, scfg, rays, 16, bg_policy="white")
    np.testing.assert_array_equal(np.asarray(rgb_d), np.asarray(rgb_s))
    np.testing.assert_array_equal(np.asarray(depth_d), np.asarray(depth_s))
    np.testing.assert_array_equal(np.asarray(acc_d), np.asarray(acc_s))

    pts = jnp.asarray(rng.uniform(-1, 1, size=(32, 3)).astype(np.float32))
    with pytest.raises(ValueError):  # sparse dict, dense config
        baked_trilerp(sparse, bcfg, pts)
    with pytest.raises(ValueError):  # dense dict, sparse config
        baked_trilerp(dense, scfg, pts)
    with pytest.raises(ValueError):  # block edge must divide resolution
        BakedConfig(resolution=12, sparse_block=5)
    with pytest.raises(ValueError):
        BakedConfig(sparse_block=1)
    with pytest.raises(ValueError):  # compaction needs a sparse config
        compact_baked(dense, bcfg)
    assert compact_baked(sparse, scfg) is sparse  # idempotent


def test_baked_cache_roundtrip_and_guards(tmp_path):
    """save_baked/load_baked: bit-exact roundtrip (dense AND sparse),
    refusal on BakedConfig mismatch and on a changed params fingerprint —
    a stale cache must never silently serve wrong geometry."""
    from dataclasses import replace

    from nerfsys_tpu.models.baked import (
        load_baked,
        params_fingerprint,
        save_baked,
    )

    cfg, st, params = _tiny_scene()
    bcfg = BakedConfig(resolution=8, sh_levels=2, n_dirs=8,
                       chunk_cells=512, dtype="float32", corner_pack=4)
    baked = bake_field(params, cfg, st, bcfg)
    fp = params_fingerprint(params)
    path = str(tmp_path / "snap.npz")
    save_baked(path, baked, bcfg, fingerprint=fp)

    loaded = load_baked(path, bcfg, fingerprint=fp)
    np.testing.assert_array_equal(np.asarray(loaded["table"]),
                                  np.asarray(baked["table"]))
    np.testing.assert_array_equal(np.asarray(loaded["aabb"]),
                                  np.asarray(baked["aabb"]))
    assert loaded["corner_pack"] == baked["corner_pack"]

    # config mismatch -> refused
    assert load_baked(path, replace(bcfg, sh_levels=1), fingerprint=fp) \
        is None
    # params changed -> refused
    other = init_container_params(jax.random.PRNGKey(9), cfg)
    assert load_baked(path, bcfg,
                      fingerprint=params_fingerprint(other)) is None
    # missing file -> None, no crash
    assert load_baked(str(tmp_path / "absent.npz"), bcfg) is None
    # fingerprints: deterministic, sensitive to values
    assert fp == params_fingerprint(params)
    assert fp != params_fingerprint(other)

    # sparse snapshot roundtrips with its block index
    scfg = replace(bcfg, sparse_block=4)
    sp = bake_field(params, cfg, st, scfg)
    spath = str(tmp_path / "snap_sp.npz")
    save_baked(spath, sp, scfg, fingerprint=fp)
    lsp = load_baked(spath, scfg, fingerprint=fp)
    np.testing.assert_array_equal(np.asarray(lsp["table"]),
                                  np.asarray(sp["table"]))
    np.testing.assert_array_equal(np.asarray(lsp["block_index"]),
                                  np.asarray(sp["block_index"]))
    # sparse cache refused under the dense config (and vice versa)
    assert load_baked(spath, bcfg, fingerprint=fp) is None

    # the SHIPPED table dtype (bfloat16) roundtrips bit-faithfully
    # (npz stores a uint16 view; load restores the dtype)
    bcfg16 = BakedConfig(resolution=8, sh_levels=2, n_dirs=8,
                         chunk_cells=512, corner_pack=4)
    b16 = bake_field(params, cfg, st, bcfg16)
    p16 = str(tmp_path / "snap16.npz")
    save_baked(p16, b16, bcfg16, fingerprint=fp)
    l16 = load_baked(p16, bcfg16, fingerprint=fp)
    assert l16["table"].dtype == b16["table"].dtype
    np.testing.assert_array_equal(
        np.asarray(l16["table"]).view(np.uint16),
        np.asarray(b16["table"]).view(np.uint16))


@pytest.mark.parametrize("shape,dtype", [
    ((37, 12), np.float32),      # ragged tail slice
    ((64, 5), "bfloat16"),       # exact multiple, shipped table dtype
    ((3, 4, 6), np.int32),       # ndim > 2 (dense (R,R,R,W) tables)
])
def test_device_put_chunked_bitexact(shape, dtype):
    """Chunked host->device push is bit-identical to jnp.asarray.

    The monolithic transfer of a multi-GB table stalled the axon tunnel
    (BASELINE.md K=16 row); every table now rides device_put_chunked —
    this pins that the slicing/donation mechanics change nothing."""
    import ml_dtypes

    from nerfsys_tpu.models.baked import device_put_chunked

    dt = ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
    rng = np.random.default_rng(0)
    a = rng.standard_normal(shape).astype(dt)
    # max_bytes below one row -> one row per slice (worst case ragged)
    got = device_put_chunked(a, max_bytes=a[0:1].nbytes)
    assert got.dtype == jnp.asarray(a).dtype
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint8), a.view(np.uint8))
    # mid-size slices (ragged tail) and the small-array fast path
    np.testing.assert_array_equal(
        np.asarray(device_put_chunked(a, max_bytes=a[0:2].nbytes + 1)),
        np.asarray(a))
    np.testing.assert_array_equal(
        np.asarray(device_put_chunked(a)), np.asarray(a))
