"""Native C++ ray-kernel parity vs the numpy reference path."""
import numpy as np
import pytest

from nerfsys_tpu.data import native
from nerfsys_tpu.data.ram_rays import (
    np_clamp_rays,
    np_get_rays,
    np_ray_directions,
)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def _random_cam(rng, H=24, W=32):
    intr = np.array([30.0, 28.0, W / 2 + 1.3, H / 2 - 0.7], np.float32)
    # random orthonormal rotation
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    R = (u @ vt).astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3).astype(np.float32) * 2
    c2w = np.concatenate([R, t[:, None]], axis=1)
    return intr, c2w


@pytest.mark.parametrize("with_aabb", [True, False])
@pytest.mark.parametrize("with_clamp", [True, False])
def test_native_matches_numpy(with_aabb, with_clamp):
    rng = np.random.default_rng(3)
    H, W = 24, 32
    intr, c2w = _random_cam(rng, H, W)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32) \
        if with_aabb else None
    near, far = (0.2, 5.0) if with_clamp else (None, None)

    out = native.compute_rays_native(H, W, intr, c2w, aabb=aabb,
                                     near=near, far=far)
    assert out is not None
    rays_n, valid_n = out

    dirs = np_ray_directions(H, W, *intr, True)
    if aabb is None and near is None:
        rays_p = np_get_rays(dirs, c2w, near=0.0, far=1e10).reshape(-1, 8)
    else:
        rays_p = np_get_rays(dirs, c2w, aabb=aabb, near=near, far=far
                             ).reshape(-1, 8)
    rays_p, valid_p = np_clamp_rays(rays_p, near, far)

    np.testing.assert_array_equal(valid_n, valid_p)
    np.testing.assert_allclose(rays_n[:, :6], rays_p[:, :6], atol=1e-5)
    # near/far agree on valid rays (inf sentinels elsewhere)
    np.testing.assert_allclose(rays_n[valid_n, 6:], rays_p[valid_p, 6:],
                               atol=1e-4, rtol=1e-5)


def test_native_compact():
    rng = np.random.default_rng(0)
    n = 100
    rays = rng.normal(size=(n, 8)).astype(np.float32)
    valid = rng.integers(0, 2, n).astype(bool)
    keep = rng.integers(0, 2, n).astype(bool)
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    out_rays, out_rgb = native.compact_rays_native(rays, valid, keep, rgb)
    sel = valid & keep
    np.testing.assert_allclose(out_rays, rays[sel])
    np.testing.assert_allclose(out_rgb, rgb[sel].astype(np.float32) / 255.0,
                               atol=1e-6)


def test_ram_rays_dataset_uses_native(tmp_path):
    """End-to-end: RamRaysDataset output identical with/without native."""
    from PIL import Image

    from nerfsys_tpu.data.image_metadata import ImageMetadata
    from nerfsys_tpu.data.ram_rays import RamRaysDataset

    rng = np.random.default_rng(1)
    H, W = 12, 16
    metas = []
    for i in range(3):
        p = tmp_path / f"{i:06d}.png"
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(p)
        intr, c2w = _random_cam(rng, H, W)
        metas.append(ImageMetadata(p, c2w, W, H, intr, i))

    aabb = np.array([[-2, -2, -2], [2, 2, 2]], np.float32)
    ds = RamRaysDataset(metas, scene_aabb=aabb)

    import nerfsys_tpu.data.native as nat
    old = nat._lib, nat._lib_failed
    try:
        nat._lib, nat._lib_failed = None, True  # force numpy fallback
        ds_py = RamRaysDataset(metas, scene_aabb=aabb)
    finally:
        nat._lib, nat._lib_failed = old

    assert len(ds) == len(ds_py)
    np.testing.assert_allclose(ds.rays[:, :6], ds_py.rays[:, :6], atol=1e-5)
    np.testing.assert_allclose(ds.rgbs, ds_py.rgbs, atol=1e-6)
    np.testing.assert_array_equal(ds.img_indices, ds_py.img_indices)


def test_route_rays_native_matches_numpy():
    import nerfsys_tpu.data.native as nat
    from nerfsys_tpu.data.task_dataset import route_rays_to_cells

    rng = np.random.default_rng(5)
    n = 5000
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile(np.array([0.1, 2.0], np.float32), (n, 1))
    nf[::17] = np.inf  # some invalid rays
    rays = np.concatenate([o, d, nf], 1)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)

    out_native = route_rays_to_cells(rays, aabb, (1, 5, 5),
                                     rng=np.random.default_rng(0))
    old = nat._lib, nat._lib_failed
    try:
        nat._lib, nat._lib_failed = None, True
        out_numpy = route_rays_to_cells(rays, aabb, (1, 5, 5),
                                        rng=np.random.default_rng(0))
    finally:
        nat._lib, nat._lib_failed = old
    np.testing.assert_array_equal(out_native, out_numpy)
    assert (out_native[::17] == -1).all()
    assert (out_native >= 0).mean() > 0.5


@pytest.mark.parametrize("aabb_nf", [
    (True, (0.2, 5.0)),   # render_image: aabb + metric near/far overrides
    (True, (None, None)),  # video_gen: aabb only (bias applied by caller)
    (False, (0.05, 100.0)),  # viewer without a global aabb
])
def test_frame_rays_native_matches_fallback(aabb_nf):
    """frame_rays (the full-frame helper behind render_image / video_gen /
    the viewer) is bit-compatible between its native and numpy paths."""
    import nerfsys_tpu.data.native as nat
    from nerfsys_tpu.data.ram_rays import frame_rays

    with_aabb, (near, far) = aabb_nf
    rng = np.random.default_rng(11)
    H, W = 20, 28
    intr, c2w = _random_cam(rng, H, W)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32) \
        if with_aabb else None

    rays_n, valid_n = frame_rays(H, W, intr, c2w, aabb=aabb,
                                 near=near, far=far)
    old = nat._lib, nat._lib_failed
    try:
        nat._lib, nat._lib_failed = None, True
        rays_p, valid_p = frame_rays(H, W, intr, c2w, aabb=aabb,
                                     near=near, far=far)
    finally:
        nat._lib, nat._lib_failed = old

    np.testing.assert_array_equal(valid_n, valid_p)
    np.testing.assert_allclose(rays_n[:, :6], rays_p[:, :6], atol=1e-5)
    np.testing.assert_allclose(rays_n[valid_n, 6:], rays_p[valid_p, 6:],
                               atol=1e-4, rtol=1e-5)
    assert np.isinf(rays_n[~valid_n, 6:]).all()
