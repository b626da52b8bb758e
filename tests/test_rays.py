import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.ops.rays import (
    clamp_rays_near_far,
    get_ray_directions,
    get_rays,
    pack_rays,
    rays_for_camera,
    unpack_rays,
)
from nerfsys_tpu.ops.scene_box import SceneBox


def test_ray_directions_center_pixel_points_back():
    H, W = 4, 6
    fx = fy = 10.0
    cx, cy = W / 2, H / 2
    dirs = get_ray_directions(H, W, fx, fy, cx, cy, center_pixels=False)
    assert dirs.shape == (H, W, 3)
    # principal-point pixel looks straight down -z (RUB camera)
    d = np.asarray(dirs[int(cy), int(cx)])
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    # all unit norm
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)


def test_ray_directions_signs():
    # pixel right of center -> +x; pixel below center (larger j) -> -y
    dirs = get_ray_directions(8, 8, 5.0, 5.0, 4.0, 4.0, center_pixels=False)
    assert float(dirs[4, 6, 0]) > 0  # right of center
    assert float(dirs[6, 4, 1]) < 0  # below center -> negative y (up-axis)
    assert float(dirs[2, 4, 1]) > 0  # above center


def test_center_pixels_offset():
    d0 = get_ray_directions(2, 2, 1.0, 1.0, 1.0, 1.0, center_pixels=False)
    d1 = get_ray_directions(2, 2, 1.0, 1.0, 1.0, 1.0, center_pixels=True)
    assert not np.allclose(d0, d1)


def test_get_rays_identity_pose_constant_near_far():
    dirs = get_ray_directions(2, 3, 2.0, 2.0, 1.5, 1.0, center_pixels=True)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [2.0], [3.0]])], axis=1)
    rays = get_rays(dirs, c2w, near=0.5, far=9.0)
    assert rays.shape == (2, 3, 8)
    o, d, near, far = unpack_rays(rays)
    np.testing.assert_allclose(o, np.tile([1, 2, 3], (6, 1)), atol=1e-6)
    np.testing.assert_allclose(near[:, 0], 0.5)
    np.testing.assert_allclose(far[:, 0], 9.0)
    # directions rotated by identity == camera dirs
    np.testing.assert_allclose(d.reshape(2, 3, 3), dirs, atol=1e-6)


def test_get_rays_rotation():
    # 180-degree yaw: camera -z maps to world +z
    R = jnp.diag(jnp.array([-1.0, 1.0, -1.0]))
    c2w = jnp.concatenate([R, jnp.zeros((3, 1))], axis=1)
    dirs = jnp.array([[[0.0, 0.0, -1.0]]])
    rays = get_rays(dirs, c2w, near=0.0, far=1.0)
    np.testing.assert_allclose(rays[0, 0, 3:6], [0, 0, 1], atol=1e-6)


def test_get_rays_scene_box_near_far():
    box = SceneBox.from_bounds([-1, -1, -1], [1, 1, 1])
    dirs = jnp.array([[0.0, 0.0, -1.0]])
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [5.0]])], axis=1)
    rays = get_rays(dirs, c2w, scene_box=box)
    assert rays.shape == (1, 8)
    np.testing.assert_allclose(rays[0, 6], 4.0, atol=1e-5)
    np.testing.assert_allclose(rays[0, 7], 6.0, atol=1e-5)


def test_pack_unpack_roundtrip():
    o = jnp.arange(6.0).reshape(2, 3)
    d = jnp.arange(6.0, 12.0).reshape(2, 3)
    near = jnp.array([[0.1], [0.2]])
    far = jnp.array([[1.0], [2.0]])
    packed = pack_rays(o, d, near, far)
    o2, d2, n2, f2 = unpack_rays(packed)
    np.testing.assert_allclose(o2, o)
    np.testing.assert_allclose(d2, d)
    np.testing.assert_allclose(n2, near)
    np.testing.assert_allclose(f2, far)


def test_clamp_rays_near_far():
    rays = jnp.array(
        [
            [0, 0, 0, 0, 0, 1, 0.5, 2.0],  # valid
            [0, 0, 0, 0, 0, 1, 3.0, 2.0],  # far < near -> invalid
            [0, 0, 0, 0, 0, 1, 1e10, 1e10],  # miss tag -> invalid
        ],
        dtype=jnp.float32,
    )
    out, valid = clamp_rays_near_far(rays, near_override=1.0, far_override=1.8)
    np.testing.assert_array_equal(valid, [True, False, False])
    np.testing.assert_allclose(out[0, 6:8], [1.0, 1.8])
    assert np.isinf(np.asarray(out[1, 6]))


def test_rays_for_camera_shapes():
    box = SceneBox.from_bound_scalar(10.0)
    c2w = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    rays = rays_for_camera(c2w, 5, 7, [3.0, 3.0, 3.5, 2.5], scene_box=box)
    assert rays.shape == (5, 7, 8)
