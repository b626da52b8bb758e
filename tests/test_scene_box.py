import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.ops.scene_box import OrientedBox, SceneBox


def test_basic_properties():
    box = SceneBox.from_bounds([-1, -2, -3], [1, 2, 3])
    np.testing.assert_allclose(box.extent, [2, 4, 6])
    np.testing.assert_allclose(box.center, [0, 0, 0])
    np.testing.assert_allclose(box.get_diagonal_length(), np.sqrt(4 + 16 + 36))


def test_within():
    box = SceneBox.from_bound_scalar(1.0)
    pts = jnp.array([[0, 0, 0], [0.99, 0.99, 0.99], [1.01, 0, 0], [-2, 0, 0]])
    np.testing.assert_array_equal(box.within(pts), [True, True, False, False])
    # eps expansion
    np.testing.assert_array_equal(box.within(pts, eps=0.02), [True, True, True, False])


def test_ray_aabb_intersect_axis_ray():
    box = SceneBox.from_bounds([-1, -1, -1], [1, 1, 1])
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    tmin, tmax = box.ray_aabb_intersect(o, d)
    np.testing.assert_allclose(tmin, [2.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [4.0], atol=1e-6)


def test_ray_aabb_intersect_inside_origin():
    box = SceneBox.from_bounds([-1, -1, -1], [1, 1, 1])
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 1.0, 0.0]])
    tmin, tmax = box.ray_aabb_intersect(o, d)
    # origin inside -> tmin clamped to 0
    np.testing.assert_allclose(tmin, [0.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [1.0], atol=1e-6)


def test_ray_aabb_miss_tagged_invalid():
    box = SceneBox.from_bounds([-1, -1, -1], [1, 1, 1])
    o = jnp.array([[-3.0, 5.0, 0.0]])  # offset so the ray misses
    d = jnp.array([[1.0, 0.0, 0.0]])
    tmin, tmax = box.ray_aabb_intersect(o, d)
    assert float(tmin[0]) == 1e10 and float(tmax[0]) == 1e10


def test_ray_aabb_diagonal():
    box = SceneBox.from_bounds([0, 0, 0], [1, 1, 1])
    d = jnp.array([[1.0, 1.0, 1.0]]) / np.sqrt(3)
    o = jnp.array([[-1.0, -1.0, -1.0]]) / np.sqrt(3)
    tmin, tmax = box.ray_aabb_intersect(o, d)
    np.testing.assert_allclose(tmin, [1.0], rtol=1e-5)
    np.testing.assert_allclose(tmax, [1.0 + np.sqrt(3)], rtol=1e-5)


def test_expand_scalar_and_union():
    box = SceneBox.from_bounds([0, 0, 0], [2, 2, 2])
    ex = box.expand(2.0)
    np.testing.assert_allclose(ex.aabb, [[-1, -1, -1], [3, 3, 3]])
    other = SceneBox.from_bounds([-5, 1, 1], [0, 6, 1.5])
    u = box.union(other)
    np.testing.assert_allclose(u.aabb, [[-5, 0, 0], [2, 6, 2]])


def test_expand_asymmetric():
    box = SceneBox.from_bounds([0, 0, 0], [1, 1, 1])
    ex = box.expand(jnp.array([[0.5, 0.0, 0.0], [0.0, 0.25, 0.0]]))
    np.testing.assert_allclose(ex.aabb, [[-0.5, 0, 0], [1, 1.25, 1]])


def test_scene_box_is_pytree():
    box = SceneBox.from_bound_scalar(2.0)
    leaves = jax.tree_util.tree_leaves(box)
    assert len(leaves) == 1 and leaves[0].shape == (2, 3)

    @jax.jit
    def f(b: SceneBox):
        return b.extent.sum()

    assert float(f(box)) == pytest.approx(12.0)


def test_oriented_box_within_and_aabb():
    # 90-degree rotation about z: box spans [-2,2]x[-1,1] in local xy
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    R = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=jnp.float32)
    ob = OrientedBox(R=R, T=jnp.zeros(3), S=jnp.array([4.0, 2.0, 2.0]))
    pts = jnp.array([[0.9, 1.9, 0.0], [1.9, 0.5, 0.0]])
    inside = ob.within(pts)
    # After rotation the long axis lies along world y
    assert bool(inside[0]) and not bool(inside[1])
    aabb = ob.to_aabb()
    np.testing.assert_allclose(aabb.aabb[1], [1, 2, 1], atol=1e-5)
