import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.ops.activations import trunc_exp
from nerfsys_tpu.ops.volrend import (
    background_rgb,
    render_rays_stratified,
    stratified_t_vals,
    volume_render,
)


def ref_volume_render_numpy(rgb, sigma, t_vals, bg=None):
    """Independent numpy transliteration of the dense compositing spec."""
    dists = np.maximum(t_vals[:, 1:] - t_vals[:, :-1], 1e-4)
    dists = np.concatenate([dists, dists[:, -1:]], axis=1)
    alpha = np.clip(1.0 - np.exp(-sigma * dists), 0.0, 1.0 - 1e-7)
    T = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], axis=1),
        axis=1,
    )[:, :-1]
    w = alpha * T
    rgb_map = (w[..., None] * rgb).sum(1)
    depth = (w * t_vals).sum(1)
    acc = w.sum(1)
    if bg is not None:
        rgb_map = rgb_map + (1 - acc[..., None]) * bg
    return rgb_map, depth, w, acc


def test_volume_render_matches_reference_spec():
    rng = np.random.default_rng(0)
    N, S = 13, 17
    rgb = rng.uniform(size=(N, S, 3)).astype(np.float32)
    sigma = rng.uniform(0, 30, size=(N, S)).astype(np.float32)
    t = np.sort(rng.uniform(0.1, 5, size=(N, S)).astype(np.float32), axis=1)
    bg = rng.uniform(size=(N, 3)).astype(np.float32)

    rs = jnp.concatenate([jnp.asarray(rgb), jnp.asarray(sigma)[..., None]], -1)
    out = volume_render(rs, jnp.asarray(t), bg_rgb=jnp.asarray(bg))
    ref = ref_volume_render_numpy(rgb, sigma, t, bg)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-6)


def test_opaque_wall_renders_its_color():
    # One ray, huge density at every sample with constant color -> that color
    N, S = 1, 8
    rgb = jnp.ones((N, S, 3)) * jnp.array([0.25, 0.5, 0.75])
    sigma = jnp.full((N, S), 1e4)
    t = jnp.linspace(1.0, 2.0, S)[None]
    rs = jnp.concatenate([rgb, sigma[..., None]], -1)
    rgb_map, depth, w, acc = volume_render(rs, t)
    np.testing.assert_allclose(rgb_map[0], [0.25, 0.5, 0.75], atol=1e-4)
    # Fully opaque at the first sample -> depth == first t
    np.testing.assert_allclose(depth[0], 1.0, atol=1e-3)
    np.testing.assert_allclose(acc[0], 1.0, atol=1e-4)


def test_empty_space_shows_background():
    N, S = 2, 8
    rgb = jnp.zeros((N, S, 3))
    sigma = jnp.zeros((N, S))
    t = jnp.linspace(0.0, 1.0, S)[None].repeat(N, 0)
    rs = jnp.concatenate([rgb, sigma[..., None]], -1)
    bg = jnp.ones((N, 3))
    rgb_map, _, _, acc = volume_render(rs, t, bg_rgb=bg)
    np.testing.assert_allclose(rgb_map, 1.0, atol=1e-6)
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)


def test_volume_render_raw_modes():
    N, S = 3, 5
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.normal(size=(N, S, 4)).astype(np.float32))
    t = jnp.broadcast_to(jnp.linspace(0.5, 1.5, S), (N, S))
    rgb_map, *_ = volume_render(raw, t, raw_rgb=True, raw_sigma=True)
    # reproduce manually
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = trunc_exp(raw[..., 3])
    rs = jnp.concatenate([rgb, sigma[..., None]], -1)
    rgb_map2, *_ = volume_render(rs, t)
    np.testing.assert_allclose(rgb_map, rgb_map2, atol=1e-6)


def test_stratified_t_vals_deterministic():
    near = jnp.array([1.0, 2.0])
    far = jnp.array([3.0, 6.0])
    t = stratified_t_vals(None, near, far, 5, randomized=False)
    np.testing.assert_allclose(t[0], np.linspace(1, 3, 5), atol=1e-6)
    np.testing.assert_allclose(t[1], np.linspace(2, 6, 5), atol=1e-6)


def test_stratified_t_vals_jitter_bounds():
    key = jax.random.PRNGKey(0)
    near = jnp.zeros(64)
    far = jnp.ones(64)
    t = stratified_t_vals(key, near, far, 33, randomized=True)
    assert t.shape == (64, 33)
    t = np.asarray(t)
    assert (t >= 0).all() and (t <= 1).all()
    assert (np.diff(t, axis=1) >= -1e-6).all()  # monotone


def test_background_policies():
    assert np.all(np.asarray(background_rgb("white", 4)) == 1.0)
    assert np.all(np.asarray(background_rgb("black", 4)) == 0.0)
    assert background_rgb("none", 4) is None
    r = background_rgb("random", 4, key=jax.random.PRNGKey(0))
    assert r.shape == (4, 3)
    ls = jnp.full((4, 3), 0.3)
    np.testing.assert_allclose(background_rgb("last_sample", 4, last_sample_rgb=ls), 0.3)
    with pytest.raises(ValueError):
        background_rgb("bogus", 4)


def test_render_rays_stratified_sphere_scene():
    """A solid unit sphere of known color must render correctly."""

    def field(pts, dirs):
        inside = jnp.linalg.norm(pts, axis=-1) < 1.0
        sigma = jnp.where(inside, 1e4, 0.0)
        rgb = jnp.broadcast_to(jnp.array([0.1, 0.6, 0.9]), pts.shape)
        return rgb, sigma

    # one ray hitting the sphere head-on, one missing entirely
    rays = jnp.array(
        [
            [0, 0, 5, 0, 0, -1, 2.0, 8.0],
            [0, 3, 5, 0, 0, -1, 2.0, 8.0],
        ],
        dtype=jnp.float32,
    )
    rgb_map, depth, w, acc = render_rays_stratified(
        field, rays, 128, randomized=False, bg_policy="white"
    )
    np.testing.assert_allclose(rgb_map[0], [0.1, 0.6, 0.9], atol=1e-2)
    np.testing.assert_allclose(rgb_map[1], [1, 1, 1], atol=1e-6)  # background
    assert 3.9 < float(depth[0]) < 4.2  # sphere surface at z=1, origin z=5


def test_render_rays_invalid_ray_gets_background():
    def field(pts, dirs):
        return jnp.ones((*pts.shape[:-1], 3)) * 0.5, jnp.full(pts.shape[:-1], 100.0)

    rays = jnp.array([[0, 0, 0, 0, 0, -1, jnp.inf, jnp.inf]], dtype=jnp.float32)
    rgb_map, _, _, acc = render_rays_stratified(
        field, rays, 16, randomized=False, bg_policy="black"
    )
    np.testing.assert_allclose(rgb_map[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(acc[0], 0.0, atol=1e-6)


def test_render_is_differentiable():
    def loss(scale):
        def field(pts, dirs):
            rgb = jnp.full((*pts.shape[:-1], 3), 0.5)
            return rgb, jnp.full(pts.shape[:-1], 1.0) * scale

        rays = jnp.array([[0, 0, 0, 0, 0, -1, 0.1, 2.0]], dtype=jnp.float32)
        rgb_map, *_ = render_rays_stratified(
            field, rays, 32, randomized=False, bg_policy="black"
        )
        return jnp.sum(rgb_map)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and float(g) > 0
