import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    background_color,
    container_apply,
    container_bg_fn,
    container_density,
    container_field_fn,
    init_container_params,
    param_group_labels,
    routing_weights,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.models.vanilla import VanillaConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.ops.volrend import render_rays_stratified

EXPERT = NGPConfig(
    hidden=16, sigma_depth=1, color_hidden=16, color_depth=1, geo_feat_dim=7,
    hash=HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
)


def make_statics(K=4):
    # centroids on a 2x2 grid in the (y, z) plane
    cents = jnp.array(
        [[0.0, -1, -1], [0.0, -1, 1], [0.0, 1, -1], [0.0, 1, 1]],
        dtype=jnp.float32,
    )[:K]
    boxes = jnp.stack(
        [jnp.stack([c - 1.0, c + 1.0]) for c in cents]
    )
    global_aabb = jnp.array([[-2.0, -2, -2], [2, 2, 2]])
    return ContainerStatics(cents, boxes, global_aabb)


def test_init_shapes():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT, bg_hidden=8)
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    assert p["experts"]["hash_table"].shape[0] == 4
    assert p["bg"]["l0"]["w"].shape == (16, 8)  # SH(4) = 16
    assert p["bg"]["l1"]["w"].shape == (8, 3)


def test_hard_routing_one_hot():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT, boundary_margin=1.0)
    st = make_statics()
    pts = jnp.array([[5.0, -1, -1], [0.0, 1, 1]])  # x ignored (cluster_2d)
    w = routing_weights(st, cfg, pts)
    np.testing.assert_allclose(w, [[1, 0, 0, 0], [0, 0, 0, 1]], atol=1e-6)


def test_soft_routing_normalized_and_masked():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT, boundary_margin=1.5)
    st = make_statics()
    pts = jnp.array([[0.0, -1.0, 0.0], [0.0, -1, -1]])
    w = np.asarray(routing_weights(st, cfg, pts))
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    # first point is equidistant to experts 0,1 -> 50/50, others masked out
    np.testing.assert_allclose(w[0], [0.5, 0.5, 0, 0], atol=1e-5)
    # second point sits on centroid 0 -> dist clamp keeps it ~all expert 0
    assert w[1, 0] > 0.99


def test_soft_routing_3d_mode():
    cfg = ContainerConfig(
        num_experts=4, expert=EXPERT, boundary_margin=1.5, cluster_2d=False
    )
    st = make_statics()
    # differs from 2d routing when x varies
    pts = jnp.array([[3.0, -1.0, 0.0]])
    w2d = routing_weights(st, dataclasses_replace(cfg, cluster_2d=True), pts)
    w3d = routing_weights(st, cfg, pts)
    assert w2d.shape == w3d.shape == (1, 4)


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_container_apply_blends():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT, boundary_margin=1.1)
    st = make_statics()
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-2, maxval=2)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    rgb, sigma = container_apply(p, cfg, st, pts, dirs)
    assert rgb.shape == (32, 3) and sigma.shape == (32,)
    assert np.isfinite(np.asarray(rgb)).all()
    s2 = container_density(p, cfg, st, pts)
    np.testing.assert_allclose(s2, sigma, rtol=1e-5)


def test_active_expert_matches_single():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT)
    st = make_statics()
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.zeros((4, 3)).at[:, 1:].set(-1.0)  # at centroid 0
    dirs = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    rgb_a, sig_a = container_apply(p, cfg, st, pts, dirs, active_expert=0)
    # hard routing should give the same result for points at centroid 0
    rgb_r, sig_r = container_apply(p, cfg, st, pts, dirs)
    np.testing.assert_allclose(rgb_a, rgb_r, atol=1e-5)
    np.testing.assert_allclose(sig_a, sig_r, rtol=1e-5)


def test_background_color():
    cfg = ContainerConfig(num_experts=2, expert=EXPERT, bg_hidden=8)
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    d = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    bg = background_color(p, cfg, d)
    assert bg.shape == (10, 3)
    assert (np.asarray(bg) >= 0).all() and (np.asarray(bg) <= 1).all()
    # batched input
    bg3 = background_color(p, cfg, d.reshape(2, 5, 3))
    np.testing.assert_allclose(bg3.reshape(10, 3), bg, atol=1e-6)
    # disabled
    cfg2 = ContainerConfig(num_experts=2, expert=EXPERT, use_bg_nerf=False)
    p2 = init_container_params(jax.random.PRNGKey(0), cfg2)
    assert "bg" not in p2
    with pytest.raises(RuntimeError):
        background_color(p2, cfg2, d)
    assert container_bg_fn(p2, cfg2) is None


def test_fourier_bg_encoding():
    cfg = ContainerConfig(
        num_experts=2, expert=EXPERT, bg_encoding="fourier", bg_hidden=8
    )
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    assert p["bg"]["l0"]["w"].shape == (27, 8)
    bg = background_color(p, cfg, jnp.ones((4, 3)))
    assert bg.shape == (4, 3)


def test_render_through_container():
    cfg = ContainerConfig(num_experts=4, expert=EXPERT, boundary_margin=1.1)
    st = make_statics()
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    rays = jnp.array([[0, 0, 3, 0, 0, -1, 1.0, 5.0]], dtype=jnp.float32)
    rgb, depth, w, acc = render_rays_stratified(
        container_field_fn(p, cfg, st), rays, 16, randomized=False,
        bg_fn=container_bg_fn(p, cfg),
    )
    assert np.isfinite(np.asarray(rgb)).all()


def test_param_group_labels_cover_all_leaves():
    cfg = ContainerConfig(num_experts=2, expert=EXPERT)
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    labels = param_group_labels(p)
    flat_p = jax.tree_util.tree_leaves(p)
    flat_l = jax.tree_util.tree_leaves(labels)
    assert len(flat_p) == len(flat_l)
    assert set(flat_l) == {"encoding", "sigma", "color", "background"}
    # structure matches
    jax.tree_util.tree_map(lambda a, b: None, p, labels)


def test_vanilla_variant():
    vcfg = VanillaConfig(hidden=16, sigma_depth=3, skips=(2,), color_hidden=16,
                         color_depth=2, geo_feat_dim=7, pe_dim_xyz=4)
    cfg = ContainerConfig(num_experts=2, nerf_variant="vanilla", expert=vcfg)
    st = make_statics(2)
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    dirs = jnp.ones((8, 3))
    rgb, sigma = container_apply(p, cfg, st, pts, dirs)
    assert rgb.shape == (8, 3) and np.isfinite(np.asarray(rgb)).all()
    # skip layer got the wider input (axis 0 is the stacked-expert axis)
    assert p["experts"]["trunk"][2]["w"].shape[1] == 16 + vcfg.xyz_enc_dim


def test_container_grad_flows():
    cfg = ContainerConfig(num_experts=2, expert=EXPERT, boundary_margin=1.2)
    st = make_statics(2)
    p = init_container_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-2, maxval=2)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (32, 3))

    def loss(params):
        rgb, sigma = container_apply(params, cfg, st, pts, dirs)
        return jnp.mean(rgb) + jnp.mean(sigma)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))
