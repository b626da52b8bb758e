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


# --------------------------- bucketed dispatch --------------------------------
def _bucket_setup(K, margin, seed=0, **kw):
    import dataclasses as _dc

    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig

    rng = np.random.default_rng(seed)
    # well-separated centroids so margin support fits in 2 experts
    cents = jnp.asarray(rng.uniform(-3, 3, (K, 3)), jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-4.0, -4, -4], [4, 4, 4]]))
    expert = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                       geo_feat_dim=3,
                       hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                           log2_hashmap_size=8))
    dense = ContainerConfig(num_experts=K, expert=expert,
                            boundary_margin=margin, bg_hidden=8)
    bucketed = _dc.replace(dense, bucketed=True, **kw)
    params = init_container_params(jax.random.PRNGKey(seed), dense)
    return st, dense, bucketed, params


@pytest.mark.parametrize("margin", [1.0, 1.1])
def test_bucketed_matches_dense(margin):
    """With ample capacity and support <= E, bucketed == dense exactly."""
    st, dense, bucketed, params = _bucket_setup(8, margin,
                                                capacity_factor=4.0)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-3.5, 3.5, (513, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(513, 3)), jnp.float32)

    rgb_d, sig_d = container_apply(params, dense, st, pts, dirs)
    rgb_b, sig_b = container_apply(params, bucketed, st, pts, dirs)
    # restrict the check to points whose margin support fits in E=2 experts
    from nerfsys_tpu.models.container import routing_weights

    support = np.asarray(routing_weights(st, dense, pts)) > 0
    ok = support.sum(1) <= 2
    assert ok.mean() > 0.9  # separated centroids: support is almost always <=2
    np.testing.assert_allclose(np.asarray(sig_b)[ok], np.asarray(sig_d)[ok],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb_b)[ok], np.asarray(rgb_d)[ok],
                               atol=1e-4, rtol=1e-4)

    sd = container_density(params, dense, st, pts)
    sb = container_density(params, bucketed, st, pts)
    np.testing.assert_allclose(np.asarray(sb)[ok], np.asarray(sd)[ok],
                               atol=1e-4, rtol=1e-4)


def test_bucketed_jits_and_grads():
    """Bucketed dispatch must trace under jit and propagate table grads."""
    st, _, bucketed, params = _bucket_setup(4, 1.1)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-3, 3, (256, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)

    @jax.jit
    def loss(p):
        rgb, sig = container_apply(p, bucketed, st, pts, dirs)
        return jnp.sum(rgb) + jnp.sum(sig)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_bucketed_overflow_takes_dense_branch():
    """Overflowing buckets trigger the exact dense fallback (default):
    output matches the dense blend bit-for-bit even at capacity ~1."""
    import dataclasses as _dc

    st, dense, bucketed, params = _bucket_setup(2, 1.0, capacity_factor=0.01)
    pts = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, (300, 3)),
                      jnp.float32)
    dirs = jnp.ones((300, 3), jnp.float32)
    rgb_b, sig_b = container_apply(params, bucketed, st, pts, dirs)
    rgb_d, sig_d = container_apply(params, dense, st, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_d),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_d),
                               atol=1e-6)
    # legacy trash-slot behavior stays available (and finite) when the
    # fallback is disabled explicitly
    legacy = _dc.replace(bucketed, bucket_overflow_dense=False)
    rgb_l, sig_l = container_apply(params, legacy, st, pts, dirs)
    assert np.isfinite(np.asarray(rgb_l)).all()
    assert np.isfinite(np.asarray(sig_l)).all()


def test_bucketed_coherent_chunk_matches_dense():
    """The --render_fast regression (BASELINE.md, -3.5 dB): a spatially
    COHERENT point set (every point in ONE expert's region — exactly what a
    render chunk looks like) overflows the top-1 bucket (C ~ N*E/K*cf << N)
    and used to drop ~60% of points to the sigma=0 trash slot. The dense
    fallback must make this exact."""
    import dataclasses as _dc

    st, dense, bucketed, params = _bucket_setup(4, 1.0, capacity_factor=1.5)
    top1 = _dc.replace(bucketed, experts_per_point=1)
    rng = np.random.default_rng(7)
    # all points in expert 0's neighborhood
    c0 = np.asarray(st.centroids)[0]
    pts = jnp.asarray(c0[None, :] + rng.uniform(-0.4, 0.4, (512, 3)),
                      jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    rgb_b, sig_b = container_apply(params, top1, st, pts, dirs)
    rgb_d, sig_d = container_apply(params, dense, st, pts, dirs)
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_d),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_d),
                               atol=1e-5, rtol=1e-5)
    sb = container_density(params, top1, st, pts)
    sd = container_density(params, dense, st, pts)
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sd),
                               atol=1e-5, rtol=1e-5)


def test_bucketed_flags_reach_container_config():
    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.utils.config import parse_args

    P = parse_args(["--num_submodules", "16", "--bucketed_moe",
                    "--experts_per_point", "3", "--capacity_factor", "2.0"])
    P.boundary_margin_effective = float(P.bm)  # set by build_context
    P.cluster_2d = True
    cfg = container_config_from_args(P)
    assert cfg.bucketed and cfg.experts_per_point == 3
    assert cfg.capacity_factor == 2.0
    P2 = parse_args(["--num_submodules", "4"])
    P2.boundary_margin_effective = float(P2.bm)
    P2.cluster_2d = True
    cfg2 = container_config_from_args(P2)
    assert not cfg2.bucketed


def test_expert_map_matches_vmap_dense_and_bucketed():
    """ContainerConfig.expert_map (lax.map fast path) is bit-compatible
    with the vmap path kept for sharded expert axes."""
    import dataclasses as _dc

    st, dense, bucketed, params = _bucket_setup(4, 1.1, capacity_factor=4.0)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-3.5, 3.5, (257, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(257, 3)), jnp.float32)

    for cfg in (dense, bucketed):
        cfg_v = _dc.replace(cfg, expert_map=False)
        rgb_m, sig_m = container_apply(params, cfg, st, pts, dirs)
        rgb_v, sig_v = container_apply(params, cfg_v, st, pts, dirs)
        np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_v),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sig_m), np.asarray(sig_v),
                                   rtol=1e-5, atol=1e-5)
        sd_m = container_density(params, cfg, st, pts)
        sd_v = container_density(params, cfg_v, st, pts)
        np.testing.assert_allclose(np.asarray(sd_m), np.asarray(sd_v),
                                   rtol=1e-5, atol=1e-5)
