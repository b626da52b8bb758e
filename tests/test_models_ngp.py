import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.ngp import (
    NGPConfig,
    init_ngp_params,
    init_stacked_ngp_params,
    ngp_apply,
    ngp_density,
    ngp_field_fn,
)
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.ops.volrend import render_rays_stratified

CFG = NGPConfig(
    hidden=16,
    sigma_depth=2,
    color_hidden=16,
    color_depth=2,
    geo_feat_dim=7,
    hash=HashGridConfig(levels=4, min_res=4, max_res=32, log2_hashmap_size=8),
)
AABB = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


def test_param_shapes():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    assert p["hash_table"].shape == (4 * 256, 2)
    assert len(p["sigma_trunk"]) == 2
    assert p["sigma_trunk"][0]["w"].shape == (CFG.hash.out_dim, 16)
    assert p["sigma_head"]["w"].shape == (16, 1)
    np.testing.assert_allclose(p["sigma_head"]["b"], -1.0)
    assert p["geo_head"]["w"].shape == (16, 7)
    assert len(p["color_mlp"]) == 3
    assert p["color_mlp"][0]["w"].shape == (7 + 16, 16)  # geo + SH(4)=16
    assert p["color_mlp"][-1]["w"].shape == (16, 3)


def test_apply_shapes_and_ranges():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    rgb, sigma = ngp_apply(p, CFG, AABB, x, d)
    assert rgb.shape == (32, 3) and sigma.shape == (32,)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)
    assert np.all(np.asarray(sigma) >= 0)


def test_density_only_matches_full():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    s1 = ngp_density(p, CFG, AABB, x)
    _, s2 = ngp_apply(p, CFG, AABB, x, d)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_stacked_experts_distinct():
    sp = init_stacked_ngp_params(jax.random.PRNGKey(0), CFG, 3)
    assert sp["hash_table"].shape[0] == 3
    # different experts got different inits
    assert not np.allclose(sp["hash_table"][0], sp["hash_table"][1])
    # vmapped apply over experts
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
    rgb, sigma = jax.vmap(lambda p: ngp_apply(p, CFG, AABB, x, d))(sp)
    assert rgb.shape == (3, 16, 3) and sigma.shape == (3, 16)
    assert not np.allclose(sigma[0], sigma[1])


def test_frequency_dir_encoding_variant():
    cfg = NGPConfig(
        hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
        geo_feat_dim=7, dir_encoding="frequency",
        hash=HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
    )
    p = init_ngp_params(jax.random.PRNGKey(0), cfg)
    assert p["color_mlp"][0]["w"].shape == (7 + 27, 16)  # 3*(2*4+1) = 27
    rgb, sigma = ngp_apply(p, cfg, AABB, jnp.zeros((4, 3)), jnp.ones((4, 3)))
    assert rgb.shape == (4, 3)


def test_gradients_flow_to_all_params():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))

    def loss(params):
        rgb, sigma = ngp_apply(params, CFG, AABB, x, d)
        return jnp.mean(rgb**2) + jnp.mean(sigma)

    g = jax.grad(loss)(p)
    flat, _ = jax.tree_util.tree_flatten(g)
    for leaf in flat:
        assert np.isfinite(np.asarray(leaf)).all()
    # hash table must receive gradient (sparse but nonzero)
    assert float(jnp.sum(jnp.abs(g["hash_table"]))) > 0
    assert float(jnp.sum(jnp.abs(g["color_mlp"][-1]["w"]))) > 0


def test_field_fn_renders_through_volrend():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    field = ngp_field_fn(p, CFG, AABB)
    rays = jnp.array([[0, 0, 2, 0, 0, -1, 0.5, 3.5]], dtype=jnp.float32)
    rgb_map, depth, w, acc = render_rays_stratified(
        field, rays, 32, randomized=False, bg_policy="white"
    )
    assert rgb_map.shape == (1, 3)
    assert np.isfinite(np.asarray(rgb_map)).all()


def test_jit_apply_compiles_once():
    p = init_ngp_params(jax.random.PRNGKey(0), CFG)
    fn = jax.jit(lambda params, x, d: ngp_apply(params, CFG, AABB, x, d))
    x = jnp.zeros((8, 3))
    d = jnp.ones((8, 3))
    r1 = fn(p, x, d)
    r2 = fn(p, x + 0.1, d)
    assert r1[0].shape == r2[0].shape


def test_bf16_compute_close_to_fp32():
    """use_bf16 (reference AMP analogue) stays numerically close to fp32."""
    import dataclasses

    from nerfsys_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_apply
    from nerfsys_tpu.ops.encodings import HashGridConfig

    cfg32 = NGPConfig(
        hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
        geo_feat_dim=7,
        hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                            log2_hashmap_size=8),
    )
    cfg16 = dataclasses.replace(cfg32, use_bf16=True)
    aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]], jnp.float32)
    p = init_ngp_params(jax.random.PRNGKey(0), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0, -1]]), (64, 1))
    rgb32, sig32 = ngp_apply(p, cfg32, aabb, x, d)
    rgb16, sig16 = ngp_apply(p, cfg16, aabb, x, d)
    assert rgb16.dtype == jnp.float32 and sig16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(rgb16), np.asarray(rgb32), atol=3e-2)
    np.testing.assert_allclose(np.asarray(sig16), np.asarray(sig32),
                               rtol=1e-1, atol=1e-2)
    # gradients flow in bf16 mode
    g = jax.grad(lambda pp: float(0) + jnp.mean(
        ngp_apply(pp, cfg16, aabb, x, d)[0]))(p)
    assert float(jnp.abs(g["sigma_trunk"][0]["w"]).sum()) > 0
