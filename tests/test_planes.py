"""Factorized plane/line encoding: reference parity, gradients, NGP wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.ops.planes import (
    PlaneEncodingConfig,
    plane_encode,
    plane_encode_ref,
    plane_encoding_init,
)

CFG = PlaneEncodingConfig(levels=2, base_res=8, growth=2.0, features=4)


def test_matches_numpy_reference():
    p = plane_encoding_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = plane_encode(p, x, CFG)
    ref = plane_encode_ref(p, np.asarray(x), CFG)
    assert out.shape == (64, CFG.out_dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_no_lines_variant():
    cfg = PlaneEncodingConfig(levels=1, base_res=8, features=4,
                              include_lines=False)
    p = plane_encoding_init(jax.random.PRNGKey(0), cfg)
    assert "lines" not in p
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    out = plane_encode(p, x, cfg)
    ref = plane_encode_ref(p, np.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_interpolation_continuity():
    """Encoding must be continuous across cell boundaries (bilinear)."""
    p = plane_encoding_init(jax.random.PRNGKey(0), CFG)
    R = CFG.level_resolutions()[0]
    eps = 1e-5
    # straddle an interior grid line on axis 0
    x0 = jnp.array([[(3.0 - eps) / (R - 1), 0.4, 0.6]])
    x1 = jnp.array([[(3.0 + eps) / (R - 1), 0.4, 0.6]])
    f0 = plane_encode(p, x0, CFG)
    f1 = plane_encode(p, x1, CFG)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-3)


def test_gradients_flow_to_tables_and_positions():
    p = plane_encoding_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.1,
                           maxval=0.9)

    def loss(pp, xx):
        return jnp.sum(plane_encode(pp, xx, CFG) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    assert any(float(jnp.abs(g).sum()) > 0
               for g in jax.tree_util.tree_leaves(gp))
    assert float(jnp.abs(gx).sum()) > 0  # positions differentiable too


def test_ngp_planes_variant_trains():
    from nerfsys_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_apply

    cfg = NGPConfig(
        hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
        geo_feat_dim=7, xyz_encoding="planes",
        planes=PlaneEncodingConfig(levels=2, base_res=8, features=4),
    )
    aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]], jnp.float32)
    p = init_ngp_params(jax.random.PRNGKey(0), cfg)
    assert "planes_enc" in p and "hash_table" not in p
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0, -1]]), (64, 1))

    def loss(pp):
        rgb, sigma = ngp_apply(pp, cfg, aabb, x, d)
        return jnp.mean((rgb - 0.5) ** 2) + jnp.mean(sigma) * 1e-3

    l0 = float(loss(p))
    g = jax.grad(loss)(p)
    p2 = jax.tree_util.tree_map(lambda w, gg: w - 0.5 * gg, p, g)
    assert float(loss(p2)) < l0


def test_container_labels_planes_as_encoding():
    from nerfsys_tpu.models.container import (
        ContainerConfig, init_container_params, param_group_labels,
    )
    from nerfsys_tpu.models.ngp import NGPConfig

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(hidden=8, sigma_depth=1, color_hidden=8,
                         color_depth=1, geo_feat_dim=3,
                         xyz_encoding="planes",
                         planes=PlaneEncodingConfig(levels=1, base_res=8,
                                                    features=4)),
        bg_hidden=8,
    )
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    labels = param_group_labels(params)
    enc_labels = set(jax.tree_util.tree_leaves(labels["experts"]["planes_enc"]))
    assert enc_labels == {"encoding"}
