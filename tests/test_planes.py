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


def test_matmul_bwd_matches_autodiff_scatter():
    """custom-vjp (one-hot matmul) grads == XLA scatter-add autodiff grads."""
    import dataclasses as dc

    cfg_mm = dc.replace(CFG, matmul_bwd=True, bwd_dtype="float32",
                        bwd_chunk=16)
    cfg_ad = dc.replace(CFG, matmul_bwd=False)
    p = plane_encoding_init(jax.random.PRNGKey(0), cfg_mm)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3), minval=0.02,
                           maxval=0.98)
    ct = jax.random.normal(jax.random.PRNGKey(2), (37, cfg_mm.out_dim))

    def loss(pp, xx, cfg):
        return jnp.sum(plane_encode(pp, xx, cfg) * ct)

    g_mm = jax.grad(loss, argnums=(0, 1))(p, x, cfg_mm)
    g_ad = jax.grad(loss, argnums=(0, 1))(p, x, cfg_ad)
    for a, b in zip(jax.tree_util.tree_leaves(g_mm),
                    jax.tree_util.tree_leaves(g_ad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_light_bwd_table_grads_match_zero_pos_grads():
    """pos_grad=False: table grads == autodiff, position grads are zero."""
    import dataclasses as dc

    cfg_lt = dc.replace(CFG, matmul_bwd=True, pos_grad=False,
                        bwd_dtype="float32", bwd_chunk=16)
    cfg_ad = dc.replace(CFG, matmul_bwd=False)
    p = plane_encoding_init(jax.random.PRNGKey(0), cfg_lt)
    x = jax.random.uniform(jax.random.PRNGKey(1), (41, 3), minval=0.02,
                           maxval=0.98)
    ct = jax.random.normal(jax.random.PRNGKey(2), (41, cfg_lt.out_dim))

    def loss(pp, xx, cfg):
        return jnp.sum(plane_encode(pp, xx, cfg) * ct)

    g_lt, gx_lt = jax.grad(loss, argnums=(0, 1))(p, x, cfg_lt)
    g_ad, _ = jax.grad(loss, argnums=(0, 1))(p, x, cfg_ad)
    # bval/lval residuals are saved bf16 -> table grads carry ~2^-8 rounding
    for a, b in zip(jax.tree_util.tree_leaves(g_lt),
                    jax.tree_util.tree_leaves(g_ad)):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-2)
    assert float(jnp.abs(gx_lt).sum()) == 0.0


def test_matmul_bwd_bf16_close_and_no_lines():
    """bf16 contraction stays close; include_lines=False path works."""
    import dataclasses as dc

    base = PlaneEncodingConfig(levels=1, base_res=16, features=4,
                               include_lines=False)
    cfg_mm = dc.replace(base, matmul_bwd=True, bwd_dtype="bfloat16")
    cfg_ad = dc.replace(base, matmul_bwd=False)
    p = plane_encoding_init(jax.random.PRNGKey(0), cfg_mm)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3), minval=0.05,
                           maxval=0.95)

    def loss(pp, cfg):
        return jnp.sum(plane_encode(pp, x, cfg) ** 2)

    g_mm = jax.grad(loss)(p, cfg_mm)
    g_ad = jax.grad(loss)(p, cfg_ad)
    for a, b in zip(jax.tree_util.tree_leaves(g_mm),
                    jax.tree_util.tree_leaves(g_ad)):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-2)


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


def test_scatter_bwd_matches_autodiff_and_matmul():
    """The packed-corner scatter backward (fine levels) must produce the
    same table gradients as raw autodiff and as the one-hot matmul path —
    for both the full VJP (pos_grad=True) and the light VJP."""
    import dataclasses

    base = dict(levels=2, base_res=16, growth=2.0, features=4,
                bwd_dtype="float32")
    cfg_auto = PlaneEncodingConfig(**base, matmul_bwd=False)
    cfg_mm = PlaneEncodingConfig(**base, matmul_bwd=True,
                                 bwd_scatter_min_res=0)
    # threshold below both resolutions -> every level takes the scatter path
    cfg_sc = PlaneEncodingConfig(**base, matmul_bwd=True,
                                 bwd_scatter_min_res=8)
    cfg_sc_light = dataclasses.replace(cfg_sc, pos_grad=False)

    p = plane_encoding_init(jax.random.PRNGKey(0), cfg_auto)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=0.02,
                           maxval=0.98)
    ct = jax.random.normal(jax.random.PRNGKey(2), (257, cfg_auto.out_dim))

    def grads(cfg):
        def loss(pp, xx):
            return jnp.sum(plane_encode(pp, xx, cfg) * ct)

        return jax.grad(loss, argnums=(0, 1))(p, x)

    gp_auto, gx_auto = grads(cfg_auto)
    gp_mm, gx_mm = grads(cfg_mm)
    gp_sc, gx_sc = grads(cfg_sc)
    gp_light, gx_light = grads(cfg_sc_light)

    for ga, gs, gm, gl in zip(jax.tree_util.tree_leaves(gp_auto),
                              jax.tree_util.tree_leaves(gp_sc),
                              jax.tree_util.tree_leaves(gp_mm),
                              jax.tree_util.tree_leaves(gp_light)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ga),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gm),
                                   atol=2e-5, rtol=2e-5)
        # light path saves bf16 residuals -> looser tolerance
        np.testing.assert_allclose(np.asarray(gl), np.asarray(ga),
                                   atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gx_sc), np.asarray(gx_auto),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gx_light).sum()) == 0.0  # pos_grad=False contract


def test_lines_matmul_matches_reference_and_gather_path():
    """lines_matmul forward (hat-stencil MXU dot) == gather forward == numpy."""
    import dataclasses as dc

    cfg_mm = dc.replace(CFG, lines_matmul=True, lines_mm_chunk=16)
    p = plane_encoding_init(jax.random.PRNGKey(0), cfg_mm)
    # include boundary/clip cases
    x = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(1), (61, 3)),
        jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [-0.2, 0.5, 1.3]]),
    ])
    out_mm = plane_encode(p, x, cfg_mm)
    out_g = plane_encode(p, x, CFG)
    ref = plane_encode_ref(p, np.asarray(x), cfg_mm)
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_g),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_mm), ref, atol=1e-5, rtol=1e-5)


def test_lines_matmul_grads_match_all_backward_paths():
    """Forward-method change must not move gradients: autodiff through the
    stencil dot == gather autodiff == custom matmul_bwd VJPs."""
    import dataclasses as dc

    p = plane_encoding_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=0.02,
                           maxval=0.98)
    ct = jax.random.normal(jax.random.PRNGKey(2), (33, CFG.out_dim))

    def loss(pp, xx, cfg):
        return jnp.sum(plane_encode(pp, xx, cfg) * ct)

    variants = {
        "gather_ad": dc.replace(CFG, matmul_bwd=False),
        "mm_ad": dc.replace(CFG, matmul_bwd=False, lines_matmul=True,
                            lines_mm_chunk=16),
        "mm_custom": dc.replace(CFG, matmul_bwd=True, bwd_dtype="float32",
                                bwd_chunk=16, lines_matmul=True,
                                lines_mm_chunk=16),
    }
    grads = {k: jax.grad(loss, argnums=(0, 1))(p, x, cfg)
             for k, cfg in variants.items()}
    base = jax.tree_util.tree_leaves(grads["gather_ad"])
    for k in ("mm_ad", "mm_custom"):
        for a, b in zip(jax.tree_util.tree_leaves(grads[k]), base):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)


def test_pad_rows_bitexact_and_grads_match():
    """pad_plane_rows/pad_line_rows widen the PACKED gather rows with zeros
    that are never read: outputs and table gradients must be BIT-identical
    to the unpadded layout (the knob is pure execution strategy for the
    v5e fast-gather-width boundary — never semantics)."""
    from dataclasses import replace

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(size=(257, 3)).astype(np.float32))
    p = plane_encoding_init(jax.random.PRNGKey(0), CFG)
    padded_cfg = replace(CFG, pad_plane_rows=64, pad_line_rows=64)

    out0 = plane_encode(p, x, CFG)
    out1 = plane_encode(p, x, padded_cfg)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

    ct = jnp.asarray(rng.normal(size=out0.shape).astype(np.float32))

    def loss(cfg):
        return lambda pp: jnp.sum(plane_encode(pp, x, cfg) * ct)

    g0 = jax.grad(loss(CFG))(p)
    g1 = jax.grad(loss(padded_cfg))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), g0, g1)

    # the scatter-bwd (plain autodiff) path pads through concat/roll/pad
    scatter = replace(CFG, matmul_bwd=False)
    scatter_pad = replace(scatter, pad_plane_rows=64, pad_line_rows=32)
    g2 = jax.grad(loss(scatter))(p)
    g3 = jax.grad(loss(scatter_pad))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), g2, g3)
