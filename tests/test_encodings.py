import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.ops.encodings import (
    HashGridConfig,
    frequency_encode,
    frequency_out_dim,
    hash_grid_encode,
    hash_grid_init,
    sh_encode,
)


# --------------------------- spherical harmonics ---------------------------
def test_sh_l0_constant():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = sh_encode(d, levels=1)
    np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)


def test_sh_shapes_and_degree4():
    d = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
    for levels in (1, 2, 3, 4):
        assert sh_encode(d, levels).shape == (10, levels**2)


def test_sh_against_scipy_convention():
    """Check a few analytically known components on the +z axis."""
    z = jnp.array([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(z, 4))[0]
    # On +z: Y_1^0 = 0.4886..., Y_2^0 = 0.9461*1 - 0.3153..., others with x/y = 0
    assert out[2] == pytest.approx(0.4886025119029199)
    assert out[1] == pytest.approx(0.0)
    assert out[3] == pytest.approx(0.0)
    assert out[6] == pytest.approx(0.9461746957575601 - 0.31539156525251999)
    assert out[12] == pytest.approx(0.3731763325901154 * 2)  # z(5z²−3)=2 at z=1


def test_sh_normalizes_input():
    d = jnp.array([[0.0, 0.0, 10.0]])
    d_unit = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(sh_encode(d, 4), sh_encode(d_unit, 4), atol=1e-6)


def test_sh_orthonormality_monte_carlo():
    """SH basis functions are orthonormal over the sphere: mean of products
    over uniform directions ≈ δ_ij / (4π)."""
    key = jax.random.PRNGKey(42)
    d = jax.random.normal(key, (200_000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(d, 3))  # (N, 9)
    gram = (Y.T @ Y) / Y.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


# --------------------------- frequency encoding -----------------------------
def test_frequency_encode_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = frequency_encode(x, pe_dim=2, include_input=True, use_pi=False)
    assert out.shape == (1, frequency_out_dim(3, 2, True))
    o = np.asarray(out)[0]
    np.testing.assert_allclose(o[:3], [0.5, -0.25, 1.0])
    # per-channel layout: cos(x*1), cos(x*2), sin(x*1), sin(x*2)
    np.testing.assert_allclose(
        o[3:7], [np.cos(0.5), np.cos(1.0), np.sin(0.5), np.sin(1.0)], atol=1e-6
    )


def test_frequency_encode_pi_scaling():
    x = jnp.array([[1.0]])
    out = frequency_encode(x, pe_dim=1, include_input=False, use_pi=True)
    np.testing.assert_allclose(np.asarray(out)[0], [np.cos(np.pi), np.sin(np.pi)], atol=1e-6)


# --------------------------- hash grid --------------------------------------
CFG = HashGridConfig(levels=4, min_res=4, max_res=32, log2_hashmap_size=10,
                     features_per_level=2)


def test_hash_grid_init_shape_scale():
    t = hash_grid_init(jax.random.PRNGKey(0), CFG)
    assert t.shape == (4 * 1024, 2)
    assert float(jnp.max(jnp.abs(t))) <= CFG.hash_init_scale


def test_growth_factor_and_resolutions():
    cfg = HashGridConfig(levels=16, min_res=16, max_res=4096)
    rs = cfg.level_resolutions()
    # float32 floor gives 4095 at the top level — identical to the reference's
    # torch computation (verified bit-exact against torch.floor)
    assert rs[0] == 16 and rs[-1] == 4095
    assert np.all(np.diff(rs) > 0)
    np.testing.assert_allclose(cfg.growth_factor, np.exp(np.log(4096 / 16) / 15))


def test_hash_encode_shapes():
    t = hash_grid_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3))
    out = hash_grid_encode(t, x, CFG)
    assert out.shape == (7, CFG.out_dim)


def test_hash_encode_matches_manual_trilinear():
    """Pure-numpy reimplementation of the spec, checked for equality."""
    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8,
                         features_per_level=2)
    table = np.asarray(hash_grid_init(jax.random.PRNGKey(3), cfg))
    x = np.random.default_rng(0).uniform(0.01, 0.99, size=(5, 3)).astype(np.float32)

    primes = np.array([1, 2654435761, 805459861], dtype=np.int64)
    res = cfg.level_resolutions().astype(np.float32)
    T = cfg.table_size

    def h(ix, iy, iz):
        return ((ix * primes[0]) ^ (iy * primes[1]) ^ (iz * primes[2])) % T

    expected = np.zeros((5, cfg.levels, 2), np.float32)
    for n in range(5):
        for l in range(cfg.levels):
            s = x[n] * res[l]
            f = np.floor(s).astype(np.int64)
            w = s - f
            acc = np.zeros(2, np.float32)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        idx = h(f[0] + dx, f[1] + dy, f[2] + dz) + l * T
                        ww = (
                            (w[0] if dx else 1 - w[0])
                            * (w[1] if dy else 1 - w[1])
                            * (w[2] if dz else 1 - w[2])
                        )
                        acc += ww * table[idx]
            expected[n, l] = acc

    out = np.asarray(hash_grid_encode(jnp.asarray(table), jnp.asarray(x), cfg))
    np.testing.assert_allclose(out, expected.reshape(5, -1), rtol=1e-5, atol=1e-7)


def test_hash_encode_nearest_and_smoothstep():
    for mode in ("Nearest", "Smoothstep"):
        cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8,
                             interpolation=mode)
        t = hash_grid_init(jax.random.PRNGKey(0), cfg)
        out = hash_grid_encode(t, jnp.full((3, 3), 0.5), cfg)
        assert out.shape == (3, cfg.out_dim)
        assert np.isfinite(np.asarray(out)).all()


def test_hash_encode_differentiable_wrt_table():
    t = hash_grid_init(jax.random.PRNGKey(0), CFG)
    x = jnp.full((4, 3), 0.3)

    def loss(tab):
        return jnp.sum(hash_grid_encode(tab, x, CFG) ** 2)

    g = jax.grad(loss)(t)
    assert g.shape == t.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_hash_encode_continuity():
    """Trilinear interpolation must be continuous across cell boundaries."""
    t = hash_grid_init(jax.random.PRNGKey(0), CFG)
    eps = 1e-5
    # boundary of the coarsest level cell at x = 0.25 (res 4)
    a = hash_grid_encode(t, jnp.array([[0.25 - eps, 0.4, 0.4]]), CFG)
    b = hash_grid_encode(t, jnp.array([[0.25 + eps, 0.4, 0.4]]), CFG)
    np.testing.assert_allclose(a, b, atol=1e-3 * CFG.hash_init_scale * 100)


def test_fused_encode_matches_reference_impl():
    from nerfsys_tpu.ops.encodings import hash_grid_encode_fused

    for mode in ("Linear", "Smoothstep"):
        cfg = HashGridConfig(levels=3, min_res=4, max_res=16, log2_hashmap_size=9,
                             interpolation=mode)
        t = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01,
                               maxval=0.99)
        a = hash_grid_encode(t, x, cfg)
        b = hash_grid_encode_fused(t, x, cfg)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fused_encode_grad_matches():
    from nerfsys_tpu.ops.encodings import hash_grid_encode_fused

    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    t = hash_grid_init(jax.random.PRNGKey(0), cfg)
    x = jnp.full((16, 3), 0.37)
    g1 = jax.grad(lambda tab: jnp.sum(hash_grid_encode(tab, x, cfg) ** 2))(t)
    g2 = jax.grad(lambda tab: jnp.sum(hash_grid_encode_fused(tab, x, cfg) ** 2))(t)
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-8)


def test_fused_encode_bf16_compute():
    from nerfsys_tpu.ops.encodings import hash_grid_encode_fused

    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    t = hash_grid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    out = hash_grid_encode_fused(t, x, cfg, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    ref = hash_grid_encode(t, x, cfg)
    np.testing.assert_allclose(out.astype(jnp.float32), ref, atol=2e-2)


def test_packed_encode_matches_reference_bf16():
    from nerfsys_tpu.ops.encodings import (
        hash_grid_encode, hash_grid_encode_packed,
    )

    cfg = HashGridConfig(levels=4, min_res=4, max_res=32, log2_hashmap_size=10)
    t = hash_grid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_grid_encode_packed(t, x, cfg)
    ref = hash_grid_encode(t, x, cfg)
    assert out.shape == ref.shape
    # bf16 table reads: ~3 decimal digits of precision
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2 * float(np.abs(ref).max() + 1e-3),
                               rtol=2e-2)


def test_packed_encode_table_gradient():
    from nerfsys_tpu.ops.encodings import (
        hash_grid_encode_fused, hash_grid_encode_packed,
    )

    cfg = HashGridConfig(levels=3, min_res=4, max_res=16, log2_hashmap_size=9)
    t = hash_grid_init(jax.random.PRNGKey(0), cfg) * 100  # non-trivial scale
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (32, cfg.out_dim))

    def loss_packed(tt):
        return jnp.mean((hash_grid_encode_packed(tt, x, cfg) - tgt) ** 2)

    def loss_fused(tt):
        return jnp.mean((hash_grid_encode_fused(tt, x, cfg) - tgt) ** 2)

    gp = np.asarray(jax.grad(loss_packed)(t))
    gf = np.asarray(jax.grad(loss_fused)(t))
    assert gp.shape == gf.shape
    # same sparsity pattern and close values (bf16 forward rounding only)
    np.testing.assert_allclose(gp, gf, atol=3e-2 * np.abs(gf).max() + 1e-6)
    assert (np.abs(gp) > 0).sum() > 0


def test_packed_encode_jit_and_positions_no_grad():
    from nerfsys_tpu.ops.encodings import hash_grid_encode_packed

    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    t = hash_grid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    out = jax.jit(lambda tt, xx: hash_grid_encode_packed(tt, xx, cfg))(t, x)
    assert out.shape == (16, cfg.out_dim)
    # position grads are defined (zero): whole pipeline stays differentiable
    gx = jax.grad(lambda xx: jnp.sum(hash_grid_encode_packed(t, xx, cfg)))(x)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


def test_ngp_packed_flag_runs():
    from nerfsys_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_apply

    cfg = NGPConfig(
        hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
        geo_feat_dim=7,
        hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                            log2_hashmap_size=8, packed=True),
    )
    aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]], jnp.float32)
    p = init_ngp_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0, -1]]), (32, 1))
    rgb, sigma = ngp_apply(p, cfg, aabb, x, d)
    assert rgb.shape == (32, 3) and sigma.shape == (32,)
    assert np.isfinite(np.asarray(rgb)).all()
