import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.ops.activations import trunc_exp
from nerfsys_tpu.ops.color_space import (
    color_space_transformer,
    linear_to_srgb,
    srgb_to_linear,
)
from nerfsys_tpu.ops.losses import compute_mse_loss, psnr, psnr_from_mse


def test_srgb_roundtrip():
    x = jnp.linspace(0, 1, 100)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)
    np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)


def test_srgb_known_values():
    np.testing.assert_allclose(linear_to_srgb(jnp.array(0.0)), 0.0, atol=1e-8)
    np.testing.assert_allclose(linear_to_srgb(jnp.array(1.0)), 1.0, atol=1e-6)
    # below the linear knee
    np.testing.assert_allclose(
        linear_to_srgb(jnp.array(0.002)), 12.92 * 0.002, atol=1e-8
    )
    np.testing.assert_allclose(srgb_to_linear(jnp.array(0.04)), 0.04 / 12.92, atol=1e-8)


def test_color_space_transformer_modes():
    pred_lin = jnp.array([[0.5, 0.2, 0.8]])
    gt_srgb = jnp.array([[0.5, 0.2, 0.8]])

    p, g = color_space_transformer(pred_lin, gt_srgb, "linear")
    np.testing.assert_allclose(p, pred_lin)
    np.testing.assert_allclose(g, srgb_to_linear(gt_srgb), atol=1e-6)

    p, g = color_space_transformer(pred_lin, gt_srgb, "srgb")
    np.testing.assert_allclose(p, linear_to_srgb(pred_lin), atol=1e-6)
    np.testing.assert_allclose(g, gt_srgb)

    p, g = color_space_transformer(pred_lin, gt_srgb, "identity")
    np.testing.assert_allclose(p, pred_lin)
    np.testing.assert_allclose(g, gt_srgb)

    with pytest.raises(ValueError):
        color_space_transformer(pred_lin, gt_srgb, "bogus")


def test_trunc_exp_forward_backward():
    x = jnp.array([-1.0, 0.0, 1.0, 100.0, 1000.0])
    y = trunc_exp(x)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
    # in the un-clamped region grad == exp
    np.testing.assert_allclose(g[:3], np.exp([-1.0, 0.0, 1.0]), rtol=1e-6)
    # clamped region: gradient saturates at exp(clamp), never inf
    assert float(g[4]) == float(g[3])


def test_psnr():
    assert float(psnr_from_mse(jnp.array(0.01))) == pytest.approx(20.0)
    a = jnp.zeros((4, 3))
    b = jnp.full((4, 3), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


def test_compute_mse_loss_end_to_end():
    def field(pts, dirs):
        rgb = jnp.broadcast_to(jnp.array([0.2, 0.4, 0.6]), (*pts.shape[:-1], 3))
        return rgb, jnp.full(pts.shape[:-1], 1e4)

    rays = jnp.array([[0, 0, 0, 0, 0, -1, 0.1, 2.0]], dtype=jnp.float32)
    gt = linear_to_srgb(jnp.array([[0.2, 0.4, 0.6]]))
    loss, aux = compute_mse_loss(
        field, rays, gt, ray_samples=64, color_space="srgb"
    )
    assert float(loss) < 1e-4
    assert float(aux["psnr"]) > 35
