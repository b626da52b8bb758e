"""Image quality metrics: PSNR, SSIM (native jnp), gated LPIPS.

Counterparts of the reference's metric stack
(/root/reference/adaptive_nerf/pipelines/online_stage/runtime_adapt.py:111-167):
  - PSNR = -10 log10(mse + 1e-24) (utils.py:538-539) — re-exported from ops.
  - SSIM: pytorch-msssim-equivalent implementation (gaussian window 11,
    sigma 1.5, data_range=1, K1=0.01, K2=0.03) as separable jnp convolutions.
  - LPIPS (AlexNet): the reference uses the `lpips` package's pretrained
    network. Pretrained weights are not shippable in this environment, so the
    AlexNet-LPIPS graph is implemented here but only activates when a weights
    file (npz pytree) is supplied via NERFSYS_LPIPS_WEIGHTS or an explicit
    path; otherwise lpips() returns None and eval tables report NaN for the
    column, keeping the pipeline total.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.ops.losses import psnr, psnr_from_mse  # re-export  # noqa: F401

Array = jax.Array


# ------------------------------- SSIM ---------------------------------------
def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _blur(img: Array, kernel: Array) -> Array:
    """Separable 'valid' gaussian filter over (H, W, C) images."""
    k = kernel.shape[0]

    def conv_axis(x, axis):
        x = jnp.moveaxis(x, axis, -1)  # (..., L)
        shape = x.shape
        x = x.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            x, kernel.reshape(1, 1, k), window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            # TPU convs default to bf16 multiplies; the E[x^2]-mu^2 variance
            # below cancels catastrophically at that precision (measured:
            # SSIM -5.5 on a real eval image, impossible for bounded inputs)
            precision=jax.lax.Precision.HIGHEST,
        )
        out = out.reshape(*shape[:-1], shape[-1] - k + 1)
        return jnp.moveaxis(out, -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


@partial(jax.jit, static_argnames=("win_size",))
def ssim(
    pred: Array,  # (H, W, C) in [0, data_range]
    gt: Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Mean SSIM over the image, matching pytorch-msssim's `ssim` defaults."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    kernel = _gaussian_kernel1d(win_size, sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(pred, kernel)
    mu_y = _blur(gt, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    # true variances are nonnegative; the subtraction can dip below zero
    # from floating-point cancellation — clamp so the denominator stays
    # >= c1*c2 and SSIM stays in [-1, 1] for nonnegative inputs
    sigma_xx = jnp.maximum(_blur(pred * pred, kernel) - mu_xx, 0.0)
    sigma_yy = jnp.maximum(_blur(gt * gt, kernel) - mu_yy, 0.0)
    sigma_xy = _blur(pred * gt, kernel) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)


# ------------------------------- LPIPS --------------------------------------
# AlexNet-LPIPS graph: 5 conv stages -> unit-normalize features -> linear
# weights -> spatial mean -> sum over stages. Weights pytree layout:
#   {'conv{i}': {'w': (kh, kw, cin, cout), 'b': (cout,)},
#    'lin{i}': {'w': (1, 1, c, 1)}}   i in 0..4
_ALEX_CFG = [
    # (out_ch, kernel, stride, pad)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_lpips_weights_cache = {}


def load_lpips_weights(path: Optional[str] = None):
    """Load LPIPS weights pytree from an .npz file, or None if unavailable."""
    path = path or os.environ.get("NERFSYS_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    if path in _lpips_weights_cache:
        return _lpips_weights_cache[path]
    raw = np.load(path)
    weights = {}
    for key in raw.files:
        top, leaf = key.rsplit("/", 1)
        weights.setdefault(top, {})[leaf] = jnp.asarray(raw[key])
    _lpips_weights_cache[path] = weights
    return weights


def _alex_features(weights, x: Array):
    """x: (H, W, 3) normalized to [-1, 1]. Returns list of 5 feature maps."""
    h = (x - _SHIFT) / _SCALE
    h = h[None]  # NHWC
    feats = []
    for i, (cout, k, stride, pad) in enumerate(_ALEX_CFG):
        wb = weights[f"conv{i}"]
        h = jax.lax.conv_general_dilated(
            h, wb["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + wb["b"]
        h = jax.nn.relu(h)
        feats.append(h)
        # AlexNet max-pools after relu1 and relu2; LPIPS taps relu3..5 pre-pool
        if i in (0, 1):
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(
    pred: Array,  # (H, W, 3) in [0, 1] sRGB
    gt: Array,
    weights=None,
    weights_path: Optional[str] = None,
) -> Optional[Array]:
    """LPIPS(AlexNet) distance, or None when no pretrained weights are available."""
    if weights is None:
        weights = load_lpips_weights(weights_path)
    if weights is None:
        return None
    a = pred.astype(jnp.float32) * 2.0 - 1.0
    b = gt.astype(jnp.float32) * 2.0 - 1.0
    fa = _alex_features(weights, a)
    fb = _alex_features(weights, b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-10)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-10)
        d = (xn - yn) ** 2
        lin_w = weights[f"lin{i}"]["w"].reshape(1, 1, 1, -1)  # (1,1,1,C)
        total = total + jnp.mean((d * lin_w).sum(-1))
    return total
