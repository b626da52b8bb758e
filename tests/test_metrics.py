"""SSIM golden tests against an independent torch replica.

The SSIM definition matches pytorch-msssim's `ssim` defaults
(reference /root/reference/adaptive_nerf/pipelines/online_stage/
runtime_adapt.py:158: ssim(pred, gt, data_range=1.0)): gaussian window 11,
sigma 1.5, VALID padding, k1/k2 = 0.01/0.03.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nerfsys_tpu.utils.metrics import ssim

torch = pytest.importorskip("torch")


def _torch_ssim(pred, gt, data_range=1.0, win=11, sigma=1.5):
    """Independent replica of pytorch-msssim's single-scale ssim."""
    import torch.nn.functional as F

    x = torch.from_numpy(np.asarray(pred, np.float64)).permute(2, 0, 1)[None]
    y = torch.from_numpy(np.asarray(gt, np.float64)).permute(2, 0, 1)[None]
    g = torch.arange(win, dtype=torch.float64) - win // 2
    g = torch.exp(-(g ** 2) / (2 * sigma ** 2))
    g = (g / g.sum())
    C = x.shape[1]
    kx = g.view(1, 1, 1, win).repeat(C, 1, 1, 1)
    ky = g.view(1, 1, win, 1).repeat(C, 1, 1, 1)

    def blur(t):
        t = F.conv2d(t, kx, groups=C)
        return F.conv2d(t, ky, groups=C)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mx, my = blur(x), blur(y)
    sxx = blur(x * x) - mx * mx
    syy = blur(y * y) - my * my
    sxy = blur(x * y) - mx * my
    num = (2 * mx * my + c1) * (2 * sxy + c2)
    den = (mx * mx + my * my + c1) * (sxx + syy + c2)
    return float((num / den).mean())


def test_ssim_matches_torch_replica():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    noisy = np.clip(base + rng.normal(0, 0.1, base.shape), 0, 1).astype(
        np.float32
    )
    ours = float(ssim(jnp.asarray(noisy), jnp.asarray(base)))
    ref = _torch_ssim(noisy, base)
    assert abs(ours - ref) < 2e-4, (ours, ref)


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(
        1.0, abs=1e-5
    )
    # adversarial pairs (independent, near-constant, inverted) must stay in
    # [-1, 1]: the TPU eval once logged -5.5 when bf16-precision convs made
    # the E[x^2]-mu^2 variance negative — clamped + HIGHEST precision now
    for mk in (
        lambda: (rng.uniform(0, 1, (40, 40, 3)), rng.uniform(0, 1, (40, 40, 3))),
        lambda: (np.full((40, 40, 3), 0.731), np.full((40, 40, 3), 0.7311)),
        lambda: (a, 1.0 - a),
    ):
        p, g = (np.asarray(m, np.float32) for m in mk())
        v = float(ssim(jnp.asarray(p), jnp.asarray(g)))
        assert -1.0 - 1e-5 <= v <= 1.0 + 1e-5, v
