"""Golden test of the AlexNet-LPIPS graph against an independent torch
replica of the lpips package's computation.

No pretrained weights ship in this image (no egress), so the graph itself is
verified with fixed-seed random weights: the torch replica below follows
the lpips package's forward exactly (ScalingLayer -> torchvision-alexnet
conv stack tapping the 5 relu outputs -> unit channel normalization ->
1x1 linear heads -> spatial mean -> sum over stages; see
/root/reference/adaptive_nerf/pipelines/online_stage/runtime_adapt.py:111
for where the reference calls it), and the jnp implementation in
nerfsys_tpu.utils.metrics must agree to float tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerfsys_tpu.scripts.convert_lpips_weights import random_weights
from nerfsys_tpu.utils.metrics import lpips

_SHIFT = [-0.030, -0.088, -0.188]
_SCALE = [0.458, 0.448, 0.450]
# torchvision alexnet conv stack: (k, stride, pad), maxpool(3,2) after
# relu1 and relu2
_CFG = [(11, 4, 2), (5, 1, 2), (3, 1, 1), (3, 1, 1), (3, 1, 1)]


def _torch_lpips(arrs: dict, a: np.ndarray, b: np.ndarray) -> float:
    """lpips-package-equivalent forward in torch. a, b: (H, W, 3) in [0,1].

    Weights come in the converter's npz layout (conv{i}/w HWIO, lin{i}/w
    (1,1,C,1)) and are transposed back to torch OIHW here — exercising the
    converter's layout contract from the torch side.
    """

    def feats(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None].float() * 2.0 - 1.0
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        h = (x - shift) / scale
        outs = []
        for i, (k, stride, pad) in enumerate(_CFG):
            w = torch.from_numpy(
                np.transpose(arrs[f"conv{i}/w"], (3, 2, 0, 1)).copy()
            )  # HWIO -> OIHW
            bias = torch.from_numpy(arrs[f"conv{i}/b"])
            h = torch.nn.functional.conv2d(h, w, bias, stride=stride,
                                           padding=pad)
            h = torch.relu(h)
            outs.append(h)
            if i in (0, 1):
                h = torch.nn.functional.max_pool2d(h, 3, stride=2)
        return outs

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        # lpips.normalize_tensor: x / (||x||_channel + 1e-10)
        xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (xn - yn) ** 2
        lin = torch.from_numpy(arrs[f"lin{i}/w"].reshape(-1)).view(1, -1, 1, 1)
        total += float((d * lin).sum(dim=1, keepdim=True).mean())
    return total


def test_lpips_graph_matches_torch_replica():
    arrs = random_weights(seed=0)
    weights = {}
    for key, v in arrs.items():
        top, leaf = key.rsplit("/", 1)
        weights.setdefault(top, {})[leaf] = v

    rng = np.random.default_rng(7)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ours = float(lpips(a, b, weights=weights))
    golden = _torch_lpips(arrs, a, b)
    assert np.isfinite(ours) and ours > 0
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-6)


def test_lpips_graph_matches_torch_replica_dissimilar():
    arrs = random_weights(seed=3)
    weights = {}
    for key, v in arrs.items():
        top, leaf = key.rsplit("/", 1)
        weights.setdefault(top, {})[leaf] = v

    rng = np.random.default_rng(11)
    a = rng.uniform(size=(48, 80, 3)).astype(np.float32)  # non-square
    b = rng.uniform(size=(48, 80, 3)).astype(np.float32)

    ours = float(lpips(a, b, weights=weights))
    golden = _torch_lpips(arrs, a, b)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-6)
