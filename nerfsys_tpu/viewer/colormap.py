"""Host-side colormaps for viewer/video visualization.

Counterpart of /root/reference/adaptive_nerf/viewer/colormap.py:18-180
(apply_colormap / apply_depth_colormap / apply_pca_colormap). Pure numpy:
these run on already-downloaded frames, never on the device. matplotlib is
optional; 'turbo' and 'gray' are built in so headless images need no extra
dependency.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# Polynomial fit of Google's Turbo colormap (public domain reference
# implementation by Anton Mikhailov), evaluated directly so we do not depend
# on matplotlib at runtime.
_TURBO_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                     -152.94239396, 59.28637943])
_TURBO_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                     4.27729857, 2.82956604])
_TURBO_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                     -89.90310912, 27.34824973])


def _polyval(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    y = np.zeros_like(x)
    for i, c in enumerate(coeffs):
        y = y + c * x**i
    return y


def turbo(x: np.ndarray) -> np.ndarray:
    """x in [0,1] (...,) -> rgb (..., 3) in [0,1]."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    rgb = np.stack(
        [_polyval(_TURBO_R, x), _polyval(_TURBO_G, x), _polyval(_TURBO_B, x)],
        axis=-1,
    )
    return np.clip(rgb, 0.0, 1.0)


def _normalize(x: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    lo, hi = float(np.nanmin(x)), float(np.nanmax(x))
    return np.nan_to_num((x - lo) / max(hi - lo, eps))


def apply_colormap(
    x: np.ndarray,
    cmap: str = "turbo",
    *,
    normalize: bool = True,
) -> np.ndarray:
    """Scalar (...,) or (...,1) image -> rgb (..., 3) float in [0,1].

    3-channel input passes through clipped (already a color image).
    """
    x = np.asarray(x, np.float32)
    if x.ndim >= 1 and x.shape[-1] == 3:
        return np.clip(x, 0.0, 1.0)
    if x.ndim >= 1 and x.shape[-1] == 1:
        x = x[..., 0]
    if normalize:
        x = _normalize(x)
    x = np.clip(x, 0.0, 1.0)
    if cmap == "gray":
        return np.repeat(x[..., None], 3, axis=-1)
    if cmap == "turbo":
        return turbo(x)
    try:  # any other name -> matplotlib, if present
        import matplotlib.cm as mcm

        return np.asarray(mcm.get_cmap(cmap)(x))[..., :3].astype(np.float32)
    except Exception:
        return turbo(x)


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: Optional[np.ndarray] = None,
    near_plane: Optional[float] = None,
    far_plane: Optional[float] = None,
    cmap: str = "turbo",
) -> np.ndarray:
    """Depth (..., ) -> rgb, optionally alpha-faded by accumulation
    (reference colormap.py apply_depth_colormap semantics)."""
    depth = np.asarray(depth, np.float32)
    near = float(near_plane) if near_plane is not None else float(np.nanmin(depth))
    far = float(far_plane) if far_plane is not None else float(np.nanmax(depth))
    x = (depth - near) / max(far - near, 1e-10)
    rgb = apply_colormap(np.clip(x, 0.0, 1.0), cmap, normalize=False)
    if accumulation is not None:
        acc = np.clip(np.asarray(accumulation, np.float32), 0.0, 1.0)
        rgb = rgb * acc[..., None]
    return rgb


def apply_pca_colormap(features: np.ndarray) -> np.ndarray:
    """Project (..., C) features to 3 principal components -> rgb in [0,1]."""
    feats = np.asarray(features, np.float32)
    lead = feats.shape[:-1]
    flat = feats.reshape(-1, feats.shape[-1])
    flat = flat - flat.mean(axis=0, keepdims=True)
    # top-3 right singular vectors
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T  # (N, 3)
    lo = np.percentile(proj, 1, axis=0)
    hi = np.percentile(proj, 99, axis=0)
    rgb = np.clip((proj - lo) / np.maximum(hi - lo, 1e-10), 0.0, 1.0)
    return rgb.reshape(*lead, 3)


def tonemap_frame(
    rgb_linear: np.ndarray,
    *,
    exposure: float = 0.0,
    gamma: float = 2.2,
) -> np.ndarray:
    """Exposure (stops) + gamma display transform -> [0,1] rgb."""
    x = np.asarray(rgb_linear, np.float32) * (2.0**exposure)
    x = np.clip(x, 0.0, 1.0)
    return x ** (1.0 / max(gamma, 1e-3))
