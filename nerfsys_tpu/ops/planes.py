"""Factorized plane/line (triplane, TensoRF-VM style) position encoding.

The TPU-first alternative to the hash grid. Measured on TPU v5e, XLA random
gathers are ISSUE-RATE bound (~1.1e8 gathered elements/s regardless of table
size or element width), so the hash grid's 8 corners x 16 levels x 2 features
per point is ~100x more expensive than the expert MLP it feeds. A factorized
encoding changes the economics: each (plane, level) needs only 4 bilinear
ROW gathers of F contiguous features (plus 2 for the matching line), moving
~F x more useful data per gather transaction:

    hash (L=16, F=2):      256 gathered elems / point
    VM   (L=3, F=8, +line): 36 gathered rows  / point (288 useful elems)

Math (TensoRF vector-matrix decomposition, arXiv:2203.09517): for each axis
triple (a, b | c), feature = plane_ab(x_a, x_b) * line_c(x_c), concatenated
over 3 orientations x L resolutions -> (N, 3*L*F). Bilinear/linear
interpolation everywhere, fully differentiable w.r.t. the tables (positions
get the same interpolation-weight gradients as the reference hash fallback).

Reference counterpart: this plays the role tiny-cuda-nn's hash encoding
plays in /root/reference/adaptive_nerf/models/encodings.py — an exchangeable
xyz encoder behind the same (params, x01) -> features contract.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# plane axes (a, b) and the complementary line axis c per orientation
_ORIENTATIONS = ((0, 1, 2), (0, 2, 1), (1, 2, 0))


@dataclasses.dataclass(frozen=True)
class PlaneEncodingConfig:
    """Static hyperparameters of the factorized plane/line encoder."""

    levels: int = 3
    base_res: int = 128
    growth: float = 2.0  # res_l = base_res * growth**l
    features: int = 8  # per orientation per level
    include_lines: bool = True  # multiply by the TensoRF line factor
    init_scale: float = 0.1
    line_init: float = 1.0  # lines start near identity so planes dominate

    def level_resolutions(self) -> List[int]:
        return [
            max(2, int(round(self.base_res * self.growth**l)))
            for l in range(self.levels)
        ]

    @property
    def out_dim(self) -> int:
        return 3 * self.levels * self.features


def plane_encoding_init(
    key: jax.Array, cfg: PlaneEncodingConfig, dtype=jnp.float32
) -> Dict:
    """{'planes': [(3, R_l*R_l, F)...], 'lines': [(3, R_l, F)...]}.

    Planes are stored flattened (row-major u*R+v) so corner fetches are row
    gathers. Lists are per level (resolutions differ, so no stacking).
    """
    params: Dict = {"planes": [], "lines": []}
    for l, R in enumerate(cfg.level_resolutions()):
        key, kp, kl = jax.random.split(key, 3)
        params["planes"].append(
            jax.random.normal(kp, (3, R * R, cfg.features), dtype)
            * cfg.init_scale
        )
        if cfg.include_lines:
            params["lines"].append(
                jnp.full((3, R, cfg.features), cfg.line_init, dtype)
                + jax.random.normal(kl, (3, R, cfg.features), dtype)
                * cfg.init_scale
                * 0.1
            )
    if not cfg.include_lines:
        params.pop("lines")
    return params


def _bilinear_rows(table: Array, u: Array, v: Array, R: int) -> Array:
    """Bilinear interpolation over a flattened (R*R, F) grid.

    u, v in [0, R-1] continuous. 4 row gathers + fused lerp -> (N, F).
    """
    u0f = jnp.floor(jnp.clip(u, 0.0, R - 1 - 1e-6))
    v0f = jnp.floor(jnp.clip(v, 0.0, R - 1 - 1e-6))
    fu = (u - u0f)[:, None]
    fv = (v - v0f)[:, None]
    u0 = u0f.astype(jnp.int32)
    v0 = v0f.astype(jnp.int32)
    base = u0 * R + v0
    g00 = table.at[base].get(mode="promise_in_bounds")
    g01 = table.at[base + 1].get(mode="promise_in_bounds")
    g10 = table.at[base + R].get(mode="promise_in_bounds")
    g11 = table.at[base + R + 1].get(mode="promise_in_bounds")
    return (
        g00 * (1 - fu) * (1 - fv)
        + g01 * (1 - fu) * fv
        + g10 * fu * (1 - fv)
        + g11 * fu * fv
    )


def _linear_rows(table: Array, w: Array, R: int) -> Array:
    """Linear interpolation over a (R, F) line. 2 row gathers -> (N, F)."""
    w0f = jnp.floor(jnp.clip(w, 0.0, R - 1 - 1e-6))
    fw = (w - w0f)[:, None]
    w0 = w0f.astype(jnp.int32)
    g0 = table.at[w0].get(mode="promise_in_bounds")
    g1 = table.at[w0 + 1].get(mode="promise_in_bounds")
    return g0 * (1 - fw) + g1 * fw


def plane_encode(params: Dict, x01: Array, cfg: PlaneEncodingConfig) -> Array:
    """Encode points in [0,1]^3 -> (..., 3 * levels * features)."""
    assert x01.shape[-1] == 3
    lead = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    x = jnp.clip(x, 0.0, 1.0)

    feats = []
    for l, R in enumerate(cfg.level_resolutions()):
        planes_l = params["planes"][l]  # (3, R*R, F)
        lines_l = params.get("lines")
        coords = x * (R - 1)  # (N, 3)
        for o, (a, b, c) in enumerate(_ORIENTATIONS):
            f = _bilinear_rows(planes_l[o], coords[:, a], coords[:, b], R)
            if lines_l is not None:
                f = f * _linear_rows(lines_l[l][o], coords[:, c], R)
            feats.append(f)
    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*lead, cfg.out_dim)


def plane_encode_ref(params: Dict, x01: np.ndarray, cfg: PlaneEncodingConfig):
    """Pure-numpy reference for tests (same math, no jit/gather tricks)."""
    x = np.clip(np.asarray(x01, np.float64).reshape(-1, 3), 0.0, 1.0)
    feats = []
    for l, R in enumerate(cfg.level_resolutions()):
        planes_l = np.asarray(params["planes"][l], np.float64)
        lines_l = (
            np.asarray(params["lines"][l], np.float64)
            if "lines" in params
            else None
        )
        coords = x * (R - 1)
        for o, (a, b, c) in enumerate(_ORIENTATIONS):
            u = np.clip(coords[:, a], 0, R - 1 - 1e-6)
            v = np.clip(coords[:, b], 0, R - 1 - 1e-6)
            u0 = np.floor(u).astype(int)
            v0 = np.floor(v).astype(int)
            fu = (u - u0)[:, None]
            fv = (v - v0)[:, None]
            t = planes_l[o]
            base = u0 * R + v0
            f = (
                t[base] * (1 - fu) * (1 - fv)
                + t[base + 1] * (1 - fu) * fv
                + t[base + R] * fu * (1 - fv)
                + t[base + R + 1] * fu * fv
            )
            if lines_l is not None:
                w = np.clip(coords[:, c], 0, R - 1 - 1e-6)
                w0 = np.floor(w).astype(int)
                fw = (w - w0)[:, None]
                line = lines_l[o]
                f = f * (line[w0] * (1 - fw) + line[w0 + 1] * fw)
            feats.append(f)
    return np.concatenate(feats, axis=-1)
