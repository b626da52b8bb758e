"""Classic (vanilla) NeRF expert: Fourier PE + deep MLP with skip connection.

Functional counterpart of the reference MetaNeRF
(/root/reference/adaptive_nerf/models/inr/meta_vanilla.py:13-154):

    x (world) -> FrequencyEncoder(pe_dim=10, include_input) ->
    sigma_depth x [Linear(hidden)+ReLU] with the PE re-concatenated at the
    skip layers (default layer 4) -> sigma_head(1)+trunc_exp / geo_head(G)
    d -> SH(4) or Frequency(4) -> [geo, d_enc] -> color MLP -> sigmoid rgb

Unlike the NGP expert there is no world->unit mapping: the reference feeds
raw (pose-normalized) world coordinates into the PE, so the `aabb` argument
is accepted for API uniformity with ngp_* but unused.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.activations import trunc_exp
from nerfsys_tpu.ops.encodings import (
    frequency_encode,
    frequency_out_dim,
    sh_encode,
    sh_out_dim,
)

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class VanillaConfig:
    hidden: int = 256
    sigma_depth: int = 8
    skips: Tuple[int, ...] = (4,)
    geo_feat_dim: int = 15
    color_hidden: int = 128
    color_depth: int = 2
    use_sigmoid_rgb: bool = True
    # tiny-NeRF (BASELINE.json config 1) drops view dependence entirely:
    # the color head sees only the geometry features.
    use_viewdirs: bool = True
    pe_dim_xyz: int = 10
    include_input_xyz: bool = True
    dir_encoding: str = "spherical"
    sh_levels: int = 4
    freq_pe_dim: int = 4
    # nonzero: the trunk's input width is fixed to this value and the caller
    # supplies the xyz encoding itself (vanilla_apply_enc) — the mip-NeRF
    # variant feeds integrated PE through the same skip-MLP (ops/mip.py).
    xyz_enc_override: int = 0

    @property
    def xyz_enc_dim(self) -> int:
        if self.xyz_enc_override:
            return self.xyz_enc_override
        return frequency_out_dim(3, self.pe_dim_xyz, self.include_input_xyz)

    @property
    def dir_enc_dim(self) -> int:
        if self.dir_encoding == "spherical":
            return sh_out_dim(self.sh_levels)
        return frequency_out_dim(3, self.freq_pe_dim, include_input=True)


def _linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -1.0, 1.0) * bound,
        "b": jax.random.uniform(kb, (out_dim,), dtype, -1.0, 1.0) * bound,
    }


def init_vanilla_params(key: jax.Array, cfg: VanillaConfig, dtype=jnp.float32) -> Params:
    n_keys = cfg.sigma_depth + 2 + cfg.color_depth
    keys = list(jax.random.split(key, n_keys))

    trunk = []
    for i in range(cfg.sigma_depth):
        in_dim = cfg.xyz_enc_dim if i == 0 else cfg.hidden
        if i in cfg.skips and i != 0:
            in_dim = cfg.hidden + cfg.xyz_enc_dim
        trunk.append(_linear_init(keys.pop(), in_dim, cfg.hidden, dtype))

    params: Params = {
        "trunk": trunk,
        "sigma_head": _linear_init(keys.pop(), cfg.hidden, 1, dtype),
        "geo_head": _linear_init(keys.pop(), cfg.hidden, cfg.geo_feat_dim, dtype),
    }

    color = []
    for l in range(cfg.color_depth):
        dir_dim = cfg.dir_enc_dim if cfg.use_viewdirs else 0
        in_dim = cfg.geo_feat_dim + dir_dim if l == 0 else cfg.color_hidden
        out_dim = 3 if l == cfg.color_depth - 1 else cfg.color_hidden
        color.append(_linear_init(keys.pop(), in_dim, out_dim, dtype))
    params["color_mlp"] = color
    return params


def _enc_dir(d: Array, cfg: VanillaConfig) -> Array:
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    if cfg.dir_encoding == "spherical":
        return sh_encode(d, cfg.sh_levels)
    return frequency_encode(d, cfg.freq_pe_dim, include_input=True)


def vanilla_density_enc(
    params: Params, cfg: VanillaConfig, enc: Array, return_feats: bool = False
):
    """Trunk + heads over an already-encoded input (the mip path encodes
    Gaussians, not points, so the encoding happens outside)."""
    h = enc
    for i, lyr in enumerate(params["trunk"]):
        if i in cfg.skips and i != 0:
            h = jnp.concatenate([h, enc], axis=-1)
        h = jax.nn.relu(h @ lyr["w"] + lyr["b"])
    sigma_raw = h @ params["sigma_head"]["w"] + params["sigma_head"]["b"]
    sigma = trunc_exp(sigma_raw[..., 0])
    if not return_feats:
        return sigma
    geo = h @ params["geo_head"]["w"] + params["geo_head"]["b"]
    return sigma, geo


def vanilla_density(
    params: Params, cfg: VanillaConfig, aabb: Array, x: Array,
    return_feats: bool = False,
):
    """Density branch with NeRF skip connections (`aabb` unused, see module doc)."""
    del aabb
    enc = frequency_encode(x, cfg.pe_dim_xyz, cfg.include_input_xyz)
    return vanilla_density_enc(params, cfg, enc, return_feats)


def vanilla_apply_enc(
    params: Params, cfg: VanillaConfig, enc: Array, d: Array
) -> Tuple[Array, Array]:
    """(rgb, sigma) from a caller-supplied xyz encoding (mip-IPE path)."""
    sigma, geo = vanilla_density_enc(params, cfg, enc, return_feats=True)
    rgb = vanilla_color(params, cfg, d, geo)
    return rgb, sigma


def vanilla_color(params: Params, cfg: VanillaConfig, d: Array, geo_feat: Array) -> Array:
    if cfg.use_viewdirs:
        h = jnp.concatenate([geo_feat, _enc_dir(d, cfg)], axis=-1)
    else:
        h = geo_feat
    n = len(params["color_mlp"])
    for i, lyr in enumerate(params["color_mlp"]):
        h = h @ lyr["w"] + lyr["b"]
        if i < n - 1:
            h = jax.nn.relu(h)
    if cfg.use_sigmoid_rgb:
        h = jax.nn.sigmoid(h)
    return h


def vanilla_apply(
    params: Params, cfg: VanillaConfig, aabb: Array, x: Array, d: Array
) -> Tuple[Array, Array]:
    sigma, geo = vanilla_density(params, cfg, aabb, x, return_feats=True)
    rgb = vanilla_color(params, cfg, d, geo)
    return rgb, sigma


def vanilla_field_fn(params: Params, cfg: VanillaConfig, aabb: Array):
    def field(pts: Array, dirs: Array):
        return vanilla_apply(params, cfg, aabb, pts, dirs)

    return field
