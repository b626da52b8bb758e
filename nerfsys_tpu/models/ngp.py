"""Instant-NGP-style radiance field expert as a functional pytree model.

TPU-native counterpart of the reference MetaNGP
(/root/reference/adaptive_nerf/models/inr/meta_ngp.py:21-241). Instead of a
torch Module with fast-weight injection (MetaModule/get_subdict), the model
here is a pair (config, params-pytree) and a set of pure apply functions —
"fast weights" for meta-learning are literally just another params pytree, so
MAML's inner loop is jax.grad + tree arithmetic with no special machinery.

Architecture (identical to the reference):
    x (world DRB) -> [0,1]^3 via expert SceneBox -> hash grid (L*F)
      -> sigma trunk: sigma_depth x [Linear(hidden) + ReLU]
      -> sigma_head: Linear(1), bias init -1, trunc_exp activation
      -> geo_head:   Linear(geo_feat_dim)
    d (unit dir) -> SH(4) or Frequency(pe_dim=4, include_input)
    [geo_feat, dir_enc] -> color mlp: color_depth x [Linear(color_hidden)+ReLU]
      -> Linear(3) -> sigmoid (if use_sigmoid_rgb)

Because all K experts of a scene share this architecture, their params stack
along a leading K axis and evaluate under jax.vmap (see models/container.py) —
replacing the reference's serial per-expert Python loops with one batched MXU
program.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.activations import trunc_exp
from nerfsys_tpu.ops.encodings import (
    HashGridConfig,
    frequency_encode,
    frequency_out_dim,
    hash_grid_encode_fused,
    hash_grid_encode_packed,
    hash_grid_init,
    sh_encode,
    sh_out_dim,
)
from nerfsys_tpu.ops.planes import (
    PlaneEncodingConfig,
    plane_encode,
    plane_encoding_init,
)

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    """Static architecture hyperparameters of one expert."""

    hidden: int = 64
    sigma_depth: int = 2
    color_hidden: int = 64
    color_depth: int = 3
    geo_feat_dim: int = 15
    use_sigmoid_rgb: bool = True
    dir_encoding: str = "spherical"  # 'spherical' | 'frequency'
    sh_levels: int = 4
    freq_pe_dim: int = 4
    # xyz encoding: 'hash' (reference Instant-NGP parity) or 'planes'
    # (factorized plane/line VM encoding — the TPU-fast path, ~7x fewer
    # gather transactions per point; see ops/planes.py)
    xyz_encoding: str = "hash"
    hash: HashGridConfig = dataclasses.field(default_factory=HashGridConfig)
    planes: "PlaneEncodingConfig" = dataclasses.field(
        default_factory=lambda: PlaneEncodingConfig()
    )
    enc_eps: float = 1e-6  # clamp margin for world->unit mapping
    # bfloat16 MLP compute (the TPU-native analogue of the reference's AMP
    # autocast, meta_core.py:34-66): params stay fp32; activations/matmuls
    # run bf16 on the MXU; sigma/rgb heads return fp32.
    use_bf16: bool = False

    @property
    def xyz_enc_dim(self) -> int:
        if self.xyz_encoding == "planes":
            return self.planes.out_dim
        return self.hash.out_dim

    @property
    def dir_enc_dim(self) -> int:
        if self.dir_encoding == "spherical":
            return sh_out_dim(self.sh_levels)
        if self.dir_encoding == "frequency":
            return frequency_out_dim(3, self.freq_pe_dim, include_input=True)
        raise ValueError(f"Unsupported dir_encoding: {self.dir_encoding}")


# --------------------------- init -------------------------------------------
def _linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -1.0, 1.0) * bound
    b = jax.random.uniform(kb, (out_dim,), dtype, -1.0, 1.0) * bound
    return {"w": w, "b": b}


def init_ngp_params(key: jax.Array, cfg: NGPConfig, dtype=jnp.float32) -> Params:
    """Initialize one expert's parameter pytree."""
    n_keys = 4 + cfg.sigma_depth + cfg.color_depth
    keys = list(jax.random.split(key, n_keys))

    if cfg.xyz_encoding == "planes":
        params: Params = {
            "planes_enc": plane_encoding_init(keys.pop(), cfg.planes, dtype)
        }
    else:
        params = {"hash_table": hash_grid_init(keys.pop(), cfg.hash, dtype)}

    trunk = []
    last = cfg.xyz_enc_dim
    for _ in range(max(cfg.sigma_depth, 0)):
        trunk.append(_linear_init(keys.pop(), last, cfg.hidden, dtype))
        last = cfg.hidden
    params["sigma_trunk"] = trunk

    sigma_head = _linear_init(keys.pop(), last, 1, dtype)
    sigma_head["b"] = jnp.full_like(sigma_head["b"], -1.0)  # reference :83-84
    params["sigma_head"] = sigma_head
    params["geo_head"] = _linear_init(keys.pop(), last, cfg.geo_feat_dim, dtype)

    color = []
    last = cfg.geo_feat_dim + cfg.dir_enc_dim
    for _ in range(max(cfg.color_depth, 0)):
        color.append(_linear_init(keys.pop(), last, cfg.color_hidden, dtype))
        last = cfg.color_hidden
    color.append(_linear_init(keys.pop(), last, 3, dtype))
    params["color_mlp"] = color
    return params


def init_stacked_ngp_params(
    key: jax.Array, cfg: NGPConfig, num_experts: int, dtype=jnp.float32
) -> Params:
    """K independent expert inits stacked on a leading axis (vmapped init)."""
    keys = jax.random.split(key, num_experts)
    return jax.vmap(lambda k: init_ngp_params(k, cfg, dtype))(keys)


# --------------------------- apply ------------------------------------------
def world_to_unit(x: Array, aabb: Array, eps: float = 1e-6) -> Array:
    """Map world coords into the expert's [0,1]^3 hash domain (clamped)."""
    x01 = (x - aabb[0]) / (aabb[1] - aabb[0])
    return jnp.clip(x01, eps, 1.0 - eps)


def _mlp(x: Array, layers, activate_last: bool = False, dtype=None) -> Array:
    if dtype is not None:
        x = x.astype(dtype)
    n = len(layers)
    for i, lyr in enumerate(layers):
        w, b = lyr["w"], lyr["b"]
        if dtype is not None:
            w, b = w.astype(dtype), b.astype(dtype)
        x = x @ w + b
        if activate_last or i < n - 1:
            x = jax.nn.relu(x)
    return x


def encode_dir(d: Array, cfg: NGPConfig) -> Array:
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    if cfg.dir_encoding == "spherical":
        return sh_encode(d, cfg.sh_levels)
    return frequency_encode(d, cfg.freq_pe_dim, include_input=True)


def ngp_density(
    params: Params,
    cfg: NGPConfig,
    aabb: Array,  # (2, 3) expert scene box
    x: Array,  # (..., 3) world coords
    return_feats: bool = False,
):
    """Density (and optionally geometry features). Spec: meta_ngp.py:192-225."""
    x01 = world_to_unit(x, aabb, cfg.enc_eps)
    if cfg.xyz_encoding == "planes":
        h = plane_encode(params["planes_enc"], x01, cfg.planes)
    elif cfg.hash.packed and cfg.hash.features_per_level == 2 and (
        cfg.hash.interpolation != "Nearest"
    ):
        h = hash_grid_encode_packed(params["hash_table"], x01, cfg.hash)
    else:
        h = hash_grid_encode_fused(params["hash_table"], x01, cfg.hash)
    dt = jnp.bfloat16 if cfg.use_bf16 else None
    h = _mlp(h, params["sigma_trunk"], activate_last=True, dtype=dt)
    sh = params["sigma_head"]
    w, b = (sh["w"].astype(dt), sh["b"].astype(dt)) if dt else (sh["w"], sh["b"])
    sigma_raw = (h @ w + b).astype(jnp.float32)  # exp needs fp32 range
    sigma = trunc_exp(sigma_raw[..., 0])
    if not return_feats:
        return sigma
    gh = params["geo_head"]
    w, b = (gh["w"].astype(dt), gh["b"].astype(dt)) if dt else (gh["w"], gh["b"])
    geo = (h @ w + b).astype(jnp.float32)
    return sigma, geo


def ngp_color(
    params: Params, cfg: NGPConfig, d: Array, geo_feat: Array
) -> Array:
    """View-dependent color from direction + geometry features."""
    d_enc = encode_dir(d, cfg)
    h = jnp.concatenate([geo_feat, d_enc], axis=-1)
    dt = jnp.bfloat16 if cfg.use_bf16 else None
    rgb = _mlp(h, params["color_mlp"], activate_last=False, dtype=dt).astype(
        jnp.float32
    )
    if cfg.use_sigmoid_rgb:
        rgb = jax.nn.sigmoid(rgb)
    return rgb


def ngp_apply(
    params: Params,
    cfg: NGPConfig,
    aabb: Array,
    x: Array,  # (..., 3)
    d: Array,  # (..., 3)
) -> Tuple[Array, Array]:
    """Full field evaluation -> (rgb (...,3), sigma (...,))."""
    sigma, geo = ngp_density(params, cfg, aabb, x, return_feats=True)
    rgb = ngp_color(params, cfg, d, geo)
    return rgb, sigma


def ngp_field_fn(params: Params, cfg: NGPConfig, aabb: Array):
    """Bind (params, cfg, aabb) into a FieldFn for ops.volrend renderers."""

    def field(pts: Array, dirs: Array):
        return ngp_apply(params, cfg, aabb, pts, dirs)

    return field
