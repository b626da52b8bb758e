"""Meta-learnable SIREN / ReLU INR family (functional pytrees).

Counterpart of /root/reference/adaptive_nerf/models/inr/metasiren.py:9-351 —
the legacy/alternative implicit-representation stack kept for capability
parity (image/video INRs with region-routed modular variants). As with the
NGP expert, fast weights are plain params pytrees; the modular variant stacks
K submodule params on a leading axis and routes by coordinate bins.

Init parity: SIREN layers use the frequency-aware uniform init
(1/dim_in for the first layer, sqrt(c/dim_in)/w0 after); ReLU layers use He
normal with zero bias; final layers add the +0.5 output shift.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class SirenConfig:
    dim_in: int = 2
    dim_hidden: int = 256
    dim_out: int = 3
    num_layers: int = 4
    w0: float = 30.0
    w0_initial: float = 30.0
    c: float = 6.0
    activation: str = "sine"  # 'sine' | 'relu'
    # modular variant
    num_submodules: int = 1
    routing_order: str = "colwise"  # colwise | rowwise | raster


def _siren_layer_init(key, dim_in, dim_out, w0, c, is_first, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    w_std = 1.0 / dim_in if is_first else math.sqrt(c / dim_in) / w0
    return {
        "w": jax.random.uniform(kw, (dim_in, dim_out), dtype, -w_std, w_std),
        "b": jax.random.uniform(kb, (dim_out,), dtype, -w_std, w_std),
    }


def _relu_layer_init(key, dim_in, dim_out, dtype=jnp.float32):
    # He normal (fan_in, relu gain), zero bias — metasiren.py:95-97
    std = math.sqrt(2.0 / dim_in)
    return {
        "w": jax.random.normal(key, (dim_in, dim_out), dtype) * std,
        "b": jnp.zeros((dim_out,), dtype),
    }


def init_siren_params(key: jax.Array, cfg: SirenConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_layers)
    layers = []
    for i in range(cfg.num_layers - 1):
        d_in = cfg.dim_in if i == 0 else cfg.dim_hidden
        w0 = cfg.w0_initial if i == 0 else cfg.w0
        if cfg.activation == "sine":
            layers.append(
                _siren_layer_init(keys[i], d_in, cfg.dim_hidden, w0, cfg.c, i == 0,
                                  dtype)
            )
        else:
            layers.append(_relu_layer_init(keys[i], d_in, cfg.dim_hidden, dtype))
    # final layer (identity activation)
    if cfg.activation == "sine":
        layers.append(
            _siren_layer_init(keys[-1], cfg.dim_hidden, cfg.dim_out, cfg.w0,
                              cfg.c, False, dtype)
        )
    else:
        layers.append(_relu_layer_init(keys[-1], cfg.dim_hidden, cfg.dim_out, dtype))
    return {"layers": layers}


def siren_apply(
    params: Params, cfg: SirenConfig, x: Array, return_features: bool = False
):
    """Forward pass; output carries the reference's +0.5 shift
    (metasiren.py:196-197). Optionally exposes the penultimate features
    (MetaSirenPenultimate semantics)."""
    h = x
    n = len(params["layers"])
    feat = None
    for i, lyr in enumerate(params["layers"]):
        h = h @ lyr["w"] + lyr["b"]
        if i < n - 1:
            if cfg.activation == "sine":
                w0 = cfg.w0_initial if i == 0 else cfg.w0
                h = jnp.sin(w0 * h)
            else:
                h = jax.nn.relu(h)
            feat = h
    out = h + 0.5
    if return_features:
        return out, feat
    return out


# ------------------------------ modular variant -------------------------------
def init_modular_siren_params(key, cfg: SirenConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_submodules)
    return jax.vmap(lambda k: init_siren_params(k, cfg, dtype))(keys)


def route_coords(coords: Array, cfg: SirenConfig) -> Array:
    """Coordinate-bin routing (metasiren.py:278-303): coords (N, 2) = (y, x)
    in [-1, 1] -> region ids (N,)."""
    K = cfg.num_submodules
    if cfg.routing_order in ("colwise", "rowwise"):
        axis = 1 if cfg.routing_order == "colwise" else 0
        ids = jnp.floor((coords[:, axis] + 1.0) * 0.5 * K).astype(jnp.int32)
        return jnp.clip(ids, 0, K - 1)
    if cfg.routing_order == "raster":
        n = int(math.isqrt(K))
        assert n * n == K, "raster routing needs a square submodule count"
        xi = jnp.clip(
            jnp.floor((coords[:, 1] + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1
        )
        yi = jnp.clip(
            jnp.floor((coords[:, 0] + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1
        )
        return yi * n + xi
    raise NotImplementedError(cfg.routing_order)


def modular_siren_apply(
    params: Params,
    cfg: SirenConfig,
    x: Array,  # (N, dim_in)
    region_ids: Optional[Array] = None,
) -> Array:
    """Region-routed forward: every submodule evaluates all points (vmapped,
    one batched matmul chain) and a one-hot contraction selects each point's
    region output — the dense TPU replacement for the reference's per-region
    index_copy loop (metasiren.py:245-276)."""
    if region_ids is None:
        region_ids = route_coords(x[:, :2], cfg)
    outs = jax.vmap(lambda p: siren_apply(p, cfg, x))(params)  # (K, N, D)
    onehot = jax.nn.one_hot(region_ids, cfg.num_submodules, dtype=outs.dtype)
    return jnp.einsum("kn,knd->nd", onehot.T, outs)
