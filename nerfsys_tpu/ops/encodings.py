"""Input encodings: spherical harmonics, frequency bands, multires hash grid.

TPU-native replacements for tiny-cuda-nn's fused CUDA encoders
(/root/reference/adaptive_nerf/models/encodings.py). The math specs are the
reference's pure-torch fallbacks, which we reproduce exactly:

  - SH: real spherical harmonics up to degree 4, Nerfstudio coefficient
    convention (encodings.py:27-81).
  - Frequency: cos/sin bands 2^0..2^(L-1), optional pi scaling and identity
    passthrough (encodings.py:387-444).
  - HashGrid: Instant-NGP multiresolution hash (encodings.py:160-381) —
    per-level resolution floor(min_res * growth^l) with
    growth = exp((ln max - ln min)/(L-1)); prime-XOR hash
    (1, 2654435761, 805459861) mod 2^log2_size; one table slab per level;
    trilinear (or nearest / smoothstep) interpolation.

Everything is a pure function over explicit parameters so the hash table can
live inside a fast-weight pytree and be meta-learned. The gather is expressed
with jnp.take (routed through the ops/gather.py row_gather primitive) so XLA
lowers it to the TPU gather unit. A Pallas kernel was evaluated and rejected:
Mosaic cannot vectorize integer-indexed VMEM gathers (CLAUDE.md), so the
measured-fast TPU paths are packed-row gathers + one-hot-matmul gradient
contractions here and in ops/planes.py, not a fused custom kernel.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.gather import row_gather
import numpy as np

Array = jax.Array

MAX_SH_DEGREE = 4

# 64-bit-safe in uint32: (a*p mod 2^32) mod 2^T == (a*p) mod 2^T for T <= 32,
# and XOR commutes with truncation, so uint32 wraparound arithmetic reproduces
# the reference's int64 math bit-exactly.
_HASH_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))


# =========================== spherical harmonics ============================
def num_sh_bases(degree: int) -> int:
    assert degree <= MAX_SH_DEGREE
    return (degree + 1) ** 2


def sh_encode(directions: Array, levels: int = 4) -> Array:
    """Real SH components up to degree = levels - 1.

    directions: (..., 3), normalized internally. Returns (..., levels**2).
    """
    degree = levels - 1
    assert 0 <= degree <= MAX_SH_DEGREE
    d = directions
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z

    comps = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree > 0:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if degree > 1:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if degree > 2:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    if degree > 3:
        comps += [
            2.5033429417967046 * x * y * (xx - yy),
            1.7701307697799304 * y * z * (3 * xx - yy),
            0.9461746957575601 * x * y * (7 * zz - 1),
            0.6690465435572892 * y * z * (7 * zz - 3),
            0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
            0.6690465435572892 * x * z * (7 * zz - 3),
            0.47308734787878004 * (xx - yy) * (7 * zz - 1),
            1.7701307697799304 * x * z * (xx - 3 * yy),
            0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


def sh_out_dim(levels: int = 4) -> int:
    return levels**2


# =============================== frequency ==================================
def frequency_encode(
    x: Array, pe_dim: int, include_input: bool = True, use_pi: bool = False
) -> Array:
    """NeRF positional encoding: [x?, cos(x*2^k), sin(x*2^k)] per channel.

    Matches the reference torch fallback ordering: for each input channel the
    L cosine bands come first, then the L sine bands (encodings.py:436-443).
    Returns (..., D * (2*pe_dim + include_input)).
    """
    bands = (2.0 ** jnp.arange(pe_dim, dtype=x.dtype))
    xin = x * (math.pi if use_pi else 1.0)
    xe = xin[..., None] * bands  # (..., D, L)
    pe = jnp.concatenate([jnp.cos(xe), jnp.sin(xe)], axis=-1)
    pe = pe.reshape(*x.shape[:-1], -1)
    if include_input:
        return jnp.concatenate([x, pe], axis=-1)
    return pe


def frequency_out_dim(in_dim: int, pe_dim: int, include_input: bool = True) -> int:
    return in_dim * (2 * pe_dim + (1 if include_input else 0))


# =============================== hash grid ==================================
@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static hyperparameters of an Instant-NGP multiresolution hash grid."""

    levels: int = 16
    min_res: int = 16
    max_res: int = 4096
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-3
    interpolation: str = "Linear"  # Nearest | Linear | Smoothstep
    # TPU fast path: one uint32 gather per corner carrying both bf16 features
    # (tcnn-fp16-equivalent precision; ~2x fewer gathers). F must be 2.
    packed: bool = False
    # tiny-cuda-nn GridEncoding layout compatibility (for checkpoints the
    # reference trained with implementation="tcnn", encodings.py:229-251):
    # per-level scale = min_res * growth^l - 1 with the 0.5 sample offset,
    # resolution = ceil(scale) + 1, and COARSE levels (res^3 <= 2^S) indexed
    # DENSELY (x + y*res + z*res^2) instead of hashed — exactly tcnn
    # grid.h::grid_index. Off (default) = the reference's torch-fallback
    # layout: floor(min_res * growth^l) scaling, every level hashed.
    tcnn_layout: bool = False

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.levels <= 1:
            return 1.0
        return math.exp(
            (math.log(self.max_res) - math.log(self.min_res)) / (self.levels - 1)
        )

    def level_scales(self) -> np.ndarray:
        """Float per-level sampling scales (what x in [0,1] multiplies).

        floor layout: the integer resolution itself (reference fallback,
        encodings.py:331-381). tcnn layout: min_res * growth^l - 1 in f32,
        mirroring tcnn grid.h::grid_scale (exp2f of the level-scaled log)."""
        ls = np.arange(self.levels, dtype=np.float32)
        if self.tcnn_layout:
            g = np.float32(math.log2(self.growth_factor))
            return (np.exp2(ls * g, dtype=np.float32)
                    * np.float32(self.min_res) - np.float32(1.0))
        return np.floor(
            self.min_res * (self.growth_factor**ls)
        ).astype(np.float32)

    def level_resolutions(self) -> np.ndarray:
        """Integer per-level vertex-lattice resolutions."""
        if self.tcnn_layout:
            # tcnn grid.h::grid_resolution: ceil(scale) + 1
            return (np.ceil(self.level_scales()) + 1).astype(np.int32)
        ls = np.arange(self.levels, dtype=np.float32)
        return np.floor(self.min_res * (self.growth_factor**ls)).astype(np.int32)

    def level_dense_mask(self) -> np.ndarray:
        """(L,) bool: levels stored densely (tcnn layout only) — a level is
        dense iff its full lattice fits the hash table (res^3 <= 2^S)."""
        if not self.tcnn_layout:
            return np.zeros(self.levels, bool)
        res = self.level_resolutions().astype(np.int64)
        return (res**3) <= np.int64(self.table_size)


def hash_grid_init(key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32) -> Array:
    """Hash table parameter, uniform(-1, 1) * hash_init_scale.

    Shape (levels * 2^log2_hashmap_size, features_per_level) — one contiguous
    slab per level, level-major, matching the reference layout.
    """
    total = cfg.table_size * cfg.levels
    return (
        jax.random.uniform(key, (total, cfg.features_per_level), dtype=dtype) * 2.0
        - 1.0
    ) * cfg.hash_init_scale


def _hash3(ix: Array, iy: Array, iz: Array, log2_size: int) -> Array:
    """Prime-XOR spatial hash in uint32, bit-exact with the int64 reference."""
    h = (
        ix.astype(jnp.uint32) * _HASH_PRIMES[0]
        ^ iy.astype(jnp.uint32) * _HASH_PRIMES[1]
        ^ iz.astype(jnp.uint32) * _HASH_PRIMES[2]
    )
    return (h & jnp.uint32(2**log2_size - 1)).astype(jnp.int32)


def _grid_index3(ix: Array, iy: Array, iz: Array, cfg: HashGridConfig) -> Array:
    """Slab-relative row index for integer lattice coords with a trailing
    level axis broadcastable against (L,). floor layout hashes every level;
    tcnn layout indexes dense coarse levels linearly (x fastest — the
    dim-major stride accumulation of tcnn grid.h::grid_index) and hashes the
    rest with the same primes mod 2^S."""
    h = _hash3(ix, iy, iz, cfg.log2_hashmap_size)
    if not cfg.tcnn_layout:
        return h
    res = jnp.asarray(cfg.level_resolutions(), jnp.int32)  # (L,)
    dense = jnp.asarray(cfg.level_dense_mask())  # (L,)
    lin = ix + iy * res + iz * res * res
    return jnp.where(dense, lin, h)


def tcnn_param_layout(cfg: HashGridConfig):
    """Per-level (rows_used, padded_size, offset) of a tcnn GridEncoding
    param blob (offsets in ENTRIES, not floats): params_in_level =
    next_multiple(min(res^3, 2^S), 8), accumulated level-major. Used by the
    checkpoint importer; requires cfg.tcnn_layout."""
    assert cfg.tcnn_layout, "tcnn_param_layout needs tcnn_layout resolutions"
    res = cfg.level_resolutions().astype(np.int64)
    rows = np.minimum(res**3, np.int64(cfg.table_size))
    padded = -(-rows // 8) * 8
    offsets = np.concatenate([[0], np.cumsum(padded)[:-1]])
    return rows, padded, offsets


def hash_grid_encode(table: Array, x01: Array, cfg: HashGridConfig) -> Array:
    """Encode points in [0,1]^3 -> (..., levels * features_per_level).

    Exact jnp transliteration of the reference fallback math
    (encodings.py:331-381); XLA fuses the interpolation arithmetic, and the
    gathers hit the TPU gather unit. Differentiable w.r.t. `table`.
    """
    assert x01.shape[-1] == 3
    L, F = cfg.levels, cfg.features_per_level
    scale = jnp.asarray(cfg.level_scales(), dtype=x01.dtype)  # (L,)
    level_offsets = (jnp.arange(L, dtype=jnp.int32) * cfg.table_size)  # (L,)

    scaled = x01[..., None, :] * scale[:, None]  # (..., L, 3)
    if cfg.tcnn_layout:
        scaled = scaled + 0.5  # tcnn grid.h: pos = fma(scale, x, 0.5)

    mode = cfg.interpolation or "Linear"
    if mode == "Nearest":
        if cfg.tcnn_layout:
            raise NotImplementedError(
                "Nearest interpolation is not supported with tcnn_layout"
            )
        idx = jnp.round(scaled).astype(jnp.int32)
        h = _hash3(idx[..., 0], idx[..., 1], idx[..., 2], cfg.log2_hashmap_size)
        feats = jnp.take(table, h + level_offsets, axis=0)  # (..., L, F)
        return feats.reshape(*x01.shape[:-1], L * F)

    floor = jnp.floor(scaled)
    frac = scaled - floor
    fl = floor.astype(jnp.int32)
    ce = fl + 1
    if cfg.tcnn_layout:
        # keep corners on the lattice so dense linear indices stay in-level
        # (tcnn assumes x in [0,1); identical for such inputs)
        res_i = jnp.asarray(cfg.level_resolutions(), jnp.int32)  # (L,)
        fl = jnp.clip(fl, 0, res_i[:, None] - 1)
        ce = jnp.clip(ce, 0, res_i[:, None] - 1)

    def corner(cx, cy, cz):
        h = _grid_index3(cx, cy, cz, cfg)
        return jnp.take(table, h + level_offsets, axis=0)  # (..., L, F)

    f000 = corner(fl[..., 0], fl[..., 1], fl[..., 2])
    f001 = corner(fl[..., 0], fl[..., 1], ce[..., 2])
    f010 = corner(fl[..., 0], ce[..., 1], fl[..., 2])
    f011 = corner(fl[..., 0], ce[..., 1], ce[..., 2])
    f100 = corner(ce[..., 0], fl[..., 1], fl[..., 2])
    f101 = corner(ce[..., 0], fl[..., 1], ce[..., 2])
    f110 = corner(ce[..., 0], ce[..., 1], fl[..., 2])
    f111 = corner(ce[..., 0], ce[..., 1], ce[..., 2])

    wx = frac[..., 0:1]
    wy = frac[..., 1:2]
    wz = frac[..., 2:3]
    if mode == "Smoothstep":
        wx = wx * wx * (3 - 2 * wx)
        wy = wy * wy * (3 - 2 * wy)
        wz = wz * wz * (3 - 2 * wz)

    c00 = f000 * (1 - wx) + f100 * wx
    c01 = f001 * (1 - wx) + f101 * wx
    c10 = f010 * (1 - wx) + f110 * wx
    c11 = f011 * (1 - wx) + f111 * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    feats = c0 * (1 - wz) + c1 * wz  # (..., L, F)
    return feats.reshape(*x01.shape[:-1], L * F)


# 8 trilinear corner offsets in (x, y, z), corner-major
_CORNERS = np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=np.int32,
)  # (8, 3)


def _corner_sum_matrix(L: int, F: int, f: int, dtype=np.float32) -> np.ndarray:
    """(L*8, L*F) selector: column l*F+f sums the 8 corners of level l.

    Turns the per-level corner reduction into one MXU matmul with both
    operand trailing dims lane-sized, instead of a (..., L, 8) reduce whose
    size-8 trailing axis XLA pads 16x to the 128 lane width.
    """
    S = np.zeros((L * 8, L * F), dtype)
    for level in range(L):
        S[level * 8 : (level + 1) * 8, level * F + f] = 1.0
    return S


def hash_grid_encode_fused(
    table: Array,
    x01: Array,
    cfg: HashGridConfig,
    compute_dtype=None,
) -> Array:
    """TPU-optimized hash encode, mathematically identical to
    hash_grid_encode (up to fp reassociation) but laid out for the TPU
    memory system:

      - Every large intermediate is (N, L*8) — the trailing axis is the
        flattened level x corner product (128 lanes exactly at the default
        L=16), so nothing gets the catastrophic 16x lane padding a trailing
        8 would (a 768MB corner tensor padding to 12GB is what this avoids).
      - Index math runs per axis, so no (..., 8, 3) coordinate tensors exist.
      - Per-feature column gathers from the table, with in-bounds promise
        (indices are masked to the table by construction), so XLA emits no
        bounds-check predicate tensors.
      - The trilinear corner reduction is one (N, L*8) @ (L*8, L*F) matmul
        on the MXU per feature, emitting the final (N, L*F) directly in the
        reference's level-major feature order.

    `compute_dtype` (e.g. bfloat16) selects the post-gather math precision;
    indices/weights are always derived in fp32. Only 'Linear' and
    'Smoothstep' interpolation (the hot paths) are supported here;
    'Nearest' falls back to the reference implementation.
    """
    assert x01.shape[-1] == 3
    L, F = cfg.levels, cfg.features_per_level
    mode = cfg.interpolation or "Linear"
    if mode == "Nearest":
        return hash_grid_encode(table, x01, cfg)

    lead = x01.shape[:-1]
    # shared per-axis index/weight math, (N, L*8) lane-aligned (see below)
    idx, w = _encode_indices_weights(x01, cfg)

    cdt = compute_dtype or table.dtype
    out = None
    for f in range(F):
        col = jax.lax.slice_in_dim(table, f, f + 1, axis=1)[:, 0]  # (T*L,)
        feats = row_gather(col, idx)  # (N, L*8)
        p = (w * feats).astype(cdt)
        S = jnp.asarray(_corner_sum_matrix(L, F, f), cdt)
        contrib = jax.lax.dot(p, S, precision=None,
                              preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    out_dtype = compute_dtype if compute_dtype is not None else table.dtype
    return out.astype(out_dtype).reshape(*lead, L * F)


# ===================== packed-pair gather (TPU fast path) ====================
# TPU random-gather throughput is issue-rate bound (~10^8 elements/s measured
# on v5e, independent of table size or element width). With F=2 features per
# level the dominant cost is therefore the NUMBER of gathered elements, not
# bytes. Packing both features of a table entry into ONE uint32 (2 x bf16)
# halves the gather count — the same precision trade tiny-cuda-nn makes with
# its fp16 tables. Positions get no gradient here (rays are not learnable
# anywhere in the system); the table gradient is an explicit scatter-add.


def _encode_indices_weights(x01: Array, cfg: HashGridConfig):
    """Shared index/weight computation, (N, L*8) lane-aligned layouts."""
    L = cfg.levels
    x = x01.reshape(-1, 3).astype(jnp.float32)
    scale = jnp.asarray(cfg.level_scales(), dtype=jnp.float32)
    level_offsets = (jnp.arange(L, dtype=jnp.uint32)
                     * jnp.uint32(cfg.table_size))
    mask = jnp.uint32(2**cfg.log2_hashmap_size - 1)
    mode = cfg.interpolation or "Linear"
    tc = cfg.tcnn_layout
    if tc:
        res_i = jnp.asarray(cfg.level_resolutions(), jnp.int32)  # (L,)
        dense = jnp.asarray(cfg.level_dense_mask())  # (L,)

    coords, hashed, fracs = [], [], []
    for a in range(3):
        s = x[:, a : a + 1] * scale[None, :]
        if tc:
            s = s + 0.5  # tcnn grid.h: pos = fma(scale, x, 0.5)
        fl = jnp.floor(s)
        fr = s - fl
        if mode == "Smoothstep":
            fr = fr * fr * (3.0 - 2.0 * fr)
        fracs.append(fr)
        c0 = fl.astype(jnp.int32)
        c1 = c0 + 1
        if tc:
            c0 = jnp.clip(c0, 0, res_i[None, :] - 1)
            c1 = jnp.clip(c1, 0, res_i[None, :] - 1)
        coords.append((c0, c1))
        hashed.append((c0.astype(jnp.uint32) * _HASH_PRIMES[a],
                       c1.astype(jnp.uint32) * _HASH_PRIMES[a]))

    idx_cols, w_cols = [], []
    for bx, by, bz in _CORNERS:
        h = hashed[0][bx] ^ hashed[1][by] ^ hashed[2][bz]
        rel = (h & mask).astype(jnp.int32)
        if tc:
            lin = (coords[0][bx] + coords[1][by] * res_i[None, :]
                   + coords[2][bz] * res_i[None, :] * res_i[None, :])
            rel = jnp.where(dense[None, :], lin, rel)
        idx_cols.append(rel + level_offsets.astype(jnp.int32))
        wx = fracs[0] if bx else (1.0 - fracs[0])
        wy = fracs[1] if by else (1.0 - fracs[1])
        wz = fracs[2] if bz else (1.0 - fracs[2])
        w_cols.append(wx * wy * wz)
    idx = jnp.stack(idx_cols, axis=-1).reshape(-1, L * 8)
    w = jnp.stack(w_cols, axis=-1).reshape(-1, L * 8)
    return idx, w


def pack_table_pairs(table: Array) -> Array:
    """(T, 2) float table -> (T,) uint32 of two bf16s (hi=f0, lo=f1)."""
    tb = table.astype(jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(tb[:, 0], jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(tb[:, 1], jnp.uint16).astype(jnp.uint32)
    return (hi << 16) | lo


def _unpack_pairs(g: Array):
    """uint32 (N, C) -> (f0, f1) bf16 arrays of the same shape."""
    hi = jax.lax.bitcast_convert_type((g >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type((g & 0xFFFF).astype(jnp.uint16),
                                      jnp.bfloat16)
    return hi, lo


def _packed_encode_fwd_impl(table: Array, x01: Array, cfg: HashGridConfig):
    L, F = cfg.levels, cfg.features_per_level
    assert F == 2, "packed gather requires features_per_level == 2"
    idx, w = _encode_indices_weights(x01, cfg)
    packed = pack_table_pairs(table)
    g = row_gather(packed, idx)  # ONE gather for both feats
    f0, f1 = _unpack_pairs(g)
    wb = w.astype(jnp.bfloat16)
    S0 = jnp.asarray(_corner_sum_matrix(L, F, 0), jnp.bfloat16)
    S1 = jnp.asarray(_corner_sum_matrix(L, F, 1), jnp.bfloat16)
    out = jax.lax.dot(wb * f0, S0, preferred_element_type=jnp.float32)
    out = out + jax.lax.dot(wb * f1, S1, preferred_element_type=jnp.float32)
    return out, (idx, w)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_grid_encode_packed(table: Array, x01: Array, cfg: HashGridConfig):
    """Hash encode with ONE uint32 gather per corner (both bf16 features).

    ~2x fewer gathered elements than hash_grid_encode_fused on the forward
    pass; table values are read at bf16 precision (tcnn-fp16-equivalent).
    Gradients flow to `table` only (explicit scatter-add); positions are
    treated as constants — correct for this system, where sample positions
    are ray geometry, never parameters.
    Returns (..., L * 2) float32.
    """
    out, _ = _packed_encode_fwd_impl(table, x01, cfg)
    return out.reshape(*x01.shape[:-1], cfg.levels * 2)


def _packed_fwd(table, x01, cfg):
    out, (idx, w) = _packed_encode_fwd_impl(table, x01, cfg)
    return out.reshape(*x01.shape[:-1], cfg.levels * 2), (idx, w, table.shape)


def _packed_bwd(cfg, res, dout):
    idx, w, tshape = res
    L, F = cfg.levels, cfg.features_per_level
    g = dout.reshape(-1, L * F).astype(jnp.float32)
    S0 = jnp.asarray(_corner_sum_matrix(L, F, 0), jnp.float32)
    S1 = jnp.asarray(_corner_sum_matrix(L, F, 1), jnp.float32)
    # d(w*f_k) = dout @ S_k^T  -> per-corner contribution, times w
    d0 = jax.lax.dot(g, S0.T, preferred_element_type=jnp.float32) * w
    d1 = jax.lax.dot(g, S1.T, preferred_element_type=jnp.float32) * w
    dt0 = jnp.zeros(tshape[0], jnp.float32).at[idx].add(
        d0, mode="promise_in_bounds")
    dt1 = jnp.zeros(tshape[0], jnp.float32).at[idx].add(
        d1, mode="promise_in_bounds")
    dtable = jnp.stack([dt0, dt1], axis=-1)
    return dtable, jnp.zeros((*dout.shape[:-1], 3), jnp.float32)


hash_grid_encode_packed.defvjp(_packed_fwd, _packed_bwd)
