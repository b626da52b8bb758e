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
import functools
import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.ops.gather import row_gather

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
    # Backward pass strategy. XLA lowers the autodiff table gradient to a
    # scatter-add, which on TPU is issue-rate bound (~1.1e8 elem/s) just like
    # gathers. matmul_bwd=True replaces it with a custom VJP that computes
    # grad_plane = einsum('nu,nv,nf->uvf', Au, Av, g) where Au/Av are the
    # 2-nonzero bilinear weight profiles — dense one-hot contractions that
    # ride the MXU. Position gradients are computed exactly (same math as
    # autodiff), so this is a pure speed knob, not a semantics change.
    matmul_bwd: bool = True
    bwd_chunk: int = 8192  # points per contraction chunk (scan step)
    bwd_dtype: str = "bfloat16"  # contraction dtype: 'bfloat16' | 'float32'
    # Zero-pad the PACKED gather rows to these element counts (0 = natural
    # width: planes 4F, lines 2F). Execution-strategy knobs, not arch keys —
    # the zeros are never read, outputs are bit-identical. Rationale: the
    # 2026-08-20 v5e width sweep found 56-wide bf16 rows gather at ~0.4x
    # the >= 64-element rate; whether the boundary is elements or BYTES
    # decides if the f32 plane rows (4F=32 els = 128 B) and line rows
    # (2F=16 els = 64 B) are affected — measure_perf --mode gather_width
    # prints the matrix, these knobs apply the verdict.
    pad_plane_rows: int = 0
    pad_line_rows: int = 0
    # Hybrid backward OPTION: levels with R >= this threshold compute table
    # grads as a packed-corner scatter-add (one 4F-wide row add per point,
    # folded back with 4 rolls — the forward packing, transposed) instead of
    # the O(R^2 F)-FLOPs/point one-hot contraction. MEASURED on v5e this
    # LOSES: XLA scatter-add with duplicate indices serializes (~7e6 rows/s
    # under vmap vs the contraction's ~127 TFLOP/s; demo-scale bench 26.3k
    # -> 14.9k rays/s with R=512 on the scatter path), so it stays DISABLED
    # (0) by default; kept as a config knob for low-duplicate regimes.
    bwd_scatter_min_res: int = 0
    # pos_grad=False enables the fastest backward: the forward saves the
    # interpolated plane/line values as bf16 residuals so the backward needs
    # NO table re-gathers at all — but gradients w.r.t. the input positions
    # are returned as ZERO. Only set False when positions are not a function
    # of anything being differentiated (true everywhere in this framework:
    # sample positions come from rays/cameras, never from trainable params).
    pos_grad: bool = True
    # Forward gather packing: gathers on TPU are TRANSACTION-rate bound
    # (rows/s, independent of row width up to the 128-lane tile), so the 4
    # bilinear corner rows are fetched as ONE gather from a 4F-wide packed
    # table t4[i] = [t[i], t[i+1], t[i+R], t[i+R+1]] built by rolls each call
    # (bandwidth-trivial). Same trick halves the line gathers. Math identical.
    packed_corners: bool = True
    # Forward LINE lookups as hat-weight MATMULS instead of row gathers.
    # Line tables are tiny (R <= ~512 rows), so the two-nonzero linear-
    # interp stencil (N, R) contracted against the (R, F) table rides the
    # MXU — zero gather transactions, removing 9 of the 18 gather
    # rows/point of the packed L3 encoder. MEASURED on v5e (2026-08-18)
    # this LOSES despite the row reduction: the dot's output is only F=8
    # columns (15/16 of the 128-wide MXU idle) and the removed gathers
    # were overlapping with non-gather work anyway (train utilization was
    # 54-69% of the transaction peak, so gathers were not the sole
    # critical path) — bench 127.0k -> 116.8k rays/s (f32-HIGHEST) /
    # 116.9k (bf16); occ-32 800^2 render 11.4 -> 12.4 s; top1+union
    # render neutral (5.57 vs 5.60 s). Stays DISABLED; kept as the
    # measured record + for hosts where gather issue rate is the real
    # wall. Exact in float32 (precision=HIGHEST); 'bfloat16' quantizes
    # stencil and table operands in the dot (tcnn-fp16-like).
    lines_matmul: bool = False
    lines_mm_dtype: str = "float32"  # 'float32' | 'bfloat16'
    lines_mm_chunk: int = 32768  # points per stencil tile (bounds memory)

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


def _bilinear_rows(
    table: Array, u: Array, v: Array, R: int, packed: bool = False,
    pad_to: int = 0,
) -> Array:
    """Bilinear interpolation over a flattened (R*R, F) grid.

    u, v in [0, R-1] continuous -> (N, F). packed=False: 4 row gathers +
    fused lerp. packed=True: one gather from a 4F-wide corner-packed table
    (gathers are transaction-rate bound; a 4F<=128 row costs one transaction).
    """
    u0f = jnp.floor(jnp.clip(u, 0.0, R - 1 - 1e-6))
    v0f = jnp.floor(jnp.clip(v, 0.0, R - 1 - 1e-6))
    fu = (u - u0f)[:, None]
    fv = (v - v0f)[:, None]
    u0 = u0f.astype(jnp.int32)
    v0 = v0f.astype(jnp.int32)
    base = u0 * R + v0
    if packed:
        # u0 <= R-2 and v0 <= R-2 by the clamp, so the rolled wrap rows
        # (last row / last column pairs) are never addressed
        t4 = jnp.concatenate(
            [table, jnp.roll(table, -1, 0), jnp.roll(table, -R, 0),
             jnp.roll(table, -(R + 1), 0)], axis=-1,
        )
        if pad_to > t4.shape[-1]:
            # widen onto the gather fast path; the zero tail is sliced
            # away below (cfg.pad_plane_rows — bit-exact)
            t4 = jnp.pad(t4, ((0, 0), (0, pad_to - t4.shape[-1])))
        g = row_gather(t4, base)  # (N, >=4F)
        F = table.shape[-1]
        g00, g01, g10, g11 = (g[:, :F], g[:, F:2 * F], g[:, 2 * F:3 * F],
                              g[:, 3 * F:4 * F])  # 4F: exclude any pad tail
    else:
        g00 = row_gather(table, base)
        g01 = row_gather(table, base + 1)
        g10 = row_gather(table, base + R)
        g11 = row_gather(table, base + R + 1)
    return (
        g00 * (1 - fu) * (1 - fv)
        + g01 * (1 - fu) * fv
        + g10 * fu * (1 - fv)
        + g11 * fu * fv
    )


def _linear_rows(
    table: Array, w: Array, R: int, packed: bool = False, pad_to: int = 0
) -> Array:
    """Linear interpolation over a (R, F) line -> (N, F).

    packed=False: 2 row gathers; packed=True: one gather from a 2F-wide
    neighbor-packed table.
    """
    w0f = jnp.floor(jnp.clip(w, 0.0, R - 1 - 1e-6))
    fw = (w - w0f)[:, None]
    w0 = w0f.astype(jnp.int32)
    if packed:
        t2 = jnp.concatenate([table, jnp.roll(table, -1, 0)], axis=-1)
        if pad_to > t2.shape[-1]:
            t2 = jnp.pad(t2, ((0, 0), (0, pad_to - t2.shape[-1])))
        g = row_gather(t2, w0)
        F = table.shape[-1]
        g0, g1 = g[:, :F], g[:, F:2 * F]  # 2F: exclude any pad tail
    else:
        g0 = row_gather(table, w0)
        g1 = row_gather(table, w0 + 1)
    return g0 * (1 - fw) + g1 * fw


def _linear_rows_mm(
    table: Array, w: Array, R: int, cfg: PlaneEncodingConfig
) -> Array:
    """Linear interpolation over a (R, F) line -> (N, F), gather-free.

    The (N, R) two-nonzero interp stencil (`_weight_profile`) is contracted
    against the table on the MXU. Chunked via lax.scan so at most one
    (chunk, R) stencil tile is live; autodiff through the dot yields the
    table gradient as the transposed matmul (no scatter), so this forward
    is also safe on the plain-autodiff path (matmul_bwd=False).
    """
    n = w.shape[0]
    cdtype = (jnp.bfloat16 if cfg.lines_mm_dtype == "bfloat16"
              else jnp.float32)
    if cdtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU DotThunk can't execute bf16 x bf16 -> f32 (see bwd_dtype)
        cdtype = jnp.float32
    chunk = min(cfg.lines_mm_chunk, _round_up(max(n, 1), 128))
    npad = _round_up(max(n, 1), chunk)
    wp = jnp.pad(w, (0, npad - n))
    w0f = jnp.floor(jnp.clip(wp, 0.0, R - 1 - 1e-6))
    fw = wp - w0f
    w0 = w0f.astype(jnp.int32)
    tb = table.astype(cdtype)
    # f32 stencils must multiply in f32 (TPU dots default to bf16 operands)
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None

    # remat: without it, autodiff through the scan (matmul_bwd=False path)
    # saves every (chunk, R) stencil tile as a residual — gigabytes of
    # recomputable data; checkpointing keeps only (w0, fw) per tile and
    # rebuilds the stencil in the backward (grads flow to tb through the
    # closure; the stencil itself is a constant function of w)
    @jax.checkpoint
    def body_fn(w0c, fwc):
        aw = _weight_profile(w0c, fwc, R, cdtype)  # (C, R)
        return jnp.dot(aw, tb, precision=prec,
                       preferred_element_type=jnp.float32)

    _, outs = jax.lax.scan(
        lambda _, s: (None, body_fn(s[0], s[1])), None,
        (w0.reshape(-1, chunk), fw.reshape(-1, chunk))
    )
    return outs.reshape(npad, -1)[:n].astype(table.dtype)


def _plane_encode_parts(params: Dict, x: Array, cfg: PlaneEncodingConfig):
    """Encode pre-flattened (N,3) points -> (out, [bval...], [lval...]).

    bval/lval are the per-(level, orientation) interpolated plane and line
    values whose product forms the output features; they're returned so the
    light backward can save them as residuals (unused ones are DCE'd).
    """
    x = jnp.clip(x, 0.0, 1.0)
    feats, bvals, lvals = [], [], []
    for l, R in enumerate(cfg.level_resolutions()):
        planes_l = params["planes"][l]  # (3, R*R, F)
        lines_l = params.get("lines")
        coords = x * (R - 1)  # (N, 3)
        for o, (a, b, c) in enumerate(_ORIENTATIONS):
            bv = _bilinear_rows(planes_l[o], coords[:, a], coords[:, b], R,
                                packed=cfg.packed_corners,
                                pad_to=int(cfg.pad_plane_rows))
            bvals.append(bv)
            if lines_l is not None:
                if cfg.lines_matmul:
                    lv = _linear_rows_mm(lines_l[l][o], coords[:, c], R, cfg)
                else:
                    lv = _linear_rows(lines_l[l][o], coords[:, c], R,
                                      packed=cfg.packed_corners,
                                      pad_to=int(cfg.pad_line_rows))
                lvals.append(lv)
                feats.append(bv * lv)
            else:
                feats.append(bv)
    return jnp.concatenate(feats, axis=-1), bvals, lvals


def _plane_encode_flat(
    params: Dict, x: Array, cfg: PlaneEncodingConfig
) -> Array:
    """Encode pre-flattened (N, 3) points in [0,1]^3 -> (N, out_dim)."""
    return _plane_encode_parts(params, x, cfg)[0]


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _weight_profile(idx: Array, frac: Array, R: int, cdtype) -> Array:
    """(C,) int cell + (C,) frac -> (C, R) two-nonzero interp-weight rows.

    Row n is zero except columns idx[n] (weight 1-frac[n]) and idx[n]+1
    (weight frac[n]) — the dense one-hot form of the linear interpolation
    stencil, built with vectorized compares (no gather/scatter).
    """
    iota = jnp.arange(R, dtype=jnp.int32)[None, :]
    i = idx[:, None]
    f = frac[:, None]
    prof = jnp.where(iota == i, 1.0 - f, 0.0) + jnp.where(iota == i + 1, f, 0.0)
    return prof.astype(cdtype)


def _scatter_grads_mm(
    u0: Array, fu: Array, v0: Array, fv: Array, gp: Array,
    w0, fw, gl, R: int, chunk: int, cdtype,
):
    """Table gradients as one-hot matmul contractions (chunked lax.scan).

    grad_plane[u*R+v, f] = sum_n Au[n,u] * Av[n,v] * gp[n,f]   ((R*R, F))
    grad_line[w, f]      = sum_n Aw[n,w] * gl[n,f]             ((R, F))

    This is mathematically the scatter-add of the 4 (resp. 2) weighted
    corner contributions per point, computed as dense matmuls on the MXU
    instead of a TPU scatter (which is issue-rate bound at ~1.1e8 elem/s).
    """
    n = gp.shape[0]
    npad = _round_up(max(n, 1), chunk)
    pad = npad - n

    def padded(a, fill=0):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    # zero cotangents on padded rows -> padded points contribute nothing
    xs = {
        "u0": padded(u0).reshape(-1, chunk),
        "fu": padded(fu).reshape(-1, chunk),
        "v0": padded(v0).reshape(-1, chunk),
        "fv": padded(fv).reshape(-1, chunk),
        "gp": padded(gp).reshape(-1, chunk, gp.shape[-1]),
    }
    has_line = gl is not None
    if has_line:
        xs["w0"] = padded(w0).reshape(-1, chunk)
        xs["fw"] = padded(fw).reshape(-1, chunk)
        xs["gl"] = padded(gl).reshape(-1, chunk, gl.shape[-1])

    F = gp.shape[-1]
    acc0 = {"plane": jnp.zeros((R * R, F), jnp.float32)}
    if has_line:
        acc0["line"] = jnp.zeros((R, F), jnp.float32)

    def body(acc, s):
        au = _weight_profile(s["u0"], s["fu"], R, cdtype)  # (C, R)
        av = _weight_profile(s["v0"], s["fv"], R, cdtype)  # (C, R)
        tmp = av[:, :, None] * s["gp"].astype(cdtype)[:, None, :]  # (C,R,F)
        gpl = jnp.einsum(
            "nu,nvf->uvf", au, tmp, preferred_element_type=jnp.float32
        )
        out = {"plane": acc["plane"] + gpl.reshape(R * R, F)}
        if has_line:
            aw = _weight_profile(s["w0"], s["fw"], R, cdtype)
            gln = jnp.einsum(
                "nw,nf->wf", aw, s["gl"].astype(cdtype),
                preferred_element_type=jnp.float32,
            )
            out["line"] = acc["line"] + gln
        return out, None

    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc["plane"], (acc["line"] if has_line else None)


def _scatter_grads_packed(
    u0: Array, fu: Array, v0: Array, fv: Array, gp: Array,
    w0, fw, gl, R: int,
):
    """Table gradients as ONE packed row scatter-add per point.

    The transpose of the packed_corners forward: the 4 weighted corner
    contributions are concatenated into a (N, 4F) row and added at row
    u0*R+v0 of a corner-packed (R*R, 4F) buffer, then folded back onto the
    (R*R, F) grid with 4 rolls (shift +1/+R/+R+1 for the off-corner slots).
    Cost is one scatter transaction per point per table — independent of R,
    beating the O(R^2 F) one-hot contraction for fine levels.

    The fold wraps nothing: the forward clamp guarantees u0, v0 <= R-2, so
    packed rows >= R*R - R - 1 are never written.
    """
    F = gp.shape[-1]
    wu, wv = 1.0 - fu[:, None], 1.0 - fv[:, None]
    fuc, fvc = fu[:, None], fv[:, None]
    g4 = jnp.concatenate(
        [gp * (wu * wv), gp * (wu * fvc), gp * (fuc * wv), gp * (fuc * fvc)],
        axis=-1,
    )  # (N, 4F)
    base = u0 * R + v0
    t4g = jnp.zeros((R * R, 4 * F), jnp.float32)
    t4g = t4g.at[base].add(g4, mode="promise_in_bounds")
    gplane = (
        t4g[:, :F]
        + jnp.roll(t4g[:, F:2 * F], 1, axis=0)
        + jnp.roll(t4g[:, 2 * F:3 * F], R, axis=0)
        + jnp.roll(t4g[:, 3 * F:], R + 1, axis=0)
    )
    gline = None
    if gl is not None:
        g2 = jnp.concatenate(
            [gl * (1.0 - fw[:, None]), gl * fw[:, None]], axis=-1
        )  # (N, 2F)
        t2g = jnp.zeros((R, 2 * F), jnp.float32)
        t2g = t2g.at[w0].add(g2, mode="promise_in_bounds")
        gline = t2g[:, :F] + jnp.roll(t2g[:, F:], 1, axis=0)
    return gplane, gline


def _table_grads(
    cfg: PlaneEncodingConfig,
    u0, fu, v0, fv, gp, w0, fw, gl, R: int, chunk: int, cdtype,
):
    """Dispatch: packed scatter for fine levels, one-hot matmul otherwise."""
    if cfg.bwd_scatter_min_res and R >= cfg.bwd_scatter_min_res:
        return _scatter_grads_packed(u0, fu, v0, fv, gp, w0, fw, gl, R)
    return _scatter_grads_mm(u0, fu, v0, fv, gp, w0, fw, gl, R, chunk, cdtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _plane_encode_mm(params: Dict, x: Array, cfg: PlaneEncodingConfig):
    return _plane_encode_flat(params, x, cfg)


def _plane_encode_mm_fwd(params, x, cfg):
    return _plane_encode_flat(params, x, cfg), (params, x)


def _plane_encode_mm_bwd(cfg: PlaneEncodingConfig, res, ct):
    """Exact VJP of _plane_encode_flat with MXU-friendly table scatters.

    Corner rows are re-gathered here (same cost as one forward pass) rather
    than saved as residuals — keeps memory flat under remat'd inner loops.
    Position gradients use the same piecewise-linear derivative autodiff
    would produce (clip outside [0,1] -> zero grad).
    """
    params, x_raw = res
    x = jnp.clip(x_raw, 0.0, 1.0)
    n = x.shape[0]
    F = cfg.features
    cdtype = jnp.bfloat16 if cfg.bwd_dtype == "bfloat16" else jnp.float32
    if cdtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU DotThunk can't execute bf16 x bf16 -> f32; the bf16 fast path
        # only pays on the MXU anyway.
        cdtype = jnp.float32
    has_lines = "lines" in params

    g_planes, g_lines = [], []
    gx = jnp.zeros((n, 3), jnp.float32)
    ct = ct.astype(jnp.float32)
    for l, R in enumerate(cfg.level_resolutions()):
        chunk = min(cfg.bwd_chunk, _round_up(max(n, 1), 128))
        coords = x * (R - 1)
        cf = jnp.floor(jnp.clip(coords, 0.0, R - 1 - 1e-6))
        frac = coords - cf
        i0 = cf.astype(jnp.int32)
        gp_o, gl_o = [], []
        for o, (a, b, c) in enumerate(_ORIENTATIONS):
            u0, v0 = i0[:, a], i0[:, b]
            fu, fv = frac[:, a][:, None], frac[:, b][:, None]  # (N,1)
            t = params["planes"][l][o]
            base = u0 * R + v0
            g00 = row_gather(t, base)
            g01 = row_gather(t, base + 1)
            g10 = row_gather(t, base + R)
            g11 = row_gather(t, base + R + 1)
            bval = (
                g00 * (1 - fu) * (1 - fv)
                + g01 * (1 - fu) * fv
                + g10 * fu * (1 - fv)
                + g11 * fu * fv
            )
            if has_lines:
                w0 = i0[:, c]
                fw = frac[:, c][:, None]
                ln = params["lines"][l][o]
                l0 = row_gather(ln, w0)
                l1 = row_gather(ln, w0 + 1)
                lval = l0 * (1 - fw) + l1 * fw
            else:
                w0 = fw = None
                lval = None

            g_of = ct[:, (l * 3 + o) * F : (l * 3 + o + 1) * F]  # (N, F)
            gp = g_of * lval if has_lines else g_of  # plane-corner cotangent
            gl = g_of * bval if has_lines else None  # line-node cotangent
            gpl, gln = _table_grads(
                cfg, u0, frac[:, a], v0, frac[:, b], gp, w0,
                frac[:, c] if has_lines else None, gl, R, chunk, cdtype,
            )
            gp_o.append(gpl)
            if has_lines:
                gl_o.append(gln)

            # position gradients (chain: d feat / d frac * (R-1))
            db_dfu = (g10 - g00) * (1 - fv) + (g11 - g01) * fv
            db_dfv = (g01 - g00) * (1 - fu) + (g11 - g10) * fu
            scale = float(R - 1)
            lw = lval if has_lines else 1.0
            gx = gx.at[:, a].add(jnp.sum(g_of * lw * db_dfu, -1) * scale)
            gx = gx.at[:, b].add(jnp.sum(g_of * lw * db_dfv, -1) * scale)
            if has_lines:
                gx = gx.at[:, c].add(
                    jnp.sum(g_of * bval * (l1 - l0), -1) * scale
                )
        g_planes.append(jnp.stack(gp_o).astype(params["planes"][l].dtype))
        if has_lines:
            g_lines.append(jnp.stack(gl_o).astype(params["lines"][l].dtype))

    # clip(x, 0, 1) kills gradients outside [0,1], per coordinate
    inside = (x_raw >= 0.0) & (x_raw <= 1.0)
    gx = jnp.where(inside, gx, 0.0).astype(x_raw.dtype)
    g_params: Dict = {"planes": g_planes}
    if has_lines:
        g_params["lines"] = g_lines
    return g_params, gx


_plane_encode_mm.defvjp(_plane_encode_mm_fwd, _plane_encode_mm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _plane_encode_mm_light(params: Dict, x: Array, cfg: PlaneEncodingConfig):
    return _plane_encode_flat(params, x, cfg)


def _plane_encode_mm_light_fwd(params, x, cfg):
    out, bvals, lvals = _plane_encode_parts(params, x, cfg)
    # dtype tokens: zero-size arrays carrying the table dtypes so the bwd
    # can return cotangents with matching avals without saving the tables
    dt = {
        "planes": [jnp.zeros((0,), p.dtype) for p in params["planes"]],
    }
    if "lines" in params:
        dt["lines"] = [jnp.zeros((0,), p.dtype) for p in params["lines"]]
    res = (
        x,
        [b.astype(jnp.bfloat16) for b in bvals],
        [lv.astype(jnp.bfloat16) for lv in lvals],
        dt,
    )
    return out, res


def _plane_encode_mm_light_bwd(cfg: PlaneEncodingConfig, res, ct):
    """Gather-free VJP: table grads from saved bf16 plane/line values.

    Position gradients are returned as ZERO (see PlaneEncodingConfig.pos_grad)
    — valid whenever positions don't depend on differentiated values.
    """
    x_raw, bvals, lvals, dt = res
    x = jnp.clip(x_raw, 0.0, 1.0)
    n = x.shape[0]
    F = cfg.features
    has_lines = len(lvals) > 0
    cdtype = jnp.bfloat16 if cfg.bwd_dtype == "bfloat16" else jnp.float32
    if cdtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        cdtype = jnp.float32

    ct = ct.astype(jnp.float32)
    g_planes, g_lines = [], []
    for l, R in enumerate(cfg.level_resolutions()):
        chunk = min(cfg.bwd_chunk, _round_up(max(n, 1), 128))
        coords = x * (R - 1)
        cf = jnp.floor(jnp.clip(coords, 0.0, R - 1 - 1e-6))
        frac = coords - cf
        i0 = cf.astype(jnp.int32)
        gp_o, gl_o = [], []
        for o, (a, b, c) in enumerate(_ORIENTATIONS):
            idx = l * 3 + o
            g_of = ct[:, idx * F : (idx + 1) * F]  # (N, F)
            if has_lines:
                gp = g_of * lvals[idx].astype(jnp.float32)
                gl = g_of * bvals[idx].astype(jnp.float32)
            else:
                gp, gl = g_of, None
            gpl, gln = _table_grads(
                cfg, i0[:, a], frac[:, a], i0[:, b], frac[:, b], gp,
                i0[:, c] if has_lines else None,
                frac[:, c] if has_lines else None,
                gl, R, chunk, cdtype,
            )
            gp_o.append(gpl)
            if has_lines:
                gl_o.append(gln)
        g_planes.append(jnp.stack(gp_o).astype(dt["planes"][l].dtype))
        if has_lines:
            g_lines.append(jnp.stack(gl_o).astype(dt["lines"][l].dtype))

    g_params: Dict = {"planes": g_planes}
    if has_lines:
        g_params["lines"] = g_lines
    return g_params, jnp.zeros_like(x_raw)


_plane_encode_mm_light.defvjp(
    _plane_encode_mm_light_fwd, _plane_encode_mm_light_bwd
)


def plane_encode(params: Dict, x01: Array, cfg: PlaneEncodingConfig) -> Array:
    """Encode points in [0,1]^3 -> (..., 3 * levels * features)."""
    assert x01.shape[-1] == 3
    lead = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    if cfg.matmul_bwd and not cfg.pos_grad:
        out = _plane_encode_mm_light(params, x, cfg)
    elif cfg.matmul_bwd:
        out = _plane_encode_mm(params, x, cfg)
    else:
        out = _plane_encode_flat(params, x, cfg)
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
