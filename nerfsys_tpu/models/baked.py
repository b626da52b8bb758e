"""Baked snapshot renderer: the trained MoE field resampled into ONE dense
spherical-harmonics radiance grid, for serving-rate novel-view rendering.

No reference analogue (psklavos1/NeRF-Sys always evaluates the full field);
this exceeds it on the render-latency axis. The design is the TPU reading of
the PlenOctree/SNeRG baking recipe: precompute per-cell (sigma, SH radiance
coefficients) once, then a frame costs only trilinear grid lookups + the
standard compositor — no hash/plane gathers, no MLPs, no expert routing.

Why it is fast on a v5e: random gathers are TRANSACTION-rate bound
(~1.1-1.4e8 rows/s, independent of row width up to the 128-lane tile —
BASELINE.md encoding economics). The live field costs K x 18 gather rows per
sample point plus probe rows; the baked grid packs a cell's ENTIRE payload
(sigma + 3 x B SH coefficients, and its +z neighbor's too) into one table
row, so a trilinear sample is exactly FOUR row gathers (the 2x2 (x, y)
corner block; each row carries both z corners — the same overlap-packing
trick as ops/planes.packed_corners). At 32 samples/ray that is 128 rows/ray
vs 2944 for the occ-32 live MoE render (BASELINE.md render ladder).

View dependence is kept through the SH basis (degree levels-1, exact for
radiance that is low-degree in direction; aerial scenes are near-diffuse).
Geometry is resolution-limited by the bake grid — an approximation stated
honestly; A/B the PSNR before trusting a resolution.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    container_apply_multidir,
    container_bg_fn,
)
from nerfsys_tpu.ops.encodings import sh_encode
from nerfsys_tpu.ops.gather import row_gather
from nerfsys_tpu.ops.volrend import (
    background_rgb,
    stratified_t_vals,
    t_to_points,
    volume_render,
)

Array = jax.Array


@dataclass(frozen=True)
class BakedConfig:
    resolution: int = 256  # cells per axis over the global aabb
    sh_levels: int = 3  # SH degree + 1 (3 -> 9 bases; 2 -> 4; 1 -> diffuse)
    n_dirs: int = 32  # directions sampled per cell for the SH projection
    chunk_cells: int = 131072  # field-eval chunk during baking
    dtype: str = "bfloat16"  # table dtype (payload bandwidth, not accuracy-
    # critical: compositing runs in f32 after the gather)
    corner_pack: int = 0  # corners packed per table row: 2 (z-pairs, 4
    # gathers/point), 4 ((y,z) blocks, 2 gathers), 8 (full 2x2x2 block,
    # ONE gather). 0 = auto: 8 unless the table would exceed
    # auto_pack_budget_gb, then 4, then 2. Measured serve ladder at 800²/32
    # samples, 128³ (2026-08-20 /tmp/r6_layout.log): pack2-unpadded 3.65
    # s/frame -> pack2 1.34 -> pack4 0.84 -> pack8 0.62 — gathers are
    # TRANSACTION-bound, so fewer-but-wider rows win as long as each block
    # stays on the fast-width path; memory scales with corner_pack.
    auto_pack_budget_gb: float = 5.0  # auto mode's table-size ceiling
    # (v5e has 16 GB HBM; leave room for chunk temporaries + params)
    sparse_block: int = 0  # 0 = dense table; else compact the table into
    # alive blocks of sparse_block³ cells (compact_baked): blocks whose rows
    # are ALL exactly zero collapse onto one shared zero block, an int32
    # indirection grid maps block -> compacted slot, and queries pay one
    # extra FAST-WIDTH gather (the slots of a 4³ super-block pack into one
    # 64-wide index row; the in-row select is a one-hot VPU dot, never a
    # vectorized int index). Bit-exact by construction at ANY alive
    # fraction; table memory scales with the alive fraction, which is what
    # makes 256³ pack-8 (8.6 GB dense) and 512³ grids servable. Pairs best
    # with corner_pack=8 (one payload row per query -> one indirection);
    # pack 4/2 pay 2/4 indirections.

    def __post_init__(self):
        if int(self.n_dirs) < self.n_bases:
            raise ValueError(
                f"BakedConfig: n_dirs={self.n_dirs} < n_bases="
                f"{self.n_bases} (sh_levels={self.sh_levels}) makes the SH "
                "least-squares projection YᵀY singular — raise n_dirs to at "
                "least sh_levels², or lower sh_levels."
            )
        if int(self.corner_pack) not in (0, 2, 4, 8):
            raise ValueError(
                f"BakedConfig: corner_pack={self.corner_pack} — must be "
                "0 (auto), 2, 4, or 8"
            )
        if int(self.sparse_block) < 0 or int(self.sparse_block) == 1:
            raise ValueError(
                f"BakedConfig: sparse_block={self.sparse_block} — must be "
                "0 (dense) or a block edge >= 2"
            )
        if self.sparse_block and self.resolution % self.sparse_block:
            raise ValueError(
                f"BakedConfig: sparse_block={self.sparse_block} must divide "
                f"resolution={self.resolution}"
            )

    @property
    def n_bases(self) -> int:
        return int(self.sh_levels) ** 2

    @property
    def channels(self) -> int:
        return 1 + 3 * self.n_bases  # sigma + SH coefs per color channel

    @property
    def padded_channels(self) -> int:
        """Per-corner block width in the table, padded so the row hits
        the v5e gather fast path: measured (2026-08-20 width sweep, 2^21-row
        bf16 tables) rows of >= 64 elements gather at ~105-109M rows/s while
        56-wide rows run at 39.5M and the SH-3 table's natural 2x28 = 56
        layout was exactly that slow width — the whole 3.6 s/frame serve
        wall. Pad each block to a multiple of 8 with 2 blocks >= 64 total
        (zeros; sliced away after the corner lerps, exactness unchanged)."""
        return max(32, -(-self.channels // 8) * 8)

    def resolved_pack(self, resolution: Optional[int] = None) -> int:
        """corner_pack with auto (0) resolved against the table budget."""
        pack = int(self.corner_pack)
        if pack:
            return pack
        R = int(self.resolution if resolution is None else resolution)
        bytes_per = np.dtype(self.dtype).itemsize
        for pack in (8, 4):
            gb = R ** 3 * pack * self.padded_channels * bytes_per / 1e9
            if gb <= float(self.auto_pack_budget_gb):
                return pack
        return 2

    @property
    def row_width(self) -> int:
        return self.resolved_pack() * self.padded_channels


def _fibonacci_sphere(n: int) -> np.ndarray:
    """(n, 3) roughly uniform unit directions (deterministic)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)], axis=-1,
    ).astype(np.float32)


def sh_projection_matrix(levels: int, dirs: np.ndarray) -> np.ndarray:
    """(B, M) least-squares projector: coefs = P @ rgb_at_dirs.

    Solves min_C || Y C - RGB ||² over the M sampled directions
    (P = (YᵀY)⁻¹ Yᵀ with Y the (M, B) SH design matrix) — exact recovery
    whenever the radiance truly is degree < levels in the view direction
    (tests/test_baked.py pins this)."""
    Y = np.asarray(sh_encode(jnp.asarray(dirs), levels=levels))  # (M, B)
    return np.linalg.solve(Y.T @ Y, Y.T).astype(np.float32)  # (B, M)


_SUPER = 4  # blocks per super-block axis in the packed index rows (4³ = 64
# int32 slots per row — the index gather rides the >= 64-element fast-width
# path that the payload table itself needs; see BakedConfig.padded_channels)


def _compact_np(table: np.ndarray, bcfg: BakedConfig):
    """Block-compact an (R³, W) table: (compacted_table, block_index).

    Blocks of sparse_block³ x-major rows whose entries are ALL exactly zero
    collapse onto the reserved all-zero block at slot 0; alive blocks keep
    their rows contiguously at slot 1..n. block_index rows pack the slots of
    a 4³ super-block of blocks ((dx, dy, dz) lexicographic, zero-padded past
    Rb), so resolving a query's slot costs ONE fast-width int32 gather plus
    a one-hot in-row select on the VPU (TPU has no vectorized in-row int
    indexing fast path). Gathering the zero block reproduces the zero rows
    bit-for-bit, so compaction is exact for ANY table — it only ever wins
    space where dead blocks exist (occ-baked grids zero them wholesale)."""
    B = int(bcfg.sparse_block)
    R = int(bcfg.resolution)
    Rb = R // B
    W = table.shape[1]
    t6 = table.reshape(Rb, B, Rb, B, Rb, B, W)
    alive = t6.any(axis=(1, 3, 5, 6))  # (Rb, Rb, Rb), no big temporary
    alive_ids = np.nonzero(alive.reshape(-1))[0]
    n_alive = int(alive_ids.size)

    slots = np.zeros(Rb**3, np.int32)  # dead blocks -> the zero block
    slots[alive_ids] = 1 + np.arange(n_alive, dtype=np.int32)
    comp = np.zeros(((n_alive + 1) * B**3, W), table.dtype)
    for s, bid in enumerate(alive_ids):
        bx = int(bid) // (Rb * Rb)
        by = (int(bid) // Rb) % Rb
        bz = int(bid) % Rb
        comp[(s + 1) * B**3:(s + 2) * B**3] = (
            t6[bx, :, by, :, bz, :, :].reshape(B**3, W))

    S = _SUPER
    Rbs = -(-Rb // S)
    padded = np.zeros((Rbs * S, Rbs * S, Rbs * S), np.int32)
    padded[:Rb, :Rb, :Rb] = slots.reshape(Rb, Rb, Rb)
    block_index = (padded.reshape(Rbs, S, Rbs, S, Rbs, S)
                   .transpose(0, 2, 4, 1, 3, 5)
                   .reshape(Rbs**3, S**3))
    return comp, np.ascontiguousarray(block_index)


def compact_baked(baked: Dict, bcfg: BakedConfig) -> Dict:
    """Dense baked dict -> block-sparse baked dict (exact; see _compact_np).

    bcfg.sparse_block selects the block edge and MUST also be set on the
    bcfg used at render time — baked_trilerp dispatches on the
    "block_index" key and refuses a config mismatch."""
    if not bcfg.sparse_block:
        raise ValueError("compact_baked: bcfg.sparse_block is 0 (dense)")
    if "block_index" in baked:
        return baked
    comp, block_index = _compact_np(np.asarray(baked["table"]), bcfg)
    out = dict(baked)
    out["table"] = device_put_chunked(comp)
    out["block_index"] = jnp.asarray(block_index)
    return out


def _pack_sparse_from_vals(vals_t: np.ndarray, R: int, bcfg: BakedConfig,
                           pack: int):
    """Corner-pack + block-compact WITHOUT materializing the dense packed
    table: (compacted_table, block_index), bit-identical to packing the
    dense (R³, pack·Cp) table and running _compact_np on it
    (tests/test_baked.py parity test).

    The dense route peaks at R³·pack·Cp table bytes on the host — 68.7 GB
    at 512³ pack-8 SH-3, which (plus the shifted-copy temporaries) does
    not fit the 125 GB host for mostly-alive scenes and wastes minutes of
    memcpy for sparse ones. Here only ALIVE blocks' rows are ever built:
    a packed row is nonzero iff any of its pack corner payloads is, so
    block aliveness comes from a forward-dilated nonzero mask over vals
    (one bool array), and each alive block assembles its B³ rows from a
    (B+1)³ clamped halo slice of vals. vals_t must already be in the
    TABLE dtype — aliveness must see post-cast zeros (a sub-bf16-normal
    f32 value flushes to 0.0 in the table; testing pre-cast would keep a
    block the dense path drops)."""
    B = int(bcfg.sparse_block)
    Rb = R // B
    C = vals_t.shape[-1]
    Cp = bcfg.padded_channels
    W = pack * Cp
    v4 = vals_t.reshape(R, R, R, C)

    # per-ROW nonzero mask: row (x,y,z) carries the payloads of its pack
    # forward corners, so it is nonzero iff any corner cell is — a forward
    # max-dilation of the per-cell mask along each packed axis (clamped:
    # the packing clamps neighbor indices at R-1)
    rnz = v4.any(axis=-1)
    packed_axes = ([0, 1, 2] if pack == 8
                   else [1, 2] if pack == 4 else [2])
    for ax in packed_axes:
        idx = [slice(None)] * 3
        idx[ax] = np.r_[1:R, R - 1]  # x+1 clamped at the boundary
        rnz = rnz | rnz[tuple(idx)]
    alive = rnz.reshape(Rb, B, Rb, B, Rb, B).any(axis=(1, 3, 5))
    alive_ids = np.nonzero(alive.reshape(-1))[0]
    n_alive = int(alive_ids.size)

    slots = np.zeros(Rb**3, np.int32)
    slots[alive_ids] = 1 + np.arange(n_alive, dtype=np.int32)

    deltas = [(dx, dy, dz)
              for dx in range(2 if pack == 8 else 1)
              for dy in range(2 if pack >= 4 else 1)
              for dz in range(2)]
    comp = np.zeros(((n_alive + 1) * B**3, W), vals_t.dtype)
    rows = np.empty((B, B, B, W), vals_t.dtype)
    sub = np.zeros((B + 1, B + 1, B + 1, Cp), vals_t.dtype)
    for s, bid in enumerate(alive_ids):
        bx = int(bid) // (Rb * Rb)
        by = (int(bid) // Rb) % Rb
        bz = int(bid) % Rb
        xs = np.minimum(np.arange(bx * B, bx * B + B + 1), R - 1)
        ys = np.minimum(np.arange(by * B, by * B + B + 1), R - 1)
        zs = np.minimum(np.arange(bz * B, bz * B + B + 1), R - 1)
        sub[..., :C] = v4[np.ix_(xs, ys, zs)]
        for bi, (dx, dy, dz) in enumerate(deltas):
            rows[..., bi * Cp:(bi + 1) * Cp] = (
                sub[dx:dx + B, dy:dy + B, dz:dz + B])
        comp[(s + 1) * B**3:(s + 2) * B**3] = rows.reshape(B**3, W)

    S = _SUPER
    Rbs = -(-Rb // S)
    padded = np.zeros((Rbs * S, Rbs * S, Rbs * S), np.int32)
    padded[:Rb, :Rb, :Rb] = slots.reshape(Rb, Rb, Rb)
    block_index = (padded.reshape(Rbs, S, Rbs, S, Rbs, S)
                   .transpose(0, 2, 4, 1, 3, 5)
                   .reshape(Rbs**3, S**3))
    return comp, np.ascontiguousarray(block_index)


def _np_dilate3(mask: np.ndarray) -> np.ndarray:
    """One 3³ max-pool pass over an (R, R, R) bool mask (host numpy)."""
    R = mask.shape[0]
    p = np.pad(mask, 1, constant_values=False)
    out = np.zeros_like(mask)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                out |= p[dx:dx + R, dy:dy + R, dz:dz + R]
    return out


def device_put_chunked(arr: np.ndarray, max_bytes: int = 1 << 28):
    """Push a big host array to device in bounded slices.

    One monolithic host->device transfer of a multi-GB baked table can
    stall indefinitely on a tunneled transport (observed: an 8.29 GB
    jnp.asarray frozen for 55 min with IO counters flat, BASELINE.md
    K=16 row). Bounded slices keep every RPC small, make progress
    observable, and — via buffer donation — keep peak device memory at
    table + one slice. Each slice lands with lax.dynamic_update_slice
    into a donated table buffer; the last (ragged) slice is written
    separately so only two programs ever compile.
    """
    a = np.ascontiguousarray(arr)
    row_bytes = max(1, a.nbytes // max(1, a.shape[0]))
    rows = max(1, int(max_bytes) // row_bytes)
    if a.shape[0] <= rows:
        return jnp.asarray(a)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("n",))
    def _write(tbl, chunk, start, n):
        del n  # static: distinguishes full-slice vs ragged-tail programs
        zeros = (jnp.int32(0),) * (a.ndim - 1)
        return jax.lax.dynamic_update_slice(tbl, chunk, (start,) + zeros)

    tbl = jnp.zeros(a.shape, dtype=a.dtype)
    for i, s in enumerate(range(0, a.shape[0], rows)):
        e = min(s + rows, a.shape[0])
        tbl = _write(tbl, jnp.asarray(a[s:e]), jnp.int32(s), n=e - s)
        if i % 8 == 7:  # bound the outstanding-transfer queue (axon:
            np.asarray(tbl[:1, ..., :1])  # block_until_ready is a no-op)
    return tbl


def bake_field(
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    bcfg: BakedConfig = BakedConfig(),
    *,
    aabb: Optional[Array] = None,
    occ_state: Optional[Dict] = None,
    occ_dilate: int = 2,
) -> Dict:
    """Resample the routed container field into a baked grid.

    Returns {"table": (R*R*R, 2*C) dtype, "aabb": (2,3) f32, plus static
    metadata} — row ((x*R)+y)*R+z packs cell (x,y,z) AND (x,y,z+1) (z+1
    clamped at the boundary), so a trilinear query needs one row per (x,y)
    corner. One-time cost: R³ x n_dirs field evaluations, chunked.

    With `occ_state` (a trained, ready occupancy state — models/occupancy),
    only cells marked alive under ANY expert's binary grid are evaluated;
    dead cells get all-zero rows (sigma 0) without touching the field. The
    alive mask is dilated `occ_dilate` passes in BAKE-grid space first
    (trilinear queries read 1-cell neighborhoods, and the occ grid's
    resolution differs from the bake's — the margin keeps the skip
    conservative). This matches the HARD-mask live render's zeroing
    semantics, so soft-trained checkpoints trade the soft pdf-floor's
    unmarked-space radiance for the bake-cost cut — A/B before trusting
    (BASELINE.md). The occ probe itself is cheap: one binary row gather per
    cell per expert vs n_dirs field evaluations saved per dead cell.
    """
    R = int(bcfg.resolution)
    C = bcfg.channels
    box = statics.global_aabb if aabb is None else jnp.asarray(aabb)
    lo, hi = box[0], box[1]
    h = (hi - lo) / R

    dirs = _fibonacci_sphere(bcfg.n_dirs)
    proj = jnp.asarray(sh_projection_matrix(bcfg.sh_levels, dirs))  # (B, M)
    dirs_j = jnp.asarray(dirs)

    # cell-center lattice, flattened x-major to match the row indexing
    idx = jnp.arange(R, dtype=jnp.float32) + 0.5
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    centers = (lo[None, :]
               + jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * h[None, :])

    @jax.jit
    def eval_chunk(pts):  # (c, 3) -> (c, C) f32
        n = pts.shape[0]
        # position-heavy work (encoder gathers, sigma trunk, routing) runs
        # once; only the color head sweeps the M directions — measured
        # 1119 s -> ~1/M-of-encoder scaling for the 256³ x 32-dir bake
        rgb_m, sigma = container_apply_multidir(
            params, cfg, statics, pts, dirs_j
        )  # (M, c, 3), (c,)
        rgb_m = jnp.clip(rgb_m, 0.0, 1.0)
        sigma = jnp.maximum(sigma, 0.0)
        coefs = jnp.einsum("bm,mcr->cbr", proj, rgb_m)  # (c, B, 3)
        return jnp.concatenate([sigma[:, None], coefs.reshape(n, -1)], 1)

    n_cells = R * R * R
    centers_np = np.asarray(centers, np.float32)

    alive_idx = None
    if occ_state is not None:
        from nerfsys_tpu.models.occupancy import occ_ready, union_binary_fn

        if not bool(occ_ready(occ_state)):
            print("[bake] occ_state not ready (warmup incomplete) — "
                  "baking dense")
        else:
            qfn = jax.jit(union_binary_fn(occ_state, statics))
            qchunk = min(1 << 20, n_cells)
            qpad = (-n_cells) % qchunk
            qpts = centers_np
            if qpad:
                qpts = np.concatenate(
                    [qpts, np.zeros((qpad, 3), np.float32)], 0)
            alive_np = np.empty(qpts.shape[0], bool)
            for i in range(0, qpts.shape[0], qchunk):
                alive_np[i:i + qchunk] = np.asarray(
                    qfn(jnp.asarray(qpts[i:i + qchunk])))
            alive = alive_np[:n_cells].reshape(R, R, R)
            for _ in range(max(int(occ_dilate), 0)):
                alive = _np_dilate3(alive)
            alive_idx = np.nonzero(alive.reshape(-1))[0]
            print(f"[bake] occ skip: {alive_idx.size}/{n_cells} cells alive "
                  f"({100.0 * alive_idx.size / n_cells:.1f}%, "
                  f"dilate={occ_dilate})")

    # HOST loop over chunks, one bounded jitted program per chunk, forced
    # to completion via the host transfer (np.asarray): a single fused
    # R³ x n_dirs program runs minutes on-device, and long/dangling
    # executions crash the axon TPU worker (CLAUDE.md). The transfer also
    # IS the sync — block_until_ready does not block under axon.
    if alive_idx is None:
        eval_pts = centers_np  # (R³, 3)
    else:
        eval_pts = centers_np[alive_idx]  # (n_alive, 3)
    n_eval = eval_pts.shape[0]
    chunk = max(1, min(int(bcfg.chunk_cells), n_eval))
    pad = (-n_eval) % chunk
    if pad:
        eval_pts = np.concatenate(
            [eval_pts, np.zeros((pad, 3), np.float32)], 0)
    out_np = np.empty((eval_pts.shape[0], C), np.float32)
    for i in range(0, eval_pts.shape[0], chunk):
        out_np[i:i + chunk] = np.asarray(
            eval_chunk(jnp.asarray(eval_pts[i:i + chunk])))
    if alive_idx is None:
        vals = out_np[:n_cells]  # (R³, C) f32
    else:
        vals = np.zeros((n_cells, C), np.float32)
        vals[alive_idx] = out_np[:n_eval]

    # overlapping corner blocks: row (x, y, z) carries the payloads of
    # corner_pack cells of its forward 2x2x2 neighborhood (neighbors
    # clamped at the boundary), each block zero-padded to padded_channels
    # so every row sits on the gather fast path. pack 2 -> [z, z+1]
    # (4 gathers/query); pack 4 -> (y, z) block (2 gathers); pack 8 ->
    # the full corner block (ONE gather). Block order is (dx, dy, dz)
    # lexicographic — baked_query's lerp tree indexes it that way.
    pack = bcfg.resolved_pack(R)
    Cp = bcfg.padded_channels
    out = {
        "aabb": jnp.stack([lo, hi]).astype(jnp.float32),
        "corner_pack": pack,
    }
    if bcfg.sparse_block:
        # memory-lean sparse packing on the HOST (before any device
        # transfer): only alive blocks' rows are ever built — the dense
        # packed table (68.7 GB at 512³ pack-8) never materializes.
        # Cast vals to the table dtype FIRST so aliveness sees post-cast
        # zeros (bit-parity with dense-then-compact; _pack_sparse_from_vals)
        vals_t = vals.astype(np.dtype(bcfg.dtype))
        del vals
        comp, block_index = _pack_sparse_from_vals(vals_t, R, bcfg, pack)
        nb = comp.shape[0] // int(bcfg.sparse_block) ** 3 - 1
        total = (R // int(bcfg.sparse_block)) ** 3
        dense_gb = n_cells * pack * Cp * comp.dtype.itemsize / 1e9
        print(f"[bake] sparse pack: {nb}/{total} blocks alive "
              f"({100.0 * nb / total:.1f}%), table "
              f"{comp.nbytes / 1e9:.2f} GB (dense {dense_gb:.2f})")
        out["table"] = device_put_chunked(comp)
        out["block_index"] = jnp.asarray(block_index)
        return out

    g = vals.reshape(R, R, R, C)
    if Cp != C:
        g = np.concatenate(
            [g, np.zeros((R, R, R, Cp - C), np.float32)], axis=-1)

    # fill block-by-block in the target dtype (a 256³ pack-8 table is
    # 8.6 GB bf16 — never materialize a second f32 copy on the 1-core host)
    deltas = [(dx, dy, dz)
              for dx in range(2 if pack == 8 else 1)
              for dy in range(2 if pack >= 4 else 1)
              for dz in range(2)]
    clamped = np.minimum(np.arange(1, R + 1), R - 1)
    table = np.empty((R, R, R, pack * Cp), dtype=np.dtype(bcfg.dtype))
    for bi, (dx, dy, dz) in enumerate(deltas):
        b = g
        if dz:
            b = b.take(clamped, axis=2)
        if dy:
            b = b.take(clamped, axis=1)
        if dx:
            b = b.take(clamped, axis=0)
        table[..., bi * Cp:(bi + 1) * Cp] = b
    out["table"] = device_put_chunked(table.reshape(n_cells, pack * Cp))
    return out


def params_fingerprint(params) -> str:
    """Cheap deterministic fingerprint of a params pytree (shape signature
    + float checksums + strided byte samples) — keys the baked-snapshot
    cache to the weights it was baked from. Not cryptographic, but the
    byte samples make it order-sensitive: two checkpoints whose leaves
    differ only by a row permutation (identical sums) no longer collide
    (ADVICE r4)."""
    import hashlib

    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(params)[0],
        key=lambda kv: str(kv[0]),
    ):
        a = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        if a.size:
            af = a.astype(np.float64)
            h.update(np.float64(np.abs(af).sum()).tobytes())
            h.update(np.float64(af.sum()).tobytes())
            raw = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
            h.update(raw[:4096].tobytes())
            if raw.size > 4096:
                h.update(raw[:: max(1, raw.size // 1024)].tobytes())
    return h.hexdigest()[:16]


def occ_bake_fingerprint(occ_state: Optional[Dict], occ_dilate: int) -> str:
    """Digest of the occ-bake inputs ('' when occ baking is off): the
    dilate count plus the binary grids' bytes. Part of the snapshot cache
    key — re-running the same checkpoint with occ baking toggled or a
    different dilate must MISS the cache, not silently serve a snapshot
    baked under different dead-cell zeroing (ADVICE r4)."""
    if occ_state is None:
        return ""
    import hashlib

    h = hashlib.sha256()
    h.update(str(int(occ_dilate)).encode())
    h.update(np.asarray(occ_state["binary"]).tobytes())
    return "occ:" + h.hexdigest()[:16]


def _norm_npz_path(path) -> str:
    """np.savez appends '.npz' when the extension is absent — normalize so
    load_baked probes the path savez actually wrote (ADVICE r4)."""
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"


def save_baked(path, baked: Dict, bcfg: BakedConfig, *,
               fingerprint: str = "", occ_key: str = "") -> None:
    """Persist a baked snapshot (.npz): bake minutes ONCE, serve seconds
    every restart. Stores the table/aabb/(block_index) plus the BakedConfig
    fields, an optional params fingerprint, and the occ-bake input key
    (occ_bake_fingerprint) for load-time validation."""
    import dataclasses
    import json

    import ml_dtypes

    arrays, dtypes = {}, {}
    for k in ("table", "aabb", "block_index"):
        if k not in baked:
            continue
        a = np.asarray(baked[k])
        dtypes[k] = str(a.dtype)
        if a.dtype == ml_dtypes.bfloat16:
            a = a.view(np.uint16)  # npz cannot roundtrip bf16 directly
        arrays[k] = a
    meta = {"bcfg": dataclasses.asdict(bcfg),
            "corner_pack": int(baked["corner_pack"]),
            "dtypes": dtypes,
            "fingerprint": fingerprint,
            "occ_key": occ_key}
    np.savez(_norm_npz_path(path), __meta__=json.dumps(meta), **arrays)


def load_baked(path, bcfg: BakedConfig, *,
               fingerprint: str = "", occ_key: str = "") -> Optional[Dict]:
    """Load a snapshot saved by save_baked, or None (with a visible
    reason) when the file is absent or was baked under a different
    BakedConfig / params fingerprint / occ-bake inputs — a stale cache
    must never silently serve wrong geometry."""
    import dataclasses
    import json
    import os

    path = _norm_npz_path(path)
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    want = dataclasses.asdict(bcfg)
    if meta["bcfg"] != want:
        print(f"[baked] cache {path} ignored: BakedConfig mismatch "
              f"(cached {meta['bcfg']} != requested {want})")
        return None
    if fingerprint and meta.get("fingerprint") \
            and meta["fingerprint"] != fingerprint:
        print(f"[baked] cache {path} ignored: params fingerprint mismatch "
              "(checkpoint changed since the bake)")
        return None
    if meta.get("occ_key", "") != occ_key:
        print(f"[baked] cache {path} ignored: occ-bake input mismatch "
              f"(cached {meta.get('occ_key', '')!r} != requested "
              f"{occ_key!r} — occ toggle/dilate/grids changed since the "
              "bake)")
        return None
    import ml_dtypes

    def arr(k):
        a = z[k]
        if meta.get("dtypes", {}).get(k) == "bfloat16":
            a = a.view(ml_dtypes.bfloat16)
        return device_put_chunked(a) if k == "table" else jnp.asarray(a)

    out = {"table": arr("table"), "aabb": arr("aabb"),
           "corner_pack": int(meta["corner_pack"])}
    if "block_index" in z:
        out["block_index"] = arr("block_index")
    return out


def baked_trilerp(baked: Dict, bcfg: BakedConfig, pts: Array) -> Array:
    """Trilinear payload (N, C) at pts (N, 3) — 8/corner_pack row gathers.

    The table rows carry corner_pack corners of the forward 2x2x2
    neighborhood (bake_field packing), each block padded to the
    fast-gather width; the lerp tree consumes blocks in (dx, dy, dz)
    lexicographic order and slices the pad off once at the end. Measured
    serve ladder (v5e, 2026-08-20): one wide gather per point beats four
    narrow ones 5.9x — gathers are transaction-bound, not bandwidth-bound."""
    R = int(bcfg.resolution)
    C = bcfg.channels
    Cp = bcfg.padded_channels
    table = baked["table"]
    # the pack is implied by the (static) row width — never read the
    # "corner_pack" dict entry here: the baked dict is threaded through
    # jit as an ARGUMENT, so its non-array leaves arrive as tracers
    pack = int(table.shape[1]) // Cp
    lo, hi = baked["aabb"][0], baked["aabb"][1]
    h = (hi - lo) / R

    sparse = "block_index" in baked  # dict STRUCTURE — static under jit
    if sparse != bool(bcfg.sparse_block):
        raise ValueError(
            "baked_trilerp: baked dict sparsity does not match "
            f"bcfg.sparse_block={bcfg.sparse_block} — bake and render must "
            "share the BakedConfig")
    if sparse:
        Bs = int(bcfg.sparse_block)
        S = _SUPER
        Rbs = -(-(R // Bs) // S)
        idx_tab = baked["block_index"]
        sel = jnp.arange(S**3, dtype=jnp.int32)

        def row_of(jx, jy, jz):
            # block -> compacted slot via ONE fast-width index gather +
            # a one-hot in-row select (no vectorized in-row int indexing
            # on TPU); dead blocks resolve to the reserved zero block
            bx, by, bz = jx // Bs, jy // Bs, jz // Bs
            sid = ((bx // S) * Rbs + (by // S)) * Rbs + (bz // S)
            srow = row_gather(idx_tab, sid)  # (N, S³) int32
            sub = ((bx % S) * S + (by % S)) * S + (bz % S)
            slot = jnp.sum(
                jnp.where(sub[:, None] == sel[None, :], srow, 0), axis=1)
            return slot * (Bs**3) + (((jx % Bs) * Bs + (jy % Bs)) * Bs
                                     + (jz % Bs))
    else:
        def row_of(jx, jy, jz):
            return (jx * R + jy) * R + jz

    # cell-center coordinates; clamp so forward neighbors stay in-row
    g = (pts - lo) / h - 0.5
    g = jnp.clip(g, 0.0, R - 1.000001)
    f = jnp.floor(g)
    w = (g - f).astype(jnp.float32)
    ix = f[:, 0].astype(jnp.int32)
    iy = f[:, 1].astype(jnp.int32)
    iz = f[:, 2].astype(jnp.int32)
    wx, wy, wz = w[:, 0:1], w[:, 1:2], w[:, 2:3]

    if pack == 8:
        r = row_gather(table, row_of(ix, iy, iz)).astype(jnp.float32)

        def blk(i):
            return r[:, i * Cp:(i + 1) * Cp]

        x0 = ((blk(0) * (1 - wz) + blk(1) * wz) * (1 - wy)
              + (blk(2) * (1 - wz) + blk(3) * wz) * wy)
        x1 = ((blk(4) * (1 - wz) + blk(5) * wz) * (1 - wy)
              + (blk(6) * (1 - wz) + blk(7) * wz) * wy)
        val = x0 * (1 - wx) + x1 * wx
    elif pack == 4:
        ix1 = jnp.minimum(ix + 1, R - 1)

        def row4(jx):  # one gather: the (y, z) corner block of column jx
            r = row_gather(table, row_of(jx, iy, iz))
            r = r.astype(jnp.float32)
            z0 = r[:, 0 * Cp:1 * Cp] * (1 - wz) + r[:, 1 * Cp:2 * Cp] * wz
            z1 = r[:, 2 * Cp:3 * Cp] * (1 - wz) + r[:, 3 * Cp:4 * Cp] * wz
            return z0 * (1 - wy) + z1 * wy

        val = row4(ix) * (1 - wx) + row4(ix1) * wx
    else:
        ix1 = jnp.minimum(ix + 1, R - 1)
        iy1 = jnp.minimum(iy + 1, R - 1)

        def row2(jx, jy):  # one gather: both z corners of column (jx, jy)
            r = row_gather(table, row_of(jx, jy, iz))
            r = r.astype(jnp.float32)
            return r[:, :Cp] * (1.0 - wz) + r[:, Cp:] * wz

        val = (
            row2(ix, iy) * (1 - wx) * (1 - wy)
            + row2(ix1, iy) * wx * (1 - wy)
            + row2(ix, iy1) * (1 - wx) * wy
            + row2(ix1, iy1) * wx * wy
        )
    return val[:, :C]


def baked_query(
    baked: Dict, bcfg: BakedConfig, pts: Array, dirs: Array
) -> Tuple[Array, Array]:
    """Trilinear (sigma, rgb) at pts (N,3) viewed along dirs (N,3)."""
    B = bcfg.n_bases
    val = baked_trilerp(baked, bcfg, pts)
    sigma = jnp.maximum(val[:, 0], 0.0)
    sh = sh_encode(dirs, levels=int(bcfg.sh_levels))  # (N, B)
    rgb = jnp.einsum("nb,nbc->nc", sh, val[:, 1:].reshape(-1, B, 3))
    return jnp.clip(rgb, 0.0, 1.0), sigma


def render_rays_baked(
    baked: Dict,
    bcfg: BakedConfig,
    rays: Array,  # (N, 8)
    n_samples: int,
    key: Optional[jax.Array] = None,
    *,
    randomized: bool = False,
    bg_policy: str = "white",
    bg_fn=None,  # dirs (N,3) -> (N,3): the checkpoint's bg MLP, optional
) -> Tuple[Array, Array, Array, Array]:
    """Stratified render over the baked grid (rgb, depth, weights, acc).

    Same validity/background semantics as render_rays_stratified; the field
    is the baked snapshot instead of the live container."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n_rays = o.shape[0]
    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    near_s = jnp.where(valid, near, 0.0)
    far_s = jnp.where(valid, far, 1.0)

    skey = bkey = None
    if key is not None:
        skey, bkey = jax.random.split(key)
    t_vals = stratified_t_vals(skey, near_s, far_s, n_samples, randomized)
    pts = t_to_points(o, d, t_vals)
    B = bcfg.n_bases
    val = baked_trilerp(baked, bcfg, pts.reshape(-1, 3))
    val = val.reshape(n_rays, n_samples, -1)
    sigma = jnp.where(valid[:, None], jnp.maximum(val[..., 0], 0.0), 0.0)
    # view direction is constant along a ray: evaluate the SH basis once
    # per RAY, not per sample (n_samples x less VPU work than the
    # per-point baked_query path; measured 0.25 s of the 800²/32 frame)
    sh = sh_encode(d, levels=int(bcfg.sh_levels))  # (n_rays, B)
    rgb = jnp.einsum("nb,nsbc->nsc", sh,
                     val[..., 1:].reshape(n_rays, n_samples, B, 3))
    rgb = jnp.clip(rgb, 0.0, 1.0)

    if bg_fn is not None:
        bg = bg_fn(d)
    else:
        bg = background_rgb(bg_policy, n_rays, key=bkey,
                            last_sample_rgb=rgb[:, -1, :], dtype=rgb.dtype)
    rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
    return volume_render(rgb_sigma, t_vals, bg_rgb=bg)


def make_baked_camera_renderer(
    baked: Dict,
    bcfg: BakedConfig,
    cfg: ContainerConfig,
    *,
    H: int,
    W: int,
    ray_samples: int,
    chunk_rays: int = 65536,
    scene_aabb: Optional[np.ndarray] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    near_override: Optional[float] = None,
    far_override: Optional[float] = None,
    near_bias: float = 0.0,  # video near shift, applied on device
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    fog_stats: bool = False,  # append (wmax, entropy) before map_outputs
    out_u8: bool = True,
    invalid_black: bool = False,
    map_outputs=None,
):
    """Serving-path frame renderer over the snapshot:
    (params, statics, c2w (3,4), intrinsics (4,)) -> (H, W, 3) uint8
    (or f32 rgb + (H, W) depth/acc with out_u8=False).

    The whole frame's host<->device traffic is ~20 floats up and the u8
    image down: rays generate on device (ops/rays.frame_chunk_rays) and
    the tonemap fuses into the render program (at 800² the host-ray path
    ships 20 MB of rays up + 13 MB f32 down through the axon tunnel).
    NOTE the 2026-08-19 theory that this transfer was the 3.6 s frame
    wall was WRONG — the wall was the slow-width table gather (56-wide
    rows; see BakedConfig.padded_channels / BASELINE.md 2026-08-20);
    the IO cut stands on its own as the serving shape. All chunks
    dispatch before the first fetch, so compute overlaps the readbacks.
    One compiled program serves every chunk AND every camera
    (start/c2w/intrinsics are traced; H/W/chunk shape are static).
    """
    from nerfsys_tpu.ops.scene_box import SceneBox

    sb = None
    if scene_aabb is not None:
        sb = SceneBox(jnp.asarray(scene_aabb, jnp.float32))
    elif near is None or far is None:
        raise ValueError("provide scene_aabb or scalar near/far")

    def chunk_fn(baked_arg, params, statics, c2w, intr, start, *extra):
        # raygen + near-bias + output shaping are the SAME code the live
        # camera renderer runs (runtime_adapt helpers) — the two serving
        # paths cannot drift semantically
        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            frame_chunk_rays_biased,
            shape_frame_outputs,
        )

        rays = frame_chunk_rays_biased(
            c2w, intr, start, chunk_rays, H, W, scene_box=sb,
            near=near, far=far, near_override=near_override,
            far_override=far_override, near_bias=near_bias,
        )
        bg_fn = container_bg_fn(params, cfg) if use_bg_fn else None
        rgb, depth, weights, acc = render_rays_baked(
            baked_arg, bcfg, rays, ray_samples, bg_policy=bg_policy,
            bg_fn=bg_fn,
        )
        return shape_frame_outputs(
            rays, rgb, depth, weights, acc, *extra, fog_stats=fog_stats,
            invalid_black=invalid_black, map_outputs=map_outputs,
            out_u8=out_u8)

    jitted = jax.jit(chunk_fn)
    n_pix = H * W

    def render(params, statics, c2w, intrinsics, *extra):
        c2w_j = jnp.asarray(np.asarray(c2w, np.float32)[:3, :4])
        intr_j = jnp.asarray(np.asarray(intrinsics, np.float32)[:4])
        # dispatch every chunk before the first fetch (overlap compute
        # with the readbacks)
        pending = [
            jitted(baked, params, statics, c2w_j, intr_j,
                   jnp.asarray(s, jnp.int32), *extra)
            for s in range(0, n_pix, chunk_rays)
        ]
        out = np.concatenate([np.asarray(p) for p in pending], 0)[:n_pix]
        if map_outputs is not None or out_u8:
            return out.reshape(H, W, -1)
        return (out[:, 0:3].reshape(H, W, 3).copy(),
                out[:, 3].reshape(H, W).copy(),
                out[:, 4].reshape(H, W).copy())

    return render


def make_baked_chunk_renderer(
    baked: Dict,
    bcfg: BakedConfig,
    cfg: ContainerConfig,
    *,
    ray_samples: int,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    fog_stats: bool = False,
    map_outputs=None,
    mesh=None,
):
    """Chunk renderer over the snapshot, drop-in for render_image /
    render_rays_chunked: (params, statics, rays (C,8)) -> (rgb, depth, acc)
    (+ per-ray (wmax, entropy) haze signals with fog_stats, so --op video's
    fog suppression works over baked frames too).

    params is consulted only for the learned background MLP (the baked grid
    replaces the field itself).

    `map_outputs(rgb, depth, acc, *extra)` transforms the outputs INSIDE
    the jitted program — the viewer uses it for the fused uint8 tonemap
    (extra per-call traced args, e.g. exposure/gamma scalars, thread
    through the returned callable).

    With a `jax.sharding.Mesh`, the chunk's ray axis shards over the
    mesh's 'data' axis and the table/params/statics replicate (per-ray
    work is communication-free — same scaling story as
    make_chunk_renderer(mesh=...)); chunks are padded to a multiple of
    the data-axis length internally, so any chunk size works.

    The table is threaded as a jit ARGUMENT, never a closure constant: a
    closed-over device array is inlined into the HLO module as a literal,
    and a 256³ SH-3 table is ~2 GB — the axon remote-compile request then
    exceeds the body limit (HTTP 413, measured)."""

    def render_fn(baked_arg, params, statics, rays, *extra):
        bg_fn = container_bg_fn(params, cfg) if use_bg_fn else None
        rgb, depth, weights, acc = render_rays_baked(
            baked_arg, bcfg, rays, ray_samples, bg_policy=bg_policy,
            bg_fn=bg_fn,
        )
        if fog_stats:
            from nerfsys_tpu.pipelines.online.runtime_adapt import _fog_stats

            return (rgb, depth, acc) + _fog_stats(weights)
        if map_outputs is not None:
            return map_outputs(rgb, depth, acc, *extra)
        return rgb, depth, acc

    jitted = jax.jit(render_fn)
    if mesh is None:
        return lambda params, statics, rays, *extra: jitted(
            baked, params, statics, rays, *extra)

    from nerfsys_tpu.parallel.mesh import ray_batch_sharding, replicated

    ray_sh = ray_batch_sharding(mesh)  # P('data', None)
    rep = replicated(mesh)
    data_axis = int(mesh.shape["data"])
    # device_put ONCE per params version (id-keyed like
    # make_chunk_renderer.prepare); the entry pins the params object so
    # its id can't be reused after gc
    rep_cache: Dict = {}

    def render(params, statics, rays, *extra):
        key = id(params)
        if key not in rep_cache:
            rep_cache.clear()
            rep_cache[key] = (
                params,
                jax.device_put(baked, rep),
                jax.device_put(params, rep),
                jax.device_put(statics, rep),
            )
        _, b_rep, p_rep, s_rep = rep_cache[key]
        r = jnp.asarray(rays)
        n = r.shape[0]
        pad = (-n) % data_axis
        if pad:
            r = jnp.concatenate(
                [r, jnp.zeros((pad, r.shape[1]), r.dtype)], axis=0)
        out = jitted(b_rep, p_rep, s_rep, jax.device_put(r, ray_sh), *extra)
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[:n], out)
        return out

    return render
