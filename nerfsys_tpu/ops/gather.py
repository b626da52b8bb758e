"""Shared row-gather primitive with a vmap-collapsing batching rule.

Used by every table-lookup hot path (plane/line encoder, hash grid,
occupancy queries). See the rule below for why this exists: XLA's default
vmap batching of gathers is ~1.7x slower on TPU than collapsing the batch
axis into the row axis of a flat gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


# --------------------------- row_gather primitive -----------------------------
# table (R, F) row gather at idx (...,) -> (..., F), as a first-class JAX
# primitive. The point is the BATCHING rule: under vmap (stacked per-expert
# tables (K, R, F) + per-expert indices) XLA's default rule emits a gather
# with a leading batch dimension, which falls off the TPU fast-gather path
# (measured 1.72x slower at K=4 — the dominant cost of the vmapped-expert
# meta-train step). The rule below collapses the batch into the row axis:
# ONE flat gather into the (K*R, F) concatenated table with k*R offsets —
# the exact shape class of the unbatched gather. JVP/transpose rules make it
# differentiable (transpose = scatter-add; only exercised by the plain
# autodiff path, matmul_bwd=False — the custom VJPs never differentiate
# through it).
from jax import core as _jcore  # noqa: E402
from jax.interpreters import ad as _ad  # noqa: E402
from jax.interpreters import batching as _batching  # noqa: E402
from jax.interpreters import mlir as _mlir  # noqa: E402

try:  # jax >= 0.4.31 moved Primitive to jax.extend.core
    from jax.extend.core import Primitive as _Primitive
except ImportError:  # pragma: no cover
    _Primitive = _jcore.Primitive

_row_gather_p = _Primitive("nerfsys_row_gather")


def _row_gather_impl(table, idx):
    return table.at[idx].get(mode="promise_in_bounds")


def row_gather(table: Array, idx: Array) -> Array:
    return _row_gather_p.bind(table, idx)


from jax._src import dispatch as _dispatch  # noqa: E402

_row_gather_p.def_impl(
    functools.partial(_dispatch.apply_primitive, _row_gather_p)
)


@_row_gather_p.def_abstract_eval
def _row_gather_abs(table, idx):
    return _jcore.ShapedArray(idx.shape + table.shape[1:], table.dtype)


_mlir.register_lowering(
    _row_gather_p, _mlir.lower_fun(_row_gather_impl, multiple_results=False)
)


def _row_gather_jvp(primals, tangents):
    table, idx = primals
    dt, _ = tangents
    out = _row_gather_p.bind(table, idx)
    if type(dt) is _ad.Zero:
        return out, _ad.Zero.from_primal_value(out)
    return out, _row_gather_p.bind(dt, idx)


_ad.primitive_jvps[_row_gather_p] = _row_gather_jvp


def _row_gather_transpose(ct, table, idx):
    assert _ad.is_undefined_primal(table)
    if type(ct) is _ad.Zero:
        return _ad.Zero(table.aval), None
    g = jnp.zeros(table.aval.shape, table.aval.dtype).at[idx].add(ct)
    return g, None


_ad.primitive_transposes[_row_gather_p] = _row_gather_transpose


def _row_gather_batch(args, dims):
    table, idx = args
    tb, ib = dims
    if tb is None and ib is None:
        return _row_gather_p.bind(table, idx), None
    if tb is not None and tb != 0:
        table = jnp.moveaxis(table, tb, 0)
    if ib is not None and ib != 0:
        idx = jnp.moveaxis(idx, ib, 0)
    if tb is not None and ib is not None:
        K, R = table.shape[0], table.shape[1]
        flat = table.reshape(K * R, *table.shape[2:])
        off = jnp.arange(K, dtype=idx.dtype).reshape(
            (K,) + (1,) * (idx.ndim - 1)
        ) * R
        out = _row_gather_p.bind(flat, (idx + off).reshape(-1))
        return out.reshape(*idx.shape, *table.shape[2:]), 0
    if ib is not None:  # shared table, batched indices: already fast
        out = _row_gather_p.bind(table, idx.reshape(-1))
        return out.reshape(*idx.shape, *table.shape[1:]), 0
    # batched table, shared indices
    return jnp.take(table, idx, axis=1), 0


_batching.primitive_batchers[_row_gather_p] = _row_gather_batch
