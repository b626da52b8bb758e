"""Debug diagnostics: per-leaf gradient analysis + tensor health checks.

TPU rebuild of the reference's two hand-rolled debug helpers
(SURVEY.md §5.1):

  - ``analyze_grads`` (reference ``pipelines/offline_stage/meta_core.py:235-294``)
    prints per-layer gradient norms, relative scales vs the parameter
    norms, and a global L2 norm — used to chase inner-loop explosions.
  - ``_tstats`` (reference ``nerfs/ray_rendering.py:633-654``) prints
    min/max/mean/std plus NaN/Inf counts for one tensor.

The torch originals call ``.item()`` per statistic per layer — dozens of
blocking device->host round-trips. Here every reduction for the whole
pytree is computed in ONE jitted program and fetched with a single
transfer; under the axon TPU backend that is the difference between a
debug print and a multi-second stall.

Host-side printing stays outside jit: these helpers take concrete arrays
(e.g. the grads pytree fetched from a train step), not tracers. To inspect
values INSIDE a jitted step, use ``jax.debug.print`` at the call site.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grad_summary", "tstats"]


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover - future jax path types
            parts.append(str(p))
    return "/".join(parts) or "param"


@jax.jit
def _leaf_stats(tree):
    """Per-leaf (norm, mean, std, absmax), stacked to ONE (L, 4) array so
    the host fetch is a single transfer (a per-leaf device_get would be
    one round-trip per leaf — the stall this module exists to avoid)."""
    f32 = lambda x: x.astype(jnp.float32)

    def stats(g):
        if g.size == 0:  # static: zero-size leaf -> all-zero row, not NaN
            return jnp.zeros((4,), jnp.float32)
        return jnp.stack([
            jnp.linalg.norm(f32(g).ravel()),
            jnp.mean(f32(g)),
            jnp.std(f32(g)),
            jnp.max(jnp.abs(f32(g))),
        ])

    return jnp.stack([stats(g) for g in jax.tree_util.tree_leaves(tree)])


def grad_summary(grads, params=None, topk: int = 100,
                 name: str = "inner_loop", verbose: bool = True) -> float:
    """Per-leaf gradient magnitude report; returns the global L2 norm.

    Mirrors the reference ``analyze_grads`` output: global/mean/max grad
    norm, then the top-``topk`` leaves by grad norm with their relative
    scale ``|g| / |p|`` when ``params`` is given.

    Args:
        grads: pytree of gradient arrays (same structure as ``params``).
        params: optional matching pytree of parameters for rel. scales.
        topk: number of leaves in the sorted per-leaf section.
        name: label printed with the summary.
        verbose: set False to skip printing (still returns the norm).
    """
    leaves_with_path = jax.tree_util.tree_flatten_with_path(grads)[0]
    if not leaves_with_path:
        if verbose:
            print(f"[{name}] No valid gradients found.")
        return 0.0

    stat_leaves = np.asarray(jax.device_get(_leaf_stats(grads)))  # (L, 4)
    names = [_leaf_name(p) for p, _ in leaves_with_path]

    param_norms = None
    if params is not None:
        param_norms = np.asarray(jax.device_get(_leaf_stats(params)))[:, 0]

    eps = 1e-12
    rows = []
    for i, (leaf_name, s) in enumerate(zip(names, stat_leaves)):
        gn = float(s[0])
        rel = gn / (param_norms[i] + eps) if param_norms is not None else None
        rows.append({
            "name": leaf_name, "grad_norm": gn, "rel_scale": rel,
            "mean": float(s[1]), "std": float(s[2]), "max": float(s[3]),
        })

    global_norm = float(np.sqrt(sum(r["grad_norm"] ** 2 for r in rows)))
    if verbose:
        print(f"\n[{name}] Gradient Summary:")
        print(f"  Global grad norm: {global_norm:.3e}")
        print(f"  Mean grad norm:   "
              f"{np.mean([r['grad_norm'] for r in rows]):.3e}")
        print(f"  Max grad norm:    "
              f"{np.max([r['grad_norm'] for r in rows]):.3e}")
        print(f"\n  Top-{topk} leaves by grad norm:")
        for r in sorted(rows, key=lambda r: r["grad_norm"], reverse=True)[:topk]:
            rel = f"(rel={r['rel_scale']:.2e})" if r["rel_scale"] is not None else ""
            print(f"   {r['name']:<40} | grad={r['grad_norm']:.3e} {rel}")
    return global_norm


@jax.jit
def _health(x):
    x = x.astype(jnp.float32)
    finite = jnp.isfinite(x)
    big = jnp.where(finite, x, -jnp.inf)
    small = jnp.where(finite, x, jnp.inf)
    masked = jnp.where(finite, x, 0.0)
    n_fin = jnp.sum(finite)
    mean = jnp.sum(masked) / jnp.maximum(n_fin, 1)
    var = jnp.sum(jnp.where(finite, (x - mean) ** 2, 0.0)) / jnp.maximum(n_fin, 1)
    return {
        "min": jnp.min(small), "max": jnp.max(big),
        "mean": mean, "std": jnp.sqrt(jnp.maximum(var, 0.0)),
        "n_finite": n_fin,
        "n_nan": jnp.sum(jnp.isnan(x)),
        "n_inf": jnp.sum(jnp.isinf(x)),
    }


def tstats(x, name: str = "tensor", verbose: bool = True) -> Mapping[str, Any]:
    """Tensor health check (reference ``_tstats``): finite-masked
    min/max/mean/std plus NaN/Inf counts, one device round-trip."""
    x = jnp.asarray(x)
    shape, dtype = tuple(x.shape), x.dtype
    if x.size == 0:
        s = {"min": float("nan"), "max": float("nan"), "mean": float("nan"),
             "std": float("nan"), "n_finite": 0, "n_nan": 0, "n_inf": 0}
    else:
        s = {k: (int(v) if k.startswith("n_") else float(v))
             for k, v in jax.device_get(_health(x)).items()}
    s.update(shape=shape, dtype=str(dtype), n=int(np.prod(shape) if shape else 1))
    if verbose:
        if s["n_finite"] > 0:
            print(
                f"[{name}] shape={shape} dtype={dtype} "
                f"min={s['min']:.4g} max={s['max']:.4g} "
                f"mean={s['mean']:.4g} std={s['std']:.4g} "
                f"finite={s['n_finite']}/{s['n']} "
                f"nan={s['n_nan']} inf={s['n_inf']}"
            )
        else:
            print(f"[{name}] shape={shape} dtype={dtype} "
                  f"ALL NON-FINITE. n={s['n']} nan={s['n_nan']} "
                  f"inf={s['n_inf']}")
    return s
