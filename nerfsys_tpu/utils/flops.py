"""FLOPs accounting and MFU for nerfsys_tpu training/rendering steps.

The reference reports only wall-clock telemetry
(/root/reference/adaptive_nerf/pipelines/offline_stage/meta_train_step.py:185-253);
throughput-vs-hardware accounting is a TPU-build addition: FLOPs come from
XLA's own cost model on the compiled executable (counts every fused op, so
matmuls dominate but elementwise work is included; encoder gathers are
memory transactions and carry ~no FLOPs), and MFU divides by the chip's
peak matmul throughput.

Peak numbers (public spec sheets):
  TPU v5e: 197 TFLOP/s bf16, ~99 TFLOP/s fp32 (MXU at half rate for f32)
"""
from __future__ import annotations

from typing import Optional

V5E_PEAK_BF16 = 1.97e14
V5E_PEAK_F32 = 0.985e14


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs per call of a jitted function, from XLA cost analysis.

    Returns None when the backend does not expose a cost model (some
    plugin backends); callers should then fall back to an analytic count.
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0] if costs else None
        if not costs:
            return None
        f = costs.get("flops")
        return float(f) if f else None
    except Exception:
        return None


def mfu(flops_per_step: float, step_seconds: float,
        peak_flops: float = V5E_PEAK_BF16) -> float:
    """Model FLOPs utilization in [0, 1]."""
    if step_seconds <= 0 or flops_per_step <= 0:
        return 0.0
    return flops_per_step / step_seconds / peak_flops


def analytic_train_step_flops(
    *,
    num_experts: int,
    tasks_per_expert: int,
    support_rays: int,
    query_rays: int,
    inner_iter: int,
    ray_samples: int,
    hidden: int = 64,
    sigma_depth: int = 2,
    color_hidden: int = 64,
    color_depth: int = 2,
    geo_feat_dim: int = 15,
    enc_dim: int = 48,  # planes L3 F8 -> 3 planes x 8 feats x ... flattened
    dir_dim: int = 16,  # SH degree 4
    algo: str = "fomaml",
) -> float:
    """Matmul-only analytic FLOPs for one meta outer step (lower bound).

    Counts the expert MLP GEMMs per sampled point (sigma trunk + color
    head), x3 for forward+backward (bwd ~ 2x fwd), x inner loop over
    support + one query pass + outer grad. Encoder gathers are excluded
    (transaction-bound, ~0 FLOPs); the one-hot-matmul table-gradient VJP
    is NOT counted, so real device FLOPs are somewhat higher. NOTE:
    compiled_flops (XLA cost analysis) counts while/scan loop BODIES once
    rather than per iteration, so under the lax.map expert loop it
    undercounts ~K x inner_iter — take the max of the two.
    """
    # per-point MLP matmul FLOPs (2*m*n per GEMM row)
    sigma_in = enc_dim
    f = 2 * sigma_in * hidden + 2 * hidden * hidden * max(sigma_depth - 1, 0)
    f += 2 * hidden * (1 + geo_feat_dim)  # heads
    cin = geo_feat_dim + dir_dim
    f += 2 * cin * color_hidden
    f += 2 * color_hidden * color_hidden * max(color_depth - 1, 0)
    f += 2 * color_hidden * 3
    per_point_fwd = float(f)

    pts_support = support_rays * ray_samples
    pts_query = query_rays * ray_samples
    # fwd + bwd (2x fwd) = 3x per differentiated pass
    inner = inner_iter * pts_support * per_point_fwd * 3
    query = pts_query * per_point_fwd * 3
    if algo == "maml":
        # second order: query grads differentiate through the inner scan;
        # remat roughly doubles the inner compute
        inner *= 2
    return num_experts * tasks_per_expert * (inner + query)
