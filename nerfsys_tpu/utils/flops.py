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

# Measured on this chip (BASELINE.md encoding economics, 2026-08-16):
# random row gathers are TRANSACTION-rate bound at ~1.1-1.4e8 rows/s,
# independent of row width up to the 128-lane tile. For this workload the
# gather issue rate — not the MXU — is the speed-of-light resource, so
# utilization against it is the honest "how close to peak" number.
V5E_GATHER_ROWS_PER_S_LOW = 1.1e8
V5E_GATHER_ROWS_PER_S_HIGH = 1.4e8


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


def analytic_train_step_gather_rows(
    *,
    num_experts: int,
    tasks_per_expert: int,
    support_rays: int,
    query_rays: int,
    inner_iter: int,
    ray_samples: int,
    plane_levels: int = 3,
    packed_corners: bool = True,
    occ_probes: int = 0,  # >0: one cached probe pass per task (CDF hoist)
    occ_levels: int = 1,
    lines_gathered: bool = True,  # False: hat-stencil MXU lines (0 rows)
) -> float:
    """Gather TRANSACTIONS (rows) issued per meta outer step, planes path.

    The bench step's cost is encoder table traffic, and v5e gathers are
    transaction-rate bound (~1.1-1.4e8 rows/s regardless of row width) —
    so rows/step / step_time vs that peak is this program's honest
    utilization number (the MXU-peak MFU is ~0.2% by construction: 64-wide
    MLPs put almost no FLOPs in a step, utils/flops.py module docstring).

    Per point per level the packed VM encoder issues 3 plane + 3 line row
    gathers (ops/planes.py: each 2x2 corner block / 2-corner line is one
    packed wide row); unpacked is 3x4 + 3x2. The matmul-bwd VJP with
    pos_grad=False does ZERO table reads, so only forward passes count:
    inner_iter support passes + one query pass per task (FoMAML; the
    backward recomputation under MAML remat would double the inner rows).
    With occupancy training, each task pays one probe pass over its
    support rays (the CDF is hoisted across inner iterations,
    meta_core.task_adapt): one grid row per probe point regardless of
    grid levels — query_binary/query_values select the finest containing
    level arithmetically and issue ONE gather into the level-concatenated
    table (ops/occupancy._finest_level_index). `occ_levels` is kept for
    signature compatibility; it no longer multiplies rows. Importance
    probing costs the same single row: (binary, value) ride one fused
    2-wide row (query_pair).
    """
    line_r = (3 if packed_corners else 3 * 2) if lines_gathered else 0
    rows_per_point = plane_levels * ((3 if packed_corners else 3 * 4)
                                     + line_r)
    pts = inner_iter * support_rays * ray_samples + query_rays * ray_samples
    rows = pts * rows_per_point
    if occ_probes:
        # one fused row per probe point; support probed once per task (CDF
        # hoisted across inner iterations), query probed once for its pass
        rows += (support_rays + query_rays) * occ_probes
    return float(num_experts * tasks_per_expert * rows)


def analytic_render_gather_rows_per_ray(
    *,
    ray_samples: int,
    num_experts: int,
    experts_evaluated: Optional[int] = None,  # None: dense = all K
    plane_levels: int = 3,
    packed_corners: bool = True,
    occ: bool = False,
    n_probes: int = 128,
    occ_levels: int = 2,
    union_probe: bool = False,
    hard_mask: bool = True,
    probe_grids: Optional[int] = None,
    lines_gathered: bool = True,  # False: hat-stencil MXU lines (0 rows)
) -> float:
    """Gather transactions per rendered ray through the MoE chunk renderer.

    Three components, all transaction-bound on v5e:
      field:  S samples x 18 rows/point (packed planes) x experts evaluated
      probe:  P probes x (1 row with the union grid, else one row per grid
              probed — level-selected arithmetically before the gather,
              ops/occupancy._finest_level_index)
      mask:   S samples x one exact-union row per grid (hard mode masking)
    `occ_levels` is kept for signature compatibility; levels no longer
    multiply rows. This is the sizing model behind --occ_union_probe_res
    (the probe still rivals the field at large K) — measure_perf reports
    it next to the measured frame time.

    `probe_grids` is how many per-expert grids the probe/mask passes touch.
    Default: all K for the full-MoE render, 1 when experts_evaluated says
    single-expert (active_expert renders probe only their own grid). NOTE
    the default is WRONG for bucketed top-E routing: routing narrows the
    FIELD to E experts per point but the per-RAY probe still unions all K
    grids (models/occupancy.union_pair_fn) — pass probe_grids=K there."""
    e = num_experts if experts_evaluated is None else experts_evaluated
    line_r = (3 if packed_corners else 3 * 2) if lines_gathered else 0
    rows_per_point = plane_levels * ((3 if packed_corners else 3 * 4)
                                     + line_r)
    rows = float(ray_samples * rows_per_point * e)
    if occ:
        g = probe_grids if probe_grids is not None else (
            num_experts if experts_evaluated is None
            else min(num_experts, experts_evaluated))
        # the union probe grid replaces the K-grid probe with one row, but
        # hard masking stays exact: it re-queries the K-grid union (the
        # dilated union grid is probe-only, conservative by construction)
        rows += n_probes * (1 if union_probe else g)
        if hard_mask:
            rows += ray_samples * g
    return rows
