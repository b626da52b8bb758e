"""Perf accounting beyond the headline bench: MFU + render latency.

Fills BASELINE.md's throughput-vs-hardware rows (the reference publishes
no numbers; SURVEY.md §6):

  train  -- the bench.py meta-train step: s/step, rays/s, FLOPs/step from
            XLA cost analysis (fallback: analytic matmul model), MFU vs
            v5e peak.
  render -- 800x800 novel-view frame latency through the chunked renderer
            (the reference's render_image path), stratified and occupancy.

Run one mode per process (compile caches are per-process; a wedged TPU
run should not take the other mode down with it):

  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      nerfsys_tpu.scripts.measure_perf --mode train
  ... --mode render [--samples 96] [--use_occ]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x) -> float:
    """Host sync: float() of a scalar (block_until_ready lies under axon)."""
    return float(np.asarray(x).ravel()[0])


def _lines_mm() -> bool:
    """NERFSYS_LINES_MM=1 flips the line lookups to the hat-stencil MXU
    path in every measured config (the flag-gated forward A/B arm)."""
    import os

    return os.environ.get("NERFSYS_LINES_MM", "0") == "1"


def _lines_mm_dtype() -> str:
    import os

    return os.environ.get("NERFSYS_LINES_MM_DTYPE", "float32")


def bench_setup(use_occ: bool = False):
    """The exact bench.py model/step at demo scale (one source of truth).

    use_occ=True mirrors bench.py's default soft-occupancy config (32
    importance samples steered by a half-occupied ready grid); False is the
    stratified-96 reference-parity arm (NERFSYS_BENCH_OCC=0)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
        param_group_labels,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.planes import PlaneEncodingConfig
    from nerfsys_tpu.pipelines.offline.meta_core import MetaConfig
    from nerfsys_tpu.pipelines.offline.meta_train_step import make_train_step
    from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer

    K, B, S, Q = 4, 3, 4000, 2000
    INNER, SAMPLES = 8, (32 if use_occ else 96)
    expert = NGPConfig(
        hidden=64, sigma_depth=2, color_hidden=64, color_depth=2,
        geo_feat_dim=15, xyz_encoding="planes",
        planes=PlaneEncodingConfig(levels=3, base_res=128, growth=2.0,
                                   features=8, matmul_bwd=True,
                                   pos_grad=False,
                                   lines_matmul=_lines_mm(),
                                   lines_mm_dtype=_lines_mm_dtype()),
    )
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=32)
    cents = jnp.asarray(
        [[0.0, -1, -1], [0.0, -1, 1], [0.0, 1, -1], [0.0, 1, 1]], jnp.float32
    )
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    statics = ContainerStatics(
        cents, boxes, jnp.asarray([[-2.2, -2.2, -2.2], [2.2, 2.2, 2.2]])
    )
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    meta = MetaConfig(algo="fomaml", inner_iter=INNER, inner_lr=0.015,
                      ray_samples=SAMPLES,
                      occ_importance=use_occ, occ_hard_mask=not use_occ)
    tx = build_optimizer(OptimConfig(outer_steps=10000),
                         param_group_labels(params))
    opt_state = tx.init(params)
    step = make_train_step(meta, cfg, tx)

    occ_state = None
    if use_occ:
        from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

        occ_state = init_occ_state(
            OccGridConfig(resolution=128, levels=4, warmup_steps=0), K
        )
        rg = jax.random.uniform(jax.random.PRNGKey(2),
                                occ_state["binary"].shape)
        occ_state["binary"] = rg < 0.5
        occ_state["occs"] = jnp.where(occ_state["binary"], 0.1, 0.0)
        occ_state["num_updates"] = jnp.asarray(1000, jnp.int32)

    rng = np.random.default_rng(0)

    def rays(n):
        o = rng.normal(size=(K, B, n, 3)).astype(np.float32) * 0.3
        d = rng.normal(size=(K, B, n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        nf = np.tile(np.array([0.1, 2.5], np.float32), (K, B, n, 1))
        return np.concatenate([o, d, nf], -1)

    batch = jax.device_put({
        "support_rays": rays(S),
        "support_rgbs": rng.uniform(size=(K, B, S, 3)).astype(np.float32),
        "query_rays": rays(Q),
        "query_rgbs": rng.uniform(size=(K, B, Q, 3)).astype(np.float32),
        "valid": np.ones((K, B), np.float32),
    })
    dims = dict(K=K, B=B, S=S, Q=Q, INNER=INNER, SAMPLES=SAMPLES,
                OCC_PROBES=(meta.occ_probes if use_occ else 0),
                occ_state=occ_state)
    return step, params, opt_state, statics, batch, dims


def measure_train(iters: int = 3, use_occ: bool = False):
    import jax

    from nerfsys_tpu.utils.flops import (
        V5E_GATHER_ROWS_PER_S_HIGH,
        V5E_GATHER_ROWS_PER_S_LOW,
        V5E_PEAK_BF16,
        analytic_train_step_flops,
        analytic_train_step_gather_rows,
        compiled_flops,
        mfu,
    )

    step, params, opt_state, statics, batch, d = bench_setup(use_occ)
    occ_state = d["occ_state"]
    key = jax.random.PRNGKey(1)
    params, opt_state, aux = step(params, opt_state, statics, batch, key,
                                  occ_state)
    _sync(aux["loss_out"])

    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, statics, batch, k,
                                      occ_state)
        _sync(aux["loss_out"])
    dt = (time.perf_counter() - t0) / iters

    xla_fl = compiled_flops(step, params, opt_state, statics, batch, key,
                            occ_state)
    ana_fl = analytic_train_step_flops(
        num_experts=d["K"], tasks_per_expert=d["B"],
        support_rays=d["S"], query_rays=d["Q"],
        inner_iter=d["INNER"], ray_samples=d["SAMPLES"],
    )
    # XLA's cost model counts a while/scan BODY once, not per iteration —
    # under the lax.map expert loop + inner scan it undercounts ~KxINNER.
    # The analytic matmul count is the honest per-step number; report both.
    flops = max(ana_fl, xla_fl or 0.0)

    rays_per_step = d["K"] * d["B"] * (d["S"] * d["INNER"] + d["Q"])
    # the honest utilization number: this step is encoder-gather bound, so
    # compare achieved gather transactions/s against the measured v5e
    # transaction peak (MXU-peak MFU is ~0.2% by construction — 64-wide
    # MLPs carry almost no FLOPs)
    rows = analytic_train_step_gather_rows(
        num_experts=d["K"], tasks_per_expert=d["B"],
        support_rays=d["S"], query_rays=d["Q"],
        inner_iter=d["INNER"], ray_samples=d["SAMPLES"],
        occ_probes=d["OCC_PROBES"], lines_gathered=not _lines_mm(),
    )
    out = {
        "mode": "train",
        "use_occ": use_occ,
        "step_seconds": round(dt, 4),
        "rays_per_sec": round(rays_per_step / dt, 1),
        "flops_per_step": flops,
        "flops_analytic_matmul": ana_fl,
        "flops_xla_cost_analysis_loop_bodies_once": xla_fl,
        "mfu_vs_v5e_bf16_peak": round(mfu(flops, dt, V5E_PEAK_BF16), 5),
        "tflops_per_sec": round(flops / dt / 1e12, 3),
        "gather_rows_per_step": rows,
        "gather_rows_per_sec": round(rows / dt, 1),
        "transaction_util_vs_measured_peak": [
            round(rows / dt / V5E_GATHER_ROWS_PER_S_HIGH, 3),
            round(rows / dt / V5E_GATHER_ROWS_PER_S_LOW, 3),
        ],
    }
    print(json.dumps(out))
    return out


def measure_train_anatomy(iters: int = 5, use_occ: bool = True):
    """Itemize the demo-scale train step: who owns each millisecond
    (VERDICT r4 weak #1 — the 58-73%-of-transaction-peak headline needs a
    decomposition, not a story).

    Isolated jitted programs at the step's EXACT shapes:
      probe — the occupancy probe/CDF pass for one task's S support rays
              (task_adapt hoists it: paid once per task, not per inner it)
      enc   — planes encoder fwd+bwd alone at S x samples points
      field — one expert's full loss fwd+bwd for ONE inner iteration
              (encoder + MLPs + SH + compositing + MSE)
      adapt — one expert's whole task_adapt (probe hoist + INNER its)
      qloss — one expert's query loss fwd+bwd (Q rays, probe included)
      step  — the whole outer step (the bench arm)

    Composition model printed alongside: step ≈ K·B·(adapt + qloss)
    + outer-update + residual, where residual is lax.map/scan dispatch +
    grad accumulation + whatever overlap hides. mlp+composite ≈ field −
    enc (reported as a difference)."""
    import functools

    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.pipelines.offline.meta_core import (
        _expert_loss_fn,
        query_loss,
        task_adapt,
    )

    step, params, opt_state, statics, batch, d = bench_setup(use_occ)
    occ_state = d["occ_state"]
    meta_cfg = None  # rebuilt below to mirror bench_setup exactly
    from nerfsys_tpu.pipelines.offline.meta_core import MetaConfig

    meta_cfg = MetaConfig(algo="fomaml", inner_iter=d["INNER"],
                          inner_lr=0.015, ray_samples=d["SAMPLES"],
                          occ_importance=use_occ, occ_hard_mask=not use_occ)
    cfg = _bench_cfg()
    K, B, S, Q = d["K"], d["B"], d["S"], d["Q"]

    e0 = jax.tree_util.tree_map(lambda a: a[0], params["experts"])
    bg = params.get("bg")
    aabb = statics.expert_aabbs[0]
    sup_r = batch["support_rays"][0, 0]
    sup_c = batch["support_rgbs"][0, 0]
    qry_r = batch["query_rays"][0, 0]
    qry_c = batch["query_rgbs"][0, 0]
    occ_b = occ_state["binary"][0] if occ_state is not None else None
    occ_v = (occ_state["occs"][0]
             if occ_state is not None and use_occ else None)
    occ_on = jnp.asarray(True) if occ_state is not None else None
    key = jax.random.PRNGKey(3)

    def timed(fn, *args):
        out = fn(*args)  # compile
        _sync(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            _sync(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    comp = {}

    if occ_state is not None:
        from nerfsys_tpu.ops.occupancy import (
            occupancy_probe_cdf,
            query_binary,
            query_pair,
        )

        @jax.jit
        def probe(rays):
            o_, d_ = rays[:, 0:3], rays[:, 3:6]
            near, far = rays[:, 6], rays[:, 7]
            v = jnp.isfinite(near) & jnp.isfinite(far) & (far > near)
            st = occupancy_probe_cdf(
                lambda p: query_binary(occ_b, aabb, p),
                o_, d_, jnp.where(v, near, 0.0), jnp.where(v, far, 1.0),
                meta_cfg.occ_probes,
                pair_fn=(lambda p: query_pair(occ_v, occ_b, aabb, p))
                if use_occ else None,
                ray_floor=meta_cfg.occ_ray_floor,
            )
            return st["cdf"]

        comp["probe_S"] = timed(probe, sup_r)

    from nerfsys_tpu.ops.planes import plane_encode

    n_pts = S * d["SAMPLES"]
    pts01 = jax.random.uniform(jax.random.PRNGKey(4), (n_pts, 3))

    @jax.jit
    def enc_fwdbwd(p_enc, x):
        def f(p):
            return (plane_encode(p, x, cfg.expert.planes) ** 2).sum()

        return jax.value_and_grad(f)(p_enc)

    comp["enc_fwdbwd"] = timed(enc_fwdbwd, e0["planes_enc"], pts01)

    @jax.jit
    def field_iter(p, kk):
        def f(pp):
            loss, _ = _expert_loss_fn(
                meta_cfg, cfg, pp, aabb, bg, sup_r, sup_c, kk,
                True, occ_binary=occ_b, occ_on=occ_on, occ_values=occ_v,
            )
            return loss

        return jax.value_and_grad(f)(p)

    comp["field_iter_fwdbwd"] = timed(field_iter, e0, key)

    @jax.jit
    def adapt(p, kk):
        fast, il = task_adapt(
            meta_cfg, cfg, p, aabb, bg, sup_r, sup_c, kk,
            occ_binary=occ_b, occ_on=occ_on, occ_values=occ_v,
        )
        return il

    comp["adapt_full"] = timed(adapt, e0, key)

    @jax.jit
    def qloss(p, kk):
        loss, _ = query_loss(
            meta_cfg, cfg, p, aabb, bg, qry_r, qry_c, kk,
            occ_binary=occ_b, occ_on=occ_on, occ_values=occ_v,
        )
        return loss

    comp["query_loss"] = timed(qloss, e0, key)

    # the whole step (bench arm)
    k2 = jax.random.PRNGKey(1)
    params2, opt2, aux = step(params, opt_state, statics, batch, k2,
                              occ_state)
    _sync(aux["loss_out"])
    t0 = time.perf_counter()
    for _ in range(iters):
        k2, kk = jax.random.split(k2)
        params2, opt2, aux = step(params2, opt2, statics, batch, kk,
                                  occ_state)
        _sync(aux["loss_out"])
    comp["step_full"] = (time.perf_counter() - t0) / iters

    model = K * B * (comp["adapt_full"] + comp["query_loss"])
    out = {
        "mode": "train_anatomy",
        "use_occ": use_occ,
        "iters": iters,
        "components_seconds": {k: round(v, 4) for k, v in comp.items()},
        "mlp_composite_by_difference": round(
            comp["field_iter_fwdbwd"] - comp["enc_fwdbwd"], 4),
        "kb_adapt_plus_query_model": round(model, 4),
        "residual_dispatch_overlap": round(comp["step_full"] - model, 4),
        "note": "residual = step - K*B*(adapt+qloss): lax.map/scan "
                "dispatch + grad-accum + outer update, minus whatever "
                "cross-program overlap hides (negative = overlap wins)",
    }
    print(json.dumps(out))
    return out


def measure_occ_update(iters: int = 3, resolution: int = 128,
                       levels: int = 4, update_interval: int = 12):
    """Occupancy EMA-update cost at demo scale: warmup (all cells) vs
    post-warmup (strided subset — only those cells' field evals are paid,
    ops/occupancy.update_occ_grid), plus the amortized s/step at the
    given update interval."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.occupancy import make_occ_update_fn
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    _, params, _, statics, _, d = bench_setup()
    occ_cfg = OccGridConfig(resolution=resolution, levels=levels,
                            warmup_steps=256, update_interval=update_interval)
    cfg = _bench_cfg()
    upd = make_occ_update_fn(cfg, occ_cfg)
    occ = init_occ_state(occ_cfg, cfg.num_experts)
    key = jax.random.PRNGKey(0)

    def time_at(step_val):
        o = upd(occ, params, statics, jnp.asarray(step_val), key)  # compile
        _sync(o["occs"].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = upd(occ, params, statics, jnp.asarray(step_val), key)
            _sync(o["occs"].reshape(-1)[0])
        return (time.perf_counter() - t0) / iters

    t_warm = time_at(0)  # step 0: due + warmup -> all cells
    # past warmup AND due (step % interval == 0): strided subset only
    past = update_interval * (256 // update_interval + 2)
    t_sub = time_at(past)
    out = {
        "mode": "occ_update",
        "cells": cfg.num_experts * levels * resolution ** 3,
        "warmup_update_seconds": round(t_warm, 4),
        "subset_update_seconds": round(t_sub, 4),
        "subset_fraction": 0.5,
        "amortized_s_per_step_at_interval": round(t_sub / update_interval, 4),
    }
    print(json.dumps(out))
    return out


def _synthetic_occ_state(statics, *, geometry: bool,
                         alive_frac: float | None = None):
    """Ready occ state for the synthetic bench scene: all-ones binary, or
    (geometry=True) only cells whose centers sit below the level-0 box tops
    (z <= 2.2) — so space above the scene is genuinely dead (an all-ones
    binary marks the level-1 halo up to z=3.4 and nothing would skip).

    alive_frac: instead of the absolute z <= 2.2 cut, mark the bottom
    `alive_frac` of EACH level's own box. The bake-cost arm needs dead
    cells INSIDE the level-0 volume (the bake table covers exactly that
    box, so the absolute cut leaves it 100% alive and occ-aware bake
    skipping has nothing to skip — r4 measurement artifact)."""
    import jax.numpy as jnp

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    occ_state = init_occ_state(
        OccGridConfig(resolution=64, levels=2, warmup_steps=0), 4
    )
    if geometry:
        from nerfsys_tpu.ops.occupancy import level_aabbs

        K_, L_, R_ = occ_state["binary"].shape[:3]
        binary = np.zeros(occ_state["binary"].shape, bool)
        for k in range(K_):
            la = np.asarray(level_aabbs(statics.expert_aabbs[k], L_))
            for lv in range(L_):
                lo, hi = la[lv, 0, 2], la[lv, 1, 2]
                zc = lo + (np.arange(R_) + 0.5) * (hi - lo) / R_
                cut = (lo + alive_frac * (hi - lo)
                       if alive_frac is not None else 2.2)
                binary[k, lv, :, :, zc <= cut] = True
        occ_state["binary"] = jnp.asarray(binary)
    else:
        occ_state["binary"] = jnp.ones_like(occ_state["binary"])
    occ_state["num_updates"] = jnp.asarray(1000, jnp.int32)
    return occ_state


def measure_render(side: int = 800, samples: int = 96, use_occ: bool = False,
                   iters: int = 3, top1: bool = False, sky: float = 0.0,
                   union_probe: int = 0, early_stop: float = 0.0,
                   opaque: float = 1.0, coherent: bool = False,
                   skew: float = 0.0):
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        default_chunk_rays,
        make_chunk_renderer,
    )
    from nerfsys_tpu.utils.flops import V5E_PEAK_BF16, compiled_flops

    _, params, _, statics, _, _ = bench_setup()
    occ_state = None
    if use_occ:
        occ_state = _synthetic_occ_state(statics, geometry=sky > 0.0)

    # renderer over CHUNK-sized ray batches (HBM-safe: 65536 x 96 samples
    # compiles to a ~21 GB program on the 16 GB v5e — measured OOM)
    chunk = default_chunk_rays(samples)
    cfg = _bench_cfg()
    if top1:
        # reference-equivalent render routing: each point evaluates ONE
        # expert (the reference loops experts serially over their own
        # points, ray_rendering.py:399-471); dense evaluates all K and
        # blends — 4x the table traffic at K=4
        import dataclasses as _dc

        cfg = _dc.replace(cfg, bucketed=True, experts_per_point=1,
                          capacity_factor=1.3)
    renderer = make_chunk_renderer(
        cfg, ray_samples=samples, bg_policy="white",
        occ_state=occ_state, occ_importance=use_occ,
        occ_probe_grid_res=union_probe,
        # early ray termination A/B: `opaque` scales density so the random-
        # init synthetic field reaches trained-scene opacity (real surfaces
        # have sigma in the hundreds; random init is ~O(1))
        early_stop_eps=early_stop, sigma_scale=opaque,
    )

    n = side * side
    rng = np.random.default_rng(0)
    o = np.tile(np.array([0.0, 0.0, 2.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if sky > 0.0:
        # aerial-frame shape: the last `sky` fraction of rows starts above
        # every expert box and points UP — those chunks are pure background
        # and the two-wave occupancy renderer skips their field eval
        i0 = int(n * (1.0 - sky))
        o[i0:, 2] = 3.0
        d[i0:, 2] = np.abs(d[i0:, 2]) + 0.5
        d[i0:] /= np.linalg.norm(d[i0:], axis=1, keepdims=True)
    if skew > 0.0:
        # spatially-skewed frame (a zoomed-in camera): the first `skew`
        # fraction of rays aims tightly into ONE expert's region — the
        # frame shape where bucketed top-1 overflows to dense and the
        # coherent dispatch packs whole rays onto one expert
        # nadir geometry: clustering lives in the (y, z) ground plane
        # (cluster_2d routing), so a zoomed-in camera's rays travel along
        # x with (y, z) parked inside expert 0's region
        i1 = int(n * skew)
        o[:i1, 0] = 2.0
        o[:i1, 1] = -1.0 + rng.normal(scale=0.15, size=i1)
        o[:i1, 2] = -1.0 + rng.normal(scale=0.15, size=i1)
        d[:i1] = np.array([-1.0, 0.0, 0.0], np.float32)
        d[:i1, 1:] = rng.normal(scale=0.02, size=(i1, 2))
        d[:i1] /= np.linalg.norm(d[:i1], axis=1, keepdims=True)
    nf = np.tile(np.array([0.1, 4.5], np.float32), (n, 1))
    rays = np.concatenate([o, d, nf], 1)

    from nerfsys_tpu.pipelines.online.runtime_adapt import render_rays_chunked

    two_wave = getattr(renderer, "probe", None) is not None
    stats = {}

    if coherent:
        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            make_coherent_renderer,
        )

        # with --use_occ the coherent programs are occupancy-guided: every
        # program probes the union grids for placement (identical CDF) and
        # only the field eval narrows to the packed expert. --union_probe
        # stacks: ALL programs then probe the ONE resampled grid (probe
        # rows /K alongside the /K field evals — the combo rung)
        ren_c = make_coherent_renderer(
            _bench_cfg(), ray_samples=samples, bg_policy="white",
            occ_state=occ_state, occ_importance=use_occ,
            sigma_scale=opaque, occ_probe_grid_res=union_probe)
        two_wave = False

        def frame():
            # the production routing: render_rays_chunked duck-types the
            # bundle (device-packed (C, 5) fetches through
            # coherent_dispatch — same path as --render_coherent)
            return render_rays_chunked(ren_c, params, statics, rays,
                                       chunk, stats=stats)
    else:
        def frame():
            # the exact render_image flow (two-wave skip + ray packing when
            # the renderer supports them); returns host numpy = fully synced
            return render_rays_chunked(renderer, params, statics, rays,
                                       chunk, stats=stats)

    frame()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        frame()
    dt = (time.perf_counter() - t0) / iters

    dt_full = None
    if ((two_wave and sky > 0.0) or early_stop > 0.0) and hasattr(
        renderer, "full"
    ):
        # same frame through the one-shot program: the skip's denominator.
        # (--early_stop without --use_occ leaves a bare jitted renderer with
        # no .full/.probe split — nothing to compare against, skip it.)
        plain = renderer.full

        def frame_full():
            return render_rays_chunked(plain, params, statics, rays, chunk)

        frame_full()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            frame_full()
        dt_full = (time.perf_counter() - t0) / iters

    # cost-analyze the one-shot jitted program (a TwoWaveOccRenderer is a
    # Python object without .lower())
    fl = compiled_flops(
        getattr(renderer, "full", renderer), params, statics,
        jnp.asarray(rays[:chunk])
    )
    from nerfsys_tpu.utils.flops import (
        V5E_GATHER_ROWS_PER_S_HIGH,
        V5E_GATHER_ROWS_PER_S_LOW,
        analytic_render_gather_rows_per_ray,
    )

    rows_per_ray = analytic_render_gather_rows_per_ray(
        ray_samples=samples, num_experts=4,
        experts_evaluated=1 if top1 else None,
        occ=use_occ, occ_levels=2, union_probe=bool(union_probe),
        # top-E routing narrows the FIELD, not the per-ray probe: the MoE
        # probe unions all K grids (models/occupancy.union_pair_fn)
        probe_grids=4, lines_gathered=not _lines_mm(),
    )
    # achieved rows: wave 1 probes EVERY ray; field+mask run on alive rays
    # only; packed mode re-probes the alive rays inside the full program.
    # One fused (binary,value) row per probe point per grid (query_pair).
    probe_rows = (128.0 * (1 if union_probe else 4)) if use_occ else 0.0
    work_rows = rows_per_ray - probe_rows
    alive = stats.get("n_alive", n) if use_occ else n
    rows_frame = probe_rows * n + work_rows * alive
    if "packed" in str(stats.get("mode", "")):
        rows_frame += probe_rows * alive
    tx_util = [round(rows_frame / dt / V5E_GATHER_ROWS_PER_S_HIGH, 3),
               round(rows_frame / dt / V5E_GATHER_ROWS_PER_S_LOW, 3)]
    out = {
        "mode": "render",
        "resolution": f"{side}x{side}",
        "samples": samples,
        "use_occ": use_occ,
        "top1_routing": top1,
        "coherent": coherent,
        "sky_fraction": sky,
        "skew_fraction": skew,
        "union_probe_res": union_probe,
        "early_stop_eps": early_stop,
        "sigma_scale": opaque,
        "two_wave": two_wave,
        "render_stats": stats,
        "frame_seconds": round(dt, 4),
        "frame_seconds_one_shot": (round(dt_full, 4)
                                   if dt_full is not None else None),
        "gather_rows_per_ray": rows_per_ray,
        "transaction_util_vs_measured_peak": tx_util,
        "skip_speedup": (round(dt_full / dt, 3)
                         if dt_full is not None else None),
        "rays_per_sec": round(n / dt, 1),
        "chunk_flops": fl,
        "tflops_per_sec": (
            round(fl * np.ceil(n / chunk) / dt / 1e12, 3) if fl else None
        ),
    }
    print(json.dumps(out))
    return out


def measure_moe(K: int = 16, n_pts: int = 1_572_864, iters: int = 3,
                experts_per_point: int = 2, capacity_factor: float = 1.5):
    """Dense vs bucketed top-E MoE dispatch at K experts (NEXT item 10).

    The reference loops experts serially (ray_rendering.py:399-471); the
    dense TPU path evaluates ALL K experts per point (K x compute), the
    bucketed path counting-sorts points into per-expert buckets and
    evaluates top-E only — the win should grow with K.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerStatics,
        container_apply,
        init_container_params,
    )

    cfg_dense = _dc.replace(_bench_cfg(), num_experts=K, bucketed=False)
    cfg_buck = _dc.replace(
        cfg_dense, bucketed=True, experts_per_point=experts_per_point,
        capacity_factor=capacity_factor,
    )
    rng = np.random.default_rng(0)
    side = int(np.ceil(np.sqrt(K)))
    cents = np.stack([
        [0.0, (i % side) * 2.0 - side + 1.0, (i // side) * 2.0 - side + 1.0]
        for i in range(K)
    ]).astype(np.float32)
    boxes = np.stack([np.stack([c - 1.3, c + 1.3]) for c in cents])
    glob = np.stack([cents.min(0) - 1.5, cents.max(0) + 1.5])
    statics = ContainerStatics(*map(jnp.asarray, (cents, boxes, glob)))
    params = init_container_params(jax.random.PRNGKey(0), cfg_dense)

    pts = jnp.asarray(
        rng.uniform(glob[0], glob[1], (n_pts, 3)).astype(np.float32)
    )
    dirs = jnp.asarray(rng.normal(size=(n_pts, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)

    out = {"mode": "moe", "K": K, "n_pts": n_pts,
           "experts_per_point": experts_per_point}
    # chunk the point axis inside ONE program (lax.map): dense K=16 over
    # 1.57M points in a single launch compiles to ~21 GB on the 16 GB v5e
    # (measured OOM); 8 sequential chunks keep peak activations 1/8th
    n_chunks = 8
    assert n_pts % n_chunks == 0
    for label, cfg in (("dense", cfg_dense), ("bucketed", cfg_buck)):
        def f_chunked(p, s, x, d, cfg=cfg):
            xs = x.reshape(n_chunks, n_pts // n_chunks, 3)
            ds = d.reshape(n_chunks, n_pts // n_chunks, 3)
            return jax.lax.map(
                lambda xd: container_apply(p, cfg, s, xd[0], xd[1]),
                (xs, ds),
            )

        f = jax.jit(f_chunked)
        rgb, sigma = f(params, statics, pts, dirs)
        _sync(sigma[0, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb, sigma = f(params, statics, pts, dirs)
            _sync(sigma[0, :1])
        out[f"{label}_seconds"] = round((time.perf_counter() - t0) / iters, 4)
    out["speedup"] = round(out["dense_seconds"] / out["bucketed_seconds"], 3)
    print(json.dumps(out))
    return out


def _bench_cfg():
    from nerfsys_tpu.models.container import ContainerConfig
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.planes import PlaneEncodingConfig

    expert = NGPConfig(
        hidden=64, sigma_depth=2, color_hidden=64, color_depth=2,
        geo_feat_dim=15, xyz_encoding="planes",
        planes=PlaneEncodingConfig(levels=3, base_res=128, growth=2.0,
                                   features=8, matmul_bwd=True,
                                   pos_grad=False,
                                   lines_matmul=_lines_mm(),
                                   lines_mm_dtype=_lines_mm_dtype()),
    )
    return ContainerConfig(num_experts=4, expert=expert,
                           boundary_margin=1.1, bg_hidden=32)



def measure_baked_serve(side: int = 800, samples: int = 32, res: int = 256,
                        sh_levels: int = 3, iters: int = 5,
                        use_occ: bool = False, chunk_rays: int = 65536,
                        sparse_block: int = 0, corner_pack: int = 0):
    """Serving-rate frame latency: camera pose in, uint8 image out.

    Uses make_baked_camera_renderer — rays generate ON DEVICE and the
    tonemap fuses into the render program, so per-frame host<->device
    traffic is ~20 floats up + the u8 image down (vs 20 MB of rays up +
    13 MB of f32 down for the host-raygen path, which dominated the
    3.6 s baked frame; BASELINE.md 2026-08-19)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.baked import (
        BakedConfig,
        bake_field,
        make_baked_camera_renderer,
    )

    _, params, _, statics, _, _ = bench_setup()
    cfg = _bench_cfg()
    bcfg = BakedConfig(resolution=res, sh_levels=sh_levels,
                       sparse_block=sparse_block, corner_pack=corner_pack)
    occ_state = (
        _synthetic_occ_state(statics, geometry=True, alive_frac=0.35)
        if use_occ else None
    )

    t0 = time.perf_counter()
    baked = bake_field(params, cfg, statics, bcfg, occ_state=occ_state)
    float(jnp.sum(baked["table"][:1].astype(jnp.float32)))  # host sync
    bake_s = time.perf_counter() - t0

    # corner-packed layout; each sparse lookup adds one index-row gather
    rows_per_sample = (8.0 / baked["corner_pack"]) * (2 if sparse_block
                                                      else 1)
    H = W = side
    renderer = make_baked_camera_renderer(
        baked, bcfg, cfg, H=H, W=W, ray_samples=samples,
        chunk_rays=chunk_rays,
        scene_aabb=np.asarray(statics.global_aabb), out_u8=True,
    )
    # camera above the scene looking down -z (RUB identity pose), fov
    # sized so the frustum covers the scene box
    c2w = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.0]], np.float32)
    intr = np.array([W * 0.8, W * 0.8, W / 2, H / 2], np.float32)

    img = renderer(params, statics, c2w, intr)  # compile
    assert img.dtype == np.uint8
    t0 = time.perf_counter()
    for _ in range(iters):
        img = renderer(params, statics, c2w, intr)
    dt = (time.perf_counter() - t0) / iters

    n = H * W
    out = {
        "mode": "baked_serve",
        "resolution": f"{side}x{side}",
        "grid_res": res,
        "sh_levels": sh_levels,
        "samples": samples,
        "chunk_rays": chunk_rays,
        "n_chunks": -(-n // chunk_rays),
        "corner_pack": int(baked["corner_pack"]),
        "sparse_block": int(sparse_block),
        "alive_blocks_frac": (
            round((baked["table"].shape[0] // sparse_block**3 - 1)
                  / (res // sparse_block) ** 3, 4)
            if sparse_block else 1.0),
        "table_mb": round(
            (float(np.prod(baked["table"].shape)) * 2
             + (float(np.prod(baked["block_index"].shape)) * 4
                if sparse_block else 0.0)) / 1e6, 1),
        "bake_seconds": round(bake_s, 2),
        "frame_seconds": round(dt, 4),
        "fps": round(1.0 / dt, 2),
        "rays_per_sec": round(n / dt, 1),
        "gather_rows_per_ray": rows_per_sample * samples,
        "host_io_bytes_per_frame": int(3 * n + 19 * 4),
        "mean_pixel": round(float(img.astype(np.float32).mean()), 2),
    }
    print(json.dumps(out))
    return out


def measure_baked(side: int = 800, samples: int = 32, res: int = 256,
                  sh_levels: int = 3, iters: int = 3,
                  use_occ: bool = False):
    """Baked SH snapshot render latency (models/baked.py): one-time bake of
    the demo-scale container, then full frames at side² — the serving-rate
    rung of the render ladder (8/corner_pack gather rows/sample vs
    18/point x K live,
    zero probe rows)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.baked import (
        BakedConfig,
        bake_field,
        make_baked_chunk_renderer,
    )
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        render_rays_chunked,
    )
    from nerfsys_tpu.utils.flops import (
        V5E_GATHER_ROWS_PER_S_HIGH,
        V5E_GATHER_ROWS_PER_S_LOW,
    )

    _, params, _, statics, _, _ = bench_setup()
    cfg = _bench_cfg()
    bcfg = BakedConfig(resolution=res, sh_levels=sh_levels)
    occ_state = (
        _synthetic_occ_state(statics, geometry=True, alive_frac=0.35)
        if use_occ else None
    )

    t0 = time.perf_counter()
    baked = bake_field(params, cfg, statics, bcfg, occ_state=occ_state)
    jax.block_until_ready(baked["table"])
    # axon gotcha: block_until_ready may not block — force a host fetch
    float(jnp.sum(baked["table"][:1].astype(jnp.float32)))
    bake_s = time.perf_counter() - t0

    rows_per_sample = 8.0 / baked["corner_pack"]  # corner-packed layout
    renderer = make_baked_chunk_renderer(baked, bcfg, cfg,
                                         ray_samples=samples)
    n = side * side
    rng = np.random.default_rng(0)
    o = np.tile(np.array([0.0, 0.0, 2.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile(np.array([0.1, 4.5], np.float32), (n, 1))
    rays = np.concatenate([o, d, nf], 1)

    chunk = 65536  # 4 rows/sample: far below the live field's HBM budget

    def frame():
        return render_rays_chunked(renderer, params, statics, rays, chunk)

    frame()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        frame()
    dt = (time.perf_counter() - t0) / iters

    rows_frame = rows_per_sample * samples * n
    out = {
        "mode": "baked",
        "resolution": f"{side}x{side}",
        "grid_res": res,
        "sh_levels": sh_levels,
        "samples": samples,
        "bake_seconds": round(bake_s, 2),
        "corner_pack": int(baked["corner_pack"]),
        "table_mb": round(float(np.prod(baked["table"].shape)) * 2 / 1e6, 1),
        "frame_seconds": round(dt, 4),
        "rays_per_sec": round(n / dt, 1),
        "gather_rows_per_ray": rows_per_sample * samples,
        "transaction_util_vs_measured_peak": [
            round(rows_frame / dt / V5E_GATHER_ROWS_PER_S_HIGH, 3),
            round(rows_frame / dt / V5E_GATHER_ROWS_PER_S_LOW, 3),
        ],
    }
    print(json.dumps(out))
    return out


def measure_gather_width(iters: int = 5):
    """Row-gather rate vs row width AND dtype — the fast-path boundary probe.

    The 2026-08-20 serve root-cause found bf16 56-wide rows gather at ~39.5M
    rows/s while 64-128-wide run 105-109M on v5e. Whether the boundary is
    ELEMENTS (>= 64) or BYTES (>= 128) decides if the TRAINING tables are
    affected: the packed planes corner rows are 32 x f32 = 128 B and the
    line rows 16 x f32 = 64 B. This mode prints the full matrix so the
    layout decision is measured, not inferred.
    """
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.ops.gather import row_gather

    R = 1 << 21
    N = 1 << 21  # gathered rows per call
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, N, dtype=np.int32))

    out = {"mode": "gather_width", "table_rows": R, "gathered_rows": N,
           "rates_Mrows_per_s": {}}
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for width in (8, 16, 28, 32, 56, 64, 128):
            table = jnp.zeros((R, width), dtype)

            @jax.jit
            def run(t, i):
                # fold so XLA can't elide the gather; output is tiny
                return jnp.sum(row_gather(t, i).astype(jnp.float32))

            float(run(table, idx))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(iters):
                float(run(table, idx))
            dt = (time.perf_counter() - t0) / iters
            key = f"{dtype_name}_w{width}"
            out["rates_Mrows_per_s"][key] = round(N / dt / 1e6, 1)
    print(json.dumps(out))
    return out


def parse_perf_args(argv=None):
    """CLI resolution, exposed for the regression test that pins the baked
    modes' --samples default to 32 (the r3 sweep once ran 96 samples because
    the render default leaked over the mode's; VERDICT r3 item 1)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["train", "train_anatomy", "render", "moe",
                             "occ_update", "baked", "baked_serve",
                             "gather_width"],
                    required=True)
    ap.add_argument("--side", type=int, default=800)
    ap.add_argument("--samples", type=int, default=None,
                    help="samples per ray (default: 96 for render, 32 for "
                         "the baked modes — the baked serving ladder is "
                         "measured at 32)")
    ap.add_argument("--use_occ", action="store_true")
    ap.add_argument("--top1", action="store_true")
    ap.add_argument("--coherent", action="store_true",
                    help="render mode: coherent-expert dispatch (exact "
                         "one-expert programs for rays inside one routing "
                         "region; boundary rays take the full program). "
                         "With --use_occ the programs are occupancy-guided "
                         "(union-CDF placement, single-expert field eval)")
    ap.add_argument("--skew", type=float, default=0.0,
                    help="render mode: fraction of rays aimed tightly into "
                         "one expert region (the skewed-frame benchmark)")
    ap.add_argument("--union_probe", type=int, default=0,
                    help="probe one resampled union grid at this resolution")
    ap.add_argument("--sky", type=float, default=0.0,
                    help="fraction of rays aimed at empty sky "
                         "(sizes the two-wave chunk skip)")
    ap.add_argument("--grid_res", type=int, default=256,
                    help="baked mode: bake grid resolution")
    ap.add_argument("--sh_levels", type=int, default=3,
                    help="baked mode: SH levels (degree + 1)")
    ap.add_argument("--early_stop", type=float, default=0.0,
                    help="render mode: early ray termination eps")
    ap.add_argument("--chunk_rays", type=int, default=65536,
                    help="baked_serve mode: rays per dispatched chunk "
                         "(sweep to separate per-dispatch overhead from "
                         "gather throughput)")
    ap.add_argument("--sparse_block", type=int, default=0,
                    help="baked_serve mode: block-compact the table with "
                         "this block edge (0 = dense; exact at any alive "
                         "fraction, memory scales with it)")
    ap.add_argument("--corner_pack", type=int, default=0,
                    help="baked modes: corners per table row (0 = auto vs "
                         "the HBM budget; sparse tables usually afford 8)")
    ap.add_argument("--opaque", type=float, default=1.0,
                    help="render mode: density scale (trained scenes are "
                         "opaque; random init is not)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--experts_per_point", type=int, default=2)
    ap.add_argument("--capacity_factor", type=float, default=1.5)
    a = ap.parse_args(argv)
    if a.samples is None:
        a.samples = 32 if a.mode in ("baked", "baked_serve") else 96
    return a


def main(argv=None):
    a = parse_perf_args(argv)
    if a.mode == "train":
        measure_train(a.iters, use_occ=a.use_occ)
    elif a.mode == "train_anatomy":
        measure_train_anatomy(a.iters, use_occ=a.use_occ)
    elif a.mode == "occ_update":
        measure_occ_update(a.iters)
    elif a.mode == "baked":
        measure_baked(a.side, a.samples, res=a.grid_res,
                      sh_levels=a.sh_levels, iters=a.iters,
                      use_occ=a.use_occ)
    elif a.mode == "baked_serve":
        measure_baked_serve(a.side, a.samples, res=a.grid_res,
                            sh_levels=a.sh_levels, iters=a.iters,
                            use_occ=a.use_occ, chunk_rays=a.chunk_rays,
                            sparse_block=a.sparse_block,
                            corner_pack=a.corner_pack)
    elif a.mode == "gather_width":
        measure_gather_width(a.iters)
    elif a.mode == "moe":
        measure_moe(a.K, iters=a.iters,
                    experts_per_point=a.experts_per_point,
                    capacity_factor=a.capacity_factor)
    else:
        measure_render(a.side, a.samples, a.use_occ, a.iters, a.top1,
                       sky=a.sky, union_probe=a.union_probe,
                       early_stop=a.early_stop, opaque=a.opaque,
                       coherent=a.coherent, skew=a.skew)


if __name__ == "__main__":
    main()
