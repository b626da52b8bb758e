"""Outer meta-training loop: step cadence, eval/save-best, resume.

Counterpart of /root/reference/adaptive_nerf/pipelines/offline_stage/trainer.py:9-103.
The hot work is one jitted step (meta_train_step.make_train_step); this loop
only moves batches, tracks cadence, and checkpoints.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.profiler  # noqa: F401  (trace window)
import numpy as np

from nerfsys_tpu.utils import checkpoint as ckpt
from nerfsys_tpu.utils.logging import Logger, MetricLogger


def meta_trainer(
    *,
    params,
    opt_state,
    train_step,  # jitted (params, opt_state, statics, batch, key) -> (p, s, aux)
    eval_step,  # jitted (params, statics, batch, key) -> metrics, or None
    statics,
    train_loader,  # yields stacked episode batches (numpy)
    eval_loader=None,
    config: Optional[dict] = None,
    outer_steps: int = 20000,
    eval_every: int = 200,
    save_every: int = 1000,
    print_every: int = 1,
    run_dir=None,
    logger: Optional[Logger] = None,
    seed: int = 0,
    start_step: int = 0,
    best: float = float("-inf"),
    trace_steps: int = 0,
    occ_state=None,  # stacked expert occupancy pytree, or None
    occ_update_fn=None,  # jitted (occ_state, params, statics, step, key)
    fixed_eval: bool = False,  # reuse one eval episode set + key every eval
    metric_lag: int = 1,  # fetch step metrics N steps late (0 = exact sync)
    eval_batches: int = 1,  # episode batches per eval point; the reference
    # caps its eval loop at max_test_tasks loader batches
    # (meta_eval_step.py:31,94-96) — the runner passes that flag here
):
    """Run the outer loop; returns (params, opt_state, best).

    With occupancy enabled, each outer step ends with
    maybe_update_expert_occupancies (reference meta_train_step.py:176-177)
    and the train/eval steps render occupancy-guided once the grid is ready.
    """
    log = logger.log if logger else print
    meters = MetricLogger()
    key = jax.random.PRNGKey(seed)
    # fixed_eval pins the episodes AND the sampling key so successive evals
    # measure model change, not episode-draw variance (+-1.5 dB observed on
    # the example scene with fresh draws)
    fixed_eval_state = None
    train_iter = iter(train_loader)
    eval_iter = iter(eval_loader) if eval_loader is not None else None

    # resume (reference trainer.py:27-29)
    if run_dir is not None and start_step == 0:
        restored = ckpt.is_resume(run_dir, params, opt_state)
        if restored is not None:
            params, rest_opt, state = restored
            if rest_opt is not None:
                opt_state = rest_opt
            start_step = state["step"]
            best = state.get("best", best)
            log(f"[resume] restored step {start_step}, best {best:.3f}")
            if occ_state is not None:
                occ_restored = ckpt.load_aux_state(run_dir, "occ", occ_state)
                if occ_restored is not None:
                    occ_state = occ_restored
                    log("[resume] occupancy grids restored")

    # optional device trace window (utils/profiling.py): a few steady-state
    # steps after warmup, written into the run dir for TensorBoard/Perfetto
    trace_window = ()
    if trace_steps > 0 and run_dir is not None:
        t_begin = start_step + min(10, max(outer_steps - start_step - trace_steps, 0))
        trace_window = range(t_begin, t_begin + trace_steps)

    t_last = time.perf_counter()
    pending = None  # deferred metrics fetch (see drain below)
    for step in range(start_step, outer_steps):
        if trace_window and step == trace_window[0]:
            jax.profiler.start_trace(str(run_dir))
            log(f"[trace] started device trace @ step {step}")
        t0 = time.perf_counter()
        batch = next(train_iter)
        t_data = time.perf_counter() - t0

        key, k_step = jax.random.split(key)
        t1 = time.perf_counter()
        if occ_state is not None:
            params, opt_state, aux = train_step(
                params, opt_state, statics, batch, k_step, occ_state
            )
        else:
            params, opt_state, aux = train_step(
                params, opt_state, statics, batch, k_step
            )

        def drain(p):
            """Fetch + log one completed step's metrics. Called one step
            LATE by default (metric_lag=1): the device->host scalar fetch
            (a full network round trip under the axon backend) then
            overlaps the NEXT step's device compute instead of sitting on
            the critical path. Exact per-step device timing needs
            metric_lag=0."""
            nonlocal t_last
            lo = float(p["aux"]["loss_out"])  # blocks until p's step done
            now = time.perf_counter()
            bt = now - t_last
            t_last = now
            st = (now - p["t1"]) if metric_lag == 0 else max(
                bt - p["t_data"], 0.0
            )
            meters.update(
                loss_in=float(p["aux"]["loss_in"]),
                loss_out=lo,
                psnr_out=float(p["aux"]["psnr_out"]),
                data_time=p["t_data"],
                step_time=st,
                batch_time=bt,
            )
            if logger and p["step"] % max(print_every, 1) == 0:
                logger.scalars(
                    {
                        "loss_in": p["aux"]["loss_in"],
                        "loss_out": lo,
                        "psnr_out": p["aux"]["psnr_out"],
                        "grad_norm": p["aux"].get("grad_norm", 0.0),
                        "time_data": p["t_data"],
                        "time_step": st,
                    },
                    p["step"],
                    prefix="train/",
                )
                for cid, v in enumerate(np.asarray(p["aux"]["region_loss_out"])):
                    logger.scalar(f"train/region_{cid}/loss_out", v, p["step"])
                for cid, v in enumerate(np.asarray(p["aux"]["region_psnr_out"])):
                    logger.scalar(f"train/region_{cid}/psnr_out", v, p["step"])
            if p["step"] % 50 == 0:
                log(f"step {p['step']}/{outer_steps}  {meters}")

        cur = {"step": step, "aux": aux, "t_data": t_data, "t1": t1}
        if metric_lag == 0:
            drain(cur)
        else:
            if pending is not None:
                drain(pending)
            pending = cur

        # occupancy EMA update cadence (reference meta_train_step.py:176-177)
        if occ_state is not None and occ_update_fn is not None:
            key, k_occ = jax.random.split(key)
            occ_state = occ_update_fn(occ_state, params, statics, step, k_occ)

        if trace_window and step == trace_window[-1]:
            jax.profiler.stop_trace()
            log(f"[trace] device trace written to {run_dir}")

        # ----- periodic eval + save-best (trainer.py:52-74) -----
        if eval_step is not None and eval_iter is not None and eval_every > 0 \
                and (step + 1) % eval_every == 0:
            n_eval = max(int(eval_batches), 1)
            if fixed_eval:
                if fixed_eval_state is None:
                    fixed_eval_state = (
                        [next(eval_iter) for _ in range(n_eval)],
                        jax.random.PRNGKey(seed + 7919),
                    )
                eval_set, k_eval = fixed_eval_state
            else:
                key, k_eval = jax.random.split(key)
                eval_set = [next(eval_iter) for _ in range(n_eval)]
            # equal-weight mean over eval batches (batches share one shape,
            # so per-batch task counts only differ through rare padding)
            evs = []
            for eval_batch in eval_set:
                if occ_state is not None:
                    evs.append(eval_step(params, statics, eval_batch, k_eval,
                                         occ_state))
                else:
                    evs.append(eval_step(params, statics, eval_batch, k_eval))
            ev = {k: np.mean([float(np.mean(np.asarray(e[k]))) for e in evs])
                  for k in evs[0]}
            eval_psnr = float(ev["psnr_out"])
            if logger:
                logger.scalars(ev, step, prefix="eval/")
            log(f"[eval @ {step}] query psnr {eval_psnr:.3f} (best {best:.3f})")
            if eval_psnr > best and run_dir is not None:
                best = eval_psnr
                ckpt.save_checkpoint(
                    run_dir, "best", ckpt.tree_to_host(params),
                    ckpt.tree_to_host(opt_state), config, step + 1, best, True,
                )
                if occ_state is not None:
                    ckpt.save_aux_state(run_dir, "best", "occ", occ_state)
                log(f"[ckpt] new best ({best:.3f}) saved")

        if run_dir is not None and save_every > 0 and (step + 1) % save_every == 0:
            ckpt.save_checkpoint(
                run_dir, f"step{step + 1}", ckpt.tree_to_host(params),
                ckpt.tree_to_host(opt_state), config, step + 1, best,
            )
            if occ_state is not None:
                ckpt.save_aux_state(run_dir, f"step{step + 1}", "occ", occ_state)
            log(f"[ckpt] step{step + 1} saved")

    if pending is not None:
        drain(pending)  # final step's metrics

    if run_dir is not None:
        ckpt.save_checkpoint(
            run_dir, "last", ckpt.tree_to_host(params),
            ckpt.tree_to_host(opt_state), config, outer_steps, best,
        )
        if occ_state is not None:
            ckpt.save_aux_state(run_dir, "last", "occ", occ_state)
        log("[ckpt] last saved")
    return params, opt_state, best
