"""Online stage: runtime adaptation (TTO) + full-image evaluation.

Counterpart of /root/reference/adaptive_nerf/pipelines/online_stage/runtime_adapt.py.

  - runtime_adapt: in-place optimization of the full routed container on
    support-ray batches (one jitted Adam step per batch), either a fixed step
    budget with infinite restart or one epoch (:213-315).
  - runtime_evaluate: Phase A adapts on support rays built from the test
    metadata; Phase B renders every test image and scores PSNR / SSIM / LPIPS
    in the configured color space, dumping pred/gt PNGs (:24-210).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfsys_tpu.data.image_metadata import ImageMetadata
from nerfsys_tpu.data.loaders import EpochBatchSampler, InfiniteBatchSampler
from nerfsys_tpu.data.ram_rays import RamRaysDataset, frame_rays
from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    container_bg_fn,
    container_field_fn,
)
from nerfsys_tpu.ops.color_space import color_space_transformer, linear_to_srgb
from nerfsys_tpu.ops.losses import compute_mse_loss, psnr_from_mse
from nerfsys_tpu.ops.volrend import render_rays_stratified
from nerfsys_tpu.utils.metrics import lpips as lpips_fn
from nerfsys_tpu.utils.metrics import load_lpips_weights, ssim


# --------------------------- adaptation --------------------------------------
def make_adapt_step(
    cfg: ContainerConfig,
    optimizer: optax.GradientTransformation,
    *,
    ray_samples: int,
    color_space: str = "linear",
    bg_policy: str = "random",
    active_expert: Optional[int] = None,
    occ_importance: bool = False,
    occ_probe_mask: bool = False,
    occ_hard_mask: bool = True,
    occ_ray_floor: float = 0.25,
):
    """Jitted single optimization step over a support-ray batch.

    Pass occ_state (stacked expert occupancy) to render occupancy-guided
    once the grids are ready (reference render_rays dispatch)."""

    def step(params, opt_state, statics, rays, rgbs, key, occ_state=None):
        binary_fn = occ_on = value_fn = occ_cdf = None
        pair_fn = None
        if occ_state is not None:
            from nerfsys_tpu.models.occupancy import (
                occ_ready,
                union_binary_fn,
                union_pair_fn,
                union_value_fn,
            )
            from nerfsys_tpu.ops.occupancy import occupancy_probe_cdf

            binary_fn = union_binary_fn(occ_state, statics)
            occ_on = occ_ready(occ_state)
            if occ_importance:
                value_fn = union_value_fn(occ_state, statics)
                # fused (occ, value) rows: half the probe transactions
                pair_fn = union_pair_fn(occ_state, statics)

            # Hoist the probe CDF out of the differentiated loss, exactly as
            # task_adapt does (meta_core.py:161-201): the probe pass depends
            # only on (rays, grid), not params, so building it here keeps it
            # out of the backward graph; the lax.cond skips it entirely
            # while the grid is still warming up (stratified branch taken).
            o, d = rays[:, 0:3], rays[:, 3:6]
            near, far = rays[:, 6], rays[:, 7]
            s_valid = (
                jnp.isfinite(near) & jnp.isfinite(far) & (far > near)
                & (far < 1e9)
            )
            near_s = jnp.where(s_valid, near, 0.0)
            far_s = jnp.where(s_valid, far, 1.0)

            def build_cdf():
                return occupancy_probe_cdf(
                    binary_fn, o, d, near_s, far_s, weight_fn=value_fn,
                    ray_floor=0.0 if occ_hard_mask else occ_ray_floor,
                    pair_fn=pair_fn,
                )

            occ_cdf = jax.lax.cond(
                occ_on,
                build_cdf,
                lambda: {"cdf": jnp.zeros((o.shape[0], 129), o.dtype),
                         "alive": jnp.zeros((o.shape[0],), bool),
                         "occ": jnp.zeros((o.shape[0], 128), bool)},
            )

        def loss_fn(p):
            field = container_field_fn(p, cfg, statics, active_expert)
            loss, aux = compute_mse_loss(
                field, rays, rgbs, ray_samples=ray_samples, key=key,
                randomized=True, color_space=color_space, bg_policy=bg_policy,
                bg_fn=container_bg_fn(p, cfg),
                binary_fn=binary_fn, occ_on=occ_on, value_fn=value_fn,
                occ_cdf=occ_cdf, occ_probe_mask=occ_probe_mask,
                occ_hard_mask=occ_hard_mask, occ_ray_floor=occ_ray_floor,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def make_fim_adapt_step(
    cfg: ContainerConfig,
    optimizer: optax.GradientTransformation,
    fim_cfg,  # models.fim.FIMConfig
    *,
    ray_samples: int,
    color_space: str = "linear",
    bg_policy: str = "random",
    active_expert: Optional[int] = None,
):
    """Fisher-weighted adaptation step (reference --fim, made operational —
    the reference's silently degrades to plain MSE, SURVEY.md §2.5).

    Threads a Fisher EMA state (pytree like params) through the loop:
      F <- beta F + (1-beta) g²  from the UNWEIGHTED gradients, then
      batch mode:      final grads = w(F, g) * g
      per-sample mode: re-render gradient of mean(w_i * mse_i)
    """
    from nerfsys_tpu.models.fim import (
        fim_batch_weight,
        fim_sample_weights,
        update_fisher,
    )
    from nerfsys_tpu.ops.color_space import color_space_transformer
    from nerfsys_tpu.ops.volrend import render_rays_stratified

    def per_ray_mse(p, statics, rays, rgbs, key):
        field = container_field_fn(p, cfg, statics, active_expert)
        rgb_map, _, _, _ = render_rays_stratified(
            field, rays, ray_samples, key=key, randomized=True,
            bg_policy=bg_policy, bg_fn=container_bg_fn(p, cfg),
        )
        pred, gt = color_space_transformer(rgb_map, rgbs, color_space)
        return jnp.mean(jnp.square(pred - gt), axis=-1)  # (N,)

    def step(params, opt_state, fisher, statics, rays, rgbs, key):
        def base(p):
            mse_i = per_ray_mse(p, statics, rays, rgbs, key)
            return jnp.mean(mse_i), mse_i

        (base_loss, mse_i), grads = jax.value_and_grad(base, has_aux=True)(
            params
        )
        fisher = update_fisher(fisher, grads, fim_cfg)

        if fim_cfg.per_sample:
            w_i = fim_sample_weights(fisher, mse_i, fim_cfg)

            def weighted(p):
                return jnp.mean(w_i * per_ray_mse(p, statics, rays, rgbs, key))

            loss, grads = jax.value_and_grad(weighted)(params)
        else:
            w = fim_batch_weight(fisher, grads, fim_cfg)
            grads = jax.tree_util.tree_map(lambda g: w * g, grads)
            loss = w * base_loss

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, fisher, loss

    return jax.jit(step)


def runtime_adapt(
    *,
    params,
    opt_state,
    adapt_step,  # from make_adapt_step
    statics: ContainerStatics,
    data_loader: Iterable,  # yields {'rays', 'rgbs'} numpy batches
    steps: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> Dict:
    """steps=None -> one pass over the loader; else exactly `steps` updates
    with infinite restart (reference :228-231)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    last_loss = 0.0
    count = 0
    if steps is None:
        for batch in data_loader:
            key, k = jax.random.split(key)
            params, opt_state, loss = adapt_step(
                params, opt_state, statics, batch["rays"], batch["rgbs"], k
            )
            last_loss = float(loss)
            count += 1
    else:
        it = iter(data_loader)
        while count < steps:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(data_loader)
                batch = next(it)
            key, k = jax.random.split(key)
            params, opt_state, loss = adapt_step(
                params, opt_state, statics, batch["rays"], batch["rgbs"], k
            )
            last_loss = float(loss)
            count += 1
    return {"params": params, "opt_state": opt_state, "loss": last_loss,
            "steps": count}


# --------------------------- full-image rendering -----------------------------
def _union_probe_wrap(occ_state, occ_importance, res):
    """Wave-1 probe wrapper over ONE resampled union grid.

    Only the probe (shared by every map_outputs variant) switches grids:
    wave-2 alive chunks sample from the resulting CDF, so they inherit
    the cheap probing; the one-shot `full` program keeps exact per-expert
    probing (packing mode and direct calls stay exact). The grid is built
    lazily per statics version (outside jit — the cache and id() keying
    don't survive tracing) and fed to the jitted program as an argument,
    so a new statics never silently reuses a stale grid."""
    import functools

    from nerfsys_tpu.models.occupancy import (
        build_union_probe_grid,
        probe_rays_occ,
        union_probe_fns,
    )

    build_j = jax.jit(functools.partial(
        build_union_probe_grid, res=res, importance=occ_importance))

    def probe_impl(grid, statics, rays):
        return probe_rays_occ(
            statics, occ_state, rays, importance=occ_importance,
            probe_fns=union_probe_fns(grid),
        )

    probe_j = jax.jit(probe_impl)
    cache = {}

    def grid_for(statics):
        key = id(statics)
        if key not in cache:
            cache.clear()
            cache[key] = (statics, build_j(occ_state, statics))
        return cache[key][1]

    def probe(statics, rays):
        return probe_j(grid_for(statics), statics, rays)

    return probe


class TwoWaveOccRenderer:
    """Chunk renderer with exact empty-chunk skipping (occupancy path).

    Callable exactly like the plain jitted renderer (the one-shot program),
    plus the two-wave surface render_image exploits: `probe` runs only the
    occupancy probe/CDF pass and reports whether any valid ray is alive;
    `render_from_cdf` finishes an alive chunk from that CDF (no duplicated
    probe work); `render_dead` produces the bit-exact background fill for a
    chunk with zero alive rays WITHOUT evaluating the field — on sky-heavy
    aerial frames most chunks take this path (design note: NEXT.md round-3
    item; reference analogue is nerfacc marching emitting zero samples for
    empty rays, ray_rendering.py:430-443).
    """

    def __init__(self, full, probe, render_from_cdf, render_dead,
                 packable=True, prepare=None, check_rays=None,
                 pack_cost_ratio=0.0):
        self.full = full
        self.probe = probe
        self.render_from_cdf = render_from_cdf
        self.render_dead = render_dead
        # ray packing re-batches rays across chunk boundaries; exact only
        # when per-ray outputs are batch-independent (bucketed MoE capacity
        # overflow depends on chunk composition -> not packable)
        self.packable = packable
        # mesh-sharded renderers: prepare(params, statics) commits the
        # params/statics placement ONCE per dispatch (device_put cached per
        # params version) and check_rays validates chunk divisibility —
        # both must run OUTSIDE jit (id()-keyed caching and raising don't
        # survive tracing), hence hooks rather than wrappers
        self.prepare = prepare
        self.check_rays = check_rays
        # packing discards wave-1 CDFs, so packed chunks re-pay the probe:
        # probe cost as a fraction of a chunk's field+mask cost, used by
        # the dispatcher's mode decision (0 = probe free, legacy behavior)
        self.pack_cost_ratio = pack_cost_ratio

    def __call__(self, params, statics, rays):
        if self.check_rays is not None:
            self.check_rays(rays)
        if self.prepare is not None:
            params, statics = self.prepare(params, statics)
        return self.full(params, statics, rays)

    def map_outputs(self, fn):
        """Two-wave renderer with `fn` fused onto every render program.

        fn(rgb, depth, acc, *extra) runs on device inside the same jit
        (e.g. the viewer's uint8 tonemap — the fetch then moves 3 B/ray
        instead of 20). `extra` are per-call traced args threaded through
        render calls; the probe is shared untouched. Cache the result —
        each call builds fresh jit wrappers."""
        full, rcdf, dead = self.full, self.render_from_cdf, self.render_dead
        return TwoWaveOccRenderer(
            full=jax.jit(lambda p, s, r, *ex: fn(*full(p, s, r), *ex)),
            probe=self.probe,
            render_from_cdf=jax.jit(
                lambda p, s, r, c, *ex: fn(*rcdf(p, s, r, c), *ex)
            ),
            render_dead=jax.jit(lambda p, s, r, *ex: fn(*dead(p, s, r), *ex)),
            packable=self.packable,
            prepare=self.prepare,
            check_rays=self.check_rays,
            pack_cost_ratio=self.pack_cost_ratio,
        )


class EarlyStopOccRenderer:
    """Chunk renderer with early ray termination (occupancy path).

    Reference analogue: nerfacc's early_stop_eps in OccGridEstimator.sampling
    (meta_ngp.py:430-443) — a ray stops paying for samples once its
    transmittance is negligible. Fixed TPU shapes cannot skip per-ray work
    inside one program, so the renderer splits into two programs and the
    dispatcher compacts between them on host:

      partial         — first seg samples for every ray; returns a PACKED
                        (C, ncols+1) output (finalized-as-terminated rows +
                        a needs-more flag column) and a device resume state;
      partial_from_cdf — same, consuming a wave-1 probe CDF (two-wave);
      resume          — finish the remaining samples for `cap` gathered row
                        ids of a partial chunk, packed (cap, ncols);
      render_dead     — packed background program for occupancy-dead chunks
                        (hard-mask mode only, else None);
      full            — the one-shot UNPACKED program (exactness tests /
                        direct callers; never used by the ET dispatch).

    Outputs are approximate by at most `2*eps` per channel: the dropped tail
    radiance and the background-weight shift are EACH bounded by the carried
    transmittance (<= eps), and a terminated ray pays both. Not built for bucketed MoE (capacity assignment depends
    on chunk composition — same reason two-wave packing is disabled there)
    or for sharded meshes (host compaction vs chunk-divisibility contract).
    """

    def __init__(self, full, partial, partial_from_cdf, resume, render_dead,
                 probe, ncols, eps, pack_cost_ratio=0.0):
        self.full = full
        self.et_partial = partial
        self.et_partial_from_cdf = partial_from_cdf
        self.et_resume = resume
        self.render_dead = render_dead
        self.probe = probe
        self.ncols = ncols
        self.et_eps = eps
        self.packable = probe is not None  # ET repacks per ray anyway; this
        # gates only the occupancy-dead exclusion before the partial wave
        self.pack_cost_ratio = pack_cost_ratio
        self.prepare = None
        self.check_rays = None

    def __call__(self, params, statics, rays):
        return self.full(params, statics, rays)


def _pad_ids(ids: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros(cap, np.int32)
    out[: len(ids)] = ids
    return out


def _early_stop_dispatch(
    r: EarlyStopOccRenderer,
    params,
    statics,
    rays: np.ndarray,
    chunk_rays: int,
    stats: dict,
):
    """two_wave_dispatch's early-termination mode (see EarlyStopOccRenderer).

    Wave 1 (hard-mask renderers only): probe chunks, pack occupancy-alive
    rays into dense chunks, dead chunks to the background program — the
    existing two-wave economics. Wave A: the partial program over every
    live chunk, all dispatched before the first fetch. Wave B: fetch each
    chunk's packed partial output, keep terminated rays' rows as final, and
    resume still-alive rays in cap-sized slices (cap = chunk/4 — the
    compaction granularity; savings round down to it).
    """
    n = rays.shape[0]
    spans = [(s, min(chunk_rays, n - s)) for s in range(0, n, chunk_rays)]
    stats.update(chunks_total=len(spans), mode="early_stop",
                 chunks_skipped=0, n_resumed=0, n_terminated=0,
                 resume_calls=0)
    cap = max(chunk_rays // 4, 1024)

    # --- big frames: segment so at most SEG resume states are live ---
    SEG = 16
    if len(spans) > SEG:
        pending = []
        totals = {"chunks_total": 0, "chunks_skipped": 0, "n_resumed": 0,
                  "n_terminated": 0, "resume_calls": 0}
        for s0 in range(0, n, SEG * chunk_rays):
            seg_stats: dict = {}
            for ids, out in _early_stop_dispatch(
                r, params, statics, rays[s0 : s0 + SEG * chunk_rays],
                chunk_rays, seg_stats,
            ):
                pending.append((ids + s0, out))
            for k in totals:
                totals[k] += int(seg_stats.get(k, 0))
        stats.update(segments=-(-len(spans) // SEG), **totals)
        return pending

    pending = []
    partials = []  # (global ids (m,), packed partial output, resume state)

    if r.probe is not None:
        # wave 1: occupancy probe -> pack alive rays / skip dead chunks
        probed = []
        for s, m in spans:
            dev = jnp.asarray(_pad_chunk(rays[s : s + m], chunk_rays))
            probed.append((s, m, dev, r.probe(statics, dev)))
        alive = np.zeros(n, bool)
        for s, m, _, (cdf_state, _) in probed:
            alive[s : s + m] = np.asarray(cdf_state["alive_valid"])[:m]
        n_alive = int(alive.sum())
        alive_chunks = sum(1 for s, m in spans if alive[s : s + m].any())
        packed_chunks = -(-n_alive // chunk_rays) if n_alive else 0
        idx_dead_chunks = []
        if packed_chunks * (1.0 + r.pack_cost_ratio) < alive_chunks:
            stats.update(mode="early_stop+packed", n_alive=n_alive,
                         alive_chunks=alive_chunks,
                         packed_chunks=packed_chunks)
            probed = None  # release CDFs; packed partials re-probe
            idx_alive = np.flatnonzero(alive)
            for s in range(0, len(idx_alive), chunk_rays):
                gids = idx_alive[s : s + chunk_rays]
                dev = jnp.asarray(_pad_chunk(rays[gids], chunk_rays))
                packed, state = r.et_partial(params, statics, dev)
                partials.append((gids, packed, state))
            idx_dead = np.flatnonzero(~alive)
            for s in range(0, len(idx_dead), chunk_rays):
                gids = idx_dead[s : s + chunk_rays]
                dev = jnp.asarray(_pad_chunk(rays[gids], chunk_rays))
                pending.append((gids, r.render_dead(params, statics, dev)))
        else:
            skipped = 0
            for i in range(len(probed)):
                s, m, dev, (cdf_state, _) = probed[i]
                probed[i] = None
                gids = np.arange(s, s + m)
                if alive[s : s + m].any():
                    packed, state = r.et_partial_from_cdf(
                        params, statics, dev, cdf_state
                    )
                    partials.append((gids, packed, state))
                else:
                    skipped += 1
                    pending.append(
                        (gids, r.render_dead(params, statics, dev))
                    )
                del cdf_state
            stats.update(mode="early_stop+two_wave", chunks_skipped=skipped,
                         n_alive=n_alive, alive_chunks=alive_chunks)
    else:
        # soft mode: no occupancy dead-ray concept — every chunk partials
        for s, m in spans:
            dev = jnp.asarray(_pad_chunk(rays[s : s + m], chunk_rays))
            packed, state = r.et_partial(params, statics, dev)
            partials.append((np.arange(s, s + m), packed, state))

    # wave B: fetch partial outputs (device compute overlapped — every
    # partial is already dispatched), split terminated/alive, resume
    nc = r.ncols
    for i in range(len(partials)):
        gids, packed, state = partials[i]
        partials[i] = None
        h = np.asarray(packed)
        m = len(gids)
        flags = h[:m, nc] > 0.5
        idx_term = np.flatnonzero(~flags)
        idx_alive = np.flatnonzero(flags)
        if len(idx_term):
            pending.append((gids[idx_term], h[idx_term, :nc]))
        for s in range(0, len(idx_alive), cap):
            sl = idx_alive[s : s + cap]
            ids_dev = jnp.asarray(_pad_ids(sl, cap))
            pending.append(
                (gids[sl], r.et_resume(params, statics, state, ids_dev))
            )
            stats["resume_calls"] += 1
        stats["n_resumed"] += int(len(idx_alive))
        stats["n_terminated"] += int(len(idx_term))
        del state
    return pending


def _fog_stats(weights):
    """Per-ray (wmax, entropy) of the compositing weights — the reference's
    haze signals (video_gen.py:349-352), computed on device so the video
    path never ships (N, S) weight maps to host."""
    wsum = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-12)
    p = weights / wsum
    entropy = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)), axis=1)
    return jnp.max(weights, axis=1), entropy


def make_chunk_renderer(
    cfg: ContainerConfig,
    *,
    ray_samples: int,
    bg_policy: str = "white",
    active_expert: Optional[int] = None,
    occ_state=None,
    occ_importance: bool = False,
    mesh=None,
    occ_probe_grid_res: int = 0,
    occ_hard_mask: bool = True,
    occ_probe_mask: bool = False,  # interval-bit masking, no grid re-query
    use_bg_fn: bool = True,  # False: ignore the learned bg MLP (video op)
    fog_stats: bool = False,  # append per-ray (wmax, entropy) haze signals
    early_stop_eps: float = 0.0,  # > 0: early ray termination (nerfacc
    # early_stop_eps parity) — outputs approximate within 2*eps per channel
    # (tail radiance <= eps dropped AND background weight shifted <= eps)
    early_stop_seg: int = 0,  # first-segment samples (0 = ray_samples // 4)
    sigma_scale: float = 1.0,  # density multiplier (perf harness knob)
):
    """Jitted fixed-size ray-chunk renderer: (params, statics, rays(C,8)) ->
    (rgb (C,3), depth (C,), acc (C,)). With occ_state, samples concentrate
    in occupied space (reference render_rays occ path). occ_hard_mask=False
    renders the SOFT mode (grid steers placement, never zeroes sigma) —
    match it to how the checkpoint was trained (--occ_no_hard_mask); dead
    rays then composite the field, so two-wave skipping is disabled.

    use_bg_fn=False composites the plain bg_policy color even when the
    checkpoint carries a learned background MLP (the reference video path
    sets model.use_bg_nerf = False, video_gen.py:407-408). fog_stats=True
    appends (wmax (C,), entropy (C,)) of the compositing weights to every
    program's outputs (incl. the dead program: zeros — its weights are
    exactly zero) for host-side fog suppression (video_gen.py:329-363).

    occ_probe_grid_res > 0 probes a single resampled union grid instead of
    every expert's every level (K x L fewer probe transactions; placement-
    only approximation — the hard sigma mask stays exact). Unsharded MoE
    path only.

    With a `jax.sharding.Mesh`, the chunk's ray axis shards over the mesh's
    'data' axis (per-ray work is communication-free) — the same renderer
    scales a big frame across chips. The chunk size must divide by the
    'data' axis length. When the mesh also has an 'expert' axis > 1, the
    stacked expert tables shard across it (expert parallelism for large K:
    each device holds and evaluates only its experts; XLA inserts the
    blend's cross-expert reduction) and the expert dispatch switches from
    lax.map to vmap so the mesh, not a serial scan, walks the expert
    axis."""

    def _with_stats(rgb, depth, weights, acc):
        if fog_stats:
            return (rgb, depth, acc) + _fog_stats(weights)
        return rgb, depth, acc

    if occ_state is not None:
        from nerfsys_tpu.models.occupancy import render_rays_occ

        def render_fn(params, statics, rays):
            rgb, depth, w, acc = render_rays_occ(
                params, cfg, statics, occ_state, rays, ray_samples,
                randomized=False, bg_policy=bg_policy,
                active_expert=active_expert, importance=occ_importance,
                hard_mask=occ_hard_mask, mask_from_probes=occ_probe_mask,
                use_bg_fn=use_bg_fn, sigma_scale=sigma_scale,
            )
            return _with_stats(rgb, depth, w, acc)

        # dead chunks reduce to the background only when the background does
        # not read field colors ('last_sample' does; 'random' also needs a
        # key the eval renderer never has) AND sigma is hard-masked (soft
        # mode composites the field on dead rays too). Whether the learned
        # bg MLP is live depends on params at call time, so gate on the
        # policy alone — the dead program applies the same
        # bg-MLP-else-policy fallback as the full one.
        skippable_bg = occ_hard_mask and bg_policy in ("white", "black",
                                                       "none")
        union_probe = bool(occ_probe_grid_res) and active_expert is None \
            and mesh is None
        if bool(occ_probe_grid_res) and not union_probe:
            print("[render] --occ_union_probe_res ignored: union-grid "
                  "probing applies to the unsharded full-MoE path only "
                  "(active_expert=None, no mesh)")
        # packing re-pays the probe the wave-1 CDFs already paid — weigh
        # that in the dispatcher's mode decision (rows are the v5e cost)
        from nerfsys_tpu.utils.flops import analytic_render_gather_rows_per_ray

        # one gather row per probe point per expert (finest-level select +
        # fused pair, ops/occupancy) — keep in sync with the flops model
        occ_L = int(occ_state["binary"].shape[1])
        probe_rows = 128.0 * (1 if union_probe or active_expert is not None
                              else cfg.num_experts)
        planes_cfg = getattr(cfg.expert, "planes", None)
        total_rows = analytic_render_gather_rows_per_ray(
            ray_samples=ray_samples, num_experts=cfg.num_experts,
            experts_evaluated=(1 if active_expert is not None else None),
            occ=True, occ_levels=occ_L, union_probe=union_probe,
            hard_mask=occ_hard_mask,
            lines_gathered=not bool(getattr(planes_cfg, "lines_matmul",
                                            False)),
        )
        pack_ratio = probe_rows / max(total_rows - probe_rows, 1.0)

        # ---- early ray termination (EarlyStopOccRenderer docstring) ----
        et_on = (
            float(early_stop_eps) > 0.0 and mesh is None
            and not cfg.bucketed and int(ray_samples) > 8
            and bg_policy not in ("last_sample", "random")
        )
        if float(early_stop_eps) > 0.0 and not et_on:
            print("[render] early_stop_eps ignored: needs an unsharded, "
                  "non-bucketed renderer with > 8 samples and a background "
                  "that reads no field colors")
        et_builder = None
        if et_on:
            from nerfsys_tpu.models.occupancy import (
                render_rays_occ_et_partial,
                render_rays_occ_et_resume,
            )

            seg = int(early_stop_seg) or max(int(ray_samples) // 4, 8)
            nc = 7 if fog_stats else 5

            def _pack_et(outs):
                rgb, depth, acc = outs[:3]
                cols = [rgb, depth[:, None], acc[:, None]]
                if fog_stats:
                    cols += [outs[3][:, None], outs[4][:, None]]
                return jnp.concatenate(cols, axis=1)

            def et_partial_fn(params, statics, rays, cdf_state=None):
                outs, et_alive, state = render_rays_occ_et_partial(
                    params, cfg, statics, occ_state, rays, ray_samples,
                    seg_samples=seg, bg_policy=bg_policy,
                    use_bg_fn=use_bg_fn, active_expert=active_expert,
                    importance=occ_importance, cdf_state=cdf_state,
                    hard_mask=occ_hard_mask,
                    mask_from_probes=occ_probe_mask,
                    early_stop_eps=float(early_stop_eps), fog=fog_stats,
                    sigma_scale=sigma_scale,
                )
                flag = et_alive.astype(outs[0].dtype)[:, None]
                return jnp.concatenate([_pack_et(outs), flag], axis=1), state

            def et_resume_fn(params, statics, state, ids):
                return _pack_et(render_rays_occ_et_resume(
                    params, cfg, statics, occ_state, state, ids,
                    active_expert=active_expert, importance=occ_importance,
                    hard_mask=occ_hard_mask, sigma_scale=sigma_scale,
                ))

            def et_builder(probe_w, dead_fn):  # noqa: F811
                dead_packed = None
                if dead_fn is not None:
                    dead_packed = jax.jit(
                        lambda p, s, rr: _pack_et(dead_fn(p, s, rr))
                    )
                return EarlyStopOccRenderer(
                    full=jax.jit(render_fn),
                    partial=jax.jit(
                        lambda p, s, rr: et_partial_fn(p, s, rr)
                    ),
                    partial_from_cdf=(jax.jit(et_partial_fn)
                                      if probe_w is not None else None),
                    resume=jax.jit(et_resume_fn),
                    render_dead=dead_packed,
                    probe=probe_w,
                    ncols=nc,
                    eps=float(early_stop_eps),
                    pack_cost_ratio=pack_ratio,
                )

        if skippable_bg:
            from nerfsys_tpu.models.occupancy import (
                probe_rays_occ,
                render_rays_occ_dead,
            )

            def probe_fn(statics, rays):
                return probe_rays_occ(
                    statics, occ_state, rays, active_expert=active_expert,
                    importance=occ_importance,
                )

            def render_cdf_fn(params, statics, rays, cdf_state):
                rgb, depth, w, acc = render_rays_occ(
                    params, cfg, statics, occ_state, rays, ray_samples,
                    randomized=False, bg_policy=bg_policy,
                    active_expert=active_expert, importance=occ_importance,
                    cdf_state=cdf_state, mask_from_probes=occ_probe_mask,
                    use_bg_fn=use_bg_fn, sigma_scale=sigma_scale,
                )
                return _with_stats(rgb, depth, w, acc)

            def render_dead_fn(params, statics, rays):
                rgb, depth, w, acc = render_rays_occ_dead(
                    params, cfg, statics, rays, ray_samples,
                    bg_policy=bg_policy, use_bg_fn=use_bg_fn,
                    sigma_scale=sigma_scale,
                )
                return _with_stats(rgb, depth, w, acc)

            if mesh is None:
                probe_w = (
                    _union_probe_wrap(occ_state, occ_importance,
                                      int(occ_probe_grid_res))
                    if union_probe else jax.jit(probe_fn)
                )
                if et_builder is not None:
                    return et_builder(probe_w, render_dead_fn)
                return TwoWaveOccRenderer(
                    full=jax.jit(render_fn),
                    probe=probe_w,
                    render_from_cdf=jax.jit(render_cdf_fn),
                    render_dead=jax.jit(render_dead_fn),
                    packable=not cfg.bucketed,
                    pack_cost_ratio=pack_ratio,
                )
        else:
            probe_fn = None
            if et_builder is not None:
                # soft mode: no occupancy dead-ray concept, so no probe/dead
                # programs — every chunk partials, termination is purely by
                # accumulated transmittance
                return et_builder(None, None)
            if union_probe:
                # SOFT mode one-shot + union grid: the grid steers sample
                # PLACEMENT through render_rays_occ's probe_fns override —
                # probe rows drop /K exactly as on the hard-mask two-wave
                # path (before this, --occ_union_probe_res was a silent
                # no-op on soft checkpoints: the TwoWave probe wrapper only
                # exists when dead chunks do, and --render_fast therefore
                # changed nothing on the shipped soft default — measured
                # bit-identical eval_live/eval_fast, 2026-08-21). Same
                # lazy-per-statics grid-as-argument pattern as
                # _union_probe_wrap.
                import functools

                from nerfsys_tpu.models.occupancy import (
                    build_union_probe_grid,
                    union_probe_fns,
                )

                build_j = jax.jit(functools.partial(
                    build_union_probe_grid, res=int(occ_probe_grid_res),
                    importance=occ_importance))
                grid_cache: Dict = {}

                def grid_for(statics):
                    key = id(statics)
                    if key not in grid_cache:
                        grid_cache.clear()
                        grid_cache[key] = (statics, build_j(occ_state,
                                                            statics))
                    return grid_cache[key][1]

                def render_union_fn(grid, params, statics, rays):
                    rgb, depth, w, acc = render_rays_occ(
                        params, cfg, statics, occ_state, rays, ray_samples,
                        randomized=False, bg_policy=bg_policy,
                        active_expert=active_expert,
                        importance=occ_importance,
                        hard_mask=occ_hard_mask,
                        mask_from_probes=occ_probe_mask,
                        use_bg_fn=use_bg_fn, sigma_scale=sigma_scale,
                        probe_fns=union_probe_fns(grid),
                    )
                    return _with_stats(rgb, depth, w, acc)

                jit_u = jax.jit(render_union_fn)
                return lambda p, s, r: jit_u(grid_for(s), p, s, r)
    else:
        if float(early_stop_eps) > 0.0:
            print("[render] early_stop_eps ignored: early ray termination "
                  "exists on the occupancy path only (checkpoint has no "
                  "occ state / --use_occ off)")
        probe_fn = None
        def render_fn(params, statics, rays):
            field = container_field_fn(params, cfg, statics, active_expert)
            rgb, depth, w, acc = render_rays_stratified(
                field, rays, ray_samples, randomized=False,
                bg_policy=bg_policy,
                bg_fn=container_bg_fn(params, cfg) if use_bg_fn else None,
                sigma_scale=sigma_scale,
            )
            return _with_stats(rgb, depth, w, acc)

    if mesh is None:
        return jax.jit(render_fn)

    from nerfsys_tpu.parallel.mesh import (
        ray_batch_sharding,
        replicated,
        shard_params,
    )

    shard_experts = mesh.shape.get("expert", 1) > 1
    if shard_experts and cfg.expert_map:
        # a lax.map scan over a sharded expert axis would serialize what
        # the mesh parallelizes — rebind the renderer on the vmap path
        import dataclasses as _dc

        return make_chunk_renderer(
            _dc.replace(cfg, expert_map=False), ray_samples=ray_samples,
            bg_policy=bg_policy, active_expert=active_expert,
            occ_state=occ_state, occ_importance=occ_importance, mesh=mesh,
            occ_probe_grid_res=occ_probe_grid_res,
            occ_hard_mask=occ_hard_mask, occ_probe_mask=occ_probe_mask,
            use_bg_fn=use_bg_fn, fog_stats=fog_stats,
        )

    ray_sh = ray_batch_sharding(mesh)  # P('data', None)
    rep = replicated(mesh)
    out_vec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    out_sh = (ray_sh, out_vec, out_vec) + ((out_vec, out_vec) if fog_stats
                                           else ())
    jitted = jax.jit(
        render_fn,
        # params/statics shardings inferred from their committed placement
        # (replicated, or expert-stacked leaves on 'expert')
        in_shardings=(None, None, ray_sh),
        out_shardings=out_sh,
    )
    data_axis = mesh.shape["data"]
    rep_cache = {}  # id(params) -> placed copy: device_put ONCE per
    # params version, not a full-pytree broadcast on every chunk call

    def check_rays(rays):
        if rays.shape[0] % data_axis != 0:
            raise ValueError(
                f"render chunk of {rays.shape[0]} rays does not divide the "
                f"mesh data axis ({data_axis}); pad the chunk or pick a "
                f"chunk size that is a multiple of the data axis"
            )

    def prepare(params, statics):
        key = id(params)
        if key not in rep_cache:
            rep_cache.clear()
            # keep `params` itself in the entry so its id stays pinned
            # for the cache's lifetime (no id-reuse aliasing after gc)
            rep_cache[key] = (
                params,
                shard_params(params, mesh, shard_experts=shard_experts),
                jax.device_put(statics, rep),
            )
        _, p_rep, s_rep = rep_cache[key]
        return p_rep, s_rep

    if probe_fn is not None:
        # sharded two-wave: the probe/CDF render/dead programs shard the
        # ray axis exactly like the one-shot program; cdf_state flows
        # probe -> render committed, so its shardings are inferred
        return TwoWaveOccRenderer(
            full=jitted,
            probe=jax.jit(probe_fn, in_shardings=(None, ray_sh)),
            render_from_cdf=jax.jit(
                render_cdf_fn, in_shardings=(None, None, ray_sh, None),
                out_shardings=out_sh,
            ),
            render_dead=jax.jit(
                render_dead_fn, in_shardings=(None, None, ray_sh),
                out_shardings=out_sh,
            ),
            packable=not cfg.bucketed,
            prepare=prepare,
            check_rays=check_rays,
            pack_cost_ratio=pack_ratio,
        )

    def render_sharded(params, statics, rays):
        check_rays(rays)
        p_rep, s_rep = prepare(params, statics)
        return jitted(p_rep, s_rep, rays)

    return render_sharded


def default_chunk_rays(ray_samples: int, budget_pts: int = 3_145_728) -> int:
    """Largest lane-friendly render chunk whose rays x samples point count
    stays HBM-resident: a 65536-ray x 96-sample chunk compiles to a ~21 GB
    program on the 16 GB v5e (measured OOM), while the 48-sample x 65536
    (3.1M-point) program runs comfortably — so budget 3M points and floor
    at 4096 rays to keep MXU batches wide."""
    c = budget_pts // max(int(ray_samples), 1)
    return int(max(4096, min(65536, (c // 1024) * 1024)))


def render_image(
    chunk_renderer,
    params,
    statics: ContainerStatics,
    md: ImageMetadata,
    *,
    scene_aabb: Optional[np.ndarray] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    chunk_rays: int = 65536,
):
    """Full-frame render via fixed-size padded chunks (no recompiles).

    Counterpart of reference render_image (ray_rendering.py:577-627).
    Returns (rgb (H,W,3) linear, depth (H,W), acc (H,W)) as numpy.
    """
    H, W = md.H, md.W
    rays, _ = frame_rays(H, W, md.intrinsics, md.c2w, aabb=scene_aabb,
                         near=near, far=far)

    out = render_rays_chunked(chunk_renderer, params, statics, rays,
                              chunk_rays)
    return (
        out[:, 0:3].reshape(H, W, 3).copy(),
        out[:, 3].reshape(H, W).copy(),
        out[:, 4].reshape(H, W).copy(),
    )


def frame_chunk_rays_biased(
    c2w, intr, start, chunk_rays, H, W, *, scene_box, near, far,
    near_override, far_override, near_bias,
):
    """On-device frame raygen + the video path's near-bias shift.

    Shared by the live and baked camera renderers (ONE copy of the
    t_near = max(near, 0) + bias, capped at far - 1e-4 arithmetic —
    video_gen.py:362-366 parity; inf miss tags flow through unchanged)."""
    from nerfsys_tpu.ops.rays import clamp_rays_near_far, frame_chunk_rays

    rays = frame_chunk_rays(
        c2w, intr, start, chunk_rays, H, W, scene_box=scene_box,
        near=near, far=far,
        near_override=near_override, far_override=far_override,
    )
    if float(near_bias) != 0.0:
        t_near = jnp.maximum(rays[:, 6], 0.0) + jnp.float32(near_bias)
        rays = rays.at[:, 6].set(jnp.minimum(t_near, rays[:, 7] - 1e-4))
        rays, _ = clamp_rays_near_far(rays)
    return rays


def shape_frame_outputs(
    rays, rgb, depth, weights, acc, *extra, fog_stats, invalid_black,
    map_outputs, out_u8,
):
    """Camera-renderer output shaping, inside the jitted chunk program.

    Appends the fog haze signals, zeroes AABB-miss rays on device
    (invalid_black — the host paths' valid-mask semantics), then applies
    map_outputs / the u8 quantization / the stacked-planes packing. ONE
    copy shared by the live and baked camera renderers so the semantics
    cannot drift between them."""
    outs = [rgb, depth, acc]
    if fog_stats:
        outs += list(_fog_stats(weights))
    if invalid_black:
        ok = jnp.isfinite(rays[:, 6])
        outs = [jnp.where(ok[:, None] if o.ndim == 2 else ok, o, 0.0)
                for o in outs]
    if map_outputs is not None:
        return map_outputs(*outs, *extra)
    if out_u8:
        return jnp.clip(outs[0] * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return jnp.concatenate(
        [o if o.ndim == 2 else o[:, None] for o in outs], axis=1)


def make_live_camera_renderer(
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
    near_bias: float = 0.0,
    occ_state=None,
    occ_importance: bool = False,
    occ_hard_mask: bool = True,
    occ_probe_mask: bool = False,
    occ_probe_grid_res: int = 0,  # union-grid probing (0 = exact per-expert)
    active_expert: Optional[int] = None,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    fog_stats: bool = False,
    invalid_black: bool = False,
    out_u8: bool = True,
    map_outputs=None,
):
    """Serving-path frame renderer over the LIVE field:
    (params, statics, c2w (3,4), intrinsics (4,), *extra) -> (H, W, 3)
    uint8 (or stacked f32 planes with out_u8=False / a map_outputs fn).

    The live counterpart of models/baked.make_baked_camera_renderer: rays
    generate ON DEVICE (ops/rays.frame_chunk_rays) and the display
    transform fuses into the render program, so per-frame host<->device
    traffic is ~20 floats up + the frame down — vs H*W*8 f32 of rays up
    for the render_image/two_wave_dispatch path (~6 MB at the viewer's
    512², ~20 MB at 800² through the axon tunnel). One compiled program
    serves every chunk AND camera (start/c2w/intrinsics are traced).

    Covers the ONE-PROGRAM live modes: stratified, soft occupancy (the
    shipped default — the grid steers placement inside the program, no
    probe wave), and hard-mask occ WITHOUT dead-chunk skipping. The
    two-wave chunk-skip/pack dispatcher stays on the host-ray path
    (runtime's mode decision needs per-ray alive bits on host); callers
    that want sky-skipping on hard-mask checkpoints keep riding
    two_wave_dispatch. Reference analogue: the viewer render callback
    (/root/reference/adaptive_nerf/viewer/viewer.py:694-848) regenerates
    and uploads rays per frame.

    `near_bias` applies the video path's near shift on device
    (t_near = max(near, 0) + bias, capped at far - 1e-4; inf miss tags
    flow through unchanged — video_gen.py:362-366 parity).

    `map_outputs(rgb, depth, acc[, wmax, entropy], *extra)` transforms
    outputs INSIDE the jitted program (fused u8 tonemap, fog suppression
    + srgb for video). With fog_stats the per-ray haze signals are
    appended before map_outputs/stacking. invalid_black zeroes AABB-miss
    pixels on device (the host paths' valid-mask semantics)."""
    from nerfsys_tpu.ops.scene_box import SceneBox

    sb = None
    if scene_aabb is not None:
        sb = SceneBox(jnp.asarray(np.asarray(scene_aabb), jnp.float32))
    elif near is None or far is None:
        raise ValueError("provide scene_aabb or scalar near/far")

    if occ_state is not None:
        from nerfsys_tpu.models.occupancy import render_rays_occ

    # union-grid probing parity with make_chunk_renderer: the grid builds
    # lazily per statics version OUTSIDE jit and threads in as a traced
    # argument (same pattern as _union_probe_wrap); the hard sigma mask
    # inside render_rays_occ stays exact per-expert either way
    union_grid_for = None
    if occ_state is not None and int(occ_probe_grid_res) > 0:
        if active_expert is not None:
            print("[render] --occ_union_probe_res ignored: union-grid "
                  "probing applies to the full-MoE path only "
                  "(active_expert set)")
        else:
            import functools

            from nerfsys_tpu.models.occupancy import build_union_probe_grid

            _build_j = jax.jit(functools.partial(
                build_union_probe_grid, res=int(occ_probe_grid_res),
                importance=occ_importance))
            _grid_cache: Dict = {}

            def union_grid_for(statics):
                k = id(statics)
                if k not in _grid_cache:
                    _grid_cache.clear()
                    _grid_cache[k] = (statics, _build_j(occ_state, statics))
                return _grid_cache[k][1]

    def chunk_fn(params, statics, c2w, intr, start, union_grid, *extra):
        rays = frame_chunk_rays_biased(
            c2w, intr, start, chunk_rays, H, W, scene_box=sb,
            near=near, far=far, near_override=near_override,
            far_override=far_override, near_bias=near_bias,
        )
        if occ_state is not None:
            probe_fns = None
            if union_grid is not None:  # static: None or a traced grid
                from nerfsys_tpu.models.occupancy import union_probe_fns

                probe_fns = union_probe_fns(union_grid)
            rgb, depth, w, acc = render_rays_occ(
                params, cfg, statics, occ_state, rays, ray_samples,
                randomized=False, bg_policy=bg_policy,
                active_expert=active_expert, importance=occ_importance,
                hard_mask=occ_hard_mask, mask_from_probes=occ_probe_mask,
                use_bg_fn=use_bg_fn, probe_fns=probe_fns,
            )
        else:
            field = container_field_fn(params, cfg, statics, active_expert)
            rgb, depth, w, acc = render_rays_stratified(
                field, rays, ray_samples, randomized=False,
                bg_policy=bg_policy,
                bg_fn=container_bg_fn(params, cfg) if use_bg_fn else None,
            )
        return shape_frame_outputs(
            rays, rgb, depth, w, acc, *extra, fog_stats=fog_stats,
            invalid_black=invalid_black, map_outputs=map_outputs,
            out_u8=out_u8)

    jitted = jax.jit(chunk_fn)
    n_pix = H * W

    def render(params, statics, c2w, intrinsics, *extra):
        c2w_j = jnp.asarray(np.asarray(c2w, np.float32)[:3, :4])
        intr_j = jnp.asarray(np.asarray(intrinsics, np.float32)[:4])
        ug = union_grid_for(statics) if union_grid_for is not None else None
        # dispatch every chunk before the first fetch (compute overlaps
        # the readbacks)
        pending = [
            jitted(params, statics, c2w_j, intr_j,
                   jnp.asarray(s, jnp.int32), ug, *extra)
            for s in range(0, n_pix, chunk_rays)
        ]
        out = np.concatenate([np.asarray(p) for p in pending], 0)[:n_pix]
        if map_outputs is not None or out_u8:
            return out.reshape(H, W, -1)
        return out  # (H*W, C) stacked planes; caller reshapes

    return render


class CoherentExpertRenderer:
    """Bundle for coherent_dispatch: `full` renders a routed chunk,
    `single(params, statics, rays, k)` renders a chunk through expert k
    alone (k is TRACED — one compiled program serves all K experts), and
    `probe(statics, rays)` returns each ray's coherent expert id or -1
    (models/container.routing_coherent_expert)."""

    def __init__(self, full, single, probe, num_experts, fog_stats=False):
        self.full = full
        self.single = single
        self.probe = probe
        self.num_experts = int(num_experts)
        self.fog_stats = bool(fog_stats)

    def __call__(self, params, statics, rays):
        # no *extra: the coherent render fns take none (unlike the fused-u8
        # two-wave paths) — advertising it would promise a TypeError
        return self.full(params, statics, rays)


def make_coherent_renderer(
    cfg: ContainerConfig,
    *,
    ray_samples: int,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    fog_stats: bool = False,
    occ_state=None,  # occupancy-guided coherent mode (see below)
    occ_importance: bool = False,
    occ_hard_mask: bool = True,
    occ_probe_mask: bool = False,
    sigma_scale: float = 1.0,
    occ_probe_grid_res: int = 0,  # probe ONE resampled union grid instead
    # of the K-expert union (probe rows drop /K) — shared by ALL programs
    # (probe + single + full), so the coherent exactness contract holds
    # verbatim under the cheaper probing (identical CDF everywhere)
):
    """Coherent-expert live renderer (the honest fast top-1 path).

    Bucketed top-1 routing degrades to dense on spatially-skewed FRAMES
    (most pixels route to 1-2 experts, the capacity buckets overflow and
    the exact fallback evaluates all K — BASELINE.md retired rungs). But
    skewed frames are exactly the COHERENT case: whole rays sit inside
    one expert's routing region. coherent_dispatch packs such rays into
    dense chunks and renders each through ONE expert (1/K the field
    evals), keeping the full routed program only for boundary-crossing
    rays — EXACT by construction (the packed rays are ones where the
    routed blend equals the single-expert field; routing_coherent_expert
    docstring). Probe cost is pure routing arithmetic + a 4-byte/ray
    fetch on the stratified path.

    With occ_state, sampling is occupancy-guided (render_rays_occ): every
    program probes the UNION grids for placement (identical CDF ->
    identical sample positions and hard-mask semantics as the full
    program) and only the FIELD eval narrows to one expert
    (field_expert=k, traced). The probe then also pays the union CDF —
    routing is checked at the CDF-determined positions, where the
    exactness argument must hold."""

    def _stats(rgb, depth, weights, acc):
        if fog_stats:
            return (rgb, depth, acc) + _fog_stats(weights)
        return rgb, depth, acc

    if occ_state is not None:
        from nerfsys_tpu.models.occupancy import (
            occ_sample_positions,
            render_rays_occ,
        )

        use_union_grid = int(occ_probe_grid_res) > 0

        def render_k(pfns, params, statics, rays, k):
            return _stats(*render_rays_occ(
                params, cfg, statics, occ_state, rays, ray_samples,
                randomized=False, bg_policy=bg_policy,
                importance=occ_importance, hard_mask=occ_hard_mask,
                mask_from_probes=occ_probe_mask, use_bg_fn=use_bg_fn,
                sigma_scale=sigma_scale, field_expert=k, probe_fns=pfns,
            ))

        def probe_impl(pfns, statics, rays):
            from nerfsys_tpu.models.container import (
                routing_coherent_expert,
            )

            pts, _, alive = occ_sample_positions(
                occ_state, statics, rays, ray_samples,
                importance=occ_importance, hard_mask=occ_hard_mask,
                probe_fns=pfns,
            )
            kid = routing_coherent_expert(statics, cfg, pts)
            if occ_hard_mask:
                # dead rays (no occupancy mass anywhere) hard-mask sigma
                # to zero in EVERY program, so any expert renders them
                # identically — pack them with expert 0 instead of letting
                # their uniform-fallback CDF (which spans regions) send
                # every sky ray through the expensive full routed program.
                # Soft mode composites the live field on dead rays, so
                # there the routing test must keep deciding.
                kid = jnp.where(alive, kid, 0)
            return kid

        if not use_union_grid:
            return CoherentExpertRenderer(
                full=jax.jit(lambda p, s, r: render_k(None, p, s, r, None)),
                single=jax.jit(
                    lambda p, s, r, k: render_k(None, p, s, r, k)),
                probe=jax.jit(lambda s, r: probe_impl(None, s, r)),
                num_experts=cfg.num_experts, fog_stats=fog_stats,
            )

        # coherent + union-probe combo: every program probes the ONE
        # resampled union grid, so probe rows drop /K alongside the /K
        # field evals (BASELINE.md coherent-row projection). The grid is
        # built lazily per statics version and threaded as a jit ARGUMENT
        # (the _union_probe_wrap pattern — id() caches don't survive
        # tracing); sharing ONE grid across probe/single/full keeps the
        # CDF identical everywhere, which is the exactness contract
        # (tests/test_coherent.py union arm).
        import functools

        from nerfsys_tpu.models.occupancy import (
            build_union_probe_grid,
            union_probe_fns,
        )

        build_j = jax.jit(functools.partial(
            build_union_probe_grid, res=int(occ_probe_grid_res),
            importance=occ_importance))
        cache: Dict = {}

        def grid_for(statics):
            key = id(statics)
            if key not in cache:
                cache.clear()
                cache[key] = (statics, build_j(occ_state, statics))
            return cache[key][1]

        full_j = jax.jit(
            lambda g, p, s, r: render_k(union_probe_fns(g), p, s, r, None))
        single_j = jax.jit(
            lambda g, p, s, r, k: render_k(union_probe_fns(g), p, s, r, k))
        probe_j = jax.jit(
            lambda g, s, r: probe_impl(union_probe_fns(g), s, r))

        return CoherentExpertRenderer(
            full=lambda p, s, r: full_j(grid_for(s), p, s, r),
            single=lambda p, s, r, k: single_j(grid_for(s), p, s, r, k),
            probe=lambda s, r: probe_j(grid_for(s), s, r),
            num_experts=cfg.num_experts, fog_stats=fog_stats,
        )

    def full_fn(params, statics, rays):
        field = container_field_fn(params, cfg, statics, None)
        return _stats(*render_rays_stratified(
            field, rays, ray_samples, randomized=False, bg_policy=bg_policy,
            bg_fn=container_bg_fn(params, cfg) if use_bg_fn else None,
            sigma_scale=sigma_scale,
        ))

    def single_fn(params, statics, rays, k):
        field = container_field_fn(params, cfg, statics, k)
        return _stats(*render_rays_stratified(
            field, rays, ray_samples, randomized=False, bg_policy=bg_policy,
            bg_fn=container_bg_fn(params, cfg) if use_bg_fn else None,
            sigma_scale=sigma_scale,
        ))

    def probe_fn(statics, rays):
        from nerfsys_tpu.models.container import routing_coherent_expert
        from nerfsys_tpu.ops.volrend import stratified_t_vals, t_to_points

        o, d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6], rays[:, 7]
        valid = (jnp.isfinite(near) & jnp.isfinite(far) & (far > near)
                 & (far < 1e9))
        near_s = jnp.where(valid, near, 0.0)
        far_s = jnp.where(valid, far, 1.0)
        # EXACTLY the render's sample positions (render_rays_stratified)
        t_vals = stratified_t_vals(None, near_s, far_s, ray_samples, False)
        pts = t_to_points(o, d, t_vals)
        kid = routing_coherent_expert(statics, cfg, pts)
        # invalid rays composite the background identically under every
        # program — pack them with their nearest expert
        return kid

    return CoherentExpertRenderer(
        full=jax.jit(full_fn), single=jax.jit(single_fn),
        probe=jax.jit(probe_fn), num_experts=cfg.num_experts,
        fog_stats=fog_stats,
    )


def coherent_dispatch(
    renderer: CoherentExpertRenderer,
    params,
    statics: ContainerStatics,
    rays: np.ndarray,  # (n, 8) float32, host
    chunk_rays: int,
    stats: Optional[dict] = None,
):
    """Two-wave coherent-expert dispatch -> [(ids, device_output), ...].

    Wave 1 probes each chunk's per-ray coherent expert (pure routing
    arithmetic); wave 2 packs same-expert rays into dense chunks rendered
    through the ONE-expert program (traced expert id: a single compile
    serves all K) and routes boundary-crossing rays through the full
    program. Exact: packed rays are exactly those where the routed blend
    equals the single-expert field (tests/test_coherent.py).

    Tail buckets: a large-K frame spreads rays over many experts, so
    padding every per-expert tail to the full chunk would dominate (at
    K=16, 45%-coherent 800² frames pad ~3.5x the useful rays). Tails pack
    into the smallest fitting shape of a halving ladder (chunk_rays,
    chunk/2, ... down to max(chunk/32, 1024)): padding <= 2x for any tail
    larger than the smallest bucket, <= that bucket's size otherwise
    (stats['rays_padded'] reports the realized total); at most 6 compiled
    shapes per program, and the single-expert program is traced over the
    expert id, so shapes — not K — bound the compile count."""
    n = rays.shape[0]
    if stats is None:
        stats = {}
    sizes = [chunk_rays]  # descending halving ladder of bucket shapes
    while sizes[-1] > 1024 and len(sizes) < 6:
        sizes.append(sizes[-1] // 2)

    spans = [(s, min(chunk_rays, n - s)) for s in range(0, n, chunk_rays)]
    kid = np.empty(n, np.int32)
    for s, m in spans:
        dev = jnp.asarray(_pad_chunk(rays[s:s + m], chunk_rays))
        kid[s:s + m] = np.asarray(renderer.probe(statics, dev))[:m]

    def emit(ids_all, run):
        for s in range(0, len(ids_all), chunk_rays):
            ids = ids_all[s:s + chunk_rays]
            size = next((z for z in reversed(sizes) if z >= len(ids)),
                        chunk_rays)
            run(ids, jnp.asarray(_pad_chunk(rays[ids], size)))

    pending = []
    coherent = 0
    for k in range(renderer.num_experts):
        ids_k = np.flatnonzero(kid == k)
        coherent += len(ids_k)

        def run_k(ids, dev, k=k):
            pending.append((ids, renderer.single(
                params, statics, dev, jnp.asarray(k, jnp.int32))))

        emit(ids_k, run_k)
    emit(np.flatnonzero(kid < 0),
         lambda ids, dev: pending.append(
             (ids, renderer.full(params, statics, dev))))
    rays_padded = -n
    for ids, _ in pending:
        size = next((z for z in reversed(sizes) if z >= len(ids)),
                    chunk_rays)
        rays_padded += size
    stats.update(mode="coherent", n_coherent=int(coherent),
                 n_boundary=int(n - coherent),
                 chunks_total=len(pending),
                 rays_padded=int(max(rays_padded, 0)))
    return pending


def _pad_chunk(chunk: np.ndarray, chunk_rays: int) -> np.ndarray:
    pad = chunk_rays - chunk.shape[0]
    if pad:
        chunk = np.concatenate([chunk, np.zeros((pad, 8), np.float32)], 0)
    return chunk


def _pack5(rgb, depth, acc):
    return jnp.concatenate([rgb, depth[:, None], acc[:, None]], 1)


def _pack7(rgb, depth, acc, wmax, entropy):
    return jnp.concatenate(
        [rgb, depth[:, None], acc[:, None], wmax[:, None], entropy[:, None]], 1
    )


def two_wave_dispatch(
    chunk_renderer,
    params,
    statics: ContainerStatics,
    rays: np.ndarray,  # (n, 8) float32, host
    chunk_rays: int,
    *extra,
    stats: Optional[dict] = None,
    probe_cache: Optional[dict] = None,
):
    """Dispatch a ray batch through fixed-size padded chunks; the caller
    fetches and scatters. Returns [(ids (m,) int, device_output), ...] with
    every chunk dispatched before the first fetch, so device compute
    overlaps the high-latency device->host readbacks.

    Output-agnostic: works for the (rgb, depth, acc) renderer and for any
    `map_outputs` variant (e.g. the viewer's fused uint8 tonemap); `extra`
    per-call traced args are threaded through render calls (not the probe).

    `probe_cache` (a caller-owned dict) persists wave 1 across calls: the
    probe depends only on (rays, grid), never params, so a viewer
    rendering the SAME camera while adaptation updates params every frame
    pays the probe once. The CALLER owns invalidation — pass a fresh dict
    (or none) whenever rays or the occupancy grid change. Ignored for
    frames larger than the segment budget.

    With a TwoWaveOccRenderer, wave 1 probes every chunk's occupancy CDF
    and fetches the per-ray alive bits; wave 2 then picks per frame:
      - ray packing (renderer.packable and it saves field-eval launches):
        alive rays from the whole frame are re-batched into dense chunks —
        field-eval cost scales with alive RAYS, not alive chunks, which is
        what matters when sky interleaves with geometry inside every chunk.
        Exact because per-ray outputs are batch-independent.
      - chunk skipping otherwise: alive chunks render FROM the wave-1 CDF
        (zero duplicated probe work), dead chunks from the background-only
        program (bit-exact, tests/test_chunk_skip.py).
    """
    n = rays.shape[0]
    if stats is None:
        stats = {}
    if getattr(chunk_renderer, "et_resume", None) is not None:
        # early-termination renderer: its own dispatch (partial -> host
        # compaction -> resume); probe_cache does not apply (resume states
        # depend on params, unlike probe CDFs)
        if extra:
            raise ValueError(
                "early-stop renderers pack their outputs on device and do "
                "not thread extra per-call args"
            )
        return _early_stop_dispatch(
            chunk_renderer, params, statics, rays, chunk_rays, stats
        )
    spans = [(s, min(chunk_rays, n - s)) for s in range(0, n, chunk_rays)]
    stats.update(chunks_total=len(spans), mode="plain", chunks_skipped=0)

    if getattr(chunk_renderer, "probe", None) is None:
        return [
            (np.arange(s, s + m),
             chunk_renderer(
                 params, statics,
                 jnp.asarray(_pad_chunk(rays[s : s + m], chunk_rays)), *extra,
             ))
            for s, m in spans
        ]

    if chunk_renderer.check_rays is not None and spans:
        chunk_renderer.check_rays(np.empty((chunk_rays, 8), np.float32))
    if chunk_renderer.prepare is not None:
        params, statics = chunk_renderer.prepare(params, statics)

    # huge frames: process in segments so at most SEG probe CDF states
    # (~21-42 MB each) are live on device at once — a 4K frame would
    # otherwise hold ~250 of them (multi-GB) through the alive fetch.
    # Mode (skip vs pack) is decided per segment; packing efficiency only
    # degrades marginally (alive rays pack within their segment).
    SEG = 16
    if len(spans) > SEG:
        pending = []
        totals = {"chunks_total": 0, "chunks_skipped": 0, "n_alive": 0,
                  "alive_chunks": 0}
        modes = set()
        for s0 in range(0, n, SEG * chunk_rays):
            seg_stats: dict = {}
            for ids, out in two_wave_dispatch(
                chunk_renderer, params, statics,
                rays[s0 : s0 + SEG * chunk_rays], chunk_rays, *extra,
                stats=seg_stats,
            ):
                pending.append((ids + s0, out))
            modes.add(seg_stats.get("mode"))
            for k in totals:
                totals[k] += int(seg_stats.get(k, 0))
        stats.update(mode="+".join(sorted(m for m in modes if m)),
                     segments=-(-len(spans) // SEG), **totals)
        return pending

    # ---- wave 1: probe every chunk, fetch per-ray alive bits ----
    if probe_cache is not None and probe_cache.get("chunk_rays") == chunk_rays:
        probed = probe_cache["probed"]
        alive = probe_cache["alive"]
        stats.update(probe_cached=True)
    else:
        probed = []
        for s, m in spans:
            dev = jnp.asarray(_pad_chunk(rays[s : s + m], chunk_rays))
            probed.append((s, m, dev, chunk_renderer.probe(statics, dev)))
        alive = np.zeros(n, bool)
        for s, m, _, (cdf_state, _) in probed:
            # alive & valid per the DEVICE's validity predicate
            # (probe_rays_occ computes it — one definition, no host numpy
            # twin to keep in sync)
            alive[s : s + m] = np.asarray(cdf_state["alive_valid"])[:m]
        if probe_cache is not None:
            probe_cache.update(probed=probed, alive=alive,
                               chunk_rays=chunk_rays)

    alive_chunks = sum(1 for s, m in spans if alive[s : s + m].any())
    n_alive = int(alive.sum())
    packed_chunks = -(-n_alive // chunk_rays) if n_alive else 0

    pending = []
    ratio = getattr(chunk_renderer, "pack_cost_ratio", 0.0)
    if getattr(chunk_renderer, "packable", False) and (
        packed_chunks * (1.0 + ratio) < alive_chunks
    ):
        # ---- ray packing: field-eval launches = ceil(alive / chunk) ----
        stats.update(mode="packed", packed_chunks=packed_chunks,
                     alive_chunks=alive_chunks, n_alive=n_alive)
        if probe_cache is None:
            probed = None  # release every chunk's probe CDF (~42 MB each
            # at 65536 rays x 128 probes — a 4K frame holds 127 otherwise)
        idx_alive = np.flatnonzero(alive)
        idx_dead = np.flatnonzero(~alive)
        for s in range(0, len(idx_alive), chunk_rays):
            ids = idx_alive[s : s + chunk_rays]
            dev = jnp.asarray(_pad_chunk(rays[ids], chunk_rays))
            pending.append(
                (ids, chunk_renderer.full(params, statics, dev, *extra))
            )
        for s in range(0, len(idx_dead), chunk_rays):
            ids = idx_dead[s : s + chunk_rays]
            dev = jnp.asarray(_pad_chunk(rays[ids], chunk_rays))
            pending.append(
                (ids,
                 chunk_renderer.render_dead(params, statics, dev, *extra))
            )
        return pending

    # ---- chunk skipping from the hoisted CDF ----
    skipped = 0
    for i in range(len(probed)):
        s, m, dev, (cdf_state, _) = probed[i]
        if probe_cache is None:
            probed[i] = None  # drop the CDF ref once its render is
            # dispatched: device memory frees as the queue drains instead
            # of at frame end (kept when the caller caches the probe)
        if alive[s : s + m].any():
            out = chunk_renderer.render_from_cdf(
                params, statics, dev, cdf_state, *extra
            )
        else:
            skipped += 1
            out = chunk_renderer.render_dead(params, statics, dev, *extra)
        del cdf_state
        pending.append((np.arange(s, s + m), out))
    stats.update(mode="two_wave", chunks_skipped=skipped,
                 alive_chunks=alive_chunks, n_alive=n_alive)
    return pending


def render_rays_chunked(
    chunk_renderer,
    params,
    statics: ContainerStatics,
    rays: np.ndarray,  # (n, 8) float32, host
    chunk_rays: int,
    stats: Optional[dict] = None,
    fog_stats: bool = False,  # renderer built with fog_stats=True -> (n, 7)
) -> np.ndarray:
    """Render an arbitrary ray batch through fixed-size padded chunks.

    Returns (n, 5) float32 [rgb, depth, acc] on host — two_wave_dispatch
    with the outputs packed on device into one (C, 5) fetch per chunk.
    With fog_stats (renderer built via make_chunk_renderer(fog_stats=True)),
    the per-ray haze signals ride along: (n, 7) [..., wmax, entropy]."""
    pack, ncols, attr = ((_pack7, 7, "_pack7_cache") if fog_stats
                         else (_pack5, 5, "_pack5_cache"))
    if getattr(chunk_renderer, "single", None) is not None:
        # coherent-expert bundle: route through coherent_dispatch with the
        # outputs packed on device (one fetch per chunk, same as two-wave)
        if chunk_renderer.fog_stats != fog_stats:
            raise ValueError(
                f"coherent renderer built with fog_stats="
                f"{chunk_renderer.fog_stats} but the caller expects "
                f"fog_stats={fog_stats} — build it with the matching flag"
            )
        packed = getattr(chunk_renderer, attr, None)
        if packed is None:
            base = chunk_renderer
            packed = CoherentExpertRenderer(
                full=jax.jit(lambda p, s, c: pack(*base.full(p, s, c))),
                single=jax.jit(
                    lambda p, s, c, k: pack(*base.single(p, s, c, k))),
                probe=base.probe, num_experts=base.num_experts,
                fog_stats=base.fog_stats,
            )
            setattr(chunk_renderer, attr, packed)
        out = np.zeros((rays.shape[0], ncols), np.float32)
        for ids, dev in coherent_dispatch(packed, params, statics, rays,
                                          chunk_rays, stats=stats):
            out[ids] = np.asarray(dev)[: len(ids)]
        return out
    if getattr(chunk_renderer, "et_resume", None) is not None:
        if chunk_renderer.ncols != ncols:
            raise ValueError(
                f"early-stop renderer packs {chunk_renderer.ncols} output "
                f"columns but the caller expects {ncols} — build it with "
                f"the matching fog_stats flag"
            )
        packed = chunk_renderer  # ET programs pack on device already
    elif getattr(chunk_renderer, "probe", None) is not None:
        packed = getattr(chunk_renderer, attr, None)
        if packed is None:
            packed = chunk_renderer.map_outputs(pack)
            setattr(chunk_renderer, attr, packed)
        packed.packable = chunk_renderer.packable  # may be toggled post-build
    else:
        base = chunk_renderer
        packed = lambda p, s, c: pack(*base(p, s, c))  # noqa: E731
    out = np.zeros((rays.shape[0], ncols), np.float32)
    for ids, dev in two_wave_dispatch(packed, params, statics, rays,
                                      chunk_rays, stats=stats):
        out[ids] = np.asarray(dev)[: len(ids)]
    return out


# --------------------------- evaluate ----------------------------------------
def runtime_evaluate(
    *,
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    optimizer: optax.GradientTransformation,
    test_metadata: List[ImageMetadata],
    tto_steps: int,
    support_batch: int = 4096,
    ray_samples: int = 96,
    color_space: str = "linear",
    bg_policy: str = "random",
    near: Optional[float] = None,
    far: Optional[float] = None,
    global_aabb: Optional[np.ndarray] = None,
    out_dir: Optional[Path] = None,
    logger=None,
    seed: int = 0,
    lpips_weights_path: Optional[str] = None,
    chunk_rays: Optional[int] = None,  # None: HBM-safe default_chunk_rays
    occ_state=None,
    occ_importance: bool = False,
    occ_probe_mask: bool = False,
    occ_hard_mask: bool = True,
    occ_probe_grid_res: int = 0,  # Phase-B union-grid probing (0 = exact)
    render_early_stop: float = 0.0,  # Phase-B early ray termination eps
    render_coherent: bool = False,  # Phase-B coherent-expert dispatch
    render_baked_res: int = 0,  # > 0: Phase-B renders a baked SH snapshot
    render_baked_sh: int = 3,  # SH levels (degree + 1) for the bake
    render_baked_occ: bool = False,  # bake only occ-alive cells
    render_baked_occ_dilate: int = 2,
    render_baked_sparse: int = 0,  # block-compact the baked table (exact)
    render_baked_cache: str = "",  # .npz snapshot cache: bake once, serve
    # on every later run of the SAME checkpoint/adaptation (fingerprinted)
    fim_cfg=None,  # models.fim.FIMConfig -> Fisher-weighted adaptation
    mesh=None,  # jax.sharding.Mesh -> Phase-B frames shard over 'data'
) -> Dict[str, float]:
    """Adapt on the test images' support rays, then render + score them."""
    log = logger.log if logger is not None else print
    if chunk_rays is None:
        chunk_rays = default_chunk_rays(ray_samples)

    # ---- Phase A: adaptation ----
    log(f"[Phase 1] runtime adaptation, tto={tto_steps}")
    t0 = time.time()
    opt_state = optimizer.init(params)
    if fim_cfg is not None:
        from nerfsys_tpu.models.fim import init_fisher

        fim_step = make_fim_adapt_step(
            cfg, optimizer, fim_cfg, ray_samples=ray_samples,
            color_space=color_space, bg_policy=bg_policy,
        )
        fisher_box = [init_fisher(params)]

        def adapt_step(p, o, statics_, rays_, rgbs_, key_):
            p, o, fisher_box[0], loss = fim_step(
                p, o, fisher_box[0], statics_, rays_, rgbs_, key_
            )
            return p, o, loss
    else:
        adapt_step = make_adapt_step(
            cfg, optimizer, ray_samples=ray_samples, color_space=color_space,
            bg_policy=bg_policy, occ_importance=occ_importance,
            occ_probe_mask=occ_probe_mask, occ_hard_mask=occ_hard_mask,
        )
    support_ds = RamRaysDataset(
        test_metadata, scene_aabb=global_aabb, near_far_override=(near, far),
    )
    log(f"  support rays: {len(support_ds):,} from {support_ds.num_images} images")
    if occ_state is not None and fim_cfg is None:
        # (FIM adaptation renders stratified; occupancy still applies to
        # Phase B rendering below)
        base_adapt = adapt_step

        def adapt_step(params, opt_state, statics, rays, rgbs, key):  # noqa
            return base_adapt(params, opt_state, statics, rays, rgbs, key,
                              occ_state)

    if tto_steps > 0 and len(support_ds) > 0:
        loader = EpochBatchSampler(support_ds, support_batch, seed=seed)
        out = runtime_adapt(
            params=params, opt_state=opt_state, adapt_step=adapt_step,
            statics=statics, data_loader=loader, steps=tto_steps,
            key=jax.random.PRNGKey(seed),
        )
        params = out["params"]
        log(f"  adapted {out['steps']} steps, last loss {out['loss']:.6f}")
    adapt_time = time.time() - t0

    # ---- Phase B: render + metrics ----
    log("[Phase 2] rendering test images")
    if render_baked_res > 0:
        # serving mode: resample the (adapted) field into a baked SH grid
        # once, then frames cost only trilinear grid lookups (models/baked).
        # Re-baked per TTO setting because adaptation changes the field.
        if float(render_early_stop) > 0.0:
            log("  [baked] NOTE: --render_early_stop is ignored with "
                "--render_baked (the baked render has no occ/ET path)")
        if render_coherent:
            log("  [baked] NOTE: --render_coherent is ignored with "
                "--render_baked (the snapshot has no expert routing)")
        from nerfsys_tpu.models.baked import (
            BakedConfig,
            bake_field,
            make_baked_chunk_renderer,
        )

        # n_dirs scales with the basis count so the SH least-squares
        # projection stays overdetermined at any --render_baked_sh
        bcfg = BakedConfig(resolution=int(render_baked_res),
                           sh_levels=int(render_baked_sh),
                           n_dirs=max(32, 2 * int(render_baked_sh) ** 2),
                           sparse_block=int(render_baked_sparse))
        if render_baked_occ and occ_state is None:
            # visible no-op guard (ADVICE r3): bake_field only warns for a
            # present-but-not-ready state; a checkpoint with no grids at
            # all would otherwise silently bake dense
            log("  [baked] WARNING: --render_baked_occ requested but the "
                "checkpoint has no occupancy state — baking dense")
        from nerfsys_tpu.models.baked import (
            load_baked,
            occ_bake_fingerprint,
            params_fingerprint,
            save_baked,
        )

        baked = None
        fp = params_fingerprint(params) if render_baked_cache else ""
        ok = occ_bake_fingerprint(
            occ_state if render_baked_occ else None,
            int(render_baked_occ_dilate)) if render_baked_cache else ""
        if render_baked_cache:
            baked = load_baked(render_baked_cache, bcfg, fingerprint=fp,
                               occ_key=ok)
            if baked is not None:
                log(f"  [baked] loaded snapshot cache {render_baked_cache}")
        if baked is None:
            tb = time.time()
            baked = bake_field(
                params, cfg, statics, bcfg,
                occ_state=occ_state if render_baked_occ else None,
                occ_dilate=int(render_baked_occ_dilate),
            )
            jax.block_until_ready(baked["table"])
            log(f"  baked {bcfg.resolution}³ SH-{bcfg.sh_levels} grid "
                f"in {time.time() - tb:.1f}s")
            if render_baked_cache:
                save_baked(render_baked_cache, baked, bcfg, fingerprint=fp,
                           occ_key=ok)
                log(f"  [baked] saved snapshot cache {render_baked_cache}")
        renderer = make_baked_chunk_renderer(
            baked, bcfg, cfg, ray_samples=ray_samples, bg_policy="white",
            mesh=mesh,
        )
    elif render_coherent and mesh is None and float(render_early_stop) == 0:
        # coherent-expert live dispatch: exact, fastest on spatially-
        # clustered frames (render_rays_chunked routes the bundle through
        # coherent_dispatch)
        if int(occ_probe_grid_res) > 0:
            log(f"  [render] coherent + union-probe grid "
                f"(res {int(occ_probe_grid_res)}): probe rows /K in every "
                "program")
        renderer = make_coherent_renderer(
            cfg, ray_samples=ray_samples, bg_policy="white",
            occ_state=occ_state, occ_importance=occ_importance,
            occ_hard_mask=occ_hard_mask, occ_probe_mask=occ_probe_mask,
            occ_probe_grid_res=occ_probe_grid_res,
        )
    else:
        if render_coherent:
            log("  [render] --render_coherent ignored: unsharded renders "
                "without --render_early_stop only")
        renderer = make_chunk_renderer(
            cfg, ray_samples=ray_samples, bg_policy="white",
            occ_state=occ_state,
            occ_importance=occ_importance, mesh=mesh,
            occ_probe_grid_res=occ_probe_grid_res,
            occ_hard_mask=occ_hard_mask,  # render how the checkpoint trained
            occ_probe_mask=occ_probe_mask,
            early_stop_eps=render_early_stop,
        )
    lpips_w = load_lpips_weights(lpips_weights_path)
    psnrs, ssims, lpipss = [], [], []
    if out_dir is not None:
        pred_dir = Path(out_dir) / f"pred{tto_steps}"
        gt_dir = Path(out_dir) / "gt"
        pred_dir.mkdir(parents=True, exist_ok=True)
        gt_dir.mkdir(parents=True, exist_ok=True)

    t1 = time.time()
    for i, md in enumerate(test_metadata):
        gt_srgb = md.load_image().astype(np.float32) / 255.0
        pred_lin, depth, acc = render_image(
            renderer, params, statics, md, scene_aabb=global_aabb,
            near=near, far=far, chunk_rays=chunk_rays,
        )
        pred_j, gt_j = color_space_transformer(
            jnp.asarray(pred_lin), jnp.asarray(gt_srgb), color_space
        )
        mse = jnp.mean((pred_j - gt_j) ** 2)
        p = float(psnr_from_mse(mse))
        s = float(ssim(pred_j, gt_j))
        psnrs.append(p)
        ssims.append(s)
        if lpips_w is not None:
            pred_srgb = np.asarray(linear_to_srgb(jnp.asarray(pred_lin)))
            lp = lpips_fn(jnp.asarray(pred_srgb), jnp.asarray(gt_srgb), lpips_w)
            lpipss.append(float(lp))
        log(f"  [{i:03d}] psnr {p:.2f}  ssim {s:.4f}"
            + (f"  lpips {lpipss[-1]:.4f}" if lpips_w is not None else ""))

        if out_dir is not None:
            from PIL import Image as PILImage

            pred_srgb8 = (
                np.clip(np.asarray(linear_to_srgb(jnp.asarray(pred_lin))), 0, 1) * 255
            ).astype(np.uint8)
            PILImage.fromarray(pred_srgb8).save(pred_dir / f"{i:06d}.png")
            PILImage.fromarray((gt_srgb * 255).astype(np.uint8)).save(
                gt_dir / f"{i:06d}.png"
            )

    render_time = time.time() - t1
    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
        "duration": adapt_time,
        "render_time": render_time,
        "num_images": len(test_metadata),
        "params": params,
    }
    log(
        f"[RESULT tto={tto_steps}] psnr {result['psnr']:.3f}  "
        f"ssim {result['ssim']:.4f}  lpips {result['lpips']:.4f}  "
        f"adapt {adapt_time:.1f}s  render {render_time:.1f}s"
    )
    return result
