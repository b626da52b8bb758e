"""Unified job entry point: --op train | eval | video | view.

Counterpart of /root/reference/adaptive_nerf/nerf_runner.py:48-496. Builds an
op-aware context (data + model + loaders) from the merged config and
dispatches to the pipelines. Run as:

    python -m nerfsys_tpu.runner --op train --configPath configs/train.json
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.data.dataset import (
    get_dataset,
    get_image_metadata,
    load_clustering_meta,
    load_coordinates,
    load_scene_boxes,
)
from nerfsys_tpu.data.loaders import MetaBatcher, PrefetchLoader
from nerfsys_tpu.data.task_dataset import TaskDataset
from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
    param_group_labels,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.models.vanilla import VanillaConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.pipelines.offline.meta_core import MetaConfig
from nerfsys_tpu.pipelines.offline.meta_train_step import (
    make_eval_step,
    make_train_step,
)
from nerfsys_tpu.pipelines.offline.trainer import meta_trainer
from nerfsys_tpu.pipelines.online.runtime_adapt import runtime_evaluate
from nerfsys_tpu.utils import checkpoint as ckpt
from nerfsys_tpu.utils.config import namespace_to_dict, parse_args
from nerfsys_tpu.utils.logging import Logger
from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer


# --------------------------- model construction ------------------------------
def container_config_from_args(P) -> ContainerConfig:
    """Map the flat flag namespace onto the static model config
    (nerf_runner.py:101-170 wiring)."""
    if P.nerf_variant == "instant":
        from nerfsys_tpu.ops.planes import PlaneEncodingConfig

        expert = NGPConfig(
            hidden=P.dim_hidden,
            sigma_depth=P.sigma_depth,
            color_hidden=P.color_hidden,
            color_depth=P.color_depth,
            dir_encoding=P.dir_encoding,
            use_bf16=bool(getattr(P, "use_amp", False)),
            xyz_encoding="planes" if P.xyz_encoding == "planes" else "hash",
            hash=HashGridConfig(
                levels=getattr(P, "high_levels", 16),
                features_per_level=getattr(P, "high_features_per_level", 2),
                log2_hashmap_size=P.log2_hashmap_size,
                max_res=P.max_res,
                min_res=getattr(P, "high_min_res", 16),
                interpolation=getattr(P, "interpolation", "Linear"),
                packed=bool(getattr(P, "packed_gather", False)),
                tcnn_layout=bool(getattr(P, "hash_tcnn_layout", False)),
            ),
            planes=PlaneEncodingConfig(
                levels=P.plane_levels,
                base_res=P.plane_base_res,
                growth=P.plane_growth,
                features=P.plane_features,
                include_lines=not P.plane_no_lines,
                # positions never depend on trainable params in any runner
                # path, so the gather-free backward is always valid here
                pos_grad=bool(getattr(P, "plane_pos_grad", False)),
                matmul_bwd=not bool(getattr(P, "plane_scatter_bwd", False)),
                # execution-strategy knob (no param-shape change, so not an
                # ARCH key): line lookups as hat-stencil MXU dots
                lines_matmul=bool(getattr(P, "plane_lines_mm", False)),
                lines_mm_dtype=getattr(P, "plane_lines_mm_dtype", "float32"),
                pad_plane_rows=int(getattr(P, "plane_pad_rows", 0)),
                pad_line_rows=int(getattr(P, "line_pad_rows", 0)),
            ),
        )
    else:
        expert = VanillaConfig(
            hidden=P.dim_hidden,
            sigma_depth=max(P.sigma_depth, 8) if P.sigma_depth == 2 else P.sigma_depth,
            color_hidden=P.color_hidden,
            color_depth=P.color_depth,
            dir_encoding=P.dir_encoding,
        )
    return ContainerConfig(
        num_experts=P.num_submodules,
        nerf_variant=P.nerf_variant,
        bucketed=bool(getattr(P, "bucketed_moe", False)),
        experts_per_point=getattr(P, "experts_per_point", 2),
        capacity_factor=getattr(P, "capacity_factor", 1.5),
        boundary_margin=float(P.boundary_margin_effective),
        cluster_2d=bool(P.cluster_2d),
        use_bg_nerf=not P.no_bg_nerf,
        bg_hidden=P.bg_hidden,
        bg_encoding="spherical" if P.bg_encoding == "spherical" else "fourier",
        expert=expert,
    )


def optim_config_from_args(P) -> OptimConfig:
    return OptimConfig(
        optimizer=P.optimizer,
        lr=P.lr,
        encoding_lr=P.encoding_lr,
        sigma_lr=P.sigma_lr,
        color_lr=P.color_lr,
        bg_lr=P.bg_lr,
        use_scheduler=not P.no_scheduler,
        decay_factor=P.decay_factor,
        outer_steps=P.outer_steps,
        weight_decay=getattr(P, "weight_decay", 0.0),
    )


def meta_config_from_args(P) -> MetaConfig:
    return MetaConfig(
        algo=P.algo,
        inner_iter=P.inner_iter,
        inner_lr=P.inner_lr,
        reptile_lr=P.lr,
        ray_samples=P.ray_samples,
        color_space=P.color_space,
        bg_policy=P.bg_color_default,
        occ_importance=getattr(P, "occ_importance", False),
        occ_probe_mask=getattr(P, "occ_probe_mask", False),
        occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
        occ_ray_floor=float(getattr(P, "occ_ray_floor", 0.25)),
        occ_probes=int(getattr(P, "occ_probes", 128)),
        expert_unroll=bool(getattr(P, "expert_unroll", False)),
        task_unroll=bool(getattr(P, "task_unroll", False)),
    )


# --------------------------- context ------------------------------------------
def build_context(P, op: str) -> dict:
    """Resolve data paths, scene geometry, model, and per-op data plumbing."""
    np.random.seed(P.seed)

    ctx: dict = {"P": P, "op": op}

    if getattr(P, "checkpoint_path", None):
        P.checkpoint_path = str(
            ckpt.resolve_checkpoint_dir(P.checkpoint_path, logs_root="logs")
        )
        print("Using checkpoint path:", P.checkpoint_path)

    data_path = Path(P.data_path) / "out" / P.data_dirname
    mask_dir = data_path / "masks" / P.mask_dirname
    clustering = load_clustering_meta(mask_dir)
    coordinate_info = load_coordinates(data_path)
    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)

    scale = float(coordinate_info["pose_scale_factor"])
    P.near = P.near / scale if P.near is not None else None
    P.far = P.far / scale if P.far is not None else None

    # routing margin: min(max(1, P.bm), clustering margin) (nerf_runner.py:151)
    P.boundary_margin_effective = min(
        max(1.0, float(P.bm)), float(clustering["boundary_margin"])
    )
    P.cluster_2d = bool(clustering["cluster_2d"])

    cfg = container_config_from_args(P)
    statics = ContainerStatics(
        centroids=jnp.asarray(clustering["centroids"], jnp.float32),
        expert_aabbs=jnp.asarray(expert_aabbs, jnp.float32),
        global_aabb=jnp.asarray(global_aabb, jnp.float32),
    )
    params = init_container_params(jax.random.PRNGKey(P.seed), cfg)

    ctx.update(
        cfg=cfg,
        statics=statics,
        params=params,
        coordinate_info=coordinate_info,
        clustering=clustering,
        data_path=data_path,
        mask_dir=mask_dir,
        global_aabb=global_aabb,
        expert_aabbs=expert_aabbs,
    )

    # default run-name: the reference's exact hparam string
    # (offline_stage/__init__.py:6-21,33). Divergence, deliberate: the
    # reference appends _seed to USER-provided fnames too; we keep explicit
    # fnames verbatim (mediator job dirs and scripted runs rely on them).
    if P.fname:
        fname = P.fname
    else:
        if getattr(P, "data_type", "ray") != "ray":
            raise NotImplementedError(
                "Only ray-based data_type is implemented."
            )
        fname = (
            f"{P.data_type}/{P.dataset}/"
            f"cells-{P.num_submodules:02}/"
            + ("fim/" if getattr(P, "fim", False) else "mod/")
            + f"algo-{P.algo}/"
            f"{P.nerf_variant}_dir-{P.dir_encoding}_depth-{P.num_layers}"
            f"_hid-{P.dim_hidden}_ch-{P.color_hidden}/"
            + ("no_bg/" if P.no_bg_nerf else f"bg_{P.bg_hidden}/")
            + f"initer-{P.inner_iter:02}_samples-{P.ray_samples}/"
            f"lr-{int(P.inner_lr * 1e3):03d}-{int(P.lr * 1e6):04d}"
            f"_seed-{P.seed}"
        )
    logger = Logger(fn=fname, logs_path="logs", resume=op != "train",
                    today=bool(getattr(P, "log_date", False)))
    ctx["logger"] = logger
    ctx["run_dir"] = logger.logdir

    if op == "train":
        bundle = get_dataset(
            data_path, P.downscale, P.mask_dirname, P.num_submodules,
            cap_images=P.cap_images, near_far_override=(P.near, P.far),
            num_workers=P.num_workers,
        )
        ctx["bundle"] = bundle
        # reference wrapper_kwargs (nerf_runner.py:202-209): region bounds
        # inferred from near points (region_bounds=None), exact DDA routing,
        # image_cap 0.4, min_rays = (S+Q)*0.5
        task_kwargs = dict(
            region_aabb=None, support_rays=P.support_rays,
            query_rays=P.query_rays, cell_dim=P.cell_dim,
            routing_policy=P.routing_policy,
        )
        task_sets = [
            TaskDataset(ds, seed=P.seed + i, **task_kwargs)
            for i, ds in enumerate(bundle.train_sets)
        ]
        print("Task cells per expert:",
              [len(td.eligible_cells) for td in task_sets])
        val_task_sets = [
            TaskDataset(ds, seed=P.seed + 1000 + i, **task_kwargs)
            for i, ds in enumerate(bundle.val_sets)
        ] if bundle.val_sets else None
        ctx["train_loader"] = PrefetchLoader(MetaBatcher(task_sets, P.batch_size))
        ctx["eval_loader"] = (
            PrefetchLoader(MetaBatcher(val_task_sets, P.test_batch_size))
            if val_task_sets
            else None
        )
    elif op in ("eval", "video"):
        _, val_md = get_image_metadata(data_path, P.downscale)
        if P.cap_images:
            from nerfsys_tpu.data.dataset import cap_metadata

            val_md = cap_metadata(val_md, P.cap_images)
        ctx["test_metadata"] = val_md
        _load_params_from_checkpoint(ctx)
    elif op == "view":
        _load_params_from_checkpoint(ctx)
    return ctx


def occ_config_from_args(P):
    """OccGridConfig from flags (reference occ conf, nerf_runner.py:125-149)."""
    from nerfsys_tpu.ops.occupancy import OccGridConfig

    return OccGridConfig(
        resolution=getattr(P, "occ_resolution", 128),
        levels=getattr(P, "occ_levels", 4),
        occ_thre=getattr(P, "occ_thre", 1e-2),
        ema_decay=getattr(P, "occ_ema_decay", 0.95),
        warmup_steps=getattr(P, "occ_warmup", 256),
        update_interval=getattr(P, "occ_update_interval", 16),
        dilate=getattr(P, "occ_dilate", 0),
    )


def _load_params_from_checkpoint(ctx):
    P = ctx["P"]
    if getattr(P, "checkpoint_path", None):
        params, state = ckpt.load_model_checkpoint(
            P.checkpoint_path, P.prefix, ctx["params"]
        )
        ctx["params"] = params
        ctx["ckpt_state"] = state
        print(f"Loaded checkpoint {P.prefix} @ step {state['step']}")
        # restore occupancy grids when the run trained with --use_occ
        if getattr(P, "use_occ", False):
            from nerfsys_tpu.ops.occupancy import init_occ_state

            tpl = init_occ_state(occ_config_from_args(P), P.num_submodules)
            occ = ckpt.load_aux_state(
                P.checkpoint_path, "occ", tpl, tag=P.prefix
            )
            if occ is not None:
                ctx["occ_state"] = occ
                print("Restored occupancy grids from checkpoint")


# --------------------------- ops ----------------------------------------------
class _ShardedLoader:
    """Wrap a batch iterator, placing every batch with mesh shardings."""

    def __init__(self, source, mesh):
        from nerfsys_tpu.parallel.mesh import shard_batch

        self._source = source
        self._mesh = mesh
        self._shard = shard_batch

    def __iter__(self):
        for batch in self._source:
            yield self._shard(batch, self._mesh)


def maybe_shard_training(ctx, params):
    """Multi-chip data/expert parallelism (parallel/mesh.py): shard episode
    ray axes on 'data', optionally experts on 'expert'; params replicated.
    Single-device: no-op. Returns (params, mesh or None). Build the
    optimizer state AFTER this so its moments inherit the param shardings."""
    P = ctx["P"]
    mesh_spec = getattr(P, "mesh_shape", None)
    if jax.device_count() == 1 and not mesh_spec:
        return params, None
    from nerfsys_tpu.parallel.mesh import make_mesh, shard_params

    mesh = make_mesh(mesh_spec)
    shard_experts = mesh.shape.get("expert", 1) > 1
    if shard_experts and P.num_submodules % mesh.shape["expert"] != 0:
        raise ValueError(
            f"expert mesh axis {mesh.shape['expert']} must divide "
            f"num_submodules={P.num_submodules}"
        )
    params = shard_params(params, mesh, shard_experts=shard_experts)
    if jax.process_count() > 1:
        # multi-host: each process materializes only its addressable ray
        # stripes (MultiHostBatcher); re-wrapped in PrefetchLoader so device
        # upload still overlaps sampling
        from nerfsys_tpu.data.loaders import (
            MetaBatcher,
            MultiHostBatcher,
            PrefetchLoader,
        )

        def _rewrap(loader):
            batcher = getattr(loader, "source", loader)
            if not isinstance(batcher, MetaBatcher):
                return _ShardedLoader(loader, mesh)
            if hasattr(loader, "close"):
                loader.close()
            return PrefetchLoader(MultiHostBatcher(batcher, mesh))

        ctx["train_loader"] = _rewrap(ctx["train_loader"])
        if ctx.get("eval_loader") is not None:
            ctx["eval_loader"] = _rewrap(ctx["eval_loader"])
        print(f"[mesh] multi-host input: process "
              f"{jax.process_index()}/{jax.process_count()} uploads only "
              f"its addressable stripes")
    else:
        ctx["train_loader"] = _ShardedLoader(ctx["train_loader"], mesh)
        if ctx.get("eval_loader") is not None:
            ctx["eval_loader"] = _ShardedLoader(ctx["eval_loader"], mesh)
    print(f"[mesh] training over {dict(mesh.shape)} "
          f"({jax.device_count()} devices)")
    return params, mesh


def train(ctx):
    import dataclasses as _dc

    P = ctx["P"]
    meta = meta_config_from_args(P)
    opt_cfg = optim_config_from_args(P)

    # Warm-start / continue training from a checkpoint (reference parity:
    # trainer.py:27-29 resumes via P.checkpoint_path + P.prefix through
    # is_resume, common/utils.py:129-160). `--op train --checkpoint_path
    # DIR [--prefix TAG]` restores params here (before sharding, so mesh
    # placement applies to the restored values), optimizer state below
    # (after tx.init, so moments adopt the init leaves' shardings), occ
    # grids in the occ block, and step/best thread into the outer loop —
    # continuing an interrupted run into a fresh log dir. ARCH_KEYS are
    # already pinned from the checkpoint config by parse_args.
    start_step, best = 0, float("-inf")
    warm_tag = None
    if getattr(P, "checkpoint_path", None):
        warm_tag = (P.prefix
                    if ckpt.checkpoint_exists(P.checkpoint_path, P.prefix)
                    else ckpt.latest_step_tag(P.checkpoint_path))
        if warm_tag is None:
            print(f"[warm-start] no checkpoint under {P.checkpoint_path}; "
                  "training from scratch")
        else:
            params_r, _, w_state = ckpt.load_checkpoint(
                P.checkpoint_path, warm_tag, ctx["params"])
            ctx["params"] = params_r
            start_step = int(w_state.get("step", 0))
            best = float(w_state.get("best", float("-inf")))
            print(f"[warm-start] restored '{warm_tag}' @ step {start_step} "
                  f"(best {best:.3f}) from {P.checkpoint_path}")

    ctx["params"], _mesh = maybe_shard_training(ctx, ctx["params"])
    if _mesh is not None and _mesh.shape.get("expert", 1) > 1:
        # scanning a sharded expert axis would serialize what the mesh
        # parallelizes; keep vmap there (see MetaConfig.expert_map and
        # ContainerConfig.expert_map — the latter governs eval/render/occ
        # paths through container_apply)
        meta = _dc.replace(meta, expert_map=False)
        ctx["cfg"] = _dc.replace(ctx["cfg"], expert_map=False)
    tx = build_optimizer(opt_cfg, param_group_labels(ctx["params"]))
    opt_state = tx.init(ctx["params"])  # inherits param shardings
    if warm_tag is not None:
        _, opt_r, _ = ckpt.load_checkpoint(
            P.checkpoint_path, warm_tag, ctx["params"], opt_state)
        if opt_r is not None:
            # mesh-placed moments (NamedSharding from tx.init on sharded
            # params) must be re-placed explicitly; everything else stays
            # an UNCOMMITTED host array — committing (device_put) scalars
            # like schedule counts pins them to one device and the jitted
            # step then rejects the params/opt placement mix
            def _place(r, i):
                sh = getattr(i, "sharding", None)
                if isinstance(sh, jax.sharding.NamedSharding):
                    return jax.device_put(jnp.asarray(r), sh)
                return np.asarray(r)

            opt_state = jax.tree_util.tree_map(_place, opt_r, opt_state)
            print("[warm-start] optimizer state restored")
    step_fn = make_train_step(meta, ctx["cfg"], tx)
    eval_fn = make_eval_step(meta, ctx["cfg"], tto=P.inner_iter)

    # occupancy acceleration (reference nerf_runner.py:125-149,191-199)
    occ_state = occ_update_fn = None
    if getattr(P, "use_occ", False):
        from nerfsys_tpu.models.occupancy import (
            make_occ_update_fn,
            premark_invisible_expert_cells,
        )
        from nerfsys_tpu.ops.occupancy import init_occ_state

        occ_cfg = occ_config_from_args(P)
        occ_state = init_occ_state(occ_cfg, P.num_submodules)
        train_md = getattr(ctx.get("bundle"), "train_metadata", None)
        if train_md:
            c2ws = jnp.stack([jnp.asarray(m.c2w) for m in train_md])
            intr = jnp.stack([jnp.asarray(m.intrinsics[:4]) for m in train_md])
            wh = jnp.asarray([[m.W, m.H] for m in train_md], jnp.float32)
            occ_state = premark_invisible_expert_cells(
                occ_state, ctx["statics"], occ_cfg, c2ws, intr, wh,
                near=P.near or 0.0,
            )
            print(f"[occ] premarked invisible cells from {len(train_md)} cams")
        if warm_tag is not None:
            occ_r = ckpt.load_aux_state(
                P.checkpoint_path, "occ", occ_state, tag=warm_tag)
            if occ_r is not None:
                occ_state = occ_r  # trained grids beat the fresh premark
                print("[warm-start] occupancy grids restored")
        occ_update_fn = make_occ_update_fn(ctx["cfg"], occ_cfg)

    params, opt_state, best = meta_trainer(
        params=ctx["params"],
        opt_state=opt_state,
        train_step=step_fn,
        eval_step=eval_fn,
        statics=ctx["statics"],
        train_loader=ctx["train_loader"],
        eval_loader=ctx["eval_loader"],
        config=namespace_to_dict(P),
        outer_steps=P.outer_steps,
        eval_every=P.eval_step,
        save_every=P.save_step,
        print_every=P.print_step,
        run_dir=ctx["run_dir"],
        logger=ctx["logger"],
        seed=P.seed,
        start_step=start_step,
        best=best,
        trace_steps=getattr(P, "trace_steps", 0),
        occ_state=occ_state,
        occ_update_fn=occ_update_fn,
        fixed_eval=bool(getattr(P, "fixed_eval", False)),
        eval_batches=int(getattr(P, "max_test_tasks", 1)),
    )
    ctx["params"] = params
    return params


def evaluate(ctx):
    """Per-TTO eval with base-state reset between settings
    (nerf_runner.py:323-368)."""
    P = ctx["P"]
    base_params = ctx["params"]
    tto_list = [int(t) for t in str(P.tto).split(",") if t != ""]
    opt_cfg = optim_config_from_args(P)
    from nerfsys_tpu.parallel.mesh import maybe_render_mesh

    render_mesh = maybe_render_mesh(P)
    # --chunk_points honors the reference's render point budget when the
    # user asked for it; otherwise the HBM-aware default sizes the chunk
    chunk_rays = None
    if "chunk_points" in getattr(P, "explicit_keys", ()):
        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            default_chunk_rays,
        )

        chunk_rays = default_chunk_rays(P.ray_samples,
                                        budget_pts=int(P.chunk_points))
    rows = []
    for tto in tto_list:
        tx = build_optimizer(
            dataclasses.replace(opt_cfg, use_scheduler=False),
            param_group_labels(base_params),
        )
        fim_cfg = None
        if getattr(P, "fim", False):
            from nerfsys_tpu.models.fim import FIMConfig

            fim_cfg = FIMConfig(
                lam=P.fim_lambda, beta=P.fim_beta, eps=P.fim_epsilon,
                per_sample=bool(P.fim_per_sample),
            )
        result = runtime_evaluate(
            params=base_params,  # reset to meta-learned base each time
            cfg=ctx["cfg"],
            statics=ctx["statics"],
            occ_state=ctx.get("occ_state"),
            occ_importance=getattr(P, "occ_importance", False),
            occ_probe_mask=getattr(P, "occ_probe_mask", False),
            occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
            occ_probe_grid_res=int(getattr(P, "occ_union_probe_res", 0)),
            render_early_stop=float(getattr(P, "render_early_stop", 0.0)),
            render_baked_res=int(getattr(P, "render_baked", 0)),
            render_baked_sh=int(getattr(P, "render_baked_sh", 3)),
            render_baked_occ=bool(getattr(P, "render_baked_occ", False)),
            render_baked_occ_dilate=int(
                getattr(P, "render_baked_occ_dilate", 2)),
            render_baked_sparse=int(getattr(P, "render_baked_sparse", 0)),
            render_baked_cache=str(
                getattr(P, "render_baked_cache", "") or ""),
            render_coherent=bool(getattr(P, "render_coherent", False)),
            fim_cfg=fim_cfg,
            optimizer=tx,
            test_metadata=ctx["test_metadata"],
            tto_steps=tto,
            support_batch=P.support_rays,
            ray_samples=P.ray_samples,
            color_space=P.color_space,
            bg_policy=P.bg_color_default,
            near=P.near,
            far=P.far,
            global_aabb=ctx["global_aabb"],
            out_dir=Path(ctx["run_dir"]) / "rendered",
            logger=ctx["logger"],
            seed=P.seed,
            mesh=render_mesh,
            chunk_rays=chunk_rays,
        )
        rows.append({"tto": tto, **{k: v for k, v in result.items()
                                    if k != "params"}})

    # results table (reference prints pandas + LaTeX)
    try:
        import pandas as pd

        df = pd.DataFrame(rows).set_index("tto")
        print(df.to_string())
        print(df.to_latex(float_format="%.3f"))
    except ImportError:
        print(json.dumps(rows, indent=2))
    out_path = Path(ctx["run_dir"]) / "eval_results.json"
    out_path.write_text(json.dumps(rows, indent=2))
    return rows


def video(ctx):
    from nerfsys_tpu.pipelines.video_gen import render_video

    return render_video(ctx)


def view(ctx):
    from nerfsys_tpu.viewer.viewer import launch_viewer

    return launch_viewer(ctx)


def main(argv=None):
    P = parse_args(argv)
    op = P.op
    ctx = build_context(P, op)
    t0 = time.time()
    if op == "train":
        train(ctx)
    elif op == "eval":
        evaluate(ctx)
    elif op == "video":
        video(ctx)
    elif op == "view":
        view(ctx)
    else:
        raise ValueError(f"Unknown op: {op}")
    print(f"[done] op={op} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
