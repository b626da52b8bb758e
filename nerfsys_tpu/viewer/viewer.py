"""Interactive web viewer: Viser UI over a jitted, shape-bucketed renderer.

Counterpart of /root/reference/adaptive_nerf/viewer/viewer.py:77-855. Split
in two so the compute path is testable headless:

  - RenderEngine: everything between "client camera pose" and "uint8 frame" —
    RUB->DRB conversion, optional metric->normalized translation, ray
    generation, bucketed jitted chunk rendering (fixed compile shapes while
    the user resizes), depth/opacity colormaps, exposure/gamma tonemap,
    non-finite scrubbing. No viser dependency.
  - launch_viewer(ctx): the Viser GUI (gated import) wiring reference
    controls — Visuals, Postprocessing, camera buttons, Operation Mode with
    Start/Pause/Resume/Stop/Step, continual batch Scan & Verify, live LR /
    ray hyperparameters, viewer checkpoints — to a Controller and the engine.

TPU-first notes: render requests land on one of a few precompiled chunk
sizes (powers of two), so interactive resizing never triggers recompiles;
params arrive as immutable pytree snapshots from the controller so training
steps and rendering overlap instead of serializing on a model lock.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from nerfsys_tpu.viewer.colormap import (
    apply_colormap,
    apply_depth_colormap,
    tonemap_frame,
)
from nerfsys_tpu.viewer.utils import (
    load_continual_batch_metadata,
    rub_pose_to_drb,
    safe_active_module,
    safe_bg,
    verify_continual_batch_dir,
)


class RenderEngine:
    """Camera pose -> frame, with compile-shape bucketing."""

    def __init__(
        self,
        cfg,
        statics,
        base_params,
        *,
        coordinate_info: Optional[dict] = None,
        global_aabb: Optional[np.ndarray] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        chunk_rays: int = 65536,
        default_samples: int = 64,
        occ_state=None,  # stacked expert occupancy (viewer occ toggle)
        occ_hard_mask: bool = True,  # match how the checkpoint trained
        occ_importance: bool = False,  # match how the checkpoint trained
        occ_probe_grid_res: int = 0,  # union-grid probing (0 = exact)
        occ_probe_mask: bool = False,  # interval-bit masking
    ):
        self.cfg = cfg
        self.statics = statics
        self.base_params = base_params
        self.occ_state = occ_state
        self.use_occ = occ_state is not None
        self.occ_hard_mask = bool(occ_hard_mask)
        self.occ_importance = bool(occ_importance)
        self.occ_probe_grid_res = int(occ_probe_grid_res)
        self.occ_probe_mask = bool(occ_probe_mask)
        self.global_aabb = (
            np.asarray(global_aabb, np.float32) if global_aabb is not None else None
        )
        self.near, self.far = near, far
        self.chunk_rays = int(chunk_rays)
        self.default_samples = int(default_samples)
        self.origin = None
        self.scale = 1.0
        if coordinate_info:
            self.origin = np.asarray(coordinate_info["origin_drb"], np.float32)
            self.scale = float(coordinate_info["pose_scale_factor"])
        self._renderers: Dict[Tuple, object] = {}
        # probe caches for the two-wave occ path: the probe depends only on
        # (rays, grid), so a stationary camera watching live adaptation
        # pays wave 1 once (keyed by ray-buffer content + grid identity)
        self._probe_caches: Dict[Tuple, dict] = {}
        # baked serving mode (models/baked.py): one snapshot + its source
        # params' identity; a new params snapshot (= an adapt step landed)
        # auto-invalidates and frames fall back to the live field
        self._baked = None  # (baked dict, BakedConfig, id(source params))
        self._baked_renderers: Dict[Tuple, object] = {}

    # ------------------------------ baked serving -----------------------------
    def bake(self, params=None, resolution: int = 256, sh_levels: int = 3,
             use_occ: bool = False, occ_dilate: int = 2,
             sparse_block: int = 0):
        """Resample the (possibly adapted) field into a baked SH grid and
        serve subsequent rgb frames from it — 4 gather rows/sample instead
        of the live MoE chain. Call on pause (the GUI's Bake control /
        bake-on-pause); rendering any NEWER params snapshot invalidates
        automatically, so a resumed adaptation never serves stale geometry.
        With use_occ and a loaded occupancy state, dead cells are skipped
        during the bake (models/baked.bake_field occ_state path) — the
        interactive bake-on-pause latency drops by the dead fraction.
        """
        from nerfsys_tpu.models.baked import BakedConfig, bake_field

        p = self.base_params if params is None else params
        bcfg = BakedConfig(resolution=int(resolution),
                           sh_levels=int(sh_levels),
                           n_dirs=max(32, 2 * int(sh_levels) ** 2),
                           sparse_block=int(sparse_block))
        baked = bake_field(
            p, self.cfg, self.statics, bcfg,
            occ_state=self.occ_state if use_occ else None,
            occ_dilate=int(occ_dilate),
        )
        self._baked = (baked, bcfg, id(p))
        self._baked_renderers = {}
        return bcfg

    def invalidate_baked(self):
        self._baked = None
        self._baked_renderers = {}

    @property
    def baked_active(self) -> bool:
        return self._baked is not None

    def _baked_cam_renderer(self, H, W, samples, bg_policy, near, far):
        """Whole-frame serving renderer over the snapshot: pose in, fused-
        tonemap uint8 out (exposure/gamma are traced scalars). Rays
        generate on device — per-frame host IO is ~20 floats up + 3 B/px
        down. AABB-miss pixels render black (the host paths' valid-mask
        semantics, applied on device)."""
        import jax.numpy as jnp

        baked, bcfg, _src = self._baked
        key = ("cam", int(H), int(W), int(samples), str(bg_policy),
               near, far)
        r = self._baked_renderers.get(key)
        if r is None:
            from nerfsys_tpu.models.baked import make_baked_camera_renderer

            def tonemap_u8(rgb, depth, acc, exposure, inv_gamma):
                x = jnp.clip(rgb * (2.0 ** exposure), 0.0, 1.0) ** inv_gamma
                return (x * 255.0 + 0.5).astype(jnp.uint8)

            if len(self._baked_renderers) >= 6:  # resolution churn bound
                self._baked_renderers.clear()
            kw = {}
            if self.global_aabb is not None:
                kw = dict(scene_aabb=np.asarray(self.global_aabb),
                          near_override=near, far_override=far)
            else:
                kw = dict(near=near, far=far)
            r = make_baked_camera_renderer(
                baked, bcfg, self.cfg, H=int(H), W=int(W),
                ray_samples=int(samples), chunk_rays=self.chunk_rays,
                bg_policy=str(bg_policy), invalid_black=True,
                map_outputs=tonemap_u8, **kw,
            )
            self._baked_renderers[key] = r
        return r

    # ------------------------------- plumbing ---------------------------------
    def _rgb_u8_renderer(self, samples, bg_policy, active):
        """Chunk renderer fused with the display transform, returning uint8.

        The interactive path is transfer-bound (the reference fetches f32
        rgb+depth+acc = 20 B/ray per frame); tonemapping on device and
        fetching uint8 rgb moves 3 B/ray instead (6.7x less). Exposure and
        gamma are traced scalars so slider changes never recompile.
        """
        import jax
        import jax.numpy as jnp

        key = ("u8", int(samples), str(bg_policy), active, self.use_occ)
        r = self._renderers.get(key)
        if r is None:
            base = self._renderer(samples, bg_policy, active)

            def tonemap_u8(rgb, depth, acc, exposure, inv_gamma):
                x = jnp.clip(rgb * (2.0 ** exposure), 0.0, 1.0) ** inv_gamma
                return (x * 255.0 + 0.5).astype(jnp.uint8)

            if getattr(base, "map_outputs", None) is not None:
                # two-wave occupancy renderer: keep the probe/skip/packing
                # machinery AND the fused uint8 fetch
                r = base.map_outputs(tonemap_u8)
            else:
                def render_u8(p, statics, chunk, exposure, inv_gamma):
                    return tonemap_u8(*base(p, statics, chunk),
                                      exposure, inv_gamma)

                r = jax.jit(render_u8)
            self._renderers[key] = r
        return r

    def _renderer(self, samples: int, bg_policy: str, active: Optional[int]):
        occ = self.occ_state if self.use_occ else None
        key = (int(samples), str(bg_policy), active, occ is not None)
        r = self._renderers.get(key)
        if r is None:
            from nerfsys_tpu.pipelines.online.runtime_adapt import (
                make_chunk_renderer,
            )

            r = make_chunk_renderer(
                self.cfg, ray_samples=int(samples), bg_policy=str(bg_policy),
                active_expert=active, occ_state=occ,
                occ_hard_mask=self.occ_hard_mask,
                occ_importance=self.occ_importance,
                occ_probe_grid_res=self.occ_probe_grid_res,
                occ_probe_mask=self.occ_probe_mask,
            )
            self._renderers[key] = r
        return r

    def _two_wave_live(self, bg_policy: str) -> bool:
        """True when the live render rides the two-wave probe dispatcher
        (hard-mask occ + background that reads no field colors) — that
        path needs per-ray alive bits on host, so it keeps host raygen;
        every other live mode is one program and serves from a pose."""
        return (self.use_occ and self.occ_state is not None
                and self.occ_hard_mask
                and str(bg_policy) in ("white", "black", "none"))

    def _live_cam_renderer(self, H, W, samples, bg_policy, active, near, far,
                           planes: bool = False):
        """Pose-in live-frame renderer (make_live_camera_renderer): rays
        generate on device and the tonemap fuses into the program, so a
        live frame's host IO is ~20 floats up + the frame down — the same
        serving shape as baked frames (VERDICT r3 item 4). planes=True
        fetches f32 [rgb, depth, acc] for the depth/opacity displays
        (still kills the ray upload). Cache capped like the baked
        renderers (resolution churn bound)."""
        import jax.numpy as jnp

        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            make_live_camera_renderer,
        )

        key = ("livecam", bool(planes), int(H), int(W), int(samples),
               str(bg_policy), active, self.use_occ, near, far)
        r = self._renderers.get(key)
        if r is None:
            if sum(1 for k in self._renderers if k[0] == "livecam") >= 6:
                for k in [k for k in self._renderers if k[0] == "livecam"]:
                    del self._renderers[k]
            kw = {}
            if self.global_aabb is not None:
                kw = dict(scene_aabb=np.asarray(self.global_aabb),
                          near_override=near, far_override=far)
            else:
                kw = dict(near=near, far=far)
            if not planes:
                def tonemap_u8(rgb, depth, acc, exposure, inv_gamma):
                    x = jnp.clip(rgb * (2.0 ** exposure), 0.0, 1.0) \
                        ** inv_gamma
                    return (x * 255.0 + 0.5).astype(jnp.uint8)

                kw["map_outputs"] = tonemap_u8
            else:
                kw["out_u8"] = False
            r = make_live_camera_renderer(
                self.cfg, H=int(H), W=int(W), ray_samples=int(samples),
                chunk_rays=self.chunk_rays, bg_policy=str(bg_policy),
                active_expert=active,
                occ_state=self.occ_state if self.use_occ else None,
                occ_importance=self.occ_importance,
                occ_hard_mask=self.occ_hard_mask,
                occ_probe_mask=self.occ_probe_mask,
                occ_probe_grid_res=self.occ_probe_grid_res,
                invalid_black=True, **kw,
            )
            self._renderers[key] = r
        return r

    # ------------------------------- rendering --------------------------------
    def render(
        self,
        c2w_rub: np.ndarray,  # (3,4)/(4,4) client camera in RUB world
        W: int,
        H: int,
        fov_y: float,
        params=None,  # adapted params snapshot; None -> base checkpoint
        *,
        pose_is_metric: bool = False,
        output: str = "rgb",  # rgb | depth | opacity
        bg_policy: str = "white",
        active_expert=None,
        ray_samples: Optional[int] = None,
        exposure: float = 0.0,
        gamma: float = 2.2,
        depth_cmap: str = "turbo",
        near_clip_m: Optional[float] = None,
        far_clip_m: Optional[float] = None,
    ) -> np.ndarray:
        """Returns (H, W, 3) uint8. Never raises on bad poses — non-finite
        inputs are scrubbed and OOM degrades to a blank frame (reference
        viewer.py:779-801)."""
        from nerfsys_tpu.data.ram_rays import frame_rays

        p = params if params is not None else self.base_params
        samples = int(ray_samples or self.default_samples)
        active = safe_active_module(active_expert, self.cfg.num_experts)
        bg = safe_bg(bg_policy)
        if bg in ("nerf", "none", "last_sample", "random"):
            bg = "white" if bg != "nerf" else "white"  # learned bg comes via bg_fn

        c2w = rub_pose_to_drb(np.nan_to_num(np.asarray(c2w_rub, np.float32)))
        if pose_is_metric and self.origin is not None:
            c2w[:, 3] = (c2w[:, 3] - self.origin) / self.scale

        near = self.near
        far = self.far
        if near_clip_m is not None:
            near = float(near_clip_m) / self.scale
        if far_clip_m is not None:
            far = float(far_clip_m) / self.scale
        if self.global_aabb is None and (near is None or far is None):
            near = 0.05 if near is None else near
            far = 100.0 if far is None else far

        fy = H / (2.0 * np.tan(0.5 * float(fov_y)))

        # baked serving: checked BEFORE host ray-gen — the camera renderer
        # uploads ~20 floats (pose + intrinsics) and fetches the u8 frame;
        # rays generate on device (the ray upload dominated baked frame
        # latency, BASELINE.md 2026-08-19). Valid only for the params
        # snapshot it was baked from; newer params mean adaptation stepped,
        # so invalidate and fall back to the live field. Active-expert
        # isolation always renders live (the bake is routed over ALL
        # experts).
        if self._baked is not None and output == "rgb" and active is None:
            if self._baked[2] == id(p):
                try:
                    renderer = self._baked_cam_renderer(
                        H, W, samples, bg, near, far)
                    inv_gamma = np.float32(1.0 / max(float(gamma), 1e-3))
                    img = renderer(
                        p, self.statics, c2w,
                        np.array([fy, fy, W / 2.0, H / 2.0], np.float32),
                        np.float32(exposure), inv_gamma,
                    )
                    return np.asarray(img, np.uint8)
                except Exception as e:
                    print(f"[viewer] render failed "
                          f"({type(e).__name__}: {e})")
                    return np.zeros((H, W, 3), np.uint8)
            self.invalidate_baked()

        inv_gamma = np.float32(1.0 / max(float(gamma), 1e-3))
        if not self._two_wave_live(bg):
            # one-program live modes (stratified / soft occ / hard occ
            # without a skippable bg): serve from the pose — rays
            # generate on device, the frame comes back u8 (or f32 planes
            # for depth/opacity). Host IO per frame: ~20 floats up.
            intr = np.array([fy, fy, W / 2.0, H / 2.0], np.float32)
            try:
                if output == "rgb":
                    renderer = self._live_cam_renderer(
                        H, W, samples, bg, active, near, far)
                    img = renderer(p, self.statics, c2w, intr,
                                   np.float32(exposure), inv_gamma)
                    return np.asarray(img, np.uint8)
                renderer = self._live_cam_renderer(
                    H, W, samples, bg, active, near, far, planes=True)
                out5 = renderer(p, self.statics, c2w, intr)
            except Exception as e:  # device OOM -> blank frame, keep serving
                print(f"[viewer] render failed ({type(e).__name__}: {e})")
                return np.zeros((H, W, 3), np.uint8)
            # invalid pixels are already black (on-device valid mask)
            rgb = out5[:, 0:3].reshape(H, W, 3)
            depth = out5[:, 3].reshape(H, W)
            acc = out5[:, 4].reshape(H, W)
        else:
            rays, valid = frame_rays(
                H, W, (fy, fy, W / 2.0, H / 2.0), c2w,
                aabb=self.global_aabb, near=near, far=far,
            )
            rays = np.nan_to_num(rays, posinf=1e10, neginf=-1e10)

            n = rays.shape[0]

            from nerfsys_tpu.pipelines.online.runtime_adapt import (
                render_rays_chunked,
                two_wave_dispatch,
            )

            try:
                if output == "rgb":
                    # fused device tonemap -> one uint8 fetch (3 B/ray vs
                    # the 20 B/ray f32 rgb+depth+acc path); the dispatcher
                    # also skips/packs sky chunks (two-wave)
                    renderer = self._rgb_u8_renderer(samples, bg, active)
                    exp_f = np.float32(exposure)
                    cache = None
                    if getattr(renderer, "probe", None) is not None:
                        # the probe is params-independent: a stationary
                        # camera watching live adaptation pays wave 1 once
                        key = (hash(rays.tobytes()), self.chunk_rays,
                               id(self.occ_state), int(samples), active)
                        cache = self._probe_caches.get(key)
                        if cache is None:
                            if len(self._probe_caches) >= 4:
                                self._probe_caches.clear()
                            cache = self._probe_caches[key] = {}
                    frame_u8 = np.zeros((n, 3), np.uint8)
                    for ids, out in two_wave_dispatch(
                        renderer, p, self.statics, rays, self.chunk_rays,
                        exp_f, inv_gamma, probe_cache=cache,
                    ):
                        frame_u8[ids] = np.asarray(out)[: len(ids)]
                    frame_u8 = np.where(valid[:, None], frame_u8, 0)
                    return frame_u8.reshape(H, W, 3).astype(np.uint8)

                renderer = self._renderer(samples, bg, active)
                out5 = render_rays_chunked(
                    renderer, p, self.statics, rays, self.chunk_rays
                )
                rgb, depth, acc = out5[:, 0:3], out5[:, 3], out5[:, 4]
            except Exception as e:  # device OOM -> blank frame, keep serving
                print(f"[viewer] render failed ({type(e).__name__}: {e})")
                return np.zeros((H, W, 3), np.uint8)

            rgb = np.where(valid[:, None], rgb, 0.0).reshape(H, W, 3)
            depth = np.where(valid, depth, 0.0).reshape(H, W)
            acc = np.where(valid, acc, 0.0).reshape(H, W)

        if output == "depth":
            frame = apply_depth_colormap(
                depth * self.scale, accumulation=acc, cmap=depth_cmap
            )
        elif output == "opacity":
            frame = apply_colormap(acc, cmap="gray", normalize=False)
        else:
            frame = tonemap_frame(rgb, exposure=exposure, gamma=gamma)
        frame = np.nan_to_num(frame)
        return (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)


# --------------------------------- viser UI ----------------------------------
def launch_viewer(ctx, *, port: int = 7070, blocking: bool = True):
    """Start the Viser web viewer on ctx (runner.py --op view).

    Mirrors the reference GUI surface (viewer.py:137-691): Visuals,
    Postprocessing, camera utilities, and Operation Mode (View /
    Runtime-Adapt with Start/Pause/Resume/Stop/Step, batch Scan & Verify,
    live LR scaling, viewer checkpoints).
    """
    try:
        import viser
    except ImportError as e:
        raise RuntimeError(
            "the interactive viewer requires the optional 'viser' package; "
            "install it or use --op video for offline rendering"
        ) from e

    import dataclasses as _dc

    from nerfsys_tpu.viewer.engine.controller import Controller
    from nerfsys_tpu.viewer.engine.runners.base import ViewRunner
    from nerfsys_tpu.viewer.engine.runners.runtime_adapt import RuntimeAdaptRunner

    P = ctx["P"]
    cfg, statics, params = ctx["cfg"], ctx["statics"], ctx["params"]
    engine = RenderEngine(
        cfg, statics, params,
        coordinate_info=ctx.get("coordinate_info"),
        global_aabb=ctx.get("global_aabb"),
        near=getattr(P, "near", None), far=getattr(P, "far", None),
        default_samples=min(int(getattr(P, "ray_samples", 64)), 128),
        occ_state=ctx.get("occ_state"),
        occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
        occ_importance=bool(getattr(P, "occ_importance", False)),
        occ_probe_grid_res=int(getattr(P, "occ_union_probe_res", 0)),
        occ_probe_mask=bool(getattr(P, "occ_probe_mask", False)),
    )

    from nerfsys_tpu.runner import optim_config_from_args

    def runner_factory(mode: str):
        if mode == "runtime_adapt":
            return RuntimeAdaptRunner(
                params, cfg, statics, metadata=[],
                optim_cfg=_dc.replace(optim_config_from_args(P),
                                      use_scheduler=False),
                ray_samples=int(getattr(P, "ray_samples", 96)),
                support_batch=int(getattr(P, "support_rays", 4096)),
                color_space=getattr(P, "color_space", "linear"),
                bg_policy=getattr(P, "bg_color_default", "random"),
                global_aabb=ctx.get("global_aabb"),
                near=getattr(P, "near", None), far=getattr(P, "far", None),
                seed=int(getattr(P, "seed", 0)),
                occ_state=ctx.get("occ_state"),
            )
        return ViewRunner(params)

    ctrl = Controller(runner_factory, mode="view")

    host = str(getattr(P, "viewer_host", "0.0.0.0"))
    port = int(getattr(P, "viewer_port", port))
    server = viser.ViserServer(host=host, port=port)
    pub = getattr(P, "viewer_public_host", None)
    if pub:
        print(f"[viewer] http://{pub}:{port}")
    state = {
        "output": "rgb", "bg": "white", "expert": "all", "samples":
        engine.default_samples, "exposure": 0.0, "gamma": 2.2,
        "max_res": 512, "terminate": False,
        "last_c2w": None, "last_frame": None,
    }
    # metric scene extent for the clipping sliders / dolly step
    # (reference viewer.py:203-221, 252-261)
    if ctx.get("global_aabb") is not None:
        _ext_norm = float(np.linalg.norm(
            np.asarray(ctx["global_aabb"][1]) - np.asarray(ctx["global_aabb"][0])
        ))
    else:
        _ext_norm = 2.0
    scene_extent_world = _ext_norm * engine.scale

    with server.gui.add_folder("Visuals"):
        gui_bg = server.gui.add_dropdown(
            "Background", ("white", "black", "nerf"), initial_value="white")
        gui_expert = server.gui.add_dropdown(
            "Active expert",
            ("all",) + tuple(str(i) for i in range(cfg.num_experts)),
            initial_value="all")
        gui_samples = server.gui.add_slider(
            "Samples/ray", min=8, max=256, step=8,
            initial_value=state["samples"])
        gui_occ = server.gui.add_checkbox(
            "Occupancy sampling", initial_value=engine.use_occ,
            disabled=engine.occ_state is None)
        gui_occ.on_update(lambda _: setattr(
            engine, "use_occ",
            bool(gui_occ.value) and engine.occ_state is not None))

    with server.gui.add_folder("Postprocessing"):
        gui_output = server.gui.add_dropdown(
            "Display", ("rgb", "depth", "opacity"), initial_value="rgb")
        gui_zoom = server.gui.add_slider(
            "Zoom", min=0.5, max=2.0, step=0.01, initial_value=1.0)
        gui_exposure = server.gui.add_slider(
            "Exposure", min=-4.0, max=4.0, step=0.1, initial_value=0.0)
        gui_gamma = server.gui.add_slider(
            "Gamma", min=1.0, max=4.0, step=0.1, initial_value=2.2)
        gui_res = server.gui.add_slider(
            "Max resolution", min=64, max=1024, step=64, initial_value=512)
        # tonemap folders appear only for the matching display mode
        # (reference viewer.py:176-197,223-227)
        depth_folder = server.gui.add_folder("Tonemap — Depth")
        with depth_folder:
            gui_depth_cmap = server.gui.add_dropdown(
                "Colormap", ("turbo", "viridis", "inferno", "gray"),
                initial_value="turbo")
        depth_folder.visible = False

        def _display_changed(_=None):
            depth_folder.visible = gui_output.value == "depth"

        gui_output.on_update(_display_changed)

        # metric near/far clipping (reference viewer.py:203-221); engine
        # divides by pose_scale_factor internally
        clip_folder = server.gui.add_folder("Clipping")
        with clip_folder:
            gui_nf_enable = server.gui.add_checkbox(
                "Override Near/Far", initial_value=False)
            gui_near_m = server.gui.add_slider(
                "Near (m)", min=0.0, max=max(scene_extent_world, 1.0),
                step=max(scene_extent_world, 1.0) / 1000.0,
                initial_value=scene_extent_world / 400.0)
            gui_far_m = server.gui.add_slider(
                "Far (m)", min=0.1, max=max(scene_extent_world * 2.0, 2.0),
                step=max(scene_extent_world, 1.0) / 1000.0,
                initial_value=max(scene_extent_world, 1.0))

    with server.gui.add_folder("Serving"):
        # baked SH snapshot serving (models/baked.py): bake on pause / on
        # enable-while-idle; any adapt step invalidates automatically (the
        # engine keys the snapshot to the params identity it was baked from)
        gui_baked = server.gui.add_checkbox(
            "Baked serving (bake on pause)", initial_value=False)
        gui_baked_res = server.gui.add_number(
            "Bake resolution", initial_value=256)
        gui_baked_sparse = server.gui.add_checkbox(
            "Sparse table (block-compact)", initial_value=False)

    with server.gui.add_folder("Operation Mode"):
        gui_mode = server.gui.add_dropdown(
            "Mode", ("View", "Runtime-Adapt"), initial_value="View")
        gui_steps = server.gui.add_number("Steps", initial_value=200)
        gui_start = server.gui.add_button("Start")
        gui_pause = server.gui.add_button("Pause")
        gui_resume = server.gui.add_button("Resume")
        gui_stop = server.gui.add_button("Stop")
        gui_step1 = server.gui.add_button("Step")
        gui_reset = server.gui.add_button("Reset fast weights")
        gui_batch = server.gui.add_text("Batch dir", initial_value="")
        gui_scan = server.gui.add_button("Scan & Verify")
        gui_lr = server.gui.add_slider(
            "LR scale", min=0.01, max=10.0, step=0.01, initial_value=1.0)
        gui_save = server.gui.add_button("Save viewer checkpoint")
        gui_status = server.gui.add_markdown("status: idle")
        gui_term = server.gui.add_button("Terminate")

    def _sync_mode(_=None):
        want = "runtime_adapt" if gui_mode.value == "Runtime-Adapt" else "view"
        if not ctrl.is_running and ctrl.mode != want:
            ctrl.set_mode(want)

    def _bake_now():
        try:
            # interactive bakes ride the occupancy skip only while the
            # 'Occupancy sampling' toggle is on — the occ bake hard-zeros
            # dead cells, which soft-trained checkpoints should be able to
            # opt out of from the GUI (ADVICE r3); bake-on-pause latency is
            # the UX-critical bit, so the toggle's default (occ_state
            # present) keeps the skip for occ checkpoints
            bcfg = engine.bake(ctrl.get_render_params(),
                               resolution=int(gui_baked_res.value),
                               use_occ=engine.use_occ,
                               sparse_block=8 if gui_baked_sparse.value
                               else 0)
            gui_status.content = (f"status: baked {bcfg.resolution}³ "
                                  f"SH-{bcfg.sh_levels} serving snapshot")
        except Exception as e:
            gui_status.content = f"status: bake failed: {e}"

    def _pause(_):
        ctrl.pause()
        if gui_baked.value:
            _bake_now()  # bake-on-pause: the field is frozen, serve it baked

    def _baked_toggle(_=None):
        if not gui_baked.value:
            engine.invalidate_baked()
        elif not ctrl.is_running:
            _bake_now()

    gui_baked.on_update(_baked_toggle)

    gui_mode.on_update(_sync_mode)
    gui_start.on_click(lambda _: (_sync_mode(), ctrl.start(int(gui_steps.value))))
    gui_pause.on_click(_pause)
    gui_resume.on_click(lambda _: ctrl.resume())
    gui_stop.on_click(lambda _: ctrl.stop(join=False))
    gui_reset.on_click(lambda _: ctrl.reset_fast())
    gui_lr.on_update(lambda _: ctrl.update_train_hparams(lr_scale=float(gui_lr.value)))

    def _step1(_):
        _sync_mode()
        try:
            ctrl.step_once()
        except Exception as e:
            gui_status.content = f"status: step failed: {e}"

    gui_step1.on_click(_step1)

    def _scan(_):
        ok, problems, summary = verify_continual_batch_dir(gui_batch.value)
        if not ok:
            gui_status.content = "status: batch INVALID: " + "; ".join(problems[:5])
            return
        md = load_continual_batch_metadata(
            gui_batch.value, float(getattr(P, "downscale", 1.0)))
        _sync_mode()
        r = ctrl.runner
        if isinstance(r, RuntimeAdaptRunner):
            r.set_metadata(md)
        gui_status.content = f"status: batch OK ({summary['count']} images)"

    gui_scan.on_click(_scan)
    gui_save.on_click(lambda _: ctrl.save_checkpoint(
        Path(ctx.get("run_dir", "logs")) / "viewer_ckpt.model"))

    def _terminate(_):
        state["terminate"] = True

    gui_term.on_click(_terminate)

    # camera controls (reference viewer.py:229-322): re-aim / dolly the
    # client camera and save screenshots; pose math lives in viewer/utils
    # (pose_look_center / pose_snap_dir / pose_dolly) so it tests headless
    from nerfsys_tpu.viewer.utils import (
        pose_dolly,
        pose_look_center,
        pose_snap_dir,
    )

    scene_center = (
        0.5 * (np.asarray(ctx["global_aabb"][0]) + np.asarray(ctx["global_aabb"][1]))
        if ctx.get("global_aabb") is not None else np.zeros(3, np.float32)
    )
    dolly_step = 0.05 * _ext_norm

    def _set_client_pose(client, c2w):
        import viser.transforms as vtf

        with client.atomic():
            client.camera.wxyz = vtf.SO3.from_matrix(c2w[:3, :3]).wxyz
            client.camera.position = c2w[:3, 3]
        client.flush()

    def _snapshot(_):
        if state["last_frame"] is None:
            return
        out_dir = Path(ctx.get("run_dir", "logs")) / "snapshots"
        out_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image as PILImage

        path = out_dir / f"frame_{time.strftime('%Y%m%d_%H%M%S')}.png"
        PILImage.fromarray(state["last_frame"]).save(path)
        gui_status.content = f"status: snapshot saved to {path}"

    @server.on_client_connect
    def _on_client(client: "viser.ClientHandle"):
        with client.gui.add_folder("Controls"):
            btn_center = client.gui.add_button("Look At Center")
            btn_front = client.gui.add_button("Look Front")
            btn_right = client.gui.add_button("Look Right")
            btn_down = client.gui.add_button("Look Down")
            btn_in = client.gui.add_button("Dolly In")
            btn_out = client.gui.add_button("Dolly Out")
            btn_snap = client.gui.add_button("Save Screenshot")

        def _bind(btn, fn):
            def _cb(_evt):
                c2w = state.get("last_c2w")
                if c2w is not None:
                    _set_client_pose(client, fn(c2w))
            btn.on_click(_cb)

        _bind(btn_center, lambda c: pose_look_center(c, scene_center))
        _bind(btn_front, lambda c: pose_snap_dir(c, [0.0, 0.0, -1.0]))
        _bind(btn_right, lambda c: pose_snap_dir(c, [1.0, 0.0, 0.0]))
        _bind(btn_down, lambda c: pose_snap_dir(c, [0.0, -1.0, 0.0]))
        _bind(btn_in, lambda c: pose_dolly(c, forward=True, step=dolly_step))
        _bind(btn_out, lambda c: pose_dolly(c, forward=False, step=dolly_step))
        btn_snap.on_click(_snapshot)

        @client.camera.on_update
        def _on_cam(_):
            _render_to(client)

    def _render_to(client):
        cam = client.camera
        import viser.transforms as vtf

        R = vtf.SO3(np.asarray(cam.wxyz)).as_matrix()
        c2w = np.concatenate(
            [R, np.asarray(cam.position, np.float32).reshape(3, 1)], axis=1)
        state["last_c2w"] = c2w
        max_res = int(gui_res.value)
        aspect = float(cam.aspect) if cam.aspect else 4 / 3
        H = min(max_res, 1024)
        W = int(round(H * aspect))
        clip_on = bool(gui_nf_enable.value)
        frame = engine.render(
            c2w, W, H, float(cam.fov) / max(float(gui_zoom.value), 1e-3),
            params=ctrl.get_render_params(),
            output=gui_output.value,
            bg_policy=gui_bg.value,
            active_expert=None if gui_expert.value == "all" else gui_expert.value,
            ray_samples=int(gui_samples.value),
            exposure=float(gui_exposure.value),
            gamma=float(gui_gamma.value),
            depth_cmap=str(gui_depth_cmap.value),
            near_clip_m=float(gui_near_m.value) if clip_on else None,
            far_clip_m=float(gui_far_m.value) if clip_on else None,
        )
        state["last_frame"] = frame
        client.scene.set_background_image(frame, format="jpeg")

    print(f"[viewer] serving on http://0.0.0.0:{port}")
    if not blocking:
        return server, ctrl, engine

    timeout = float(getattr(P, "viewer_timeout", 0) or 0)
    t0 = time.time()
    try:
        while not state["terminate"]:
            st = ctrl.status()
            if st["running"] or st["steps"]:
                gui_status.content = (
                    f"status: steps {st['steps']}/{st['target_steps']} "
                    f"{'running' if st['running'] else 'idle'} "
                    f"{st['last_metrics']}"
                )
            for client in server.get_clients().values():
                if ctrl.is_running:
                    _render_to(client)
            time.sleep(0.5 if ctrl.is_running else 2.0)
            if timeout and time.time() - t0 > timeout:
                break
    except KeyboardInterrupt:
        pass
    finally:
        ctrl.stop(join=False)
        server.stop()
