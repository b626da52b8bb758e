"""Orbit/path video rendering with DRB-native camera paths.

Counterpart of /root/reference/adaptive_nerf/pipelines/video_gen.py. Camera
path generation is host-side numpy (poses are cheap); frames render through
the jitted fixed-chunk renderer, so the whole video is one compiled program
replayed per chunk.

Conventions (module doc of the reference): world translations in DRB; c2w
stores RUB columns [right, up, back]; world 'up' is -D = [-1, 0, 0].
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

import numpy as np

UP_WORLD = np.array([-1.0, 0.0, 0.0], dtype=np.float32)


# --------------------------- pose builders -----------------------------------
def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-12)


def rub_pose_from_pos(center, cam, up_world=UP_WORLD) -> np.ndarray:
    """c2w (4,4) with RUB columns, camera at `cam` looking at `center`."""
    fwd = _normalize(np.asarray(center, np.float32) - cam)
    right = _normalize(np.cross(fwd, up_world))
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.stack([right, up, -fwd], axis=1)
    c2w[:3, 3] = cam
    return c2w


def rub_pose_look_same_D(center, cam, up_world=UP_WORLD) -> np.ndarray:
    """Look at the scene center projected to the camera's height (D axis)."""
    look = np.array([cam[0], center[1], center[2]], np.float32)
    return rub_pose_from_pos(look, cam, up_world)


def rub_pose_from_fwd(cam, fwd, up_world=UP_WORLD) -> np.ndarray:
    fwd = _normalize(np.asarray(fwd, np.float32))
    right = _normalize(np.cross(fwd, up_world))
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.stack([right, up, -fwd], axis=1)
    c2w[:3, 3] = cam
    return c2w


# --------------------------- path generators ----------------------------------
def poses_turntable_drb(
    center_drb, radius: float, phi_deg: float = 20.0, n_poses: int = 120,
    tilt_deg: float = 0.0,
) -> np.ndarray:
    """Turntable orbit (video_gen.py:72-133). Returns (T, 4, 4)."""
    center = np.asarray(center_drb, np.float32)
    phi = math.radians(max(phi_deg, 12.0))
    thetas = np.linspace(0, 2 * math.pi, n_poses + 1, dtype=np.float32)[:-1]
    s_tilt, c_tilt = math.sin(math.radians(tilt_deg)), math.cos(math.radians(tilt_deg))

    poses = []
    for th in thetas:
        cam = center + np.array(
            [-radius * math.sin(phi),
             radius * math.cos(phi) * math.cos(th),
             radius * math.cos(phi) * math.sin(th)],
            np.float32,
        )
        c2w = rub_pose_from_pos(center, cam)
        if abs(tilt_deg) > 1e-6:  # Rodrigues roll about the back axis
            k = _normalize(c2w[:3, 2])
            K = np.array(
                [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float32
            )
            R_t = np.eye(3, dtype=np.float32) * c_tilt + (
                1 - c_tilt
            ) * np.outer(k, k) + s_tilt * K
            c2w[:3, :3] = c2w[:3, :3] @ R_t
        poses.append(c2w)
    return np.stack(poses)


def gen_path_east_west(
    center, extent, n_poses: int, height_frac: float = -0.12,
    margin: float = 0.90,
) -> np.ndarray:
    """West-to-east sweep at constant height (video_gen.py:135-167)."""
    center = np.asarray(center, np.float32)
    halfD, halfR, halfB = 0.5 * np.asarray(extent, np.float32)
    D = height_frac * halfD
    R0, R1 = -margin * halfR, margin * halfR
    Boff = 0.15 * halfB
    ts = np.linspace(0, 1, n_poses, dtype=np.float32)
    u = 0.5 * (1 - np.cos(np.pi * ts))
    poses = []
    for t, w in zip(ts, u):
        cam = center + np.array(
            [D, (1 - w) * R0 + w * R1, Boff * math.sin(2 * math.pi * t)], np.float32
        )
        poses.append(rub_pose_look_same_D(center, cam))
    return np.stack(poses)


def gen_path_north_south(
    center, extent, n_poses: int, height_frac: float = -0.12,
    margin: float = 0.90,
) -> np.ndarray:
    """North-to-south sweep (video_gen.py:169-201)."""
    center = np.asarray(center, np.float32)
    halfD, halfR, halfB = 0.5 * np.asarray(extent, np.float32)
    D = height_frac * halfD
    B0, B1 = -margin * halfB, margin * halfB
    Roff = 0.15 * halfR
    ts = np.linspace(0, 1, n_poses, dtype=np.float32)
    u = 0.5 * (1 - np.cos(np.pi * ts))
    poses = []
    for t, w in zip(ts, u):
        cam = center + np.array(
            [D, Roff * math.sin(2 * math.pi * t), (1 - w) * B0 + w * B1], np.float32
        )
        poses.append(rub_pose_look_same_D(center, cam))
    return np.stack(poses)


def gen_path_spiral_inside(
    center, extent, n_poses: int, turns: float = 2.0, radial_frac: float = 0.6,
    height_center_frac: float = -0.15, height_amp_frac: float = 0.10,
) -> np.ndarray:
    """Spiral inside the AABB with mild height variation (video_gen.py:203-255)."""
    center = np.asarray(center, np.float32)
    extent = np.asarray(extent, np.float32)
    halfD, halfR, halfB = 0.5 * extent
    min_half = 0.5 * float(extent.min())
    r_base = radial_frac * min_half
    d_center = height_center_frac * halfD
    d_amp = height_amp_frac * halfD
    thetas = np.linspace(0, 2 * math.pi * turns, n_poses, dtype=np.float32)
    poses = []
    for th in thetas:
        rad = r_base * (0.85 + 0.15 * math.cos(th * 0.5))
        r = np.clip(rad * math.cos(th), -halfR * 0.95, halfR * 0.95)
        b = np.clip(rad * math.sin(th), -halfB * 0.95, halfB * 0.95)
        d = np.clip(d_center + d_amp * math.sin(0.5 * th), -halfD * 0.90, halfD * 0.90)
        cam = center + np.array([d, r, b], np.float32)
        poses.append(rub_pose_from_pos(center, cam))
    return np.stack(poses)


def gen_path_full_coverage(
    center, extent, n_poses: int, rows: int = 6, cols: int = 9,
    height_start_frac: float = -0.18, height_end_frac: float = 0.18,
) -> np.ndarray:
    """Boustrophedon grid sweep over the scene (video_gen.py:257-327)."""
    center = np.asarray(center, np.float32)
    halfD, halfR, halfB = 0.5 * np.asarray(extent, np.float32)
    Rvals = np.linspace(-0.85 * halfR, 0.85 * halfR, cols)
    Bvals = np.linspace(-0.85 * halfB, 0.85 * halfB, rows)
    waypoints = []
    for i, b in enumerate(Bvals):
        Rs = Rvals if i % 2 == 0 else Rvals[::-1]
        waypoints.extend((float(r), float(b)) for r in Rs)
    legs = max(1, len(waypoints) - 1)
    f_per_leg = max(2, math.ceil(n_poses / legs))
    total = legs * f_per_leg
    t_heights = np.linspace(0.0, 1.0, total)
    d_start = height_start_frac * halfD
    d_end = height_end_frac * halfD

    poses = []
    idx = 0
    for k in range(legs):
        r0, b0 = waypoints[k]
        r1, b1 = waypoints[k + 1]
        for j in range(f_per_leg):
            w = 0.5 * (1 - math.cos(math.pi * j / f_per_leg))
            r = (1 - w) * r0 + w * r1
            b = (1 - w) * b0 + w * b1
            d = (1 - t_heights[idx]) * d_start + t_heights[idx] * d_end
            idx += 1
            cam = center + np.array([d, r, b], np.float32)
            poses.append(rub_pose_from_pos(center, cam))
    poses = np.stack(poses)
    if poses.shape[0] > n_poses:
        poses = poses[:n_poses]
    elif poses.shape[0] < n_poses:
        pad = np.repeat(poses[-1:], n_poses - poses.shape[0], axis=0)
        poses = np.concatenate([poses, pad])
    return poses


PATH_GENERATORS = {
    "turntable": lambda c, e, n: poses_turntable_drb(
        c, radius=0.9 * float(np.asarray(e).max()) / 2, n_poses=n
    ),
    "east_west": gen_path_east_west,
    "north_south": gen_path_north_south,
    "spiral_in": gen_path_spiral_inside,
    "full_coverage": gen_path_full_coverage,
}


# --------------------------- fog suppression ----------------------------------
def suppress_fog(
    rgb: np.ndarray,  # (N, 3)
    weights: Optional[np.ndarray],  # (N, S); None with wmax_entropy given
    acc: np.ndarray,  # (N,)
    bg_val: float,
    acc_thr: float = 0.05,
    wmax_thr: float = 0.08,
    entropy_thr: float = 1.5,
    wmax_entropy=None,  # precomputed ((N,), (N,)) — the render path computes
    # these on device (make_chunk_renderer fog_stats) so (N, S) weight maps
    # never ship to host
):
    """Blank low-opacity / hazy pixels (video_gen.py:329-363).

    Returns (rgb, stats) — functional variant of the reference's in-place op.
    """
    rgb = rgb.copy()
    low = acc < acc_thr
    rgb[low] = bg_val
    if wmax_entropy is not None:
        wmax, entropy = wmax_entropy
    else:
        wsum = np.maximum(weights.sum(1, keepdims=True), 1e-12)
        p = weights / wsum
        entropy = -(p * np.log(np.maximum(p, 1e-12))).sum(1)
        wmax = weights.max(1)
    fog = (acc < max(acc_thr * 1.3, 0.10)) & ((wmax < wmax_thr) | (entropy > entropy_thr))
    rgb[fog] = bg_val
    return rgb, {"pct_low": float(low.mean()), "pct_fog": float(fog.mean())}


# --------------------------- main entry ---------------------------------------
def render_video(ctx) -> Path:
    """Render a camera-path video from a trained checkpoint (--op video).

    Reference-parity drive of video_gen.py:368-522 + nerf_runner.py:371-427:
    intrinsics come from the first test image when test metadata is loaded
    (nerf_runner.py:378-383; the video_width/height/fov flags are the
    fallback for contexts without data); turntable uses the inside radius
    0.6 * half-min-extent and phi 45 deg (:388-396,417-420); every path gets
    the camera drop 0.15 * extent_D (:451-452) and the near bias
    0.15 * scene radius clamped to t_far (:454-459,479-481); the learned
    background MLP is disabled (:407-408); fog suppression runs by default
    with the reference's full opacity/weight-shape signals computed on
    device (:468,506-514) — --no_suppress_fog disables it.
    """
    import jax.numpy as jnp

    from nerfsys_tpu.data.ram_rays import frame_rays, np_clamp_rays
    from nerfsys_tpu.ops.color_space import linear_to_srgb
    from nerfsys_tpu.pipelines.online.runtime_adapt import (
        default_chunk_rays,
        make_chunk_renderer,
        render_rays_chunked,
    )

    P = ctx["P"]
    statics = ctx["statics"]
    params = ctx["params"]
    cfg = ctx["cfg"]
    aabb = np.asarray(statics.global_aabb)
    center = 0.5 * (aabb[0] + aabb[1])
    extent = aabb[1] - aabb[0]

    n_poses = int(getattr(P, "video_frames", 210))
    fps = int(getattr(P, "video_fps", 30))
    test_md = ctx.get("test_metadata") or []
    if test_md:
        # reference: intrinsics of the first test image (nerf_runner.py:378-383)
        md0 = test_md[0]
        H, W = int(md0.H), int(md0.W)
        fx, fy, cx, cy = [float(x) for x in np.asarray(md0.intrinsics[:4])]
    else:
        W = int(getattr(P, "video_width", 800))
        H = int(getattr(P, "video_height", 600))
        fx = fy = 0.9 * max(W, H)
        cx, cy = W / 2, H / 2

    if P.camera_path == "turntable":
        # inside_radius_from_box(frac=0.6) + phi_deg=45 (nerf_runner.py:388-420)
        radius = 0.6 * 0.5 * float(extent.min())
        poses = poses_turntable_drb(center, radius=radius, phi_deg=45.0,
                                    n_poses=n_poses)
    else:
        poses = PATH_GENERATORS[P.camera_path](center, extent, n_poses)
    # camera drop: push every camera down by 15% of the D extent
    # (video_gen.py:451-452)
    poses[:, 0, 3] += 0.15 * extent[0]
    # near bias clips camera-adjacent haze (video_gen.py:454-459)
    near_bias = 0.15 * (0.5 * float(np.linalg.norm(extent)))
    print(f"[video] path={P.camera_path} frames={len(poses)} {W}x{H}")

    suppress = not getattr(P, "no_suppress_fog", False)
    # occupancy-accelerated frames when the checkpoint carried trained grids
    # (same dispatch as the eval op; reference render_rays, :564-574)
    from nerfsys_tpu.parallel.mesh import maybe_render_mesh

    mesh = maybe_render_mesh(P)
    baked_res = int(getattr(P, "render_baked", 0))
    # pose-path eligibility: every one-program frame mode serves from the
    # camera (rays generate on device; fog suppression + srgb + u8 fuse
    # into the program — host IO per frame is ~20 floats up + 3 B/px
    # down, vs H*W*8 f32 of rays up). The two-wave hard-occ dispatcher
    # and mesh/early-stop modes keep host raygen (their dispatch needs
    # per-ray bits on host).
    occ_hard_live = (baked_res == 0 and ctx.get("occ_state") is not None
                     and not getattr(P, "occ_no_hard_mask", False))
    pose_path = (mesh is None and not occ_hard_live
                 and float(getattr(P, "render_early_stop", 0.0)) == 0.0
                 # --render_coherent opts into the host-raygen coherent
                 # loop (the pose path has no dispatch stage to pack on)
                 and not bool(getattr(P, "render_coherent", False)))
    budget = (int(P.chunk_points)
              if "chunk_points" in getattr(P, "explicit_keys", ())
              else 3_145_728)
    chunk_rays = default_chunk_rays(P.ray_samples, budget_pts=budget)

    def fused_frame(rgb, depth, acc, *rest):
        """Device tail of the video loop: fog suppression (when on) +
        linear->srgb + u8, exactly the host math below (suppress_fog with
        entropy_thr 1.4, then truncating *255 cast)."""
        if suppress:
            wmax, entropy = rest
            rgb = jnp.where((acc < 0.05)[:, None], 1.0, rgb)
            fog = (acc < 0.10) & ((wmax < 0.08) | (entropy > 1.4))
            rgb = jnp.where(fog[:, None], 1.0, rgb)
        srgb = linear_to_srgb(rgb)
        return (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    cam_renderer = None
    if baked_res > 0:
        # serving mode: one bake, then every frame costs only 4 trilinear
        # row gathers/sample (models/baked.py) — the video loop is where
        # the per-frame saving multiplies by n_poses
        import time as _time

        if bool(getattr(P, "render_coherent", False)):
            print("[video] --render_coherent ignored with --render_baked "
                  "(the snapshot has no expert routing)")

        from nerfsys_tpu.models.baked import (
            BakedConfig,
            bake_field,
            make_baked_camera_renderer,
            make_baked_chunk_renderer,
        )

        bcfg = BakedConfig(resolution=baked_res,
                           sh_levels=int(getattr(P, "render_baked_sh", 3)),
                           n_dirs=max(32, 2 * int(getattr(
                               P, "render_baked_sh", 3)) ** 2),
                           sparse_block=int(getattr(
                               P, "render_baked_sparse", 0)))
        if getattr(P, "render_baked_occ", False) and \
                ctx.get("occ_state") is None:
            # visible no-op guard (ADVICE r3): no grids -> dense bake
            print("[video] WARNING: --render_baked_occ requested but the "
                  "checkpoint has no occupancy state — baking dense")
        from nerfsys_tpu.models.baked import (
            load_baked,
            occ_bake_fingerprint,
            params_fingerprint,
            save_baked,
        )

        cache = str(getattr(P, "render_baked_cache", "") or "")
        fp = params_fingerprint(params) if cache else ""
        ok = occ_bake_fingerprint(
            ctx.get("occ_state")
            if getattr(P, "render_baked_occ", False) else None,
            int(getattr(P, "render_baked_occ_dilate", 2))) if cache else ""
        baked = load_baked(cache, bcfg, fingerprint=fp,
                           occ_key=ok) if cache else None
        if baked is not None:
            print(f"[video] loaded baked snapshot cache {cache}")
        else:
            t0 = _time.perf_counter()
            baked = bake_field(
                params, cfg, statics, bcfg,
                occ_state=(ctx.get("occ_state")
                           if getattr(P, "render_baked_occ", False)
                           else None),
                occ_dilate=int(getattr(P, "render_baked_occ_dilate", 2)),
            )
            print(f"[video] baked {bcfg.resolution}³ SH-{bcfg.sh_levels} "
                  f"grid in {_time.perf_counter() - t0:.1f}s")
            if cache:
                save_baked(cache, baked, bcfg, fingerprint=fp, occ_key=ok)
                print(f"[video] saved baked snapshot cache {cache}")
        if pose_path:
            cam_renderer = make_baked_camera_renderer(
                baked, bcfg, cfg, H=H, W=W, ray_samples=P.ray_samples,
                chunk_rays=chunk_rays, scene_aabb=aabb,
                near_bias=near_bias, bg_policy="white",
                use_bg_fn=False,  # reference video disables the bg MLP
                fog_stats=suppress, map_outputs=fused_frame,
            )
        else:
            renderer = make_baked_chunk_renderer(
                baked, bcfg, cfg, ray_samples=P.ray_samples,
                bg_policy="white",
                use_bg_fn=False,  # reference video disables the bg MLP
                fog_stats=suppress,
                mesh=mesh,
            )
    elif pose_path:
        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            make_live_camera_renderer,
        )

        cam_renderer = make_live_camera_renderer(
            cfg, H=H, W=W, ray_samples=P.ray_samples,
            chunk_rays=chunk_rays, scene_aabb=aabb, near_bias=near_bias,
            occ_state=ctx.get("occ_state"),
            occ_importance=bool(getattr(P, "occ_importance", False)),
            occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
            occ_probe_mask=bool(getattr(P, "occ_probe_mask", False)),
            occ_probe_grid_res=int(getattr(P, "occ_union_probe_res", 0)),
            bg_policy="white",
            use_bg_fn=False,  # reference video disables the bg MLP (:407-408)
            fog_stats=suppress, map_outputs=fused_frame,
        )
    elif bool(getattr(P, "render_coherent", False)) and mesh is None \
            and float(getattr(P, "render_early_stop", 0.0)) == 0.0:
        # coherent-expert dispatch for video frames (exact; the eval op's
        # --render_coherent, same duck-typed render_rays_chunked routing)
        from nerfsys_tpu.pipelines.online.runtime_adapt import (
            make_coherent_renderer,
        )

        if int(getattr(P, "occ_union_probe_res", 0)) > 0:
            print("[video] coherent + union-probe grid (res "
                  f"{int(getattr(P, 'occ_union_probe_res', 0))}): probe "
                  "rows /K in every program")

        renderer = make_coherent_renderer(
            cfg, ray_samples=P.ray_samples, bg_policy="white",
            use_bg_fn=False, fog_stats=suppress,
            occ_state=ctx.get("occ_state"),
            occ_importance=bool(getattr(P, "occ_importance", False)),
            occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
            occ_probe_mask=bool(getattr(P, "occ_probe_mask", False)),
            occ_probe_grid_res=int(getattr(P, "occ_union_probe_res", 0)),
        )
    else:
        if bool(getattr(P, "render_coherent", False)):
            print("[video] --render_coherent ignored: unsharded renders "
                  "without --render_early_stop only")
        renderer = make_chunk_renderer(
            cfg, ray_samples=P.ray_samples, bg_policy="white",
            occ_state=ctx.get("occ_state"),
            occ_importance=bool(getattr(P, "occ_importance", False)),
            occ_probe_grid_res=int(getattr(P, "occ_union_probe_res", 0)),
            occ_hard_mask=not getattr(P, "occ_no_hard_mask", False),
            occ_probe_mask=bool(getattr(P, "occ_probe_mask", False)),
            mesh=mesh,
            use_bg_fn=False,  # reference video disables the bg MLP (:407-408)
            fog_stats=suppress,
            early_stop_eps=float(getattr(P, "render_early_stop", 0.0)),
        )

    intr = np.array([fx, fy, cx, cy], np.float32)
    frames = []
    for i, c2w in enumerate(poses):
        if cam_renderer is not None:
            # pose path: fog suppression + srgb + u8 fused on device;
            # host IO = pose up, u8 frame down
            frames.append(np.asarray(
                cam_renderer(params, statics, c2w[:3], intr), np.uint8))
            if i % 10 == 0:
                print(f"[video] frame {i}/{len(poses)}")
            continue
        rays, _ = frame_rays(H, W, (fx, fy, cx, cy), c2w[:3], aabb=aabb)
        # t_near = clamp(t_near, 0) + near_bias, capped below t_far
        # (video_gen.py:479-481); invalid rays stay inf-tagged (inf flows
        # through the bias arithmetic and the re-clamp unchanged)
        t_near = np.maximum(rays[:, 6], 0.0) + np.float32(near_bias)
        rays[:, 6] = np.minimum(t_near, rays[:, 7] - 1e-4)
        rays, _ = np_clamp_rays(rays)

        out = render_rays_chunked(renderer, params, statics, rays,
                                  chunk_rays, fog_stats=suppress)
        rgb_lin = out[:, 0:3]
        if suppress:
            # reference fog_params: entropy_thr 1.4 in the video loop (:468)
            rgb_lin, _fog = suppress_fog(
                rgb_lin, None, out[:, 4], bg_val=1.0,
                wmax_entropy=(out[:, 5], out[:, 6]), entropy_thr=1.4,
            )
        frame = np.asarray(
            linear_to_srgb(jnp.asarray(rgb_lin.reshape(H, W, 3)))
        )
        frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        if i % 10 == 0:
            print(f"[video] frame {i}/{len(poses)}")

    out_dir = Path(ctx["run_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"video_{P.camera_path}.mp4"
    try:
        import imageio.v3 as iio

        iio.imwrite(out_path, np.stack(frames), fps=fps, codec="libx264")
    except Exception as e:  # PNG-sequence fallback when no encoder available
        print(f"[video] mp4 write failed ({e}); dumping PNG sequence")
        from PIL import Image as PILImage

        seq_dir = out_dir / f"video_{P.camera_path}"
        seq_dir.mkdir(exist_ok=True)
        for i, f in enumerate(frames):
            PILImage.fromarray(f).save(seq_dir / f"{i:05d}.png")
        out_path = seq_dir
    print(f"[video] wrote {out_path}")
    return out_path
