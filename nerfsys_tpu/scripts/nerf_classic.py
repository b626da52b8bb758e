"""Classic-NeRF configs, literal: tiny / full / LLFF-NDC / mip-IPE.

BASELINE.json names four north-star configs the NeRF-Sys reference itself
does not contain; this script makes each one runnable end-to-end through the
package's real loaders and renderers:

  tiny  Blender-synthetic at 100x100, 4-layer/128-wide MLP, 64 coarse
        samples, NO view directions (CPU-runnable).
  full  Blender-synthetic at 400x400, 8x256 skip MLP, 64+128 coarse/fine
        inverse-CDF hierarchical sampling, view-dependent color head.
  llff  Forward-facing capture: poses_bounds.npy loading + NDC ray
        parameterization (ops/rays.ndc_rays), 64+128 hierarchical.
  mip   Integrated positional encoding over conical frustums
        (ops/mip.py), two levels through ONE shared MLP.

No NeRF-synthetic data ships in this image (zero egress), so by default the
script SYNTHESIZES a scene in the literal on-disk format (Blender
transforms_*.json + RGBA PNGs, or LLFF poses_bounds.npy + images/) from the
measure_fit procedural scene, then trains through the real loader — pass
--data_path at a real lego/fern download to run the actual benchmark.

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -m \
      nerfsys_tpu.scripts.nerf_classic --preset tiny --steps 300

TPU-first notes: one jitted train step (fixed batch shape), bf16-safe MLPs,
whole-image renders chunked at a fixed ray count so XLA compiles exactly two
programs (train step + render chunk).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


# --------------------------- scene synthesis --------------------------------
def synthesize_blender(root: Path, n_views: int, side: int, seed: int = 0,
                       test_views: int = 3) -> None:
    """Render the procedural measure_fit scene into the literal
    Blender-synthetic layout (train + test splits)."""
    from nerfsys_tpu.data.blender import write_blender_scene
    from nerfsys_tpu.scripts.measure_fit import (
        _gt_for_rows,
        _spiral_c2ws,
    )

    fov = 0.7
    px = side * side
    for split, n, sd in (("train", n_views, seed),
                        ("test", test_views, seed + 1)):
        c2ws = np.stack(_spiral_c2ws(n, seed=sd))
        rows = np.arange(n * px)
        rgb, hit = _gt_for_rows(rows, n, side, seed=sd, aa=2)
        rgba = np.concatenate([rgb, hit[:, None]], axis=1)
        # the procedural GT is white where rays miss; store premultiplied-
        # undone color so compositing back onto white reproduces it exactly
        a = np.maximum(rgba[:, 3:4], 1e-6)
        rgba[:, :3] = np.clip((rgba[:, :3] - (1.0 - a)) / a, 0.0, 1.0)
        rgba = rgba.reshape(n, side, side, 4)
        write_blender_scene(root, rgba, c2ws, camera_angle_x=fov, split=split)
    # the procedural rig keeps geometry inside |x| < 1.2 at radius ~2.6:
    # stash near/far in both jsons (load_blender_scene reads them)
    for split in ("train", "test"):
        meta_p = root / f"transforms_{split}.json"
        meta = json.loads(meta_p.read_text())
        meta["near"], meta["far"] = 0.5, 4.5
        meta_p.write_text(json.dumps(meta))


def synthesize_llff(root: Path, n_views: int, side: int, seed: int = 0) -> None:
    """Forward-facing rig over the procedural scene, written in the literal
    LLFF layout ([down, right, back] pose columns + hwf + bounds)."""
    from nerfsys_tpu.data.llff import write_llff_scene
    from nerfsys_tpu.data.ram_rays import np_ray_directions
    from nerfsys_tpu.scripts.measure_fit import _ray_gt

    rng = np.random.default_rng(seed)
    fov = 0.7
    f = side / (2 * np.tan(fov / 2))
    images, poses_drb, bounds = [], [], []
    dirs_cam = np_ray_directions(side, side, f, f, side / 2, side / 2)
    for i in range(n_views):
        # cameras on a small lateral grid at z ~ +2.6 looking down -z
        eye = np.array([
            0.5 * rng.uniform(-1, 1), 0.5 * rng.uniform(-1, 1),
            2.6 + 0.2 * rng.uniform(-1, 1),
        ], np.float32)
        look = np.array([0.08, 0.02, 0.0], np.float32) * rng.uniform(-1, 1)
        back = eye - look
        back /= np.linalg.norm(back)
        right = np.cross(np.array([0, 1, 0], np.float32), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.stack([right, up, back, eye], axis=1).astype(np.float32)
        d = dirs_cam.reshape(-1, 3) @ c2w[:3, :3].T
        o = np.broadcast_to(c2w[:3, 3], d.shape).astype(np.float32)
        rgb = _ray_gt(o, d.astype(np.float32))
        images.append(rgb.reshape(side, side, 3))
        # [right, up, back] -> LLFF's [down, right, back]
        poses_drb.append(np.stack(
            [-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3]], axis=1
        ))
        bounds.append([1.0, 4.8])
    write_llff_scene(
        root, np.stack(images), np.stack(poses_drb),
        hwf=np.array([side, side, f]), bounds=np.asarray(bounds, np.float64),
    )


# --------------------------- ray assembly -----------------------------------
def blender_all_rays(scene, ids):
    """Packed rays + GT colors for the given image ids (host numpy).

    The upstream NeRF Blender protocol measures near/far as camera-frame
    Z-DEPTH (it marches unnormalized dirs with z=-1); our dirs are unit
    vectors, so the parametric span is scaled per-ray by 1/|dir_cam.z| to
    reproduce z-depth sampling exactly (ADVICE r4 — corner rays otherwise
    deviate ~8% at 800²)."""
    from nerfsys_tpu.data.ram_rays import np_get_rays, np_ray_directions

    fx, fy, cx, cy = scene.intrinsics
    dirs_cam = np_ray_directions(scene.H, scene.W, fx, fy, cx, cy)
    inv_cosz = (1.0 / np.maximum(np.abs(dirs_cam[..., 2]), 1e-6)
                ).reshape(-1).astype(np.float32)
    rays, rgbs = [], []
    for i in ids:
        r = np_get_rays(dirs_cam, scene.c2ws[i], near=scene.near,
                        far=scene.far).reshape(-1, 8)
        r[:, 6] = scene.near * inv_cosz
        r[:, 7] = scene.far * inv_cosz
        rays.append(r)
        rgbs.append(scene.images[i].reshape(-1, 3))
    return np.concatenate(rays), np.concatenate(rgbs)


def llff_all_rays(scene, ids, ndc: bool = True):
    """LLFF rays; NDC-warped (near=0, far=1) when ndc, else metric bounds."""
    import jax.numpy as jnp

    from nerfsys_tpu.data.ram_rays import np_get_rays, np_ray_directions
    from nerfsys_tpu.ops.rays import ndc_rays

    fx, fy, cx, cy = scene.intrinsics
    dirs_cam = np_ray_directions(scene.H, scene.W, fx, fy, cx, cy)
    rays, rgbs = [], []
    near_m = float(scene.bounds.min()) * 0.9
    far_m = float(scene.bounds.max()) * 1.1
    for i in ids:
        r = np_get_rays(dirs_cam, scene.c2ws[i], near=near_m,
                        far=far_m).reshape(-1, 8)
        if ndc:
            o, d = ndc_rays(scene.H, scene.W, fx, fy, 1.0,
                            jnp.asarray(r[:, 0:3]), jnp.asarray(r[:, 3:6]))
            r = np.concatenate([
                np.asarray(o), np.asarray(d),
                np.zeros((len(r), 1), np.float32),
                np.ones((len(r), 1), np.float32),
            ], axis=1)
        rays.append(r)
        rgbs.append(scene.images[i].reshape(-1, 3))
    return np.concatenate(rays), np.concatenate(rgbs)


# --------------------------- presets ----------------------------------------
PRESETS = ("tiny", "full", "llff", "mip")


def build_models(preset: str):
    """(configs dict, init_fn, apply_fns) per preset."""
    import jax

    from nerfsys_tpu.models.vanilla import VanillaConfig, init_vanilla_params
    from nerfsys_tpu.ops.mip import ipe_out_dim

    if preset == "tiny":
        cfg = VanillaConfig(
            hidden=128, sigma_depth=4, skips=(), geo_feat_dim=64,
            color_hidden=64, color_depth=1, use_viewdirs=False, pe_dim_xyz=6,
        )
        def init(key):
            return {"coarse": init_vanilla_params(key, cfg)}
        return {"coarse": cfg}, init, {"kind": "stratified", "cfg": cfg}

    if preset in ("full", "llff"):
        cfg = VanillaConfig()  # 8x256 skip-4, viewdirs, pe 10
        def init(key):
            kc, kf = jax.random.split(key)
            return {"coarse": init_vanilla_params(kc, cfg),
                    "fine": init_vanilla_params(kf, cfg)}
        return {"coarse": cfg, "fine": cfg}, init, {
            "kind": "hierarchical", "cfg": cfg,
        }

    if preset == "mip":
        max_deg = 16
        cfg = VanillaConfig(
            xyz_enc_override=ipe_out_dim(0, max_deg),
            hidden=256, sigma_depth=8,
        )
        def init(key):
            return {"mip": init_vanilla_params(key, cfg)}
        return {"mip": cfg}, init, {
            "kind": "mip", "cfg": cfg, "max_deg": max_deg,
        }

    raise ValueError(f"unknown preset {preset!r}")


def make_render_fn(spec, n_coarse: int, n_fine: int, base_radius: float):
    """(params, rays, key, randomized) -> dict of per-level render tuples."""
    import jax.numpy as jnp

    from nerfsys_tpu.models.vanilla import vanilla_apply, vanilla_apply_enc
    from nerfsys_tpu.ops.mip import ipe_encode, render_rays_mip
    from nerfsys_tpu.ops.volrend import (
        render_rays_hierarchical,
        render_rays_stratified,
    )

    cfg = spec["cfg"]

    if spec["kind"] == "stratified":
        def render(params, rays, key, randomized):
            def field(pts, dirs):
                return vanilla_apply(params["coarse"], cfg, None, pts, dirs)
            out = render_rays_stratified(
                field, rays, n_coarse, key, randomized=randomized,
                bg_policy="white",
            )
            return {"fine": out}
        return render

    if spec["kind"] == "hierarchical":
        def render(params, rays, key, randomized):
            def cfield(pts, dirs):
                return vanilla_apply(params["coarse"], cfg, None, pts, dirs)
            def ffield(pts, dirs):
                return vanilla_apply(params["fine"], cfg, None, pts, dirs)
            c, f = render_rays_hierarchical(
                cfield, ffield, rays, n_coarse, n_fine, key,
                randomized=randomized, bg_policy="white",
            )
            return {"coarse": c, "fine": f}
        return render

    if spec["kind"] == "mip":
        max_deg = spec["max_deg"]

        def render(params, rays, key, randomized):
            radii = jnp.full((rays.shape[0], 1), base_radius, rays.dtype)
            def field(means, covs, dirs):
                enc = ipe_encode(means, covs, 0, max_deg)
                return vanilla_apply_enc(params["mip"], cfg, enc, dirs)
            lv0, lv1 = render_rays_mip(
                field, rays, radii, n_coarse, key, n_levels=2,
                randomized=randomized, bg_policy="white",
            )
            return {"coarse": lv0, "fine": lv1}
        return render

    raise ValueError(spec["kind"])


# --------------------------- training loop ----------------------------------
def train(a) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    root = Path(a.data_path) if a.data_path else Path(a.workdir) / a.preset
    t_setup = time.perf_counter()

    if a.preset == "llff":
        from nerfsys_tpu.data.llff import load_llff_scene

        if not (root / "poses_bounds.npy").exists():
            synthesize_llff(root, a.n_views, a.side, a.seed)
        scene = load_llff_scene(root, downscale=a.downscale,
                                llff_hold=a.llff_hold)
        train_ids, test_ids = scene.train_ids, scene.test_ids
        rays, rgbs = llff_all_rays(scene, train_ids, ndc=not a.no_ndc)
        test_rays, test_rgbs = llff_all_rays(scene, test_ids[:1],
                                             ndc=not a.no_ndc)
    else:
        from nerfsys_tpu.data.blender import load_blender_scene

        if not (root / "transforms_train.json").exists():
            synthesize_blender(root, a.n_views, a.side, a.seed)
        scene = load_blender_scene(root, split="train",
                                   downscale=a.downscale)
        test_scene = load_blender_scene(root, split="test",
                                        downscale=a.downscale)
        rays, rgbs = blender_all_rays(scene, range(len(scene.images)))
        test_rays, test_rgbs = blender_all_rays(test_scene, [0])

    _, init_fn, spec = build_models(a.preset)
    from nerfsys_tpu.ops.mip import pixel_base_radius

    # the mip-NeRF variance-matched pixel disc (2/sqrt(12) of the pixel
    # width at unit depth) — keep the single definition in ops/mip.py
    base_radius = pixel_base_radius(scene.focal, scene.focal)
    render = make_render_fn(spec, a.n_coarse, a.n_fine, base_radius)

    params = init_fn(jax.random.PRNGKey(a.seed))
    sched = optax.exponential_decay(
        a.lr, a.steps, a.lr_final / a.lr, staircase=False
    )
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rays_b, rgb_b, key):
        def loss_fn(p):
            outs = render(p, rays_b, key, True)
            loss = 0.0
            # mip-NeRF weighs earlier levels 0.1; classic NeRF weighs the
            # coarse head equally — both are preset-dependent constants
            for name, out in outs.items():
                w = 1.0 if name == "fine" else (
                    0.1 if spec["kind"] == "mip" else 1.0
                )
                loss = loss + w * jnp.mean((out[0] - rgb_b) ** 2)
            fine_mse = jnp.mean((outs["fine"][0] - rgb_b) ** 2)
            return loss, fine_mse
        (loss, fine_mse), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, fine_mse

    @jax.jit
    def render_chunk(params, rays_b):
        return render(params, rays_b, None, False)["fine"][0]

    def eval_psnr(params):
        preds = []
        n = len(test_rays)
        C = a.eval_chunk
        pad = (-n) % C
        rr = np.concatenate([test_rays, np.repeat(test_rays[-1:], pad, 0)])
        for i in range(0, len(rr), C):
            preds.append(np.asarray(render_chunk(params, jnp.asarray(rr[i:i + C]))))
        pred = np.concatenate(preds)[:n]
        mse = float(np.mean((pred - test_rgbs) ** 2))
        return -10.0 * np.log10(mse + 1e-24), pred

    n_rays = len(rays)
    rng = np.random.default_rng(a.seed)
    key = jax.random.PRNGKey(a.seed + 1)
    print(f"[nerf_classic] preset={a.preset} rays={n_rays} "
          f"H={scene.H} W={scene.W} setup={time.perf_counter() - t_setup:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    t_steady = None
    history = []
    for it in range(a.steps):
        sel = rng.integers(0, n_rays, a.batch_rays)
        key, ks = jax.random.split(key)
        params, opt_state, mse = step(
            params, opt_state, jnp.asarray(rays[sel]), jnp.asarray(rgbs[sel]),
            ks,
        )
        if it == 0:
            t_steady = time.perf_counter()
        if (it + 1) % a.eval_every == 0 or it == a.steps - 1:
            mse_h = float(mse)  # host sync
            psnr, _ = eval_psnr(params)
            history.append((it + 1, psnr))
            print(f"[nerf_classic] step {it + 1}/{a.steps} "
                  f"train_mse {mse_h:.5f} test_psnr {psnr:.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    dt = (time.perf_counter() - t_steady) / max(a.steps - 1, 1)

    psnr, pred = eval_psnr(params)
    if a.dump_png:
        from PIL import Image as PILImage

        side = int(round((len(test_rgbs)) ** 0.5))
        img = (np.clip(pred[: side * side].reshape(side, side, 3), 0, 1)
               * 255).astype(np.uint8)
        PILImage.fromarray(img).save(Path(a.workdir) / f"{a.preset}_test.png")

    out = {
        "mode": f"nerf_classic_{a.preset}",
        "steps": a.steps,
        "step_seconds": round(dt, 4),
        "rays_per_sec": round(a.batch_rays / dt, 1),
        "test_psnr": round(psnr, 2),
        "history": [(s, round(p, 2)) for s, p in history],
        "n_train_rays": n_rays,
        "ndc": a.preset == "llff" and not a.no_ndc,
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=PRESETS, required=True)
    ap.add_argument("--data_path", default="",
                    help="real dataset root (Blender or LLFF layout); "
                         "default: synthesize the procedural scene")
    ap.add_argument("--workdir", default="/tmp/nerf_classic")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_rays", type=int, default=1024)
    ap.add_argument("--n_views", type=int, default=24)
    ap.add_argument("--side", type=int, default=0,
                    help="synthesized image side (0 = preset default)")
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--n_coarse", type=int, default=0,
                    help="0 = preset default (tiny 64, others 64)")
    ap.add_argument("--n_fine", type=int, default=0,
                    help="0 = preset default (tiny 0, others 128)")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--lr_final", type=float, default=5e-6)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--eval_chunk", type=int, default=4096)
    ap.add_argument("--llff_hold", type=int, default=8)
    ap.add_argument("--no_ndc", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dump_png", action="store_true")
    a = ap.parse_args(argv)

    if a.side == 0:
        a.side = {"tiny": 100, "full": 400, "llff": 378, "mip": 400}[a.preset]
    if a.n_coarse == 0:
        a.n_coarse = 64
    if a.n_fine == 0:
        a.n_fine = 0 if a.preset == "tiny" else 128
    Path(a.workdir).mkdir(parents=True, exist_ok=True)
    train(a)


if __name__ == "__main__":
    main()
