"""Viewer subsystem tests: colormaps, geometry utils, batch verification,
controller/runner lifecycle, and the headless RenderEngine.

The viser UI itself is import-gated (optional dependency); everything under
it — the render path, the controller thread, the runtime-adapt runner — is
exercised here without a browser.
"""
import json
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from nerfsys_tpu.viewer.colormap import (
    apply_colormap,
    apply_depth_colormap,
    apply_pca_colormap,
    tonemap_frame,
    turbo,
)
from nerfsys_tpu.viewer.engine.controller import Controller
from nerfsys_tpu.viewer.engine.runners.base import BaseRunner, ViewRunner
from nerfsys_tpu.viewer.utils import (
    DRB_TO_RUB,
    RUB_TO_DRB,
    look_at_rub,
    rub_pose_to_drb,
    safe_active_module,
    safe_bg,
    verify_continual_batch_dir,
)


# --------------------------------- colormaps ---------------------------------
def test_turbo_range_and_shape():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    rgb = turbo(x)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # turbo goes blue -> red (poly fit is loose at the exact endpoints)
    lo, hi = turbo(np.array(0.15)), turbo(np.array(0.95))
    assert lo[2] > lo[0]  # blue-dominant low
    assert hi[0] > hi[2]  # red-dominant high


def test_apply_colormap_passthrough_and_scalar():
    img3 = np.random.rand(4, 4, 3).astype(np.float32)
    assert np.allclose(apply_colormap(img3), np.clip(img3, 0, 1))
    out = apply_colormap(np.random.rand(4, 4).astype(np.float32), "gray")
    assert out.shape == (4, 4, 3)
    assert np.allclose(out[..., 0], out[..., 1])


def test_depth_colormap_acc_fade():
    depth = np.ones((4, 4), np.float32)
    acc = np.zeros((4, 4), np.float32)
    out = apply_depth_colormap(depth, accumulation=acc)
    assert np.allclose(out, 0.0)  # fully faded where nothing accumulated


def test_pca_colormap():
    feats = np.random.randn(10, 10, 7).astype(np.float32)
    rgb = apply_pca_colormap(feats)
    assert rgb.shape == (10, 10, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_tonemap_exposure_monotone():
    x = np.full((2, 2, 3), 0.2, np.float32)
    assert tonemap_frame(x, exposure=1.0).mean() > tonemap_frame(x).mean()


# --------------------------------- geometry ----------------------------------
def test_rub_drb_roundtrip():
    assert np.allclose(RUB_TO_DRB @ DRB_TO_RUB, np.eye(3))
    v_rub = np.array([1.0, 2.0, 3.0])  # right, up, back
    v_drb = RUB_TO_DRB @ v_rub
    assert np.allclose(v_drb, [-2.0, 1.0, 3.0])  # down=-up, right, back


def test_rub_pose_to_drb_translation_and_rotation():
    c2w = np.eye(4)[:3]
    c2w[:, 3] = [1.0, 2.0, 3.0]
    out = rub_pose_to_drb(c2w)
    assert out.shape == (3, 4)
    assert np.allclose(out[:, 3], [-2.0, 1.0, 3.0])
    assert np.allclose(out[:, :3], RUB_TO_DRB)


def test_look_at_rub():
    eye = np.array([0.0, 0.0, 5.0])
    c2w = look_at_rub(eye, np.zeros(3))
    # camera looks along -z_cam; back column points from target to eye
    assert np.allclose(c2w[:, 2], [0, 0, 1], atol=1e-6)
    assert np.allclose(c2w[:, 3], eye)
    # columns orthonormal
    R = c2w[:, :3]
    assert np.allclose(R.T @ R, np.eye(3), atol=1e-6)


def test_safe_helpers():
    assert safe_bg("WHITE") == "white"
    assert safe_bg("bogus") == "white"
    assert safe_active_module("2", 4) == 2
    assert safe_active_module("all", 4) is None
    assert safe_active_module(7, 4) is None


# ----------------------------- batch verification -----------------------------
def _make_batch_dir(tmp_path: Path, n: int = 2, break_it: str = "") -> Path:
    import torch
    from PIL import Image

    b = tmp_path / "batch_0001"
    (b / "metadata").mkdir(parents=True)
    (b / "rgbs").mkdir()
    items = []
    for i in range(n):
        img_id = f"{i:06d}"
        torch.save(
            {
                "H": 8, "W": 8,
                "c2w": torch.eye(4)[:3],
                "intrinsics": torch.tensor([8.0, 8.0, 4.0, 4.0]),
                "distortion": torch.zeros(4),
            },
            b / "metadata" / f"{img_id}.pt",
        )
        Image.fromarray(
            np.random.randint(0, 255, (8, 8, 3), np.uint8)
        ).save(b / "rgbs" / f"{img_id}.jpg")
        items.append({"image_name": f"src_{i}.jpg", "id": img_id})
    (b / "manifest.json").write_text(
        json.dumps({"batch_tag": "batch_0001", "count": n, "items": items})
    )
    if break_it == "missing_rgb":
        (b / "rgbs" / "000000.jpg").unlink()
    elif break_it == "bad_manifest":
        (b / "manifest.json").write_text("{not json")
    return b


def test_verify_continual_batch_ok(tmp_path):
    b = _make_batch_dir(tmp_path)
    ok, problems, summary = verify_continual_batch_dir(b)
    assert ok, problems
    assert summary["count"] == 2


def test_verify_continual_batch_missing_rgb(tmp_path):
    b = _make_batch_dir(tmp_path, break_it="missing_rgb")
    ok, problems, _ = verify_continual_batch_dir(b)
    assert not ok
    assert any("rgbs/000000" in p for p in problems)


def test_verify_continual_batch_bad_manifest(tmp_path):
    b = _make_batch_dir(tmp_path, break_it="bad_manifest")
    ok, problems, _ = verify_continual_batch_dir(b)
    # falls back to directory scan but reports the unreadable manifest
    assert any("manifest" in p for p in problems)
    assert not ok


# --------------------------------- controller ---------------------------------
class CountingRunner(BaseRunner):
    name = "counting"

    def __init__(self, delay=0.0, fail_at=None):
        super().__init__(params={"w": np.zeros(1)})
        self.delay = delay
        self.fail_at = fail_at

    def step(self):
        if self.fail_at is not None and self.steps + 1 >= self.fail_at:
            raise RuntimeError("boom")
        if self.delay:
            time.sleep(self.delay)
        self.steps += 1
        self.loss_history.append(1.0 / self.steps)
        return {"loss": self.loss_history[-1], "steps": self.steps}


def _ctrl(runner):
    return Controller(lambda mode: runner, mode="runtime_adapt")


def test_controller_start_runs_to_target():
    ctrl = _ctrl(CountingRunner())
    ctrl.start(25)
    for _ in range(100):
        if not ctrl.is_running:
            break
        time.sleep(0.02)
    assert not ctrl.is_running
    assert ctrl.runner.steps == 25
    assert ctrl.status()["last_metrics"]["steps"] == 25


def test_controller_start_extends_target():
    ctrl = _ctrl(CountingRunner(delay=0.005))
    ctrl.start(20)
    ctrl.start(20)  # extend while running
    for _ in range(400):
        if not ctrl.is_running:
            break
        time.sleep(0.01)
    assert ctrl.runner.steps == 40


def test_controller_pause_resume_stop():
    ctrl = _ctrl(CountingRunner(delay=0.002))
    ctrl.start(10_000)
    time.sleep(0.05)
    ctrl.pause()
    time.sleep(0.1)  # let any in-flight step drain
    frozen = ctrl.runner.steps
    time.sleep(0.1)
    assert ctrl.runner.steps == frozen  # paused: no progress
    ctrl.resume()
    deadline = time.time() + 5.0
    while ctrl.runner.steps == frozen and time.time() < deadline:
        time.sleep(0.02)
    assert ctrl.runner.steps > frozen
    ctrl.stop()
    assert not ctrl.is_running


def test_controller_step_once_and_reset():
    ctrl = _ctrl(CountingRunner())
    m = ctrl.step_once()
    assert m["steps"] == 1
    ctrl.reset_fast()
    assert ctrl.runner.steps == 0
    assert ctrl.runner.loss_history == []


def test_controller_surfaces_runner_error():
    ctrl = _ctrl(CountingRunner(fail_at=3))
    ctrl.start(10)
    for _ in range(100):
        if not ctrl.is_running:
            break
        time.sleep(0.02)
    assert ctrl.last_error is not None and "boom" in ctrl.last_error
    assert ctrl.runner.steps == 2


def test_controller_view_mode_has_no_render_params():
    ctrl = Controller(lambda mode: CountingRunner(), mode="view")
    assert ctrl.get_render_params() is None


def test_runner_checkpoint_roundtrip(tmp_path):
    r = CountingRunner()
    r.step(); r.step()
    r.params = {"w": np.array([42.0])}
    p = r.save_checkpoint(tmp_path / "ck.model")
    r2 = CountingRunner()
    r2.load_checkpoint(p)
    assert float(r2.params["w"][0]) == 42.0
    assert r2.steps == 2


# ------------------------------- render engine --------------------------------
@pytest.fixture(scope="module")
def tiny_engine():
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.viewer.viewer import RenderEngine

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(
            hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
            geo_feat_dim=7,
            hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                log2_hashmap_size=8),
        ),
        bg_hidden=8,
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    statics = ContainerStatics(
        cents, boxes, jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    )
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    engine = RenderEngine(
        cfg, statics, params,
        global_aabb=np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32),
        chunk_rays=1024, default_samples=8,
    )
    return engine


def test_render_engine_rgb(tiny_engine):
    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    frame = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
    assert frame.shape == (12, 16, 3)
    assert frame.dtype == np.uint8


def test_render_engine_outputs_and_expert(tiny_engine):
    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    for output in ("depth", "opacity"):
        f = tiny_engine.render(c2w, 8, 8, fov_y=0.8, output=output)
        assert f.shape == (8, 8, 3)
    f = tiny_engine.render(c2w, 8, 8, fov_y=0.8, active_expert="1")
    assert f.shape == (8, 8, 3)


def test_render_engine_scrubs_bad_pose(tiny_engine):
    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    c2w[0, 3] = np.nan
    frame = tiny_engine.render(c2w, 8, 8, fov_y=0.8)
    assert frame.shape == (8, 8, 3)  # no crash, finite output


def test_render_engine_with_occupancy(tiny_engine):
    """Occ toggle: engine renders through the occupancy-guided path."""
    import jax.numpy as jnp

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    occ = init_occ_state(OccGridConfig(resolution=8, levels=2), 2)
    occ = {**occ, "binary": jnp.ones_like(occ["binary"]),
           "num_updates": jnp.asarray(1)}
    tiny_engine.occ_state = occ
    tiny_engine.use_occ = True
    try:
        c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
        f = tiny_engine.render(c2w, 8, 8, fov_y=0.8)
        assert f.shape == (8, 8, 3)
        assert np.isfinite(f.astype(float)).all()
    finally:
        tiny_engine.occ_state = None
        tiny_engine.use_occ = False


def test_render_engine_occ_two_wave_matches_plain(tiny_engine):
    """The interactive uint8 path rides the two-wave dispatcher under
    occupancy; its frame must match the one-shot u8 program exactly."""
    import jax.numpy as jnp

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.pipelines.online.runtime_adapt import TwoWaveOccRenderer

    occ = init_occ_state(OccGridConfig(resolution=8, levels=2), 2)
    occ = {**occ, "binary": jnp.ones_like(occ["binary"]),
           "num_updates": jnp.asarray(1)}
    tiny_engine.occ_state = occ
    tiny_engine.use_occ = True
    try:
        c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
        f1 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
        key = ("u8", 8, "white", None, True)
        r = tiny_engine._renderers[key]
        assert isinstance(r, TwoWaveOccRenderer)
        tiny_engine._renderers[key] = r.full  # plain callable, no .probe
        f2 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
        np.testing.assert_array_equal(f1, f2)

        # depth output goes through render_rays_chunked under occ too
        fd = tiny_engine.render(c2w, 8, 8, fov_y=0.8, output="depth")
        assert fd.shape == (8, 8, 3) and np.isfinite(fd.astype(float)).all()
    finally:
        tiny_engine._renderers.clear()
        tiny_engine._probe_caches.clear()
        tiny_engine.occ_state = None
        tiny_engine.use_occ = False


def test_render_engine_probe_cache_keys(tiny_engine):
    """Stationary camera reuses the probe cache; moving invalidates by key;
    the cache stays bounded."""
    import jax.numpy as jnp

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    occ = init_occ_state(OccGridConfig(resolution=8, levels=2), 2)
    occ = {**occ, "binary": jnp.ones_like(occ["binary"]),
           "num_updates": jnp.asarray(1)}
    tiny_engine.occ_state = occ
    tiny_engine.use_occ = True
    tiny_engine._probe_caches.clear()  # other tests may have populated it
    try:
        c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
        f1 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
        assert len(tiny_engine._probe_caches) == 1
        (cache,) = tiny_engine._probe_caches.values()
        assert "probed" in cache  # wave 1 stored
        f2 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)  # cache hit
        np.testing.assert_array_equal(f1, f2)
        assert len(tiny_engine._probe_caches) == 1

        for i in range(4):  # new poses create entries; cache stays bounded
            c = look_at_rub(np.array([0.1 * (i + 1), 0.0, 4.0]), np.zeros(3))
            tiny_engine.render(c, 16, 12, fov_y=0.8)
        assert len(tiny_engine._probe_caches) <= 4
    finally:
        tiny_engine._probe_caches.clear()
        tiny_engine._renderers.clear()
        tiny_engine.occ_state = None
        tiny_engine.use_occ = False


# --------------------------- camera pose actions -----------------------------
def test_pose_look_center_aims_at_center():
    from nerfsys_tpu.viewer.utils import pose_look_center

    c2w = look_at_rub(np.array([3.0, 2.0, 4.0]), np.array([9.0, 9.0, 9.0]))
    center = np.array([0.0, 0.5, 0.0])
    out = pose_look_center(c2w, center)
    np.testing.assert_allclose(out[:, 3], c2w[:, 3], atol=1e-6)  # same eye
    fwd = -out[:, 2]
    want = center - c2w[:, 3]
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(fwd, want, atol=1e-5)


def test_pose_snap_dir_axes():
    from nerfsys_tpu.viewer.utils import pose_snap_dir

    c2w = look_at_rub(np.array([1.0, 2.0, 3.0]), np.zeros(3))
    for fwd in ([0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]):
        out = pose_snap_dir(c2w, fwd)
        np.testing.assert_allclose(out[:, 3], c2w[:, 3], atol=1e-6)
        np.testing.assert_allclose(-out[:, 2], fwd, atol=1e-5)
        # still a rotation
        np.testing.assert_allclose(
            out[:, :3].T @ out[:, :3], np.eye(3), atol=1e-5
        )


def test_pose_dolly_moves_along_view():
    from nerfsys_tpu.viewer.utils import pose_dolly

    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    fwd = -c2w[:, 2]
    out_in = pose_dolly(c2w, forward=True, step=0.25)
    out_out = pose_dolly(c2w, forward=False, step=0.25)
    np.testing.assert_allclose(out_in[:, 3], c2w[:, 3] + 0.25 * fwd, atol=1e-6)
    np.testing.assert_allclose(out_out[:, 3], c2w[:, 3] - 0.25 * fwd, atol=1e-6)
    np.testing.assert_allclose(out_in[:, :3], c2w[:, :3], atol=1e-7)


def test_render_engine_metric_clipping(tiny_engine):
    """near/far clip in meters divide through pose_scale_factor."""
    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    f = tiny_engine.render(c2w, 8, 8, fov_y=0.8, near_clip_m=0.5,
                           far_clip_m=5.0)
    assert f.shape == (8, 8, 3)
    # clipping everything away -> valid rays vanish -> black frame
    f2 = tiny_engine.render(c2w, 8, 8, fov_y=0.8, near_clip_m=50.0,
                            far_clip_m=50.1)
    assert f2.sum() == 0


# --------------------------- live viser smoke --------------------------------
def test_viser_gui_smoke(tmp_path):
    """Instantiate the full GUI wiring against a real viser server
    (skipped where viser isn't installed — it is not in this image)."""
    viser = pytest.importorskip("viser")  # noqa: F841

    import jax

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.utils.config import parse_args
    from nerfsys_tpu.viewer.viewer import launch_viewer
    import jax.numpy as jnp

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(hidden=16, sigma_depth=1, color_hidden=16,
                         color_depth=1, geo_feat_dim=7,
                         hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                             log2_hashmap_size=8)),
        bg_hidden=8,
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    statics = ContainerStatics(
        cents, boxes, jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    )
    P = parse_args(["--op", "view", "--data_path", str(tmp_path)])
    ctx = {
        "P": P, "cfg": cfg, "statics": statics,
        "params": init_container_params(jax.random.PRNGKey(0), cfg),
        "global_aabb": np.array([[-1.5] * 3, [1.5] * 3], np.float32),
        "run_dir": tmp_path,
    }
    server, ctrl, engine = launch_viewer(ctx, port=0, blocking=False)
    try:
        assert engine is not None and ctrl is not None
    finally:
        ctrl.stop(join=False)
        server.stop()


def test_render_engine_baked_serving(tiny_engine):
    """Baked serving: bake -> rgb frames ride the snapshot; a NEW params
    snapshot (adapt step) auto-invalidates; active-expert isolation always
    renders live without dropping the snapshot; the render is a fair
    approximation of the live frame."""
    import jax

    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    live = tiny_engine.render(c2w, 16, 12, fov_y=0.8)

    bcfg = tiny_engine.bake(resolution=24, sh_levels=2)
    assert tiny_engine.baked_active and bcfg.resolution == 24
    baked = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
    assert baked.shape == (12, 16, 3) and baked.dtype == np.uint8
    # the baked u8 renderer was actually built and used
    assert tiny_engine._baked_renderers
    # a random-init field is smooth: the snapshot should track the live
    # render closely (u8 space; loose tolerance — it IS an approximation)
    assert np.mean(np.abs(baked.astype(int) - live.astype(int))) < 25.0

    # active-expert isolation renders live but keeps the snapshot
    f = tiny_engine.render(c2w, 8, 8, fov_y=0.8, active_expert="1")
    assert f.shape == (8, 8, 3) and tiny_engine.baked_active

    # depth/opacity render live too
    f = tiny_engine.render(c2w, 8, 8, fov_y=0.8, output="depth")
    assert f.shape == (8, 8, 3) and tiny_engine.baked_active

    # a NEW params snapshot = an adapt step landed -> auto-invalidation
    new_params = jax.tree.map(lambda x: x, tiny_engine.base_params)
    f = tiny_engine.render(c2w, 16, 12, fov_y=0.8, params=new_params)
    assert f.shape == (12, 16, 3)
    assert not tiny_engine.baked_active

    # explicit invalidate is idempotent
    tiny_engine.invalidate_baked()
    assert not tiny_engine.baked_active


def test_render_engine_live_pose_path(tiny_engine):
    """No-occ live rgb frames serve from the pose (make_live_camera_renderer:
    rays generate on device, host IO = ~20 floats up + u8 down). Parity with
    the host-ray path is pinned in tests/test_camera_render.py; here: the
    engine actually routes to it, frames are deterministic, and the traced
    exposure scalar never rebuilds the renderer."""
    tiny_engine._renderers.clear()
    c2w = look_at_rub(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    f1 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
    assert any(k[0] == "livecam" for k in tiny_engine._renderers)
    assert not any(k[0] == "u8" for k in tiny_engine._renderers)
    f2 = tiny_engine.render(c2w, 16, 12, fov_y=0.8)
    np.testing.assert_array_equal(f1, f2)

    n = len(tiny_engine._renderers)
    f3 = tiny_engine.render(c2w, 16, 12, fov_y=0.8, exposure=2.0)
    assert len(tiny_engine._renderers) == n  # exposure is traced, not baked
    assert f3.astype(int).sum() >= f1.astype(int).sum()  # brighter
    tiny_engine._renderers.clear()
