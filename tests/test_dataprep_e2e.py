"""End-to-end L1 data-prep pipeline on a synthetic COLMAP scene:

    COLMAP binary model + images
      -> scripts.prepare_dataset  (poses, undistort, splits, coordinates)
      -> scripts.create_clusters  (Voronoi masks, scene boxes)
      -> data.get_dataset         (per-expert masked ray datasets)

This is the producer side of the on-disk contract that
tests/test_example_data.py checks from the consumer side.
"""
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from nerfsys_tpu.data.colmap_utils import (
    Camera,
    Image as CImage,
    Point3D,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
)


def _look_down_rdf(yaw: float) -> np.ndarray:
    """World->cam rotation for a camera looking straight down (ENU world,
    RDF camera): forward = -Up, right/down spin by yaw in the ground plane."""
    c, s = np.cos(yaw), np.sin(yaw)
    right = np.array([c, s, 0.0])
    fwd = np.array([0.0, 0.0, -1.0])
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns = cam axes in world
    return R_c2w.T  # world->cam


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP wxyz quaternion."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    from PIL import Image as PILImage

    root = tmp_path_factory.mktemp("colmap_scene")
    (root / "model").mkdir()
    (root / "images").mkdir()

    rng = np.random.default_rng(0)
    W, H = 64, 48
    cams = {1: Camera(1, "PINHOLE", W, H, np.array([60.0, 60.0, W / 2, H / 2]))}

    imgs = {}
    n_imgs = 8
    for i in range(n_imgs):
        # aerial ring 60m up over a 40m ground square (ENU world)
        ang = 2 * np.pi * i / n_imgs
        C = np.array([20 * np.cos(ang), 20 * np.sin(ang), 60.0])
        R_w2c = _look_down_rdf(yaw=ang)
        t = -R_w2c @ C
        name = f"aerial_{i:03d}.jpg"
        imgs[i + 1] = CImage(
            i + 1, _rotmat_to_qvec(R_w2c), t, 1, name,
            np.zeros((0, 2)), np.zeros(0, np.int64),
        )
        PILImage.fromarray(
            rng.integers(0, 255, (H, W, 3), np.uint8)
        ).save(root / "images" / name)

    pts = {
        j: Point3D(j, np.array([rng.uniform(-25, 25), rng.uniform(-25, 25),
                                rng.uniform(0, 3)]),
                   np.array([128, 128, 128]), 1.0, np.zeros(0, np.int64),
                   np.zeros(0, np.int64))
        for j in range(200)
    }
    write_cameras_binary(cams, root / "model" / "cameras.bin")
    write_images_binary(imgs, root / "model" / "images.bin")
    write_points3D_binary(pts, root / "model" / "points3D.bin")
    return root


def test_prepare_then_cluster_then_load(colmap_scene, tmp_path):
    from nerfsys_tpu.scripts import create_clusters, prepare_dataset

    out = tmp_path / "out" / "scene"
    hp = SimpleNamespace(
        data_path=str(colmap_scene), output_path=str(out), val_split=0.25,
        ecef_to_enu=False, enu_ref="mean", enu_ref_lat=None, enu_ref_lon=None,
        enu_ref_alt=None, scale_strategy="camera_max",
        points_low_alt_percentile=0.05, maximum_allowed_height=150.0,
        verify_enu_geodetic=False, yes=True,
    )
    prepare_dataset.main(hp)

    # ---- prepared-dataset contract ----
    from nerfsys_tpu.data.dataset import get_image_metadata, load_coordinates

    coords = load_coordinates(out)
    assert coords["pose_scale_factor"] > 0
    train, val = get_image_metadata(out, 1.0)
    assert len(train) == 6 and len(val) == 2
    for md in train + val:
        assert np.abs(md.c2w[:, 3]).max() <= 1.0 + 1e-5  # normalized envelope
        # cameras look downward in DRB (down = +x axis of world)
        fwd_world = md.c2w[:, :3] @ np.array([0.0, 0, -1])  # RUB fwd = -z
        assert fwd_world[0] > 0.9  # pointing down
    assert (out / "mappings.txt").exists()

    # ---- clustering ----
    ch = create_clusters.parse_args([
        "--data_path", str(out), "--output", "g22_test",
        "--grid_dim", "2", "2", "--boundary_margin", "1.1",
        "--ray_samples", "32", "--downscale", "0.5",
    ])
    create_clusters.main(ch)

    mask_dir = out / "masks" / "g22_test"
    from nerfsys_tpu.data.dataset import (
        load_clustering_meta,
        load_scene_boxes,
    )

    meta = load_clustering_meta(mask_dir)
    assert meta["centroids"].shape == (4, 3)
    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)
    assert expert_aabbs.shape == (4, 2, 3)

    # ---- consume as per-expert masked ray datasets ----
    from nerfsys_tpu.data.dataset import get_dataset

    bundle = get_dataset(out, 0.5, "g22_test", 4)
    assert len(bundle.train_sets) >= 3  # corner region may be sparse
    total = sum(len(d) for d in bundle.train_sets)
    assert total > 1000
    for ds in bundle.train_sets:
        nf = ds.rays[:, 6:8]
        assert np.isfinite(nf).all() and (nf[:, 1] > nf[:, 0]).all()


def test_update_dataset_appends_continual_batch(colmap_scene, tmp_path):
    """update_dataset: new captures append as a verified continual batch."""
    from PIL import Image as PILImage

    from nerfsys_tpu.scripts import prepare_dataset, update_dataset

    out = tmp_path / "out" / "scene"
    hp = SimpleNamespace(
        data_path=str(colmap_scene), output_path=str(out), val_split=0.25,
        ecef_to_enu=False, enu_ref="mean", enu_ref_lat=None, enu_ref_lon=None,
        enu_ref_alt=None, scale_strategy="camera_max",
        points_low_alt_percentile=0.05, maximum_allowed_height=150.0,
        verify_enu_geodetic=False, yes=True,
    )
    prepare_dataset.main(hp)

    # an "updated" COLMAP model: original 8 images + 2 new captures
    from nerfsys_tpu.data.colmap_utils import read_model

    cams, imgs, pts = read_model(colmap_scene / "model")
    upd = tmp_path / "updated_capture"
    (upd / "model").mkdir(parents=True)
    (upd / "images").mkdir()
    rng = np.random.default_rng(7)
    W, H = cams[1].width, cams[1].height
    new_imgs = dict(imgs)
    for j in range(2):
        C = np.array([5.0 * j, 3.0, 55.0])
        R_w2c = _look_down_rdf(yaw=0.3 * j)
        t = -R_w2c @ C
        name = f"new_{j:03d}.jpg"
        iid = 100 + j
        new_imgs[iid] = CImage(iid, _rotmat_to_qvec(R_w2c), t, 1, name,
                               np.zeros((0, 2)), np.zeros(0, np.int64))
        PILImage.fromarray(
            rng.integers(0, 255, (H, W, 3), np.uint8)
        ).save(upd / "images" / name)
    write_cameras_binary(cams, upd / "model" / "cameras.bin")
    write_images_binary(new_imgs, upd / "model" / "images.bin")
    write_points3D_binary(pts, upd / "model" / "points3D.bin")

    uh = update_dataset.parse_args([
        "--data_path", str(upd), "--prepared_dir", str(out),
    ])
    update_dataset.main(uh)

    batches = sorted((out / "continual").glob("batch_*"))
    assert len(batches) == 1
    # the continual batch passes the viewer's Scan & Verify and loads
    from nerfsys_tpu.viewer.utils import (
        load_continual_batch_metadata,
        verify_continual_batch_dir,
    )

    ok, problems, summary = verify_continual_batch_dir(batches[0])
    assert ok, problems
    assert summary["count"] == 2  # only the NEW images were appended
    mds = load_continual_batch_metadata(batches[0])
    assert len(mds) == 2
    assert all(np.abs(m.c2w[:, 3]).max() <= 1.0 + 1e-5 for m in mds)

    # idempotency: re-running appends nothing new
    uh2 = update_dataset.parse_args([
        "--data_path", str(upd), "--prepared_dir", str(out),
    ])
    update_dataset.main(uh2)
    batches2 = sorted((out / "continual").glob("batch_*"))
    total = sum(
        len(list((b / "metadata").glob("*.pt"))) for b in batches2
    )
    assert total == 2


def test_runner_train_and_eval_on_prepared_scene(colmap_scene, tmp_path,
                                                 monkeypatch):
    """Full runner glue: prepare -> cluster -> build_context -> 2 meta-train
    steps -> checkpoint -> eval op with TTO — the complete user workflow,
    hermetic on CPU."""
    from nerfsys_tpu.scripts import create_clusters, prepare_dataset

    # prepared dataset under the runner's expected <data_path>/out/<name>
    data_root = tmp_path / "drz"
    out = data_root / "out" / "scene"
    hp = SimpleNamespace(
        data_path=str(colmap_scene), output_path=str(out), val_split=0.25,
        ecef_to_enu=False, enu_ref="mean", enu_ref_lat=None, enu_ref_lon=None,
        enu_ref_alt=None, scale_strategy="camera_max",
        points_low_alt_percentile=0.05, maximum_allowed_height=150.0,
        verify_enu_geodetic=False, yes=True,
    )
    prepare_dataset.main(hp)
    create_clusters.main(create_clusters.parse_args([
        "--data_path", str(out), "--output", "g22", "--grid_dim", "2", "2",
        "--ray_samples", "16",
    ]))

    monkeypatch.chdir(tmp_path)  # logs/ land in the tmp dir
    from nerfsys_tpu.runner import build_context, evaluate, train
    from nerfsys_tpu.utils.config import parse_args

    argv = [
        "--op", "train", "--data_path", str(data_root),
        "--data_dirname", "scene", "--mask_dirname", "g22",
        "--num_submodules", "4", "--downscale", "1.0",
        "--support_rays", "64", "--query_rays", "32", "--batch_size", "1",
        "--outer_steps", "2", "--eval_step", "0", "--save_step", "2",
        "--print_step", "10", "--inner_iter", "1", "--ray_samples", "4",
        "--dim_hidden", "8", "--color_hidden", "8", "--sigma_depth", "1",
        "--color_depth", "1", "--xyz_encoding", "planes",
        "--plane_levels", "1", "--plane_base_res", "8",
        "--plane_features", "4", "--bg_hidden", "8",
        "--fname", "it_run",
    ]
    P = parse_args(argv)
    ctx = build_context(P, "train")
    assert len(ctx["bundle"].train_sets) >= 3
    train(ctx)
    run_dir = Path(ctx["run_dir"])
    assert (run_dir / "last.model").exists()
    assert (run_dir / "last.config.json").exists()

    # ---- eval op against the saved checkpoint, with the LPIPS column
    # active: deterministic fixed-seed weights at the real AlexNet shapes
    # (scripts/convert_lpips_weights.random_weights — the converter's own
    # npz layout), injected the way a user supplies real weights ----
    from nerfsys_tpu.scripts.convert_lpips_weights import random_weights

    lpips_npz = tmp_path / "lpips_fixture.npz"
    np.savez(lpips_npz, **random_weights(7))
    monkeypatch.setenv("NERFSYS_LPIPS_WEIGHTS", str(lpips_npz))
    P2 = parse_args(argv + [
        "--op", "eval", "--checkpoint_path", str(run_dir),
        "--prefix", "last", "--tto", "0,1", "--cap_images", "1",
        "--fname", "it_eval",
    ])
    ctx2 = build_context(P2, "eval")
    rows = evaluate(ctx2)
    monkeypatch.delenv("NERFSYS_LPIPS_WEIGHTS")
    assert [r["tto"] for r in rows] == [0, 1]
    assert all(np.isfinite(r["psnr"]) for r in rows)
    # lpips reported (finite, > 0: render != gt) through the same path the
    # reference's eval table uses (runtime_adapt.py:111,163-167)
    assert all(np.isfinite(r["lpips"]) and r["lpips"] > 0 for r in rows)
    assert (Path(ctx2["run_dir"]) / "eval_results.json").exists()

    # ---- eval once more with sharded rendering (--mesh_shape over the 8
    # virtual devices): same checkpoint, PSNR must match the single-device
    # render to float noise ----
    P3 = parse_args(argv + [
        "--op", "eval", "--checkpoint_path", str(run_dir),
        "--prefix", "last", "--tto", "0", "--cap_images", "1",
        "--mesh_shape", "8", "--fname", "it_eval_mesh",
    ])
    ctx3 = build_context(P3, "eval")
    rows3 = evaluate(ctx3)
    assert np.isfinite(rows3[0]["psnr"])
    np.testing.assert_allclose(rows3[0]["psnr"], rows[0]["psnr"], atol=1e-3)

    # ---- occupancy + sharded rendering through the CLI: train 2 steps
    # with a tiny occ grid, then eval the SAME checkpoint unsharded and
    # with --mesh_shape (sharded two-wave renderer) — PSNRs must agree ----
    occ_argv = [a for a in argv] + [
        "--use_occ", "--occ_importance", "--occ_resolution", "8",
        "--occ_levels", "1", "--occ_warmup", "1",
        "--occ_update_interval", "1", "--occ_probes", "16",
    ]
    occ_argv[occ_argv.index("it_run")] = "it_occ_run"
    P4 = parse_args(occ_argv)
    ctx4 = build_context(P4, "train")
    train(ctx4)
    occ_dir = Path(ctx4["run_dir"])
    assert (occ_dir / "last.occ").exists()

    def eval_occ(extra, tag):
        Pn = parse_args(occ_argv + [
            "--op", "eval", "--checkpoint_path", str(occ_dir),
            "--prefix", "last", "--tto", "0", "--cap_images", "1",
            "--fname", tag, *extra,
        ])
        return evaluate(build_context(Pn, "eval"))

    r_single = eval_occ([], "it_occ_eval")
    r_mesh = eval_occ(["--mesh_shape", "8"], "it_occ_eval_mesh")
    assert np.isfinite(r_single[0]["psnr"])
    np.testing.assert_allclose(r_mesh[0]["psnr"], r_single[0]["psnr"],
                               atol=1e-3)

    # ---- early ray termination through the CLI (--render_early_stop):
    # Phase B rides the partial/resume dispatcher; output error is bounded
    # by eps per channel, so eval PSNR must match to well under 0.05 dB ----
    r_et = eval_occ(["--render_early_stop", "1e-4"], "it_occ_eval_et")
    np.testing.assert_allclose(r_et[0]["psnr"], r_single[0]["psnr"],
                               atol=0.05)

    # ---- baked snapshot rendering through the CLI (--render_baked):
    # Phase B resamples the field into an SH grid; approximate by design
    # (resolution-limited), so assert it runs and lands in the live
    # render's neighborhood rather than matching it ----
    r_baked = eval_occ(["--render_baked", "24", "--render_baked_sh", "2"],
                       "it_occ_eval_baked")
    assert np.isfinite(r_baked[0]["psnr"])
    assert abs(r_baked[0]["psnr"] - r_single[0]["psnr"]) < 6.0

    # ---- sparse-compacted bake through the CLI (--render_baked_sparse):
    # bit-exact vs the dense bake by construction, so the eval PSNR must
    # MATCH the dense-baked arm ----
    r_sparse = eval_occ(["--render_baked", "24", "--render_baked_sh", "2",
                         "--render_baked_sparse", "4"],
                        "it_occ_eval_baked_sp")
    np.testing.assert_allclose(r_sparse[0]["psnr"], r_baked[0]["psnr"],
                               atol=1e-4)

    # ---- coherent-expert dispatch through the CLI (--render_coherent):
    # exact re-packing of the live render ----
    r_coh = eval_occ(["--render_coherent"], "it_occ_eval_coh")
    np.testing.assert_allclose(r_coh[0]["psnr"], r_single[0]["psnr"],
                               atol=1e-3)

    # ---- baked snapshot cache through the CLI (--render_baked_cache):
    # first run bakes + saves, second loads (tto=0 -> same fingerprint)
    # and must score identically ----
    bc = str(tmp_path / "bake_cache.npz")
    bc_args = ["--render_baked", "24", "--render_baked_sh", "2",
               "--render_baked_cache", bc]
    r_c1 = eval_occ(bc_args, "it_occ_eval_bc1")
    assert Path(bc).exists()
    r_c2 = eval_occ(bc_args, "it_occ_eval_bc2")
    np.testing.assert_allclose(r_c2[0]["psnr"], r_c1[0]["psnr"],
                               atol=1e-6)

    # ---- warm-start (reference trainer.py:27-29 via is_resume,
    # common/utils.py:129-160): --op train --checkpoint_path continues an
    # interrupted run into a NEW run dir, restoring params, optimizer
    # moments, occ grids, and the step/best counters ----
    import json as _json

    warm_argv = list(occ_argv) + [
        "--checkpoint_path", str(occ_dir), "--prefix", "last",
        "--outer_steps", "4",  # continue 2 -> 4 (argparse takes the last)
    ]
    warm_argv[warm_argv.index("it_occ_run")] = "it_warm_run"
    P5 = parse_args(warm_argv)
    ctx5 = build_context(P5, "train")
    train(ctx5)
    warm_dir = Path(ctx5["run_dir"])
    assert warm_dir != occ_dir
    w_state = _json.loads((warm_dir / "last.state.json").read_text())
    assert w_state["step"] == 4, w_state  # continued, not restarted at 0
    assert (warm_dir / "last.occ").exists()
