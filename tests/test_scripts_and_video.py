import numpy as np
import pytest

from nerfsys_tpu.data.colmap_utils import (
    Camera,
    Image,
    Point3D,
    get_cam_intrinsics,
    qvec2rotmat,
    read_model,
    rotmat2qvec,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
)
from nerfsys_tpu.data.transformations import (
    ENU_TO_DRB,
    ecef_to_enu,
    ecef_to_geodetic,
    enu_to_ecef,
    geodetic_to_ecef,
    is_likely_ecef,
)
from nerfsys_tpu.pipelines.video_gen import (
    PATH_GENERATORS,
    gen_path_full_coverage,
    poses_turntable_drb,
    rub_pose_from_pos,
    suppress_fog,
)
from nerfsys_tpu.scripts.create_clusters import (
    compute_voronoi,
    grid_centroids,
    kmeans_centroids,
)


# --------------------------- geodesy -----------------------------------------
def test_geodetic_ecef_roundtrip():
    lat, lon, alt = 51.549, 7.373, 232.9  # the drz site
    x, y, z = geodetic_to_ecef(lat, lon, alt)
    lat2, lon2, alt2 = ecef_to_geodetic(x, y, z)
    assert abs(float(lat2) - lat) < 1e-9
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(alt2) - alt) < 1e-6


def test_enu_roundtrip_and_axes():
    ref = (51.549, 7.373, 232.9)
    # 100 m east
    xyz = enu_to_ecef(100.0, 0.0, 0.0, *ref)
    enu = ecef_to_enu(xyz[..., 0], xyz[..., 1], xyz[..., 2], *ref)
    np.testing.assert_allclose(enu, [100, 0, 0], atol=1e-6)
    # up changes altitude
    xyz_up = enu_to_ecef(0.0, 0.0, 50.0, *ref)
    _, _, alt = ecef_to_geodetic(xyz_up[..., 0], xyz_up[..., 1], xyz_up[..., 2])
    assert abs(float(alt) - (232.9 + 50)) < 1e-3


def test_is_likely_ecef():
    ecef_pts = np.stack(geodetic_to_ecef(
        np.full(10, 51.5), np.linspace(7.3, 7.4, 10), np.full(10, 200.0)), -1)
    assert is_likely_ecef(ecef_pts)
    assert not is_likely_ecef(np.random.randn(10, 3) * 100)


def test_enu_to_drb_axes():
    # ENU (E, N, U) -> DRB (D=-U, R=E, B=-N)
    np.testing.assert_allclose(ENU_TO_DRB @ [1, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(ENU_TO_DRB @ [0, 1, 0], [0, 0, -1])
    np.testing.assert_allclose(ENU_TO_DRB @ [0, 0, 1], [-1, 0, 0])


# --------------------------- colmap ------------------------------------------
def test_qvec_rotmat_roundtrip():
    q = np.array([0.9, 0.1, -0.2, 0.3])
    q /= np.linalg.norm(q)
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    q2 = rotmat2qvec(R)
    np.testing.assert_allclose(np.abs(q2), np.abs(q), atol=1e-9)


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 500, 320, 240]))}
    imgs = {
        7: Image(7, np.array([1.0, 0, 0, 0]), np.array([0.1, 0.2, 0.3]), 1,
                 "img_007.jpg", np.array([[1.0, 2.0]]), np.array([42])),
    }
    pts = {42: Point3D(42, np.array([1.0, 2, 3]), np.array([255, 0, 0]), 0.5,
                       np.array([7]), np.array([0]))}
    write_cameras_binary(cams, tmp_path / "cameras.bin")
    write_images_binary(imgs, tmp_path / "images.bin")
    write_points3D_binary(pts, tmp_path / "points3D.bin")
    c2, i2, p2 = read_model(tmp_path)
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(i2[7].tvec, [0.1, 0.2, 0.3])
    assert i2[7].name == "img_007.jpg"
    np.testing.assert_allclose(p2[42].xyz, [1, 2, 3])
    np.testing.assert_array_equal(i2[7].point3D_ids, [42])


def test_get_cam_intrinsics_models():
    c = Camera(0, "SIMPLE_RADIAL", 10, 10, np.array([100.0, 5, 5, 0.01]))
    intr, dist, how = get_cam_intrinsics(c)
    np.testing.assert_allclose(intr, [100, 100, 5, 5])
    assert how == "opencv" and dist[0] == 0.01
    c = Camera(0, "OPENCV_FISHEYE", 10, 10,
               np.array([100.0, 101, 5, 5, 0.1, 0.2, 0.3, 0.4]))
    _, _, how = get_cam_intrinsics(c)
    assert how == "fisheye"


# --------------------------- clustering --------------------------------------
def test_grid_centroids_2d():
    cams = np.array([[0, -2, -2], [1, 2, 2]], np.float32)
    c = grid_centroids(cams, 1, 2, 2, cluster_2d=True)
    assert c.shape == (4, 3)
    np.testing.assert_allclose(c[:, 0], 0.5)  # mid altitude
    np.testing.assert_allclose(sorted(c[:, 1].tolist()), [-1, -1, 1, 1])


def test_kmeans_centroids_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 2)) * 0.1 + [0, 0]
    b = rng.normal(size=(50, 2)) * 0.1 + [5, 5]
    cents = kmeans_centroids(np.concatenate([a, b]).astype(np.float32), 2, seed=1)
    cents = cents[np.argsort(cents[:, 0])]
    np.testing.assert_allclose(cents[0], [0, 0], atol=0.15)
    np.testing.assert_allclose(cents[1], [5, 5], atol=0.15)


def test_compute_voronoi_hard_and_soft():
    # two centroids on the y axis; rays pointing down through each
    cents = np.array([[0, -1, 0], [0, 1, 0]], np.float32)
    rays = np.array([
        [0, -1, 0, 1, 0, 0, 0.0, 1.0],   # down-axis ray near centroid 0
        [0, 1, 0, 1, 0, 0, 0.0, 1.0],    # near centroid 1
        [0, 0, 0, 1, 0, 0, 0.0, 1.0],    # equidistant
    ], np.float32)
    mins = np.full((2, 3), np.inf, np.float32)
    maxs = np.full((2, 3), -np.inf, np.float32)
    cnts = np.zeros(2, np.int64)
    hard = compute_voronoi(rays, cents, ray_samples=16, cluster_2d=True,
                           boundary_margin=1.0, mins_out=mins, maxs_out=maxs,
                           counts_out=cnts)
    assert hard[0].tolist() == [True, False]
    assert hard[1].tolist() == [False, True]
    assert cnts.sum() == 3 * 16
    # streamed AABB covers the sampled segment (x in [0, 1])
    assert mins[0, 0] >= 0.0 and maxs[0, 0] <= 1.0

    soft = compute_voronoi(rays, cents, ray_samples=16, cluster_2d=True,
                           boundary_margin=2.0)
    assert soft[2].tolist() == [True, True]  # equidistant joins both


def test_compute_voronoi_invalid_rays_excluded():
    cents = np.array([[0, -1, 0], [0, 1, 0]], np.float32)
    rays = np.full((3, 8), np.inf, np.float32)
    mask = compute_voronoi(rays, cents, ray_samples=8, cluster_2d=True,
                           boundary_margin=1.0)
    assert not mask.any()


# --------------------------- video paths --------------------------------------
def test_rub_pose_orthonormal_looks_at():
    c2w = rub_pose_from_pos(np.zeros(3), np.array([0, 0, 3], np.float32))
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    # back column points from center to camera
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-6)


@pytest.mark.parametrize("name", list(PATH_GENERATORS))
def test_path_generators_shapes(name):
    center = np.zeros(3, np.float32)
    extent = np.array([0.5, 2.0, 2.0], np.float32)
    poses = PATH_GENERATORS[name](center, extent, 24)
    assert poses.shape == (24, 4, 4)
    for p in poses[:: 6]:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # cameras stay within ~the scene bounds (loose sanity)
    assert np.abs(poses[:, :3, 3]).max() < 4.0


def test_full_coverage_padding():
    poses = gen_path_full_coverage(np.zeros(3), np.ones(3), 7, rows=2, cols=2)
    assert poses.shape == (7, 4, 4)


def test_suppress_fog():
    rgb = np.ones((4, 3), np.float32) * 0.5
    w = np.zeros((4, 8), np.float32)
    w[0, 0] = 0.9          # solid pixel
    w[1] = 0.01            # hazy: low acc, flat weights
    w[2, 0] = 0.03         # low-acc (below acc_thr=0.05)
    w[3, 0] = 0.5          # solid-ish
    acc = w.sum(1)
    out, stats = suppress_fog(rgb, w, acc, bg_val=1.0)
    np.testing.assert_allclose(out[0], 0.5)  # untouched
    np.testing.assert_allclose(out[1], 1.0)  # fogged -> bg
    np.testing.assert_allclose(out[2], 1.0)  # low acc -> bg
    assert stats["pct_low"] > 0

    # precomputed (wmax, entropy) — the on-device fog_stats path — must
    # reproduce the weights-based result exactly
    wsum = np.maximum(w.sum(1, keepdims=True), 1e-12)
    p = w / wsum
    ent = -(p * np.log(np.maximum(p, 1e-12))).sum(1)
    out2, stats2 = suppress_fog(rgb, None, acc, bg_val=1.0,
                                wmax_entropy=(w.max(1), ent))
    np.testing.assert_array_equal(out, out2)
    assert stats == stats2


def test_fog_stats_renderer_matches_host_math():
    """make_chunk_renderer(fog_stats=True) appends per-ray (wmax, entropy)
    equal to recomputing them from the stratified renderer's weights."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        container_bg_fn,
        container_field_fn,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.ops.volrend import render_rays_stratified
    from nerfsys_tpu.pipelines.online.runtime_adapt import make_chunk_renderer

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
    params = init_container_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(32, 3)).astype(np.float32) * 0.2
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    nf = np.tile(np.array([0.1, 2.0], np.float32), (32, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))

    r = make_chunk_renderer(cfg, ray_samples=8, bg_policy="white",
                            fog_stats=True, use_bg_fn=False)
    rgb, depth, acc, wmax, ent = r(params, statics, rays)

    field = container_field_fn(params, cfg, statics, None)
    rgb_h, depth_h, w_h, acc_h = render_rays_stratified(
        field, rays, 8, randomized=False, bg_policy="white", bg_fn=None,
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_h), atol=1e-6)
    w_np = np.asarray(w_h)
    np.testing.assert_allclose(np.asarray(wmax), w_np.max(1), atol=1e-6)
    wsum = np.maximum(w_np.sum(1, keepdims=True), 1e-12)
    p = w_np / wsum
    ent_h = -(p * np.log(np.maximum(p, 1e-12))).sum(1)
    np.testing.assert_allclose(np.asarray(ent), ent_h, atol=1e-5)

    # use_bg_fn=False must ignore the learned bg MLP: a white-bg render of
    # empty rays (near/far outside geometry) equals pure white where acc~0
    assert "bg" in params  # the container ships one by default


def test_video_uses_test_metadata_intrinsics(tmp_path):
    """--op video with loaded test metadata renders at the first test
    image's H/W (reference nerf_runner.py:378-383), not the fallback flags."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.data.image_metadata import ImageMetadata
    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.pipelines.video_gen import render_video
    from nerfsys_tpu.utils.config import parse_args

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
    md0 = ImageMetadata(
        image_path=tmp_path / "none.jpg",
        c2w=np.eye(3, 4, dtype=np.float32), W=20, H=12,
        intrinsics=np.array([15.0, 15.0, 10.0, 6.0], np.float32),
        image_index=0,
    )
    P = parse_args([
        "--op", "video", "--data_path", str(tmp_path),
        "--camera_path", "turntable", "--video_frames", "1",
        "--video_width", "64", "--video_height", "48",  # must be ignored
        "--ray_samples", "4", "--near", "0.05", "--far", "6.0",
    ])
    ctx = {
        "P": P, "cfg": cfg, "statics": statics,
        "params": init_container_params(jax.random.PRNGKey(0), cfg),
        "run_dir": tmp_path, "test_metadata": [md0],
    }
    out = render_video(ctx)
    from pathlib import Path as _P

    out = _P(out)
    if out.is_dir():
        frame = next(iter(out.glob("*.png")))
        from PIL import Image as PILImage

        assert PILImage.open(frame).size == (20, 12)
    else:
        import imageio.v3 as iio

        assert iio.imread(out).shape[-3:-1] == (12, 20)


def test_phase_timer_and_memory_stats():
    import time as _time

    from nerfsys_tpu.utils.profiling import PhaseTimer, memory_stats

    pt = PhaseTimer()
    with pt.phase("data"):
        _time.sleep(0.01)
    with pt.phase("step"):
        _time.sleep(0.02)
    s = pt.scalars()
    assert s["time_data"] >= 0.01
    assert s["time_step"] >= 0.02
    assert s["batch_time"] >= s["time_data"] + s["time_step"]
    assert "time_misc" in s
    memory_stats()  # must not raise regardless of backend support


# --------------------------- diagnostics scripts -----------------------------
_EXAMPLE = "/root/reference/adaptive_nerf/data/drz/out/example"
_MASK_TAG = "g22_grid_bm110_ss11"


@pytest.fixture(scope="module")
def example_available():
    from pathlib import Path

    if not Path(_EXAMPLE, "coordinates.pt").exists():
        pytest.skip("bundled example dataset not present")
    return Path(_EXAMPLE)


def test_log_dataset_info_full_report(example_available, tmp_path, capsys):
    """All reference report sections (log_dataset_info.py:155-382) appear."""
    from nerfsys_tpu.scripts.log_dataset_info import log_dataset_info

    out = tmp_path / "info.txt"
    log_dataset_info(example_available, downscale=0.125,
                     mask_dirname=_MASK_TAG, out_path=out)
    text = out.read_text()
    for section in [
        "Dataset", "Pose normalization", "Ray counts",
        "Image resolutions", "Camera positions — normalized DRB",
        "Camera positions — world meters", "Scene extent",
        "Baseline distance among cameras",
        "Rotation consistency — DRB", "det(R_drb)", "orthogonality",
        "Pitch from Down (DRB)", "Roll  stats", "Yaw   stats",
        "Intrinsics & FOV", "FOVx(deg)", "Principal point offset",
        "Dataset statistics complete.",
    ]:
        assert section in text, f"missing report section: {section}"
    # pct tables present for every axis, both frames
    assert text.count("pct [0, 1, 5, 50, 95, 99, 100]") == 3
    assert text.count("pct(m) [0, 1, 5, 50, 95, 99, 100]") == 3


def test_log_mask_info_overlap_and_exclusivity(example_available, tmp_path):
    """Reference report (log_mask_info.py:142-344): per-image combos,
    aggregate sum distribution, top-k, exclusivity exit codes."""
    from nerfsys_tpu.scripts.log_mask_info import gen_mask_stats

    out = tmp_path / "stats.txt"
    rc = gen_mask_stats(example_available / "masks" / _MASK_TAG,
                        expect_exclusive=False, max_images=3, out_path=out)
    assert rc == 0
    text = out.read_text()
    assert "[INFO] Found 4 submodules: [0, 1, 2, 3]" in text
    assert "[IMG 000000]" in text and "overlaps:" in text
    assert "&" in text  # combo formatting like "0&2: 11.4%"
    assert "sum=0" in text and "sum=1" in text and "sum>1" in text
    assert "Top images by overlap (sum>1):" in text
    # the example masks use soft routing (margin 1.1) -> overlap exists, so
    # the exclusivity check must fail with exit code 1
    rc_excl = gen_mask_stats(example_available / "masks" / _MASK_TAG,
                             expect_exclusive=True, max_images=3,
                             out_path=tmp_path / "s2.txt")
    assert rc_excl == 1
    assert "[FAIL] Exclusive check" in (tmp_path / "s2.txt").read_text()


def test_log_mask_info_bad_dir(tmp_path):
    from nerfsys_tpu.scripts.log_mask_info import gen_mask_stats

    (tmp_path / "empty").mkdir()
    assert gen_mask_stats(tmp_path / "empty",
                          out_path=tmp_path / "s.txt") == 2


def test_visualize_clustering_region_views(example_available, tmp_path):
    """Overview scatter + per-region Voronoi map + overlays all render
    (reference visualize_clustering.py:166-446)."""
    from nerfsys_tpu.scripts.visualize_clustering import run_visualize

    run_visualize(example_available, _MASK_TAG, tmp_path, n_overlays=1,
                  downscale=0.125)
    assert (tmp_path / "overview.png").stat().st_size > 10_000
    assert (tmp_path / "regions.png").stat().st_size > 10_000
    assert (tmp_path / "overlay_000000.png").stat().st_size > 10_000


def test_region_viz2d_margin_contours(tmp_path):
    """Soft-margin contours draw for margin > 1 without cameras."""
    from nerfsys_tpu.scripts.visualize_clustering import save_region_viz2d

    cents = np.array([[0.0, -1, -1], [0.0, 1, 1]], np.float32)
    out = save_region_viz2d(tmp_path / "r.png", cents, None,
                            cluster_2d=True, boundary_margin=1.3, res=64)
    assert out.stat().st_size > 1_000


def test_render_video_e2e_with_occ(tmp_path):
    """Full render_video drive on a tiny model, occupancy grids attached
    (the video op must use a checkpoint's trained grids, like eval)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.pipelines.video_gen import render_video
    from nerfsys_tpu.utils.config import parse_args

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
    occ = init_occ_state(OccGridConfig(resolution=8, levels=2,
                                       warmup_steps=0), 2)
    occ["binary"] = jnp.ones_like(occ["binary"])
    occ["num_updates"] = jnp.asarray(10, jnp.int32)

    P = parse_args([
        "--op", "video", "--data_path", str(tmp_path),
        "--camera_path", "turntable", "--video_frames", "2",
        "--video_width", "32", "--video_height", "24",
        "--ray_samples", "8", "--near", "0.05", "--far", "6.0",
        "--occ_importance",
    ])
    ctx = {
        "P": P, "cfg": cfg, "statics": statics,
        "params": init_container_params(jax.random.PRNGKey(0), cfg),
        "run_dir": tmp_path, "occ_state": occ,
    }
    out = render_video(ctx)
    from pathlib import Path as _P

    out = _P(out)
    assert out.exists()
    if out.is_dir():
        assert len(list(out.glob("*.png"))) == 2


def test_render_video_baked(tmp_path):
    """--op video --render_baked N: the video loop rides the baked SH
    snapshot renderer (serving mode), fog suppression included — frames
    come out at the requested size and finite."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.pipelines.video_gen import render_video
    from nerfsys_tpu.utils.config import parse_args

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
    P = parse_args([
        "--op", "video", "--data_path", str(tmp_path),
        "--camera_path", "turntable", "--video_frames", "2",
        "--video_width", "24", "--video_height", "16",
        "--ray_samples", "8", "--near", "0.05", "--far", "6.0",
        "--render_baked", "16", "--render_baked_sh", "2",
    ])
    ctx = {
        "P": P, "cfg": cfg, "statics": statics,
        "params": init_container_params(jax.random.PRNGKey(0), cfg),
        "run_dir": tmp_path,
    }
    out = render_video(ctx)
    from pathlib import Path as _P

    out = _P(out)
    if out.is_dir():
        frames = sorted(out.glob("*.png"))
        assert len(frames) == 2
        from PIL import Image as PILImage

        img = np.asarray(PILImage.open(frames[0]))
        assert img.shape[:2] == (16, 24)
        assert np.isfinite(img.astype(np.float64)).all()
    else:
        import imageio.v3 as iio

        vid = iio.imread(out)
        assert vid.shape[-3:-1] == (16, 24)


def test_render_video_pose_path_matches_host_rays(tmp_path, monkeypatch):
    """The video pose path (rays + fog + srgb + u8 fused on device) must
    produce the same frames as the host-raygen loop. Forcing the host arm
    via a mesh=None-but-ineligible knob: render_early_stop > 0 keeps the
    host path and, on a no-occ checkpoint, is ignored by
    make_chunk_renderer — so both arms render the identical program modulo
    where rays come from (u8 tolerance 1 for fusion-order float noise)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.pipelines.video_gen import render_video
    from nerfsys_tpu.utils.config import parse_args

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
    params = init_container_params(jax.random.PRNGKey(0), cfg)

    from pathlib import Path

    def _frames(extra_args, subdir):
        P = parse_args([
            "--op", "video", "--data_path", str(tmp_path),
            "--camera_path", "turntable", "--video_frames", "2",
            "--video_width", "24", "--video_height", "16",
            "--ray_samples", "4",
        ] + extra_args)
        run = tmp_path / subdir
        run.mkdir(exist_ok=True)
        ctx = {"P": P, "cfg": cfg, "statics": statics, "params": params,
               "run_dir": run}
        out = Path(render_video(ctx))
        if out.is_dir():
            from PIL import Image as PILImage

            return [np.asarray(PILImage.open(p))
                    for p in sorted(out.glob("*.png"))]
        import imageio.v3 as iio

        v = iio.imread(out)
        return [v[i] for i in range(v.shape[0])]

    pose = _frames([], "pose")
    host = _frames(["--render_early_stop", "1e-9"], "host")
    assert len(pose) == len(host) == 2
    for a, b in zip(pose, host):
        assert a.shape == b.shape
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_render_video_coherent_matches_host(tmp_path, monkeypatch):
    """--op video --render_coherent: frames equal the plain host-raygen
    render exactly (coherent dispatch is an exact re-packing, not an
    approximation)."""
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.pipelines.video_gen import render_video
    from nerfsys_tpu.utils.config import parse_args

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
    params = init_container_params(jax.random.PRNGKey(0), cfg)

    from pathlib import Path

    def _frames(extra_args, subdir):
        P = parse_args([
            "--op", "video", "--data_path", str(tmp_path),
            "--camera_path", "turntable", "--video_frames", "2",
            "--video_width", "24", "--video_height", "16",
            "--ray_samples", "4",
        ] + extra_args)
        run = tmp_path / subdir
        run.mkdir(exist_ok=True)
        ctx = {"P": P, "cfg": cfg, "statics": statics, "params": params,
               "run_dir": run}
        out = Path(render_video(ctx))
        if out.is_dir():
            from PIL import Image as PILImage

            return [np.asarray(PILImage.open(p))
                    for p in sorted(out.glob("*.png"))]
        import imageio.v3 as iio

        v = iio.imread(out)
        return [v[i] for i in range(v.shape[0])]

    # host arm: early_stop 1e-9 is ignored on a no-occ checkpoint but
    # forces the host-raygen loop (same trick as the pose-path test);
    # coherent arm: --render_coherent opts out of the pose path itself.
    # The monkeypatched counter proves the coherent branch actually
    # engaged (a silent pose-path fallback would pass vacuously).
    import nerfsys_tpu.pipelines.online.runtime_adapt as _ra

    calls = []
    _orig = _ra.make_coherent_renderer
    monkeypatch.setattr(
        _ra, "make_coherent_renderer",
        lambda *a, **k: (calls.append(1), _orig(*a, **k))[1])

    host = _frames(["--render_early_stop", "1e-9"], "vc_host")
    assert not calls
    coh = _frames(["--render_coherent"], "vc_coh")
    assert len(calls) == 1
    assert len(host) == len(coh) == 2
    for a, b in zip(host, coh):
        # exact re-packing; <=1 u8 for chunk-shape fusion float noise
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1, f"max u8 diff {diff.max()}"
