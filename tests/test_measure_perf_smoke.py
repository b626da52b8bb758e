"""Smoke for the perf-measurement tooling (keeps the TPU battery unrotted).

Tiny shapes only — this locks CLI wiring, the sky-frame construction, and
the stats plumbing, not performance. One chunk means nothing can skip;
chunk-level skip/pack behavior is covered by tests/test_chunk_skip.py.
"""
import numpy as np


def test_measure_render_sky_smoke(capsys):
    from nerfsys_tpu.scripts.measure_perf import measure_render

    out = measure_render(side=32, samples=8, use_occ=True, iters=1, sky=0.5)
    assert out["two_wave"] is True
    assert out["render_stats"]["chunks_total"] == 1
    # the sky half really is dead: only the ground rays are alive
    assert out["render_stats"]["n_alive"] == 32 * 32 // 2
    assert out["skip_speedup"] is not None
    assert np.isfinite(out["frame_seconds"])


def test_gather_rows_model_matches_hand_count():
    from nerfsys_tpu.utils.flops import analytic_train_step_gather_rows

    # 1 task, 1 ray, 1 sample, 1 inner iter, no query: one point through a
    # packed L3 planes encoder = 3 levels x (3 planes + 3 lines) = 18 rows
    rows = analytic_train_step_gather_rows(
        num_experts=1, tasks_per_expert=1, support_rays=1, query_rays=0,
        inner_iter=1, ray_samples=1)
    assert rows == 18.0
    # occ probe pass adds ONE fused row per probe point (finest-level
    # select + (binary, value) pair gather — levels don't multiply rows)
    rows_occ = analytic_train_step_gather_rows(
        num_experts=1, tasks_per_expert=1, support_rays=1, query_rays=0,
        inner_iter=1, ray_samples=1, occ_probes=16, occ_levels=2)
    assert rows_occ == 18.0 + 16.0
    # the query pass probes its rays once per task too (support CDF is
    # hoisted across inner iterations; query pays its own single pass)
    rows_q = analytic_train_step_gather_rows(
        num_experts=1, tasks_per_expert=1, support_rays=1, query_rays=2,
        inner_iter=1, ray_samples=1, occ_probes=16)
    assert rows_q == (1 + 2) * 18.0 + (1 + 2) * 16.0


def test_render_rows_model_probe_grids():
    from nerfsys_tpu.utils.flops import analytic_render_gather_rows_per_ray

    # dense MoE occ render at K=4, S=32, P=128: field 32*18*4 + probe
    # 128*4 (one fused row per grid) + hard mask 32*4
    dense = analytic_render_gather_rows_per_ray(
        ray_samples=32, num_experts=4, occ=True)
    assert dense == 32 * 18 * 4 + 128 * 4 + 32 * 4
    # top-1 bucketed routing narrows the FIELD to one expert per point but
    # the per-ray probe/mask still union all K grids — probe_grids=K
    top1 = analytic_render_gather_rows_per_ray(
        ray_samples=32, num_experts=4, experts_evaluated=1, occ=True,
        probe_grids=4)
    assert top1 == 32 * 18 * 1 + 128 * 4 + 32 * 4
    # active_expert single-expert render probes only its own grid (default)
    single = analytic_render_gather_rows_per_ray(
        ray_samples=32, num_experts=4, experts_evaluated=1, occ=True)
    assert single == 32 * 18 * 1 + 128 * 1 + 32 * 1
    # union probe grid: one probe row regardless of probe_grids
    union = analytic_render_gather_rows_per_ray(
        ray_samples=32, num_experts=4, occ=True, union_probe=True,
        probe_grids=4)
    assert union == 32 * 18 * 4 + 128 * 1 + 32 * 4
    # hat-stencil MXU lines issue zero gather rows (9 of 18 rows/point)
    no_lines = analytic_render_gather_rows_per_ray(
        ray_samples=32, num_experts=4, occ=True, lines_gathered=False)
    assert no_lines == 32 * 9 * 4 + 128 * 4 + 32 * 4


def test_train_rows_model_lines_matmul():
    from nerfsys_tpu.utils.flops import analytic_train_step_gather_rows

    rows = analytic_train_step_gather_rows(
        num_experts=1, tasks_per_expert=1, support_rays=1, query_rays=0,
        inner_iter=1, ray_samples=1, lines_gathered=False)
    assert rows == 9.0


def test_cli_samples_default_per_mode():
    """The baked modes default to 32 samples; render/train keep 96; an
    explicit --samples always wins. Regression for the r3 sweep that ran
    baked_serve at 96 because the render default leaked over the mode's
    (VERDICT r3 item 1)."""
    from nerfsys_tpu.scripts.measure_perf import parse_perf_args

    assert parse_perf_args(["--mode", "baked_serve"]).samples == 32
    assert parse_perf_args(["--mode", "baked"]).samples == 32
    assert parse_perf_args(["--mode", "render"]).samples == 96
    assert parse_perf_args(
        ["--mode", "baked_serve", "--samples", "16"]).samples == 16
    assert parse_perf_args(
        ["--mode", "render", "--samples", "32"]).samples == 32
