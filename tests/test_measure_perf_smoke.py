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
