"""Fuzz the config merge: defaults < checkpoint < JSON < CLI, ARCH pinned.

The reference merge semantics (common/args.py:170-277) are a classic source
of silent wrongness: a flag set in the wrong layer changes the model topology
or training setup without any error. These tests drive randomized layer
combinations through parse_args and check the resolved value of every fuzzed
key against an independent simulation of the documented precedence:

    non-ARCH:  CLI > JSON config > checkpoint (--use_stored_args) > default
    ARCH_KEYS: checkpoint ALWAYS wins (weights must match the graph)

Both checkpoint formats are exercised: our {prefix}.config.json and the
reference's pickled argparse `.P` (utils/config.py:225-244).
"""
import argparse
from pathlib import Path
import json
import random

import pytest

from nerfsys_tpu.utils.config import ARCH_KEYS, build_parser, parse_args

# (dest, [candidate values], cli_formatter or None if not CLI-settable)
_FUZZ_KEYS = [
    ("lr", [1e-4, 0.5, 0.007], lambda v: ["--lr", str(v)]),
    ("outer_steps", [10, 999, 20000], lambda v: ["--outer_steps", str(v)]),
    ("support_rays", [16, 4000], lambda v: ["--support_rays", str(v)]),
    ("downscale", [0.125, 1.0], lambda v: ["--downscale", str(v)]),
    ("color_space", ["srgb", "linear"], lambda v: ["--color_space", v]),
    ("inner_lr", [0.015, 0.2], lambda v: [f"--inner_lr={v}"]),  # = form
    # store_true flags: CLI can only assert True; JSON/ckpt can set either
    ("use_amp", [True, False], None),
    # ARCH keys — checkpoint must always win over JSON and CLI
    ("dim_hidden", [16, 64, 128], lambda v: ["--dim_hidden", str(v)]),
    ("plane_levels", [1, 3], lambda v: ["--plane_levels", str(v)]),
    ("xyz_encoding", ["hash", "planes"],
     lambda v: ["--xyz_encoding", v]),
    ("no_bg_nerf", [True, False], None),
]

_DEFAULTS = vars(build_parser().parse_args([]))


def _simulate(cli: dict, js: dict, ck: dict, use_stored: bool, has_ckpt: bool):
    """Independent model of the documented precedence."""
    expected = dict(_DEFAULTS)
    for k, v in js.items():
        if k not in cli:
            expected[k] = v
    if has_ckpt and use_stored:
        for k, v in ck.items():
            if k not in cli and k not in js:
                expected[k] = v
    for k, v in cli.items():
        expected[k] = v
    if has_ckpt:
        for k in ARCH_KEYS:
            if k in ck:
                expected[k] = ck[k]
    return expected


def _write_ckpt_cfg(tmp_path, cfg: dict, style: str):
    run = tmp_path / "run"
    run.mkdir(exist_ok=True)
    if style == "json":
        (run / "best.config.json").write_text(json.dumps(cfg))
    else:  # reference pickled argparse.Namespace
        import torch

        torch.save(argparse.Namespace(**cfg), run / "best.P")
    return str(run)


@pytest.mark.parametrize("ckpt_style", ["json", "P"])
def test_merge_precedence_fuzz(tmp_path, ckpt_style):
    rng = random.Random(1234 if ckpt_style == "json" else 4321)
    for trial in range(20):
        cli, js, ck = {}, {}, {}
        for dest, values, cli_fmt in _FUZZ_KEYS:
            layers = rng.sample(["cli", "json", "ckpt", "none"],
                                k=rng.randint(1, 3))
            if "cli" in layers and cli_fmt is not None:
                cli[dest] = rng.choice(values)
            if "json" in layers:
                js[dest] = rng.choice(values)
            if "ckpt" in layers:
                ck[dest] = rng.choice(values)

        use_stored = rng.random() < 0.5
        has_ckpt = rng.random() < 0.8

        argv = []
        for dest, values, cli_fmt in _FUZZ_KEYS:
            if dest in cli:
                argv += cli_fmt(cli[dest])
        cfg_json = tmp_path / f"cfg_{ckpt_style}_{trial}.json"
        cfg_json.write_text(json.dumps(js))
        argv += ["--configPath", str(cfg_json)]
        if has_ckpt:
            argv += ["--checkpoint_path",
                     _write_ckpt_cfg(tmp_path, ck, ckpt_style),
                     "--prefix", "best"]
            if use_stored:
                argv += ["--use_stored_args"]

        args = parse_args(argv)
        expected = _simulate(cli, js, ck, use_stored, has_ckpt)
        for dest, _, _ in _FUZZ_KEYS:
            got = getattr(args, dest)
            assert got == expected[dest], (
                f"trial {trial} key {dest}: got {got!r}, expected "
                f"{expected[dest]!r} (cli={cli.get(dest)!r}, "
                f"json={js.get(dest)!r}, ckpt={ck.get(dest)!r}, "
                f"use_stored={use_stored}, has_ckpt={has_ckpt})"
            )


def test_arch_pinned_against_explicit_cli(tmp_path):
    """Even an explicit CLI flag cannot unpin an architecture key."""
    run = _write_ckpt_cfg(tmp_path, {"dim_hidden": 32, "lr": 0.123}, "json")
    args = parse_args(["--dim_hidden", "128", "--lr", "0.9",
                       "--checkpoint_path", run, "--prefix", "best"])
    assert args.dim_hidden == 32  # ARCH: checkpoint wins
    assert args.lr == 0.9  # non-ARCH: CLI wins


def test_json_unknown_keys_ignored(tmp_path):
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"not_a_real_flag": 7, "lr": 0.25}))
    args = parse_args(["--configPath", str(cfg)])
    assert args.lr == 0.25
    assert not hasattr(args, "not_a_real_flag")


def test_reference_p_namespace_roundtrip(tmp_path):
    """A pickled reference-style .P restores non-ARCH keys only with
    --use_stored_args, ARCH keys unconditionally."""
    run = _write_ckpt_cfg(
        tmp_path, {"plane_levels": 1, "outer_steps": 777}, "P"
    )
    a1 = parse_args(["--checkpoint_path", run, "--prefix", "best"])
    assert a1.plane_levels == 1
    assert a1.outer_steps == _DEFAULTS["outer_steps"]
    a2 = parse_args(["--checkpoint_path", run, "--prefix", "best",
                     "--use_stored_args"])
    assert a2.outer_steps == 777


def test_occ_mode_keys_follow_checkpoint(tmp_path):
    """Render-mode keys (soft/hard, importance, probe mask, ray floor) are
    pinned from the checkpoint WITHOUT --use_stored_args — render how the
    model trained — but an explicit JSON/CLI setting still wins."""
    run = _write_ckpt_cfg(tmp_path, {"occ_no_hard_mask": True,
                                     "occ_importance": True,
                                     "occ_ray_floor": 0.4}, "json")
    a = parse_args(["--checkpoint_path", run, "--prefix", "best"])
    assert a.occ_no_hard_mask is True
    assert a.occ_importance is True
    assert a.occ_ray_floor == 0.4

    cfg = tmp_path / "override.json"
    cfg.write_text(json.dumps({"occ_no_hard_mask": False}))
    a2 = parse_args(["--configPath", str(cfg),
                     "--checkpoint_path", run, "--prefix", "best"])
    assert a2.occ_no_hard_mask is False

    a3 = parse_args(["--occ_ray_floor", "0.1",
                     "--checkpoint_path", run, "--prefix", "best"])
    assert a3.occ_ray_floor == 0.1


def test_shipped_train_config_is_soft_occ():
    """configs/train.json ships the quality-gated soft-occupancy profile
    (BASELINE.md A/B); train_strat.json keeps stratified-96 parity. Guards
    the headline default against accidental edits."""
    from nerfsys_tpu.runner import meta_config_from_args

    root = Path(__file__).resolve().parents[1]
    P = parse_args(["--configPath", str(root / "configs" / "train.json")])
    assert P.use_occ and P.occ_importance and P.occ_no_hard_mask
    assert P.ray_samples == 32 and P.occ_dilate == 1
    meta = meta_config_from_args(P)
    assert meta.occ_importance and not meta.occ_hard_mask

    P2 = parse_args(["--configPath", str(root / "configs" / "train_strat.json")])
    assert not P2.use_occ and P2.ray_samples == 96
    assert meta_config_from_args(P2).occ_hard_mask


def test_snapshot_config_not_user_explicit(tmp_path):
    """A stored run-config snapshot (namespace_to_dict -> {tag}.config.json)
    merges like a JSON config but must NOT mark its keys user-explicit:
    explicit_keys gates TPU-aware defaults (e.g. chunk_points -> HBM-safe
    chunk sizing), and a snapshot re-run would otherwise freeze reference
    semantics for every flag. Hand-written JSON stays explicit."""
    from nerfsys_tpu.utils.config import namespace_to_dict

    a = parse_args(["--data_path", "/x", "--ray_samples", "48"])
    d = namespace_to_dict(a)
    assert d.get("_config_snapshot") is True
    assert "explicit_keys" not in d  # per-invocation, not a run setting

    snap = tmp_path / "best.config.json"
    snap.write_text(json.dumps(d))
    b = parse_args(["--configPath", str(snap)])
    assert b.ray_samples == 48  # value still merges
    assert "ray_samples" not in b.explicit_keys
    assert "data_path" not in b.explicit_keys

    hand = tmp_path / "hand.json"
    hand.write_text(json.dumps({"ray_samples": 64}))
    c = parse_args(["--configPath", str(hand)])
    assert c.ray_samples == 64 and "ray_samples" in c.explicit_keys


def test_render_fast_preset_expansion():
    """--render_fast expands to the measured fastest render config; explicit
    user choices (CLI or hand-written JSON) still win over the preset."""
    from nerfsys_tpu.utils.config import parse_args

    a = parse_args(["--render_fast"])
    assert a.bucketed_moe is True
    assert a.experts_per_point == 1
    assert a.occ_union_probe_res == 128

    b = parse_args(["--render_fast", "--experts_per_point", "2",
                    "--occ_union_probe_res", "0"])
    assert b.bucketed_moe is True
    assert b.experts_per_point == 2
    assert b.occ_union_probe_res == 0

    c = parse_args([])
    assert c.bucketed_moe is False and c.occ_union_probe_res == 0
