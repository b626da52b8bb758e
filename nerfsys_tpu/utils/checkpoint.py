"""Checkpoint save/load/resume for params, optimizer state, and run config.

Counterpart of the reference flat-file checkpoint layout
(/root/reference/adaptive_nerf/utils.py:214-346, common/utils.py:113-160):

    <run_dir>/{tag}.model        flax-msgpack params pytree
    <run_dir>/{tag}.optim        flax-msgpack optax state
    <run_dir>/{tag}.config.json  full run config snapshot
    <run_dir>/{tag}.state.json   {step, best, is_best}

tags: 'best' | 'last' | 'step{N}'. Restore requires live templates (params /
opt_state pytrees built from the pinned ARCH_KEYS config), which is exactly
the reference's contract. `resolve_checkpoint_dir` reproduces the
descend-to-latest-run-dir logic (utils.py:712-757).
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization


def save_checkpoint(
    run_dir,
    tag: str,
    params,
    opt_state=None,
    config: Optional[dict] = None,
    step: int = 0,
    best: float = float("-inf"),
    is_best: bool = False,
) -> Path:
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / f"{tag}.model").write_bytes(serialization.to_bytes(params))
    if opt_state is not None:
        (run_dir / f"{tag}.optim").write_bytes(serialization.to_bytes(opt_state))
    if config is not None:
        (run_dir / f"{tag}.config.json").write_text(json.dumps(config, indent=2))
    (run_dir / f"{tag}.state.json").write_text(
        json.dumps({"step": int(step), "best": float(best), "is_best": bool(is_best)})
    )
    return run_dir / f"{tag}.model"


def load_checkpoint(
    run_dir,
    tag: str,
    params_template,
    opt_state_template=None,
) -> Tuple[Any, Any, Dict]:
    """-> (params, opt_state or None, state dict {step, best, is_best})."""
    run_dir = Path(run_dir)
    model_path = run_dir / f"{tag}.model"
    if not model_path.exists():
        raise FileNotFoundError(model_path)
    params = serialization.from_bytes(params_template, model_path.read_bytes())

    opt_state = None
    opt_path = run_dir / f"{tag}.optim"
    if opt_state_template is not None and opt_path.exists():
        opt_state = serialization.from_bytes(
            opt_state_template, opt_path.read_bytes()
        )

    state = {"step": 0, "best": float("-inf"), "is_best": False}
    state_path = run_dir / f"{tag}.state.json"
    if state_path.exists():
        state.update(json.loads(state_path.read_text()))
    return params, opt_state, state


def load_model_checkpoint(run_dir, tag: str, params_template):
    """Params only (eval/video/view paths)."""
    params, _, state = load_checkpoint(run_dir, tag, params_template)
    return params, state


def checkpoint_exists(run_dir, tag: str) -> bool:
    return (Path(run_dir) / f"{tag}.model").exists()


def latest_step_tag(run_dir) -> Optional[str]:
    """Highest 'step{N}' tag present, else 'last' if present, else None."""
    run_dir = Path(run_dir)
    if not run_dir.exists():
        return None
    best_n, best_tag = -1, None
    for f in run_dir.glob("step*.model"):
        m = re.fullmatch(r"step(\d+)\.model", f.name)
        if m and int(m.group(1)) > best_n:
            best_n, best_tag = int(m.group(1)), f.stem
    if best_tag:
        return best_tag
    if (run_dir / "last.model").exists():
        return "last"
    return None


def resolve_checkpoint_dir(path, logs_root: Optional[str] = None) -> Path:
    """Resolve a checkpoint directory, descending into the newest run subdir
    when the given dir contains no checkpoints itself (utils.py:712-757)."""
    p = Path(path)
    if not p.exists() and logs_root is not None:
        cand = Path(logs_root) / path
        if cand.exists():
            p = cand
    if not p.is_dir():
        return p
    has_ckpt = any(p.glob("*.model")) or any(p.glob("*.P"))
    if has_ckpt:
        return p
    subdirs = sorted(
        (d for d in p.iterdir() if d.is_dir()),
        key=lambda d: d.stat().st_mtime,
    )
    for d in reversed(subdirs):
        if any(d.glob("*.model")) or any(d.glob("*.P")):
            return d
    return p


def is_resume(run_dir, params_template, opt_state_template=None, tag: str = "last"):
    """Full train-state restore if a checkpoint exists (common/utils.py:129-160).

    Returns (params, opt_state, state) or None.
    """
    if run_dir is None:
        return None
    tag = tag if checkpoint_exists(run_dir, tag) else latest_step_tag(run_dir)
    if tag is None:
        return None
    try:
        return load_checkpoint(run_dir, tag, params_template, opt_state_template)
    except Exception as e:  # degrade to a warning like the reference
        print(f"[WARN] checkpoint restore failed ({e}); starting fresh")
        return None


def tree_to_host(tree):
    """Device -> host numpy copy of a pytree (for safe serialization)."""
    import numpy as np

    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_aux_state(run_dir, tag: str, name: str, state) -> Path:
    """Save an auxiliary pytree alongside a checkpoint: <tag>.<name>.

    Used for occupancy grids (the reference stores occ grids inside the
    model state_dict; here they live in their own file so params stay a
    pure learnable pytree)."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    path = run_dir / f"{tag}.{name}"
    path.write_bytes(serialization.to_bytes(tree_to_host(state)))
    return path


def load_aux_state(run_dir, name: str, template, tag: Optional[str] = None):
    """Load <tag>.<name> (default: 'last', else latest step tag); None if
    absent or unreadable."""
    run_dir = Path(run_dir)
    tags = [tag] if tag else ["last", latest_step_tag(run_dir), "best"]
    for t in tags:
        if t is None:
            continue
        path = run_dir / f"{t}.{name}"
        if path.exists():
            data = path.read_bytes()
            try:
                return serialization.from_bytes(template, data)
            except Exception as e:
                # flax from_bytes is strict on dict keys, so files written
                # before a new aux leaf existed (e.g. occ 'ready_after')
                # would fail outright. For flat-dict states, fall back to a
                # key-merge: restored keys override the template, missing
                # keys keep the template default. Shape mismatches (topology
                # change) still fail -> None.
                try:
                    raw = serialization.msgpack_restore(data)
                    if isinstance(raw, dict) and isinstance(template, dict):
                        merged = {}
                        for k, tv in template.items():
                            if k in raw:
                                rv = jnp.asarray(raw[k])
                                tv_arr = jnp.asarray(tv)
                                if rv.shape != tv_arr.shape:
                                    raise ValueError(
                                        f"leaf {k!r}: saved shape {rv.shape}"
                                        f" != template {tv_arr.shape}")
                                merged[k] = rv.astype(tv_arr.dtype)
                            else:
                                merged[k] = tv
                        print(f"[WARN] aux state {path.name}: strict restore"
                              f" failed ({e}); merged by key instead")
                        return merged
                except Exception as e2:
                    e = e2
                print(f"[WARN] aux state {path.name} unreadable ({e})")
                return None
    return None
