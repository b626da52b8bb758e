"""Import a reference (psklavos1/NeRF-Sys) checkpoint into nerfsys_tpu.

The reference saves `{tag}.model` = a torch ``state_dict()`` of its
MetaContainer (utils.py:262-302) next to `{tag}.P` (pickled argparse
namespace). This converter maps those tensors onto this framework's params
pytree and writes a native checkpoint that `--checkpoint_path` loads
directly — so a reference user can bring their trained models along.

Key mapping (names read from the reference sources, cited per block):

  MetaNGP expert, torch-fallback hash encoder (meta_ngp.py:52-97,
  encodings.py:264-268, metamodule.py:129-193):
    submodules.{k}.xyz_encoder.hash_table        -> experts.hash_table
        (identical layout: one (2^S, F) slab per level, level-major)
    submodules.{k}.sigma_trunk.{i}.linear.weight -> experts.sigma_trunk[i].w (T)
    submodules.{k}.sigma_head.weight/bias        -> experts.sigma_head.w/b
    submodules.{k}.geo_head.weight/bias          -> experts.geo_head.w/b
    submodules.{k}.color_mlp.{i}.linear.*        -> experts.color_mlp[i] (blocks)
    submodules.{k}.color_mlp.{D}.weight/bias     -> experts.color_mlp[D] (final
        MetaLinear appended positionally, meta_ngp.py:95-96)

  MetaNeRF vanilla expert (meta_vanilla.py:69-94):
    submodules.{k}.trunk.{i}.linear.*            -> experts.trunk[i]
    submodules.{k}.color_mlp.layer{l}.linear.*   -> experts.color_mlp[l]
    submodules.{k}.color_mlp.color_out.*         -> experts.color_mlp[-1]

  Background MLP (meta_container.py:86-92, plain nn.Sequential):
    bg_mlp.0.weight/bias -> bg.l0.w/b ; bg_mlp.2.weight/bias -> bg.l1.w/b

  torch nn.Linear weights are (out, in); this framework stores (in, out),
  so every weight transposes. Buffers (centroids/aabb live in
  ContainerStatics, rebuilt from the dataset's clustering meta) and
  nerfacc occupancy-grid state are reported and skipped — occupancy grids
  re-derive in a few EMA updates (ops/occupancy.py) and checkpoint as the
  separate `{tag}.occ` aux file here.

  tcnn-format checkpoints (`...xyz_encoder._tcnn_enc.params`, one flat
  fp16 blob) are rejected with an explanation: tcnn stores coarse levels
  DENSELY (per-level offset table) while this framework — like the
  reference's own torch fallback — hashes every level, so a faithful
  per-slot mapping does not exist for the dense levels.

Usage:
  python -m nerfsys_tpu.scripts.convert_reference_checkpoint \
      --reference_dir /path/to/logs/<job>/<run> --prefix best \
      --out converted_ckpt/
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> float32 numpy, transposed (torch Linear is (out, in))."""
    return np.ascontiguousarray(x.detach().cpu().numpy().T.astype(np.float32))


def _v(x) -> np.ndarray:
    return x.detach().cpu().numpy().astype(np.float32)


def _linear(state: dict, prefix: str, used: set) -> dict:
    used.add(prefix + ".weight")
    used.add(prefix + ".bias")
    return {"w": _t(state[prefix + ".weight"]), "b": _v(state[prefix + ".bias"])}


def _expert_from_state(state: dict, k: int, cfg, used: set) -> dict:
    pfx = f"submodules.{k}."
    if pfx + "xyz_encoder._tcnn_enc.params" in state:
        raise NotImplementedError(
            "this checkpoint's hash tables are in tiny-cuda-nn's packed "
            "format, which stores coarse levels densely (offset table) — "
            "there is no faithful per-slot mapping onto the hashed-all-"
            "levels layout this framework (and the reference's own torch "
            "fallback) uses. Re-save the reference checkpoint with "
            "implementation='torch' encoders, then convert."
        )
    from nerfsys_tpu.models.container import ContainerConfig

    assert isinstance(cfg, ContainerConfig)
    ecfg = cfg.expert
    p: dict = {}
    if cfg.nerf_variant == "instant":
        key = pfx + "xyz_encoder.hash_table"
        tab = _v(state[key])
        used.add(key)
        want = (ecfg.hash.table_size * ecfg.hash.levels,
                ecfg.hash.features_per_level)
        if tab.shape != want:
            raise ValueError(
                f"hash table shape {tab.shape} != {want} expected from the "
                f"checkpoint config — ARCH keys out of sync"
            )
        p["hash_table"] = tab
        p["sigma_trunk"] = [
            _linear(state, pfx + f"sigma_trunk.{i}.linear", used)
            for i in range(ecfg.sigma_depth)
        ]
        blocks = [
            _linear(state, pfx + f"color_mlp.{i}.linear", used)
            for i in range(ecfg.color_depth)
        ]
        blocks.append(_linear(state, pfx + f"color_mlp.{ecfg.color_depth}",
                              used))
        p["color_mlp"] = blocks
    else:  # vanilla (meta_vanilla.py:69-94)
        p["trunk"] = [
            _linear(state, pfx + f"trunk.{i}.linear", used)
            for i in range(ecfg.sigma_depth)
        ]
        blocks = [
            _linear(state, pfx + f"color_mlp.layer{l}.linear", used)
            for l in range(ecfg.color_depth - 1)
        ]
        blocks.append(_linear(state, pfx + "color_mlp.color_out", used))
        p["color_mlp"] = blocks
    p["sigma_head"] = _linear(state, pfx + "sigma_head", used)
    p["geo_head"] = _linear(state, pfx + "geo_head", used)
    return p


def reference_state_to_params(state: dict, cfg) -> tuple[dict, list]:
    """(params pytree, list of ignored keys). `state` is the reference's
    MetaContainer state_dict; `cfg` our ContainerConfig built from its .P."""
    import jax.numpy as jnp
    from jax import tree_util

    used: set = set()
    experts = [
        _expert_from_state(state, k, cfg, used)
        for k in range(cfg.num_experts)
    ]
    stacked = tree_util.tree_map(lambda *xs: jnp.stack(xs), *experts)
    params = {"experts": stacked}
    if "bg_mlp.0.weight" in state:
        params["bg"] = {
            "l0": {k: jnp.asarray(v)
                   for k, v in _linear(state, "bg_mlp.0", used).items()},
            "l1": {k: jnp.asarray(v)
                   for k, v in _linear(state, "bg_mlp.2", used).items()},
        }
    params["experts"] = tree_util.tree_map(jnp.asarray, params["experts"])
    ignored = sorted(k for k in state if k not in used)
    return params, ignored


def convert(reference_dir: Path, prefix: str, out_dir: Path) -> Path:
    import torch

    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.utils.checkpoint import save_checkpoint
    from nerfsys_tpu.utils.config import (
        find_checkpoint_cfg,
        load_checkpoint_cfg,
        parse_args,
    )

    reference_dir = Path(reference_dir)
    model_path = reference_dir / f"{prefix}.model"
    cfg_path = find_checkpoint_cfg(reference_dir, prefix)
    if cfg_path is None:
        raise FileNotFoundError(
            f"no {prefix}.P / {prefix}.config.json next to {model_path} — "
            "the architecture keys are required to shape the conversion"
        )
    stored = load_checkpoint_cfg(cfg_path)
    # defaults < checkpoint config (the reference's own merge order,
    # common/args.py:220-277); CLI/json layers don't apply here
    P = parse_args([])
    for k, v in dict(stored).items():
        # unconditional: hash-conf keys like high_levels are plain namespace
        # attrs in the reference too (nerf_runner.py:104-108 getattr's them)
        setattr(P, k, v)
    # dataset-derived routing fields (normally set by build_context from the
    # clustering meta) — they shape ROUTING only, never the params tree
    if not hasattr(P, "boundary_margin_effective"):
        P.boundary_margin_effective = max(1.0, float(getattr(P, "bm", 1.0)))
    if not hasattr(P, "cluster_2d"):
        P.cluster_2d = True
    cfg = container_config_from_args(P)

    state = torch.load(model_path, map_location="cpu", weights_only=True)
    params, ignored = reference_state_to_params(state, cfg)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_checkpoint(out_dir, prefix, params, config=dict(stored))
    if ignored:
        print(f"[convert] ignored {len(ignored)} non-learnable/unknown keys "
              "(buffers, occupancy grids):")
        for k in ignored[:20]:
            print(f"  - {k}")
        if len(ignored) > 20:
            print(f"  ... and {len(ignored) - 20} more")
    print(f"[convert] wrote {out_dir}/{prefix}.model "
          f"({cfg.num_experts} experts, {cfg.nerf_variant})")
    return out_dir / f"{prefix}.model"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference_dir", required=True,
                    help="reference run dir holding <prefix>.model + .P")
    ap.add_argument("--prefix", default="best")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    a = ap.parse_args(argv)
    convert(Path(a.reference_dir), a.prefix, Path(a.out))


if __name__ == "__main__":
    main()
