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
  fp16 blob, the reference's fast path — encodings.py:229-251) import
  via the offset-table layout (tcnn_table_from_blob): hashed levels copy
  1:1 (same prime-XOR hash mod 2^S); DENSE coarse levels land in the
  first res³ rows of their slab and the converted checkpoint pins
  hash_tcnn_layout=True (an ARCH key) so the encoder reproduces tcnn's
  resolutions, 0.5-offset sampling, and dense linear indexing exactly.
  Lossless up to the checkpoint's own fp16 quantization
  (tests/test_tcnn_import.py pins feature parity against an independent
  numpy simulator of the tcnn spec).

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


def tcnn_table_from_blob(blob: np.ndarray, hcfg) -> np.ndarray:
    """tiny-cuda-nn GridEncoding param blob -> this framework's uniform
    (levels * 2^S, F) table, for a HashGridConfig with tcnn_layout=True.

    tcnn stores levels back to back with entry-major, feature-fastest rows
    and per-level entry counts next_multiple(min(res^3, 2^S), 8)
    (tcnn grid.h; the reference consumes this blob at encodings.py:229-251).
    Hashed levels (res^3 > 2^S) copy 1:1 — the hash function and mod-2^S
    are identical. Dense levels land in the first res^3 rows of their slab,
    addressed linearly by the encoder's tcnn_layout mode; padding rows and
    any trailing alignment are dropped. Lossless up to the checkpoint's own
    fp16 quantization."""
    from nerfsys_tpu.ops.encodings import tcnn_param_layout

    L, F, T = hcfg.levels, hcfg.features_per_level, hcfg.table_size
    rows, padded, offsets = tcnn_param_layout(hcfg)
    total = int((padded).sum()) * F
    blob = np.asarray(blob, np.float32).reshape(-1)
    if blob.size != total:
        raise ValueError(
            f"tcnn param blob has {blob.size} floats; the checkpoint config "
            f"(levels={L}, F={F}, 2^{hcfg.log2_hashmap_size}, "
            f"min_res={hcfg.min_res}, max_res={hcfg.max_res}) implies "
            f"{total} — ARCH keys out of sync"
        )
    table = np.zeros((L * T, F), np.float32)
    for lv in range(L):
        n = int(rows[lv])
        chunk = blob[int(offsets[lv]) * F : (int(offsets[lv]) + n) * F]
        table[lv * T : lv * T + n] = chunk.reshape(n, F)
    return table


def _expert_from_state(state: dict, k: int, cfg, used: set) -> dict:
    pfx = f"submodules.{k}."
    from nerfsys_tpu.models.container import ContainerConfig

    assert isinstance(cfg, ContainerConfig)
    ecfg = cfg.expert
    p: dict = {}
    if cfg.nerf_variant == "instant":
        tcnn_key = pfx + "xyz_encoder._tcnn_enc.params"
        if tcnn_key in state:
            if not ecfg.hash.tcnn_layout:
                raise ValueError(
                    "checkpoint stores tcnn-format hash tables but the "
                    "config was built without hash_tcnn_layout — convert() "
                    "sets it automatically; set it when calling "
                    "reference_state_to_params directly"
                )
            p["hash_table"] = tcnn_table_from_blob(_v(state[tcnn_key]),
                                                   ecfg.hash)
            used.add(tcnn_key)
        else:
            key = pfx + "xyz_encoder.hash_table"
            tab = _v(state[key])
            used.add(key)
            want = (ecfg.hash.table_size * ecfg.hash.levels,
                    ecfg.hash.features_per_level)
            if tab.shape != want:
                raise ValueError(
                    f"hash table shape {tab.shape} != {want} expected from "
                    f"the checkpoint config — ARCH keys out of sync"
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


def params_to_reference_state(params: dict, cfg, statics=None) -> dict:
    """Inverse mapping: native params pytree -> reference-named torch
    state_dict, so models trained HERE run in the reference runner.

    Excludes nerfacc occupancy-grid buffers (their packed layout is
    nerfacc-internal; load with the reference's --no_strict, utils.py:339,
    or with occupancy off). Requires the hash or vanilla encoder — the
    factorized planes encoder is a TPU-build addition with no reference
    module to map onto."""
    import torch
    from jax import tree_util

    if getattr(cfg.expert, "xyz_encoding", "hash") == "planes":
        raise NotImplementedError(
            "the planes encoder is TPU-build-only; train (or re-save) with "
            "--xyz_encoding hash to export a reference-loadable checkpoint"
        )

    def w(x):  # ours (in, out) -> torch Linear (out, in)
        return torch.tensor(np.ascontiguousarray(np.asarray(x).T))

    def v(x):
        return torch.tensor(np.asarray(x))

    state = {}
    experts = params["experts"]
    for k in range(cfg.num_experts):
        ek = tree_util.tree_map(lambda x: np.asarray(x[k]), experts)
        p = f"submodules.{k}."
        if cfg.nerf_variant == "instant":
            if cfg.expert.hash.tcnn_layout:
                # inverse of tcnn_table_from_blob: slab rows -> fp16 blob
                # with tcnn's 8-entry level alignment (padding zeros)
                from nerfsys_tpu.ops.encodings import tcnn_param_layout

                hcfg = cfg.expert.hash
                rows, padded, offsets = tcnn_param_layout(hcfg)
                F, T = hcfg.features_per_level, hcfg.table_size
                blob = np.zeros((int(padded.sum()), F), np.float32)
                tab = np.asarray(ek["hash_table"], np.float32)
                for lv in range(hcfg.levels):
                    o, n = int(offsets[lv]), int(rows[lv])
                    blob[o : o + n] = tab[lv * T : lv * T + n]
                state[p + "xyz_encoder._tcnn_enc.params"] = torch.tensor(
                    blob.reshape(-1)
                ).to(torch.float16)
            else:
                state[p + "xyz_encoder.hash_table"] = v(ek["hash_table"])
            for i, lin in enumerate(ek["sigma_trunk"]):
                state[p + f"sigma_trunk.{i}.linear.weight"] = w(lin["w"])
                state[p + f"sigma_trunk.{i}.linear.bias"] = v(lin["b"])
            *blocks, final = ek["color_mlp"]
            for i, lin in enumerate(blocks):
                state[p + f"color_mlp.{i}.linear.weight"] = w(lin["w"])
                state[p + f"color_mlp.{i}.linear.bias"] = v(lin["b"])
            state[p + f"color_mlp.{len(blocks)}.weight"] = w(final["w"])
            state[p + f"color_mlp.{len(blocks)}.bias"] = v(final["b"])
        else:  # vanilla (meta_vanilla.py:69-94)
            for i, lin in enumerate(ek["trunk"]):
                state[p + f"trunk.{i}.linear.weight"] = w(lin["w"])
                state[p + f"trunk.{i}.linear.bias"] = v(lin["b"])
            *blocks, final = ek["color_mlp"]
            for l, lin in enumerate(blocks):
                state[p + f"color_mlp.layer{l}.linear.weight"] = w(lin["w"])
                state[p + f"color_mlp.layer{l}.linear.bias"] = v(lin["b"])
            state[p + "color_mlp.color_out.weight"] = w(final["w"])
            state[p + "color_mlp.color_out.bias"] = v(final["b"])
        state[p + "sigma_head.weight"] = w(ek["sigma_head"]["w"])
        state[p + "sigma_head.bias"] = v(ek["sigma_head"]["b"])
        state[p + "geo_head.weight"] = w(ek["geo_head"]["w"])
        state[p + "geo_head.bias"] = v(ek["geo_head"]["b"])
    if "bg" in params:
        state["bg_mlp.0.weight"] = w(params["bg"]["l0"]["w"])
        state["bg_mlp.0.bias"] = v(params["bg"]["l0"]["b"])
        state["bg_mlp.2.weight"] = w(params["bg"]["l1"]["w"])
        state["bg_mlp.2.bias"] = v(params["bg"]["l1"]["b"])
    if statics is not None:
        state["centroids"] = v(statics.centroids)
        state["aabb"] = v(statics.global_aabb)
    return state


def convert(reference_dir: Path, prefix: str, out_dir: Path) -> Path:
    import torch

    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.utils.checkpoint import save_checkpoint
    from nerfsys_tpu.utils.config import (
        find_checkpoint_cfg,
        load_checkpoint_cfg,
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
    state = torch.load(model_path, map_location="cpu", weights_only=True)
    if any(k.endswith("xyz_encoder._tcnn_enc.params") for k in state):
        # tcnn-trained checkpoint: flip the encoder into tcnn layout so the
        # import is a pure layout transfer; persists via ARCH_KEYS pinning
        stored = dict(stored)
        stored["hash_tcnn_layout"] = True
    # defaults < checkpoint config (the reference's own merge order,
    # common/args.py:220-277); CLI/json layers don't apply here. setattr is
    # unconditional: hash-conf keys like high_levels are plain namespace
    # attrs in the reference too (nerf_runner.py:104-108 getattr's them);
    # dataset-derived routing fields get defaults — they shape ROUTING
    # only, never the params tree.
    P = _config_to_P(stored)
    cfg = container_config_from_args(P)
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


def _config_to_P(stored: dict):
    from nerfsys_tpu.utils.config import parse_args

    P = parse_args([])
    for k, v in dict(stored).items():
        setattr(P, k, v)
    if not hasattr(P, "boundary_margin_effective"):
        P.boundary_margin_effective = max(1.0, float(getattr(P, "bm", 1.0)))
    if not hasattr(P, "cluster_2d"):
        P.cluster_2d = True
    return P


def export(native_dir: Path, prefix: str, out_dir: Path) -> Path:
    """Native checkpoint -> reference-format {prefix}.model + {prefix}.P."""
    import jax
    import torch

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.utils.checkpoint import load_checkpoint
    from nerfsys_tpu.utils.config import (
        find_checkpoint_cfg,
        load_checkpoint_cfg,
    )

    native_dir = Path(native_dir)
    cfg_path = find_checkpoint_cfg(native_dir, prefix)
    if cfg_path is None:
        raise FileNotFoundError(f"no {prefix} config in {native_dir}")
    stored = load_checkpoint_cfg(cfg_path)
    P = _config_to_P(stored)
    cfg = container_config_from_args(P)
    template = init_container_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = load_checkpoint(native_dir, prefix, template)
    state = params_to_reference_state(params, cfg)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    torch.save(state, out_dir / f"{prefix}.model")
    torch.save(argparse.Namespace(**dict(stored)), out_dir / f"{prefix}.P")
    print(f"[export] wrote {out_dir}/{prefix}.model for the reference "
          "runner (load with --no_strict if the model was built with "
          "occupancy grids)")
    return out_dir / f"{prefix}.model"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference_dir",
                    help="reference run dir holding <prefix>.model + .P")
    ap.add_argument("--reverse", action="store_true",
                    help="export a NATIVE checkpoint to reference format")
    ap.add_argument("--checkpoint_dir",
                    help="(--reverse) native run dir to export")
    ap.add_argument("--prefix", default="best")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    a = ap.parse_args(argv)
    if a.reverse:
        if not a.checkpoint_dir:
            ap.error("--reverse requires --checkpoint_dir")
        export(Path(a.checkpoint_dir), a.prefix, Path(a.out))
    else:
        if not a.reference_dir:
            ap.error("--reference_dir is required (or use --reverse)")
        convert(Path(a.reference_dir), a.prefix, Path(a.out))


if __name__ == "__main__":
    main()
