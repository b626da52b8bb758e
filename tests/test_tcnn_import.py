"""tcnn-format checkpoint import: layout transfer + encoder tcnn mode.

The ground truth here is an INDEPENDENT numpy simulator of tiny-cuda-nn's
GridEncoding written from the documented semantics (grid.h: per-level scale
= base * growth^l - 1 computed in f32, resolution = ceil(scale) + 1,
pos = x * scale + 0.5, params_in_level = next_multiple(min(res^3, 2^S), 8),
dense linear indexing x + y*res + z*res^2 when res^3 fits, else the
{1, 2654435761, 805459861} prime-XOR hash mod 2^S, feature-fastest storage)
— the layout the reference consumes via tcnn.Encoding
(/root/reference/adaptive_nerf/models/encodings.py:229-251). If either the
importer's slab placement or the encoder's tcnn_layout mode drifts from the
spec, parity fails here.
"""
from argparse import Namespace

import numpy as np
import pytest

import jax.numpy as jnp

from nerfsys_tpu.ops.encodings import (
    HashGridConfig,
    hash_grid_encode,
    hash_grid_encode_fused,
    tcnn_param_layout,
)
from nerfsys_tpu.scripts.convert_reference_checkpoint import (
    tcnn_table_from_blob,
)

# dense (4^3=64, 8^3=512) AND hashed (16^3, 32^3 > 2^9) levels
CFG = HashGridConfig(levels=4, min_res=4, max_res=32, log2_hashmap_size=9,
                     features_per_level=2, tcnn_layout=True)


def _tcnn_sim(blob: np.ndarray, cfg: HashGridConfig, pts: np.ndarray,
              smoothstep: bool = False) -> np.ndarray:
    """Independent numpy tcnn GridEncoding forward (see module docstring)."""
    L, F, S = cfg.levels, cfg.features_per_level, cfg.log2_hashmap_size
    out = np.zeros((len(pts), L * F), np.float64)
    offset = 0
    for lv in range(L):
        scale = np.float32(
            np.exp2(np.float32(lv) * np.float32(np.log2(cfg.growth_factor)))
            * np.float32(cfg.min_res) - np.float32(1.0))
        res = int(np.ceil(scale)) + 1
        n = min(res**3, 2**S)
        size = -(-n // 8) * 8
        level = blob[offset * F:(offset + size) * F].astype(
            np.float64).reshape(size, F)
        offset += size

        pos = pts.astype(np.float64) * float(scale) + 0.5
        c0 = np.floor(pos).astype(np.int64)
        w = pos - c0
        if smoothstep:
            w = w * w * (3.0 - 2.0 * w)
        acc = np.zeros((len(pts), F), np.float64)
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    cx = np.clip(c0[:, 0] + bx, 0, res - 1)
                    cy = np.clip(c0[:, 1] + by, 0, res - 1)
                    cz = np.clip(c0[:, 2] + bz, 0, res - 1)
                    if res**3 <= 2**S:
                        idx = cx + cy * res + cz * res * res
                    else:
                        idx = ((cx.astype(np.uint32) * np.uint32(1))
                               ^ (cy.astype(np.uint32)
                                  * np.uint32(2654435761))
                               ^ (cz.astype(np.uint32)
                                  * np.uint32(805459861))
                               ) % np.uint32(2**S)
                    wt = ((w[:, 0] if bx else 1 - w[:, 0])
                          * (w[:, 1] if by else 1 - w[:, 1])
                          * (w[:, 2] if bz else 1 - w[:, 2]))
                    acc += wt[:, None] * level[idx.astype(np.int64)]
        out[:, lv * F:(lv + 1) * F] = acc
    assert offset * F == blob.size
    return out


def _blob(cfg: HashGridConfig, seed: int = 0) -> np.ndarray:
    rows, padded, _ = tcnn_param_layout(cfg)
    gen = np.random.default_rng(seed)
    return gen.normal(size=int(padded.sum()) * cfg.features_per_level).astype(
        np.float32)


def test_layout_mixes_dense_and_hashed():
    rows, padded, offsets = tcnn_param_layout(CFG)
    assert list(CFG.level_dense_mask()) == [True, True, False, False]
    assert list(rows) == [64, 512, 512, 512]
    assert list(padded) == [64, 512, 512, 512]
    assert list(offsets) == [0, 64, 576, 1088]


def test_encoder_matches_tcnn_simulator():
    blob = _blob(CFG)
    table = jnp.asarray(tcnn_table_from_blob(blob, CFG))
    gen = np.random.default_rng(1)
    pts = gen.uniform(0.0, 0.999, (257, 3)).astype(np.float32)
    want = _tcnn_sim(blob, CFG, pts)

    got_plain = np.asarray(hash_grid_encode(table, jnp.asarray(pts), CFG))
    np.testing.assert_allclose(got_plain, want, atol=2e-4)
    got_fused = np.asarray(
        hash_grid_encode_fused(table, jnp.asarray(pts), CFG))
    np.testing.assert_allclose(got_fused, want, atol=2e-4)

    # smoothstep variant rides the same index math
    cfg_ss = HashGridConfig(**{**CFG.__dict__, "interpolation": "Smoothstep"})
    got_ss = np.asarray(hash_grid_encode(table, jnp.asarray(pts), cfg_ss))
    np.testing.assert_allclose(got_ss, _tcnn_sim(blob, CFG, pts, True),
                               atol=2e-4)


def test_floor_layout_unchanged_by_tcnn_support():
    """The default (floor) layout must be bit-identical to before the tcnn
    mode landed: scales are the integer resolutions, every level hashed."""
    cfg = HashGridConfig(levels=3, min_res=4, max_res=16,
                         log2_hashmap_size=8)
    assert not cfg.level_dense_mask().any()
    np.testing.assert_array_equal(cfg.level_scales(),
                                  cfg.level_resolutions().astype(np.float32))
    gen = np.random.default_rng(2)
    table = jnp.asarray(gen.normal(size=(3 * 256, 2)).astype(np.float32))
    pts = jnp.asarray(gen.uniform(0, 1, (64, 3)).astype(np.float32))
    a = np.asarray(hash_grid_encode(table, pts, cfg))
    b = np.asarray(hash_grid_encode_fused(table, pts, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_table_gradients_flow_in_tcnn_mode():
    import jax

    blob = _blob(CFG, 3)
    table = jnp.asarray(tcnn_table_from_blob(blob, CFG))
    pts = jnp.asarray(
        np.random.default_rng(4).uniform(0, 0.99, (32, 3)).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(hash_grid_encode_fused(t, pts, CFG) ** 2))(
        table)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_full_checkpoint_convert_e2e(tmp_path):
    """Reference tcnn checkpoint -> convert() -> native checkpoint whose
    encoder reproduces the tcnn simulator, with hash_tcnn_layout pinned."""
    torch = pytest.importorskip("torch")
    import jax

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.scripts.convert_reference_checkpoint import convert
    from nerfsys_tpu.utils.checkpoint import load_checkpoint
    from nerfsys_tpu.utils.config import load_checkpoint_cfg, parse_args

    stored = {
        "num_submodules": 2, "dim_hidden": 8, "sigma_depth": 1,
        "color_hidden": 8, "color_depth": 2, "log2_hashmap_size": 9,
        "high_levels": 4, "high_min_res": 4, "max_res": 32, "bg_hidden": 8,
    }
    P = parse_args([])
    for k, v in {**stored, "hash_tcnn_layout": True}.items():
        setattr(P, k, v)
    P.boundary_margin_effective = 1.0
    P.cluster_2d = True
    cfg = container_config_from_args(P)
    assert cfg.expert.hash.tcnn_layout

    gen = np.random.default_rng(5)
    e = cfg.expert
    state = {}
    blobs = []
    for k in range(cfg.num_experts):
        p = f"submodules.{k}."
        blob = _blob(e.hash, seed=10 + k)
        blobs.append(blob)
        state[p + "xyz_encoder._tcnn_enc.params"] = torch.tensor(blob)

        def lin(name, od, idim):
            state[f"{p}{name}.weight"] = torch.tensor(
                gen.normal(size=(od, idim)).astype(np.float32))
            state[f"{p}{name}.bias"] = torch.tensor(
                gen.normal(size=(od,)).astype(np.float32))

        last = e.xyz_enc_dim
        for i in range(e.sigma_depth):
            lin(f"sigma_trunk.{i}.linear", e.hidden, last)
            last = e.hidden
        lin("sigma_head", 1, last)
        lin("geo_head", e.geo_feat_dim, last)
        last = e.geo_feat_dim + e.dir_enc_dim
        for i in range(e.color_depth):
            lin(f"color_mlp.{i}.linear", e.color_hidden, last)
            last = e.color_hidden
        lin(f"color_mlp.{e.color_depth}", 3, last)

    state["bg_mlp.0.weight"] = torch.tensor(
        gen.normal(size=(cfg.bg_hidden, cfg.bg_enc_dim)).astype(np.float32))
    state["bg_mlp.0.bias"] = torch.tensor(
        gen.normal(size=(cfg.bg_hidden,)).astype(np.float32))
    state["bg_mlp.2.weight"] = torch.tensor(
        gen.normal(size=(3, cfg.bg_hidden)).astype(np.float32))
    state["bg_mlp.2.bias"] = torch.tensor(
        gen.normal(size=(3,)).astype(np.float32))

    ref_dir = tmp_path / "refrun"
    ref_dir.mkdir()
    torch.save(state, ref_dir / "best.model")
    torch.save(Namespace(**stored), ref_dir / "best.P")  # NO tcnn flag —
    # convert() must detect the tcnn keys and set it itself

    out = tmp_path / "converted"
    convert(ref_dir, "best", out)

    saved_cfg = load_checkpoint_cfg(out / "best.config.json")
    assert saved_cfg.get("hash_tcnn_layout") is True

    template = init_container_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = load_checkpoint(out, "best", template)
    pts = gen.uniform(0, 0.99, (65, 3)).astype(np.float32)
    for k in range(cfg.num_experts):
        got = np.asarray(hash_grid_encode(
            params["experts"]["hash_table"][k], jnp.asarray(pts),
            e.hash))
        np.testing.assert_allclose(got, _tcnn_sim(blobs[k], e.hash, pts),
                                   atol=2e-4)


def test_export_import_roundtrip_tcnn():
    """Native tcnn-layout params -> reference tcnn blob -> back: identity up
    to the blob's fp16 quantization on every row the encoder can address."""
    import jax

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.runner import container_config_from_args
    from nerfsys_tpu.scripts.convert_reference_checkpoint import (
        params_to_reference_state,
        reference_state_to_params,
    )
    from nerfsys_tpu.utils.config import parse_args

    pytest.importorskip("torch")
    P = parse_args([])
    for k, v in {
        "num_submodules": 2, "dim_hidden": 8, "sigma_depth": 1,
        "color_hidden": 8, "color_depth": 2, "log2_hashmap_size": 9,
        "high_levels": 4, "high_min_res": 4, "max_res": 32, "bg_hidden": 8,
        "hash_tcnn_layout": True,
    }.items():
        setattr(P, k, v)
    P.boundary_margin_effective = 1.0
    P.cluster_2d = True
    cfg = container_config_from_args(P)

    params = init_container_params(jax.random.PRNGKey(7), cfg)
    state = params_to_reference_state(params, cfg)
    assert "submodules.0.xyz_encoder._tcnn_enc.params" in state
    back, ignored = reference_state_to_params(state, cfg)
    assert ignored == []

    hcfg = cfg.expert.hash
    rows, _, _ = tcnn_param_layout(hcfg)
    T = hcfg.table_size
    orig = np.asarray(params["experts"]["hash_table"], np.float32)
    got = np.asarray(back["experts"]["hash_table"], np.float32)
    for lv in range(hcfg.levels):
        n = int(rows[lv])
        want = orig[:, lv * T: lv * T + n].astype(np.float16).astype(
            np.float32)
        np.testing.assert_array_equal(got[:, lv * T: lv * T + n], want)
