"""Reference-checkpoint importer: torch MetaContainer state_dict -> params.

Key names in the synthetic fixtures are written out LITERALLY from the
reference sources (meta_ngp.py:52-97, meta_vanilla.py:69-94,
meta_container.py:86-92, metamodule.py:129-193) — independent of the
converter's own tables — so a naming drift in the converter fails here.
"""
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerfsys_tpu.runner import container_config_from_args  # noqa: E402
from nerfsys_tpu.scripts.convert_reference_checkpoint import (  # noqa: E402
    convert,
    reference_state_to_params,
)
from nerfsys_tpu.utils.config import parse_args  # noqa: E402

STORED = {
    "num_submodules": 2,
    "dim_hidden": 8,
    "sigma_depth": 1,
    "color_hidden": 8,
    "color_depth": 2,
    "log2_hashmap_size": 6,
    "high_levels": 2,
    "high_min_res": 4,
    "max_res": 8,
    "bg_hidden": 8,
}


def _cfg(extra=None):
    P = parse_args([])
    for k, v in {**STORED, **(extra or {})}.items():
        setattr(P, k, v)
    P.boundary_margin_effective = max(1.0, float(getattr(P, "bm", 1.0)))
    P.cluster_2d = True
    return container_config_from_args(P), P


def _lin(state, name, out_d, in_d, gen):
    state[f"{name}.weight"] = torch.tensor(
        gen.normal(size=(out_d, in_d)).astype(np.float32))
    state[f"{name}.bias"] = torch.tensor(
        gen.normal(size=(out_d,)).astype(np.float32))


def _make_ngp_state(cfg, gen):
    """Reference MetaContainer state_dict, torch-fallback hash encoders."""
    e = cfg.expert
    state = {}
    for k in range(cfg.num_experts):
        p = f"submodules.{k}."
        state[p + "xyz_encoder.hash_table"] = torch.tensor(gen.normal(size=(
            e.hash.table_size * e.hash.levels, e.hash.features_per_level,
        )).astype(np.float32))
        last = e.xyz_enc_dim
        for i in range(e.sigma_depth):
            _lin(state, p + f"sigma_trunk.{i}.linear", e.hidden, last, gen)
            last = e.hidden
        _lin(state, p + "sigma_head", 1, last, gen)
        _lin(state, p + "geo_head", e.geo_feat_dim, last, gen)
        last = e.geo_feat_dim + e.dir_enc_dim
        for i in range(e.color_depth):
            _lin(state, p + f"color_mlp.{i}.linear", e.color_hidden, last,
                 gen)
            last = e.color_hidden
        _lin(state, p + f"color_mlp.{e.color_depth}", 3, last, gen)
        # buffers + nerfacc occ state the converter must skip, not choke on
        state[p + "occ_grid.occs"] = torch.zeros(8)
        state[p + "occ_grid.binaries"] = torch.zeros(1, 2, 2, 2).bool()
    state["centroids"] = torch.zeros(cfg.num_experts, 3)
    state["aabb"] = torch.zeros(2, 3)
    _lin(state, "bg_mlp.0", cfg.bg_hidden, cfg.bg_enc_dim, gen)
    _lin(state, "bg_mlp.2", 3, cfg.bg_hidden, gen)
    return state


def test_ngp_state_maps_onto_params():
    cfg, _ = _cfg()
    gen = np.random.default_rng(0)
    state = _make_ngp_state(cfg, gen)
    params, ignored = reference_state_to_params(state, cfg)

    # every learnable tensor consumed; buffers/occ reported as ignored
    assert set(ignored) == {
        "centroids", "aabb",
        "submodules.0.occ_grid.occs", "submodules.0.occ_grid.binaries",
        "submodules.1.occ_grid.occs", "submodules.1.occ_grid.binaries",
    }

    e = params["experts"]
    K = cfg.num_experts
    assert e["hash_table"].shape == (
        K, cfg.expert.hash.table_size * cfg.expert.hash.levels,
        cfg.expert.hash.features_per_level)
    np.testing.assert_array_equal(
        np.asarray(e["hash_table"])[1],
        state["submodules.1.xyz_encoder.hash_table"].numpy())
    # weights transpose (torch (out, in) -> ours (in, out))
    np.testing.assert_array_equal(
        np.asarray(e["sigma_trunk"][0]["w"])[0],
        state["submodules.0.sigma_trunk.0.linear.weight"].numpy().T)
    np.testing.assert_array_equal(
        np.asarray(e["color_mlp"][-1]["w"])[1],
        state[f"submodules.1.color_mlp.{cfg.expert.color_depth}.weight"]
        .numpy().T)
    np.testing.assert_array_equal(
        np.asarray(params["bg"]["l0"]["b"]),
        state["bg_mlp.0.bias"].numpy())

    # structural match against a fresh init (same treedef + shapes)
    import jax
    from jax import tree_util

    from nerfsys_tpu.models.container import init_container_params

    ref = init_container_params(jax.random.PRNGKey(0), cfg)
    assert (tree_util.tree_structure(ref) == tree_util.tree_structure(params))
    for a, b in zip(tree_util.tree_leaves(ref), tree_util.tree_leaves(params)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_converted_params_run_the_container():
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import ContainerStatics, container_apply

    cfg, _ = _cfg()
    gen = np.random.default_rng(1)
    params, _ = reference_state_to_params(_make_ngp_state(cfg, gen), cfg)
    cents = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    boxes = jnp.stack([jnp.stack([c - 1.2, c + 1.2]) for c in cents])
    st = ContainerStatics(cents, boxes, jnp.asarray([[-2.5] * 3, [2.5] * 3]))
    pts = jnp.asarray(gen.uniform(-1, 1, (64, 3)).astype(np.float32))
    dirs = jnp.asarray(gen.normal(size=(64, 3)).astype(np.float32))
    rgb, sigma = container_apply(params, cfg, st, pts, dirs)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(sigma)).all()


def test_vanilla_state_maps_onto_params():
    cfg, _ = _cfg({"nerf_variant": "vanilla", "sigma_depth": 3})
    e = cfg.expert
    gen = np.random.default_rng(2)
    state = {}
    for k in range(cfg.num_experts):
        p = f"submodules.{k}."
        last = e.xyz_enc_dim
        for i in range(e.sigma_depth):
            in_dim = e.xyz_enc_dim if i == 0 else e.hidden
            if i in e.skips and i != 0:
                in_dim = e.hidden + e.xyz_enc_dim
            _lin(state, p + f"trunk.{i}.linear", e.hidden, in_dim, gen)
        _lin(state, p + "sigma_head", 1, e.hidden, gen)
        _lin(state, p + "geo_head", e.geo_feat_dim, e.hidden, gen)
        for l in range(e.color_depth - 1):
            in_dim = (e.geo_feat_dim + e.dir_enc_dim) if l == 0 \
                else e.color_hidden
            _lin(state, p + f"color_mlp.layer{l}.linear", e.color_hidden,
                 in_dim, gen)
        last_in = (e.geo_feat_dim + e.dir_enc_dim) if e.color_depth == 1 \
            else e.color_hidden
        _lin(state, p + "color_mlp.color_out", 3, last_in, gen)
    _lin(state, "bg_mlp.0", cfg.bg_hidden, cfg.bg_enc_dim, gen)
    _lin(state, "bg_mlp.2", 3, cfg.bg_hidden, gen)

    params, ignored = reference_state_to_params(state, cfg)
    assert ignored == []

    import jax
    from jax import tree_util

    from nerfsys_tpu.models.container import init_container_params

    ref = init_container_params(jax.random.PRNGKey(0), cfg)
    assert (tree_util.tree_structure(ref) == tree_util.tree_structure(params))
    np.testing.assert_array_equal(
        np.asarray(params["experts"]["trunk"][2]["w"])[0],
        state["submodules.0.trunk.2.linear.weight"].numpy().T)


def test_tcnn_state_needs_tcnn_layout_cfg():
    """Calling the low-level mapper on a tcnn state dict WITHOUT flipping
    the config into tcnn layout must fail loudly (convert() flips it
    automatically; tests/test_tcnn_import.py covers the working path)."""
    cfg, _ = _cfg()  # hash_tcnn_layout defaults off
    state = {"submodules.0.xyz_encoder._tcnn_enc.params": torch.zeros(128)}
    with pytest.raises(ValueError, match="hash_tcnn_layout"):
        reference_state_to_params(state, cfg)


def test_export_import_roundtrip_identity():
    """params -> reference state -> params is the identity (both variants),
    so the two mappings are mutual inverses."""
    import jax
    from jax import tree_util

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.scripts.convert_reference_checkpoint import (
        params_to_reference_state,
    )

    for extra in ({}, {"nerf_variant": "vanilla", "sigma_depth": 3}):
        cfg, _ = _cfg(extra)
        params = init_container_params(jax.random.PRNGKey(5), cfg)
        state = params_to_reference_state(params, cfg)
        back, ignored = reference_state_to_params(state, cfg)
        assert ignored == []
        assert (tree_util.tree_structure(back)
                == tree_util.tree_structure(params))
        for a, b in zip(tree_util.tree_leaves(params),
                        tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_rejects_planes_encoder():
    import jax

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.scripts.convert_reference_checkpoint import (
        params_to_reference_state,
    )

    cfg, _ = _cfg({"xyz_encoding": "planes"})
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError, match="planes"):
        params_to_reference_state(params, cfg)


def test_export_cli_writes_reference_files(tmp_path):
    import jax

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.scripts.convert_reference_checkpoint import export
    from nerfsys_tpu.utils.checkpoint import save_checkpoint

    cfg, _ = _cfg()
    params = init_container_params(jax.random.PRNGKey(6), cfg)
    native = tmp_path / "native"
    save_checkpoint(native, "best", params, config=dict(STORED))

    out = tmp_path / "exported"
    export(native, "best", out)
    state = torch.load(out / "best.model", weights_only=True)
    assert "submodules.1.xyz_encoder.hash_table" in state
    assert "bg_mlp.2.bias" in state
    np.testing.assert_array_equal(
        state["submodules.0.sigma_head.weight"].numpy().T,
        np.asarray(params["experts"]["sigma_head"]["w"][0]))
    P = torch.load(out / "best.P", weights_only=False)
    assert P.num_submodules == 2


def test_cli_roundtrip_via_runner_loader(tmp_path):
    """convert() writes a checkpoint our load_checkpoint restores exactly,
    with the reference .P as the config source."""
    import jax
    from jax import tree_util

    from nerfsys_tpu.models.container import init_container_params
    from nerfsys_tpu.utils.checkpoint import load_checkpoint

    cfg, P = _cfg()
    gen = np.random.default_rng(3)
    state = _make_ngp_state(cfg, gen)
    ref_dir = tmp_path / "refrun"
    ref_dir.mkdir()
    torch.save(state, ref_dir / "best.model")
    torch.save(Namespace(**STORED), ref_dir / "best.P")

    out = tmp_path / "converted"
    convert(ref_dir, "best", out)

    template = init_container_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = load_checkpoint(out, "best", template)
    want, _ = reference_state_to_params(state, cfg)
    for a, b in zip(tree_util.tree_leaves(want),
                    tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
