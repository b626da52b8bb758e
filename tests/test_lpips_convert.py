"""LPIPS weight conversion: torch-checkpoint key styles -> npz -> metric."""
import numpy as np
import pytest

from nerfsys_tpu.scripts.convert_lpips_weights import (
    _STAGE_CH,
    _TV_CONV_IDX,
    assemble_npz,
    extract_convs,
    extract_lins,
    random_weights,
)


def _fake_trunk_tv():
    """torchvision-style alexnet state dict (numpy stands in for tensors)."""
    rng = np.random.default_rng(0)
    sd, cin = {}, 3
    for i, (idx, cout, k) in enumerate(
        zip(_TV_CONV_IDX, _STAGE_CH, [11, 5, 3, 3, 3])
    ):
        sd[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (cout, cin, k, k)
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(0, 0.01, cout).astype(
            np.float32
        )
        cin = cout
    return sd


def _fake_lins():
    rng = np.random.default_rng(1)
    return {
        f"lin{i}.model.1.weight": rng.uniform(-0.2, 1, (1, c, 1, 1)).astype(
            np.float32
        )
        for i, c in enumerate(_STAGE_CH)
    }


def test_extract_and_assemble_tv_style():
    convs = extract_convs(_fake_trunk_tv())
    lins = extract_lins(_fake_lins())
    arrs = assemble_npz(convs, lins)
    assert arrs["conv0/w"].shape == (11, 11, 3, 64)  # OIHW -> HWIO
    assert arrs["conv4/w"].shape == (3, 3, 256, 256)
    assert arrs["lin1/w"].shape == (1, 1, 192, 1)
    assert (arrs["lin0/w"] >= 0).all()  # inference-time clamp


def _slice_of(idx):
    """Slice number for a torchvision `features` index, derived from the
    lpips package's own slicing loops (pretrained_networks.py alexnet:
    slice1=[0,2), slice2=[2,5), slice3=[5,8), slice4=[8,10), slice5=[10,12);
    add_module(str(x), ...) preserves the original index as the child name).
    Independent of the converter's key table on purpose."""
    for sk, (lo, hi) in enumerate([(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)],
                                  start=1):
        if lo <= idx < hi:
            return sk
    raise AssertionError(idx)


def test_extract_sliced_style():
    """lpips full-module saves use net.slice{k}.{orig_tv_idx}.* trunk keys."""
    tv = _fake_trunk_tv()
    sliced = {}
    for idx in _TV_CONV_IDX:
        sk = _slice_of(idx)
        sliced[f"net.slice{sk}.{idx}.weight"] = tv[f"features.{idx}.weight"]
        sliced[f"net.slice{sk}.{idx}.bias"] = tv[f"features.{idx}.bias"]
    convs = extract_convs(sliced)
    for (w_a, b_a), idx in zip(convs, _TV_CONV_IDX):
        np.testing.assert_array_equal(w_a, tv[f"features.{idx}.weight"])


def test_extract_sliced_reindexed_fallback():
    """Saves whose slices renumber children from 0 still extract."""
    tv = _fake_trunk_tv()
    from nerfsys_tpu.scripts.convert_lpips_weights import (
        _SLICE_CONV_KEYS_REIDX,
    )

    sliced = {}
    for i, idx in enumerate(_TV_CONV_IDX):
        sk, sj = _SLICE_CONV_KEYS_REIDX[i]
        sliced[f"net.slice{sk}.{sj}.weight"] = tv[f"features.{idx}.weight"]
        sliced[f"net.slice{sk}.{sj}.bias"] = tv[f"features.{idx}.bias"]
    convs = extract_convs(sliced)
    for (w_a, _), idx in zip(convs, _TV_CONV_IDX):
        np.testing.assert_array_equal(w_a, tv[f"features.{idx}.weight"])


def test_wrong_channel_count_rejected():
    sd = _fake_trunk_tv()
    sd["features.0.weight"] = sd["features.0.weight"][:32]
    with pytest.raises(ValueError, match="out channels"):
        extract_convs(sd)


def test_npz_roundtrip_drives_lpips_metric(tmp_path):
    """CLI-written npz loads through metrics and behaves like a distance."""
    from nerfsys_tpu.scripts.convert_lpips_weights import main
    from nerfsys_tpu.utils.metrics import load_lpips_weights, lpips

    out = tmp_path / "w.npz"
    assert main(["--selftest", "--out", str(out)]) == 0
    weights = load_lpips_weights(str(out))
    assert weights is not None and "conv0" in weights and "lin4" in weights

    rng = np.random.default_rng(2)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    d_same = float(lpips(a, a, weights=weights))
    d_diff = float(lpips(a, b, weights=weights))
    assert abs(d_same) < 1e-6
    assert d_diff > 1e-4 and np.isfinite(d_diff)


def test_random_weights_layout_matches_metrics_contract():
    arrs = random_weights()
    assert set(arrs) == {
        f"conv{i}/{leaf}" for i in range(5) for leaf in ("w", "b")
    } | {f"lin{i}/w" for i in range(5)}
