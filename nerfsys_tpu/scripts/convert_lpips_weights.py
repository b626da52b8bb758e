"""Convert pretrained LPIPS(AlexNet) torch checkpoints to the .npz pytree
consumed by nerfsys_tpu.utils.metrics (set NERFSYS_LPIPS_WEIGHTS to the
output path to activate LPIPS in `--op eval`).

The reference computes LPIPS with the `lpips` package's pretrained AlexNet
(/root/reference/adaptive_nerf/pipelines/online_stage/runtime_adapt.py:111).
That package splits the weights across two artifacts:

  1. the AlexNet trunk — torchvision's `alexnet` ImageNet checkpoint
     (keys `features.{0,3,6,8,10}.{weight,bias}`, conv layout OIHW), and
  2. the per-stage linear heads — `lpips/weights/v0.1/alex.pth`
     (keys `lin{i}.model.1.weight`, shape (1, C, 1, 1)).

This tool accepts either both files or a single merged state dict (e.g. a
full `lpips.LPIPS` module save, whose trunk keys look like
`net.slice{k}.{j}.weight`), and emits an .npz with keys

    conv{i}/w  (kh, kw, cin, cout)   i in 0..4   (HWIO, transposed here)
    conv{i}/b  (cout,)
    lin{i}/w   (1, 1, C, 1)

Usage:
    python -m nerfsys_tpu.scripts.convert_lpips_weights \
        --alexnet alexnet-owt-7be5be79.pth --lins alex.pth --out lpips_alex.npz
    python -m nerfsys_tpu.scripts.convert_lpips_weights \
        --merged full_lpips_module.pth --out lpips_alex.npz
    # random-weight smoke artifact (pipeline testing only, NOT pretrained):
    python -m nerfsys_tpu.scripts.convert_lpips_weights --selftest --out t.npz

No network access is required or attempted.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision AlexNet conv layer indices inside `features`
_TV_CONV_IDX = [0, 3, 6, 8, 10]
# lpips's AlexNet wrapper slices `features` into slice1..5 over index ranges
# [0,2) [2,5) [5,8) [8,10) [10,12) using add_module(str(x), features[x]) —
# which PRESERVES the original torchvision indices, so the conv keys are
# net.slice{k}.{orig_idx}.weight
_SLICE_CONV_KEYS = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
# defensive fallback: per-slice REindexed keys, in case a save was made from
# a wrapper that renumbered children from 0
_SLICE_CONV_KEYS_REIDX = [(1, 0), (2, 2), (3, 1), (4, 0), (5, 0)]
_STAGE_CH = [64, 192, 384, 256, 256]


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _find(sd, candidates):
    for k in candidates:
        if k in sd:
            return _to_numpy(sd[k])
    return None


def extract_convs(sd) -> list:
    """Pull the 5 AlexNet conv (w OIHW, b) pairs from a state dict with
    torchvision (`features.N.*`), prefixed, or lpips-sliced key styles."""
    convs = []
    for i, tv_idx in enumerate(_TV_CONV_IDX):
        sk, sj = _SLICE_CONV_KEYS[i]
        _, rj = _SLICE_CONV_KEYS_REIDX[i]
        w = _find(sd, [
            f"features.{tv_idx}.weight",
            f"net.features.{tv_idx}.weight",
            f"net.slice{sk}.{sj}.weight",
            f"slice{sk}.{sj}.weight",
            f"net.slice{sk}.{rj}.weight",
            f"slice{sk}.{rj}.weight",
        ])
        b = _find(sd, [
            f"features.{tv_idx}.bias",
            f"net.features.{tv_idx}.bias",
            f"net.slice{sk}.{sj}.bias",
            f"slice{sk}.{sj}.bias",
            f"net.slice{sk}.{rj}.bias",
            f"slice{sk}.{rj}.bias",
        ])
        if w is None or b is None:
            raise KeyError(
                f"conv{i}: no weight/bias under any known key style "
                f"(tried features.{tv_idx}.*, net.slice{sk}.{sj}.*)"
            )
        if w.shape[0] != _STAGE_CH[i]:
            raise ValueError(
                f"conv{i}: expected {_STAGE_CH[i]} out channels, got "
                f"{w.shape[0]} — wrong checkpoint?"
            )
        convs.append((w, b))
    return convs


def extract_lins(sd) -> list:
    """Pull the 5 LPIPS linear-head weights (1, C, 1, 1)."""
    lins = []
    for i, c in enumerate(_STAGE_CH):
        w = _find(sd, [
            f"lin{i}.model.1.weight",
            f"lins.{i}.model.1.weight",
            f"lin{i}.weight",
        ])
        if w is None:
            raise KeyError(f"lin{i}: no weight under any known key style")
        if w.shape[1] != c:
            raise ValueError(
                f"lin{i}: expected {c} channels, got {w.shape[1]}"
            )
        lins.append(w)
    return lins


def assemble_npz(convs, lins) -> dict:
    """(OIHW conv, (1,C,1,1) lin) lists -> flat npz dict in metrics layout."""
    out = {}
    for i, (w, b) in enumerate(convs):
        out[f"conv{i}/w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"conv{i}/b"] = b.astype(np.float32)
    for i, w in enumerate(lins):
        # lpips clamps trained lin weights to >= 0 at inference
        out[f"lin{i}/w"] = np.maximum(w, 0.0).reshape(
            1, 1, w.shape[1], 1
        ).astype(np.float32)
    return out


def random_weights(seed: int = 0) -> dict:
    """Random-weight artifact for pipeline smoke tests (NOT pretrained)."""
    rng = np.random.default_rng(seed)
    convs, lins = [], []
    cin = 3
    for i, (cout, k) in enumerate(zip(_STAGE_CH, [11, 5, 3, 3, 3])):
        convs.append((
            rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32),
            np.zeros(cout, np.float32),
        ))
        lins.append(rng.uniform(0, 1, (1, cout, 1, 1)).astype(np.float32))
        cin = cout
    return assemble_npz(convs, lins)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--alexnet", help="torchvision alexnet .pth (trunk)")
    ap.add_argument("--lins", help="lpips v0.1 alex.pth (linear heads)")
    ap.add_argument("--merged", help="single state dict holding trunk + lins")
    ap.add_argument("--selftest", action="store_true",
                    help="emit RANDOM weights (pipeline testing only)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    if args.selftest:
        arrs = random_weights()
    else:
        import torch  # CPU build is sufficient

        def load(p):
            sd = torch.load(p, map_location="cpu", weights_only=True)
            return sd.get("state_dict", sd) if isinstance(sd, dict) else sd

        if args.merged:
            sd = load(args.merged)
            arrs = assemble_npz(extract_convs(sd), extract_lins(sd))
        elif args.alexnet and args.lins:
            arrs = assemble_npz(extract_convs(load(args.alexnet)),
                                extract_lins(load(args.lins)))
        else:
            ap.error("provide --merged, or both --alexnet and --lins, "
                     "or --selftest")

    np.savez(args.out, **arrs)
    total = sum(a.size for a in arrs.values())
    print(f"wrote {args.out}: {len(arrs)} arrays, {total / 1e6:.2f}M params")
    print("activate with: export NERFSYS_LPIPS_WEIGHTS=" + args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
