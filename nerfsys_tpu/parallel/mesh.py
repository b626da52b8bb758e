"""Device mesh construction and sharding specs for the meta-training step.

The reference is a single-GPU trainer with DP scaffolding left off
(SURVEY.md §2.11). The TPU build makes data parallelism first-class and
psum-free by construction: per-ray work is independent, so the episode
batch's RAY axes (S for support, Q for query) shard across the 'data' mesh
axis, params stay replicated, and the only cross-device communication is the
gradient/loss reduction XLA inserts automatically for the replicated params.

Mesh axes:
  data   -- shards ray axes of every task (always useful)
  expert -- optionally shards the stacked expert axis K (expert parallelism);
            useful once K outgrows one chip's HBM.

All sharding goes through jax.sharding.NamedSharding so the same jitted step
runs single-chip (trivial mesh) or multi-chip without code changes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: Optional[str], n_devices: int) -> Tuple[int, int]:
    """'4' -> (4, 1) data-only; '2x2' -> (2 data, 2 expert); None -> all data."""
    if not spec:
        return (n_devices, 1)
    parts = [int(p) for p in str(spec).lower().split("x")]
    if len(parts) == 1:
        return (parts[0], 1)
    if len(parts) == 2:
        return (parts[0], parts[1])
    raise ValueError(f"mesh_shape must be 'D' or 'DxE', got {spec!r}")


def make_mesh(
    mesh_shape: Optional[str] = None, devices=None
) -> Mesh:
    """Build a ('data', 'expert') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    d, e = parse_mesh_shape(mesh_shape, len(devices))
    if d * e != len(devices):
        raise ValueError(f"mesh {d}x{e} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(d, e)
    return Mesh(arr, axis_names=("data", "expert"))


def maybe_render_mesh(P) -> Optional[Mesh]:
    """Mesh for sharded full-frame rendering (eval/video/viewer): rays shard
    over 'data' (make_chunk_renderer) when --mesh_shape is set and more than
    one device is visible. Single device: None (plain jit). Multi-HOST
    render is not supported: render_image feeds host-local chunks and
    fetches numpy frames, which cannot span non-addressable devices — each
    process renders its own frames instead."""
    if not getattr(P, "mesh_shape", None) or jax.device_count() == 1:
        return None
    if jax.process_count() > 1:
        print("[mesh] sharded rendering skipped: multi-host run "
              "(frames are process-local)")
        return None
    mesh = make_mesh(P.mesh_shape)
    print(f"[mesh] sharded rendering over {dict(mesh.shape)}")
    return mesh


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Episode-batch shardings: shard the per-task RAY axis on 'data'.

    Batch layout (see data/loaders.MetaBatcher):
      support_rays (K, B, S, 8), support_rgbs (K, B, S, 3),
      query_rays (K, B, Q, 8),  query_rgbs (K, B, Q, 3), valid (K, B).
    The expert axis K shards on 'expert' when that mesh axis is > 1.
    """
    ray = NamedSharding(mesh, P("expert", None, "data", None))
    kb = NamedSharding(mesh, P("expert", None))
    return {
        "support_rays": ray,
        "support_rgbs": ray,
        "query_rays": ray,
        "query_rgbs": ray,
        "valid": kb,
    }


def ray_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Plain (N, ...) ray batches shard N on 'data' (runtime adaptation)."""
    return NamedSharding(mesh, P("data", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def expert_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked expert params: shard leading K axis on 'expert'."""
    return NamedSharding(mesh, P("expert"))


def shard_params(params, mesh: Mesh, shard_experts: bool = False):
    """Place params: replicated, or expert-stacked leaves sharded on 'expert'."""
    rep = replicated(mesh)
    if not shard_experts or mesh.shape.get("expert", 1) == 1:
        return jax.device_put(params, rep)
    es = expert_sharding(mesh)
    out = dict(params)
    out["experts"] = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, es), params["experts"]
    )
    if "bg" in params:
        out["bg"] = jax.device_put(params["bg"], rep)
    return out


def shard_batch(batch, mesh: Mesh):
    """Place an episode batch with ray axes sharded over 'data'."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
