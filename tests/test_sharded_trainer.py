"""Sharded meta-training over the 8-virtual-device CPU mesh: the REAL
trainer loop with params/batches placed by parallel/mesh.py shardings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    init_container_params,
    param_group_labels,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.encodings import HashGridConfig
from nerfsys_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from nerfsys_tpu.pipelines.offline.meta_core import MetaConfig
from nerfsys_tpu.pipelines.offline.meta_train_step import (
    make_eval_step,
    make_train_step,
)
from nerfsys_tpu.pipelines.offline.trainer import meta_trainer
from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

K, B, S, Q = 2, 2, 32, 16


def _setup():
    expert = NGPConfig(
        hidden=16, sigma_depth=1, color_hidden=16, color_depth=1,
        geo_feat_dim=7,
        hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                            log2_hashmap_size=8),
    )
    cfg = ContainerConfig(num_experts=K, expert=expert, bg_hidden=8)
    cents = jnp.array([[0.0, -1, 0], [0.0, 1, 0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    statics = ContainerStatics(cents, boxes,
                               jnp.array([[-3.0, -3, -3], [3, 3, 3]]))
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    return cfg, statics, params


class _Batches:
    def __init__(self, mesh):
        self.mesh = mesh
        self.rng = np.random.default_rng(0)

    def __iter__(self):
        while True:
            def rays(n):
                o = self.rng.normal(size=(K, B, n, 3)).astype(np.float32) * 0.1
                d = np.tile(np.array([0.0, 0, -1.0], np.float32),
                            (K, B, n, 1))
                nf = np.tile(np.array([0.5, 2.0], np.float32), (K, B, n, 1))
                return np.concatenate([o, d, nf], -1)

            batch = {
                "support_rays": rays(S),
                "support_rgbs": self.rng.uniform(size=(K, B, S, 3)).astype(
                    np.float32),
                "query_rays": rays(Q),
                "query_rgbs": self.rng.uniform(size=(K, B, Q, 3)).astype(
                    np.float32),
                "valid": np.ones((K, B), np.float32),
            }
            yield shard_batch(batch, self.mesh)


@pytest.mark.parametrize("mesh_spec", ["8", "4x2"])
def test_sharded_meta_trainer_runs(mesh_spec, tmp_path):
    cfg, statics, params = _setup()
    mesh = make_mesh(mesh_spec)
    shard_experts = mesh.shape["expert"] > 1
    params = shard_params(params, mesh, shard_experts=shard_experts)

    meta = MetaConfig(algo="fomaml", inner_iter=1, inner_lr=0.05,
                      expert_map=not shard_experts,
                      ray_samples=8)
    tx = build_optimizer(OptimConfig(outer_steps=10),
                         param_group_labels(params))
    opt_state = jax.device_put(
        tx.init(params),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    step = make_train_step(meta, cfg, tx)
    ev = make_eval_step(meta, cfg, tto=1)

    out_params, out_opt, best = meta_trainer(
        params=params, opt_state=opt_state, train_step=step, eval_step=ev,
        statics=statics, train_loader=_Batches(mesh),
        eval_loader=_Batches(mesh), outer_steps=3, eval_every=2,
        save_every=0, run_dir=tmp_path, seed=0,
    )
    assert np.isfinite(best)
    # params actually updated and stayed sharded-compatible
    assert not np.allclose(
        np.asarray(out_params["experts"]["sigma_head"]["w"]),
        np.asarray(params["experts"]["sigma_head"]["w"]),
    )
