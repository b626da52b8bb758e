"""Two-process jax.distributed smoke over a local coordinator.

Validates parallel/distributed.py beyond its single-process fallbacks: a
real 2-process cluster (CPU backend, 2 virtual devices per process) runs
rank-strided splits, host-scalar reductions, host-0 broadcast, and a psum
over the global mesh — the collectives the sharded create_clusters and
metric sync paths rely on (reference NCCL usage:
/root/reference/scripts/create_clusters.py:224-238,897-932).
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfsys_tpu.parallel.distributed import (
        all_reduce_host_scalars, broadcast_from_host0, local_stride,
        maybe_initialize, process_info,
    )

    active = maybe_initialize()
    rank, world = process_info()
    out = {"active": bool(active), "rank": rank, "world": world}

    out["stride"] = local_stride(7).tolist()
    out["reduced"] = all_reduce_host_scalars({"a": rank + 1.0, "b": 10.0})
    out["reduced_max"] = all_reduce_host_scalars({"a": rank + 1.0}, op="max")
    tree = {"w": jnp.full((3,), float(rank))}
    out["bcast"] = np.asarray(broadcast_from_host0(tree)["w"]).tolist()

    # cross-host psum over the global mesh (2 procs x 2 local devices).
    # device_put of a sharded GLOBAL array requires the same value on every
    # process; each device then holds its shard and psum rides the mesh.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("d",))
    n_dev = len(jax.devices())
    xs = jax.device_put(
        jnp.arange(float(n_dev * 2)), NamedSharding(mesh, P("d"))
    )
    total = jax.shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "d"),
        mesh=mesh, in_specs=P("d"), out_specs=P(),
    )(xs)
    out["psum"] = float(np.asarray(total))
    out["n_dev"] = n_dev

    print("RESULT" + json.dumps(out))
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    port = _free_port()
    procs, outs = [], []
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    for rank in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            # repo root ONLY: inheriting the parent's PYTHONPATH can pull in
            # the axon TPU site dir, whose site hook forces the axon platform
            # and breaks the CPU multi-process cluster
            PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    for p in procs:
        out, _ = p.communicate(timeout=390)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        r = json.loads(line[len("RESULT"):])
        results[r["rank"]] = r

    assert set(results) == {0, 1}, f"bad ranks; raw outputs: {outs}"
    for r in results.values():
        assert r["active"] and r["world"] == 2
        # sum over {rank+1} = 1 + 2; max = 2; 'b' summed across hosts
        assert r["reduced"] == {"a": 3.0, "b": 20.0}
        assert r["reduced_max"] == {"a": 2.0}
        assert r["bcast"] == [0.0, 0.0, 0.0]  # host-0's tree everywhere
        # sum of the global iota (0..2*n_dev-1) reduced over the mesh
        n = r["n_dev"] * 2
        assert r["psum"] == n * (n - 1) / 2
        assert r["n_dev"] == 4  # 2 procs x 2 local virtual devices
    # rank-strided split covers 0..6 disjointly
    s0, s1 = results[0]["stride"], results[1]["stride"]
    assert sorted(s0 + s1) == list(range(7))
    assert not set(s0) & set(s1)


# ------------------- multi-host episode input sharding -----------------------
_INPUT_WORKER = textwrap.dedent(
    """
    import json, os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfsys_tpu.parallel.distributed import maybe_initialize
    active = maybe_initialize()
    assert active and jax.device_count() == 4

    from nerfsys_tpu.data.loaders import MetaBatcher, MultiHostBatcher
    from nerfsys_tpu.data.task_dataset import TaskDataset
    from nerfsys_tpu.parallel.mesh import make_mesh

    class FakeRam:
        def __init__(self, seed):
            rng = np.random.default_rng(seed)
            n_img, per = 8, 400
            o = np.array([0.5, 1.0, 4.0], np.float32)
            rays, imgs = [], []
            for i in range(n_img):
                tgt = rng.uniform([0.2, 0.3, 0.3], [0.8, 1.7, 1.7],
                                  (per, 3)).astype(np.float32)
                d = tgt - o
                d /= np.linalg.norm(d, axis=1, keepdims=True)
                nf = np.tile(np.array([1.0, 6.0], np.float32), (per, 1))
                rays.append(np.concatenate(
                    [np.tile(o, (per, 1)), d, nf], 1).astype(np.float32))
                imgs.append(np.full(per, i, np.int64))
            self.rays = np.concatenate(rays)
            self.rgbs = rng.uniform(
                size=(len(self.rays), 3)).astype(np.float32)
            self.img_indices = np.concatenate(imgs)
        def __len__(self):
            return len(self.rays)

    AABB = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]], np.float32)

    def make_tds():
        # identical seeds on every process -> identical episode plans
        return [TaskDataset(FakeRam(7 + k), AABB, support_rays=64,
                            query_rays=32, cell_dim=2, seed=100 + k,
                            min_rays_per_cell=10)
                for k in range(2)]

    mesh = make_mesh("2x2")  # (data=2, expert=2) over 4 global devices

    # reference full batch from a fresh identically-seeded batcher
    full = MetaBatcher(make_tds(), batch_size=2).next_batch()

    mh = MultiHostBatcher(MetaBatcher(make_tds(), batch_size=2), mesh)
    batch = mh.next_batch()

    # every addressable shard must equal the corresponding slice of the
    # full batch -> global assembly is correct without any process having
    # built the full arrays
    mismatches = 0
    for name, arr in batch.items():
        for shard in arr.addressable_shards:
            want = full[name][shard.index]
            if not np.allclose(np.asarray(shard.data), want):
                mismatches += 1

    # and the sharded batch must execute under jit on the global mesh
    total = float(jax.jit(
        lambda b: jnp.sum(b["support_rays"]) + jnp.sum(b["valid"])
    )(batch))
    want_total = float(np.sum(full["support_rays"]) + np.sum(full["valid"]))

    out = {
        "rank": jax.process_index(),
        "mismatches": mismatches,
        "total_ok": bool(abs(total - want_total) < 1e-2 * abs(want_total)),
    }
    print("RESULT" + json.dumps(out))
    """
)


def test_multihost_episode_input_sharding(tmp_path):
    """Each process uploads only its addressable episode stripes; the
    assembled global batch matches the single-process full batch."""
    port = _free_port()
    procs, outs = [], []
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    for rank in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _INPUT_WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=390)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        r = json.loads(line[len("RESULT"):])
        results[r["rank"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["mismatches"] == 0
        assert r["total_ok"]
