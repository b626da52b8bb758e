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
