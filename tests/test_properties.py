"""Property tests: routing-weight invariants and occupancy-sampling geometry.

Randomized checks of contracts the renderers silently rely on (reference
semantics: meta_container.py:97-134 routing, nerfacc sampling guarantees):

  routing:  rows sum to 1, non-negative, support within margin*min-distance,
            margin monotonicity (larger margin never shrinks support), hard
            routing == argmin one-hot, soft -> hard continuity as margin->1+.
  sampling: occupancy-guided t_vals are sorted, within [near, far], and land
            in occupied probe intervals for alive rays.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    routing_weights,
)
from nerfsys_tpu.models.ngp import NGPConfig
from nerfsys_tpu.ops.occupancy import occupancy_sample_tvals

EXPERT = NGPConfig(hidden=8, sigma_depth=1, color_hidden=8, color_depth=1,
                   geo_feat_dim=3)


def _setup(K, seed=0, cluster_2d=True, margin=1.1):
    rng = np.random.default_rng(seed)
    cents = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    st = ContainerStatics(cents, boxes,
                          jnp.asarray([[-3.0, -3, -3], [3, 3, 3]]))
    cfg = ContainerConfig(num_experts=K, expert=EXPERT,
                          boundary_margin=margin, cluster_2d=cluster_2d,
                          bg_hidden=8)
    return st, cfg


def _dists(st, cfg, pts):
    idx = (1, 2) if cfg.cluster_2d else (0, 1, 2)
    x = np.asarray(pts)[:, idx]
    c = np.asarray(st.centroids)[:, idx]
    return np.linalg.norm(x[:, None] - c[None], axis=-1)


def test_routing_rows_normalized_and_supported():
    for seed in range(4):
        K = 2 + seed
        st, cfg = _setup(K, seed=seed, margin=1.2)
        pts = jnp.asarray(
            np.random.default_rng(seed + 10).normal(size=(257, 3)),
            jnp.float32,
        )
        w = np.asarray(routing_weights(st, cfg, pts))
        assert w.shape == (257, K)
        assert (w >= 0).all()
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
        d = _dists(st, cfg, pts)
        inside = d <= cfg.boundary_margin * d.min(1, keepdims=True) + 1e-5
        assert (w[~inside] == 0).all()  # no weight outside the margin


def test_routing_margin_monotonicity():
    """Growing the margin can only ADD experts to a point's support set."""
    st, _ = _setup(4, seed=3)
    pts = jnp.asarray(
        np.random.default_rng(7).normal(size=(100, 3)), jnp.float32
    )
    prev_support = None
    for margin in (1.01, 1.1, 1.5, 3.0):
        _, cfg = _setup(4, seed=3, margin=margin)
        w = np.asarray(routing_weights(st, cfg, pts))
        support = w > 0
        if prev_support is not None:
            assert (support | prev_support == support).all(), (
                f"margin {margin} dropped an expert from the support set"
            )
        prev_support = support


def test_routing_hard_is_argmin_onehot():
    st, cfg = _setup(3, seed=1, margin=1.0)
    pts = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 3)), jnp.float32
    )
    w = np.asarray(routing_weights(st, cfg, pts))
    d = _dists(st, cfg, pts)
    assert (w.argmax(1) == d.argmin(1)).all()
    np.testing.assert_allclose(w.max(1), 1.0)
    np.testing.assert_allclose(w.sum(1), 1.0)


def test_routing_3d_mode_uses_all_axes():
    """cluster_2d=False must distinguish points differing only in x."""
    st, cfg = _setup(2, seed=0, cluster_2d=False, margin=1.0)
    c = np.asarray(st.centroids)
    p_near0 = jnp.asarray(c[0][None] + 0.01, jnp.float32)
    w = np.asarray(routing_weights(st, cfg, p_near0))
    assert w[0].argmax() == 0


def test_occ_sampling_geometry():
    """Samples sorted, inside [near, far], and in occupied probe cells."""
    P = 64

    # occupied iff z in [-0.25, 0.25): a slab the probes straddle
    def bin_fn(pts):
        return (pts[..., 2] >= -0.25) & (pts[..., 2] < 0.25)

    N, S = 33, 16
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(N, 3)) * 0.1 + [0, 0, 2.0], jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0, -1.0]], jnp.float32), (N, 1))
    near = jnp.full((N,), 0.5)
    far = jnp.full((N,), 4.0)

    for randomized, key in ((False, None), (True, jax.random.PRNGKey(3))):
        t, alive = occupancy_sample_tvals(
            bin_fn, o, d, near, far, S, n_probes=P, key=key,
            randomized=randomized,
        )
        t = np.asarray(t)
        assert bool(np.asarray(alive).all())  # every ray crosses the slab
        assert (np.diff(t, axis=1) >= 0).all()
        assert (t >= 0.5 - 1e-5).all() and (t <= 4.0 + 1e-5).all()
        # each sample must fall inside an OCCUPIED probe interval: the pdf
        # is zero elsewhere. Check against the probe-grid indicator.
        edges = np.linspace(0.0, 1.0, P + 1)
        mids = 0.5 * (edges[:-1] + edges[1:])
        t_probe = np.asarray(near)[:, None] + (
            np.asarray(far) - np.asarray(near)
        )[:, None] * mids[None]
        pts_probe = np.asarray(o)[:, None] + np.asarray(d)[:, None] * \
            t_probe[..., None]
        occ = np.asarray(bin_fn(jnp.asarray(pts_probe)))
        s_norm = (t - 0.5) / 3.5  # back to [0,1)
        idx = np.clip((s_norm * P).astype(int), 0, P - 1)
        assert occ[np.arange(N)[:, None], idx].all()


def test_occ_sampling_concentration():
    """With a small occupied slab, samples must concentrate ~P-fold tighter
    than uniform stratified sampling would place them."""
    def bin_fn(pts):
        return jnp.abs(pts[..., 2]) < 0.1

    o = jnp.asarray([[0.0, 0, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0, -1.0]], jnp.float32)
    t, alive = occupancy_sample_tvals(
        bin_fn, o, d, jnp.asarray([0.0]), jnp.asarray([4.0]), 32,
        n_probes=128,
    )
    z = 2.0 - np.asarray(t)[0]  # sample z positions
    assert bool(alive[0])
    assert (np.abs(z) < 0.1 + 4.0 / 128).all()  # all within slab +- one probe
