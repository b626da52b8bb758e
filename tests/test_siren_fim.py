import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.models.fim import (
    FIMConfig,
    fim_batch_weight,
    fim_sample_weights,
    fim_weighted_loss,
    init_fisher,
    update_fisher,
)
from nerfsys_tpu.models.siren import (
    SirenConfig,
    init_modular_siren_params,
    init_siren_params,
    modular_siren_apply,
    route_coords,
    siren_apply,
)

CFG = SirenConfig(dim_in=2, dim_hidden=32, dim_out=3, num_layers=4)


def test_siren_shapes_and_init_scale():
    p = init_siren_params(jax.random.PRNGKey(0), CFG)
    assert len(p["layers"]) == 4
    # first layer: uniform(-1/dim_in, 1/dim_in)
    w0 = np.asarray(p["layers"][0]["w"])
    assert np.abs(w0).max() <= 1.0 / CFG.dim_in + 1e-6
    # later layers: sqrt(6/dim)/w0
    w1 = np.asarray(p["layers"][1]["w"])
    bound = np.sqrt(6.0 / 32) / 30.0
    assert np.abs(w1).max() <= bound + 1e-6
    out = siren_apply(p, CFG, jnp.zeros((10, 2)))
    assert out.shape == (10, 3)


def test_siren_fits_signal():
    """A SIREN must fit a simple 2D signal quickly (sanity of init/act)."""
    import optax

    p = init_siren_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 2), minval=-1, maxval=1)
    y = 0.5 + 0.4 * jnp.sin(3 * x[:, :1]) * jnp.cos(2 * x[:, 1:2])
    y = jnp.tile(y, (1, 3))
    tx = optax.adam(1e-4)
    st = tx.init(p)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(
            lambda pp: jnp.mean((siren_apply(pp, CFG, x) - y) ** 2)
        )(p)
        u, st = tx.update(g, st)
        return optax.apply_updates(p, u), st, l

    l0 = None
    for i in range(200):
        p, st, l = step(p, st)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 0.1


def test_relu_variant():
    cfg = SirenConfig(dim_in=2, dim_hidden=16, dim_out=1, num_layers=3,
                      activation="relu")
    p = init_siren_params(jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(p["layers"][0]["b"], 0.0)
    out = siren_apply(p, cfg, jnp.ones((4, 2)))
    assert out.shape == (4, 1)


def test_penultimate_features():
    p = init_siren_params(jax.random.PRNGKey(0), CFG)
    out, feat = siren_apply(p, CFG, jnp.zeros((5, 2)), return_features=True)
    assert feat.shape == (5, 32)


def test_route_coords_modes():
    cfg = SirenConfig(num_submodules=4, routing_order="colwise")
    coords = jnp.array([[-0.9, -0.9], [0.0, -0.3], [0.0, 0.3], [0.9, 0.9]])
    ids = route_coords(coords, cfg)
    assert ids.tolist() == [0, 1, 2, 3]
    cfg_r = SirenConfig(num_submodules=4, routing_order="raster")
    ids = route_coords(coords, cfg_r)
    assert ids.tolist() == [0, 2, 3, 3]  # 2x2 raster: (y,x) bins


def test_modular_siren_routes():
    cfg = SirenConfig(dim_in=2, dim_hidden=8, dim_out=1, num_layers=3,
                      num_submodules=2, routing_order="colwise")
    p = init_modular_siren_params(jax.random.PRNGKey(0), cfg)
    x = jnp.array([[-0.5, -0.5], [0.5, 0.5]])
    out = modular_siren_apply(p, cfg, x)
    # each point must equal its own submodule's output
    p0 = jax.tree_util.tree_map(lambda a: a[0], p)
    p1 = jax.tree_util.tree_map(lambda a: a[1], p)
    np.testing.assert_allclose(out[0], siren_apply(p0, cfg, x)[0], atol=1e-6)
    np.testing.assert_allclose(out[1], siren_apply(p1, cfg, x)[1], atol=1e-6)


# ------------------------------ FIM ------------------------------------------
def test_fisher_ema():
    params = {"w": jnp.ones((3,))}
    f = init_fisher(params)
    np.testing.assert_allclose(f["w"], 0.0)
    cfg = FIMConfig(beta=0.9)
    g = {"w": jnp.full((3,), 2.0)}
    f1 = update_fisher(f, g, cfg)
    np.testing.assert_allclose(f1["w"], 0.1 * 4.0, rtol=1e-6)
    f2 = update_fisher(f1, g, cfg)
    np.testing.assert_allclose(f2["w"], 0.9 * 0.4 + 0.1 * 4.0, rtol=1e-6)


def test_fim_weights_normalized():
    fisher = {"w": jnp.full((4,), 0.5)}
    grads = {"w": jnp.ones((4,))}
    cfg = FIMConfig(lam=0.1, clamp=None)
    w = fim_batch_weight(fisher, grads, cfg)
    np.testing.assert_allclose(float(w), 1.0, atol=1e-6)  # normalized around 1
    mse_i = jnp.array([0.1, 0.2, 0.3, 0.4])
    wi = fim_sample_weights(fisher, mse_i, cfg)
    np.testing.assert_allclose(float(jnp.mean(wi)), 1.0, atol=1e-5)
    # harder samples get larger weights
    assert float(wi[3]) > float(wi[0])


def test_fim_weighted_loss_updates_fisher():
    params = {"w": jnp.array([1.0, 2.0])}

    def loss_fn(p):
        mse_i = jnp.square(p["w"] - jnp.array([0.0, 1.0]))
        return mse_i, {}

    fisher = init_fisher(params)
    cfg = FIMConfig(per_sample=True)
    loss, fisher2, aux = fim_weighted_loss(loss_fn, params, fisher, cfg)
    assert np.isfinite(float(loss))
    assert float(jnp.sum(fisher2["w"])) > 0
    assert "base_loss" in aux
    # differentiable end-to-end
    g = jax.grad(
        lambda p: fim_weighted_loss(loss_fn, p, fisher, cfg)[0]
    )(params)
    assert np.isfinite(np.asarray(g["w"])).all()


def test_fim_adapt_step_runs_and_tracks_fisher():
    """Operational --fim: Fisher EMA threads through the adaptation loop
    and both weighting modes produce finite, param-changing updates."""
    import dataclasses

    from nerfsys_tpu.models.container import (
        ContainerConfig, ContainerStatics, init_container_params,
        param_group_labels,
    )
    from nerfsys_tpu.models.fim import FIMConfig, init_fisher
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.pipelines.online.runtime_adapt import make_fim_adapt_step
    from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(hidden=8, sigma_depth=1, color_hidden=8,
                         color_depth=1, geo_feat_dim=3,
                         hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                             log2_hashmap_size=8)),
        bg_hidden=8,
    )
    cents = jnp.array([[0.0, -1, 0], [0.0, 1, 0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    statics = ContainerStatics(cents, boxes,
                               jnp.array([[-3.0, -3, -3], [3, 3, 3]]))
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(OptimConfig(use_scheduler=False),
                         param_group_labels(params))

    n = 32
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    nf = np.tile(np.array([0.5, 2.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], 1))
    rgbs = jnp.full((n, 3), 0.4)

    for per_sample in (False, True):
        fc = FIMConfig(lam=0.5, beta=0.9, per_sample=per_sample)
        step = make_fim_adapt_step(cfg, tx, fc, ray_samples=8)
        fisher = init_fisher(params)
        p, o_state, f = params, tx.init(params), fisher
        for k in range(2):
            p, o_state, f, loss = step(
                p, o_state, f, statics, rays, rgbs, jax.random.PRNGKey(k)
            )
        assert np.isfinite(float(loss))
        # fisher accumulated nonzero energy somewhere
        energy = sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(f))
        assert energy > 0
        assert not np.allclose(
            np.asarray(p["experts"]["sigma_head"]["w"]),
            np.asarray(params["experts"]["sigma_head"]["w"]))
