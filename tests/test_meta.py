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
from nerfsys_tpu.pipelines.offline.meta_core import (
    MetaConfig,
    query_loss,
    reptile_update,
    task_adapt,
)
from nerfsys_tpu.pipelines.offline.meta_train_step import (
    make_eval_step,
    make_train_step,
)
from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer

EXPERT = NGPConfig(
    hidden=16, sigma_depth=1, color_hidden=16, color_depth=1, geo_feat_dim=7,
    hash=HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
)
K, B, S, Q = 2, 2, 64, 32
META = MetaConfig(algo="fomaml", inner_iter=2, inner_lr=0.05, ray_samples=8)
CFG = ContainerConfig(num_experts=K, expert=EXPERT, bg_hidden=8)


def make_statics():
    cents = jnp.array([[0.0, -1, 0], [0.0, 1, 0]], dtype=jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.5, c + 1.5]) for c in cents])
    return ContainerStatics(cents, boxes, jnp.array([[-3.0, -3, -3], [3, 3, 3]]))


def make_batch(key, valid=None):
    ks = jax.random.split(key, 4)
    def rays(k, n):
        o = jax.random.normal(k, (K, B, n, 3)) * 0.1
        d = jnp.tile(jnp.array([0.0, 0, -1.0]), (K, B, n, 1))
        nf = jnp.tile(jnp.array([0.5, 2.0]), (K, B, n, 1))
        return jnp.concatenate([o, d, nf], -1)
    batch = {
        "support_rays": rays(ks[0], S),
        "support_rgbs": jax.random.uniform(ks[1], (K, B, S, 3)),
        "query_rays": rays(ks[2], Q),
        "query_rgbs": jax.random.uniform(ks[3], (K, B, Q, 3)),
        "valid": jnp.ones((K, B)) if valid is None else valid,
    }
    return batch


def test_task_adapt_reduces_support_loss():
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["experts"])
    key = jax.random.PRNGKey(1)
    rays = make_batch(key)["support_rays"][0, 0]
    rgbs = jnp.full((S, 3), 0.3)
    meta = MetaConfig(algo="fomaml", inner_iter=6, inner_lr=0.1, ray_samples=8,
                      randomized=False)
    fast, losses = task_adapt(
        meta, CFG, p0, st.expert_aabbs[0], params["bg"], rays, rgbs, key
    )
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]
    # adapted params differ from base
    assert not np.allclose(fast["sigma_head"]["w"], p0["sigma_head"]["w"])


@pytest.mark.parametrize("algo", ["fomaml", "maml", "reptile"])
def test_train_step_runs_and_updates(algo):
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    meta = MetaConfig(algo=algo, inner_iter=2, inner_lr=0.05, ray_samples=8,
                      reptile_lr=0.5)
    opt_cfg = OptimConfig(outer_steps=10)
    tx = build_optimizer(opt_cfg, param_group_labels(params))
    opt_state = tx.init(params)
    step = make_train_step(meta, CFG, tx)
    batch = make_batch(jax.random.PRNGKey(1))
    new_params, new_opt, aux = step(params, opt_state, st, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss_out"]))
    assert aux["region_loss_out"].shape == (K,)
    # experts changed
    assert not np.allclose(
        new_params["experts"]["sigma_head"]["w"], params["experts"]["sigma_head"]["w"]
    )
    if algo == "reptile":
        # bg untouched by reptile rule
        np.testing.assert_array_equal(
            new_params["bg"]["l0"]["w"], params["bg"]["l0"]["w"]
        )
    else:
        # outer grads reach the background model
        assert not np.allclose(
            new_params["bg"]["l0"]["w"], params["bg"]["l0"]["w"]
        )


def test_invalid_tasks_excluded():
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    valid = jnp.array([[1.0, 1.0], [0.0, 0.0]])  # region 1 fully padded
    batch = make_batch(jax.random.PRNGKey(1), valid=valid)
    # poison region 1's data with NaN: must not affect the loss
    batch["query_rgbs"] = batch["query_rgbs"].at[1].set(jnp.nan)
    meta = MetaConfig(algo="reptile", inner_iter=1, inner_lr=0.05, ray_samples=8,
                      reptile_lr=0.5)
    tx = build_optimizer(OptimConfig(outer_steps=10), param_group_labels(params))
    step = make_train_step(meta, CFG, tx)
    new_params, _, aux = step(params, tx.init(params), st, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss_out"]))
    # reptile: expert 1 (no valid tasks) unchanged, expert 0 changed
    e_new = new_params["experts"]["sigma_head"]["w"]
    e_old = params["experts"]["sigma_head"]["w"]
    np.testing.assert_array_equal(e_new[1], e_old[1])
    assert not np.allclose(e_new[0], e_old[0])


def test_nonfinite_loss_skips_update():
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1))
    batch["query_rgbs"] = jnp.full_like(batch["query_rgbs"], jnp.nan)
    tx = build_optimizer(OptimConfig(outer_steps=10), param_group_labels(params))
    step = make_train_step(META, CFG, tx)
    new_params, _, aux = step(params, tx.init(params), st, batch, jax.random.PRNGKey(2))
    assert float(aux["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(
        new_params["experts"]["sigma_head"]["w"], params["experts"]["sigma_head"]["w"]
    )


def test_eval_step():
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    ev = make_eval_step(META, CFG, tto=2)
    batch = make_batch(jax.random.PRNGKey(1))
    out = ev(params, st, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["psnr_out"]))
    assert out["region_psnr_out"].shape == (K,)


def test_reptile_update_math():
    base = {"w": jnp.zeros((2, 3))}
    fast = {"w": jnp.ones((2, 4, 3))}  # K=2, B=4
    valid = jnp.ones((2, 4))
    out = reptile_update(base, fast, valid, lr=0.5)
    np.testing.assert_allclose(out["w"], 0.5)
    # half-masked
    valid = jnp.array([[1.0, 1, 0, 0], [0, 0, 0, 0]])
    out = reptile_update(base, fast, valid, lr=1.0)
    np.testing.assert_allclose(out["w"][0], 1.0)
    np.testing.assert_allclose(out["w"][1], 0.0)


def test_maml_differs_from_fomaml():
    """Second-order term must change the outer gradient."""
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    grads = {}
    for algo in ("maml", "fomaml"):
        meta = MetaConfig(algo=algo, inner_iter=2, inner_lr=0.05, ray_samples=8,
                          randomized=False)

        def outer(p):
            p0 = jax.tree_util.tree_map(lambda a: a[0], p["experts"])
            fast, _ = task_adapt(
                meta, CFG, p0, st.expert_aabbs[0], p["bg"],
                batch["support_rays"][0, 0], batch["support_rgbs"][0, 0], key,
            )
            ql, _ = query_loss(
                meta, CFG, fast, st.expert_aabbs[0], p["bg"],
                batch["query_rays"][0, 0], batch["query_rgbs"][0, 0],
            )
            return ql

        grads[algo] = jax.grad(outer)(params)

    ga = np.asarray(grads["maml"]["experts"]["sigma_head"]["w"][0])
    gb = np.asarray(grads["fomaml"]["experts"]["sigma_head"]["w"][0])
    assert np.isfinite(ga).all() and np.isfinite(gb).all()
    assert not np.allclose(ga, gb)


def test_eval_step_tto_zero():
    """tto=0 must evaluate at the base params without crashing
    (reference eval supports tto lists containing 0)."""
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    ev = make_eval_step(META, CFG, tto=0)
    batch = make_batch(jax.random.PRNGKey(1))
    out = ev(params, st, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["psnr_out"]))


def test_task_adapt_zero_iterations_identity():
    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["experts"])
    rays = make_batch(jax.random.PRNGKey(1))["support_rays"][0, 0]
    rgbs = jnp.full((S, 3), 0.3)
    fast, losses = task_adapt(
        META, CFG, p0, st.expert_aabbs[0], params["bg"], rays, rgbs,
        jax.random.PRNGKey(3), iterations=0,
    )
    np.testing.assert_array_equal(fast["sigma_head"]["w"], p0["sigma_head"]["w"])
    assert losses.shape == (1,)


def test_train_step_with_occupancy():
    """Occ-enabled meta step runs, dispatches stratified->occ, stays finite."""
    from nerfsys_tpu.models.occupancy import make_occ_update_fn, occ_ready
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state

    st = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    occ_cfg = OccGridConfig(resolution=8, levels=2, warmup_steps=0,
                            update_interval=1, occ_thre=1e-6)
    occ_state = init_occ_state(occ_cfg, K)
    tx = build_optimizer(OptimConfig(outer_steps=10), param_group_labels(params))
    opt_state = tx.init(params)
    step = make_train_step(META, CFG, tx)
    batch = make_batch(jax.random.PRNGKey(1))

    # grid not ready -> stratified branch
    assert not bool(occ_ready(occ_state))
    p1, o1, aux = step(params, opt_state, st, batch, jax.random.PRNGKey(2),
                       occ_state)
    assert np.isfinite(float(aux["loss_out"]))

    # run an occupancy update, then step through the occ branch
    upd = make_occ_update_fn(CFG, occ_cfg)
    occ_state = upd(occ_state, p1, st, 0, jax.random.PRNGKey(3))
    assert int(occ_state["num_updates"]) == 1
    p2, o2, aux2 = step(p1, o1, st, batch, jax.random.PRNGKey(4), occ_state)
    assert np.isfinite(float(aux2["loss_out"]))
    # eval step with occ as well
    ev = make_eval_step(META, CFG, tto=1)
    out = ev(p2, st, batch, jax.random.PRNGKey(5), occ_state)
    assert np.isfinite(float(out["psnr_out"]))


def test_aux_state_checkpoint_roundtrip(tmp_path):
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.utils.checkpoint import load_aux_state, save_aux_state

    occ = init_occ_state(OccGridConfig(resolution=4, levels=2), 2)
    occ = {**occ, "num_updates": jnp.asarray(7)}
    save_aux_state(tmp_path, "last", "occ", occ)
    tpl = init_occ_state(OccGridConfig(resolution=4, levels=2), 2)
    restored = load_aux_state(tmp_path, "occ", tpl)
    assert restored is not None
    assert int(restored["num_updates"]) == 7


def test_aux_state_restores_files_saved_without_new_leaves(tmp_path):
    """Pre-'ready_after' .occ files (round-1 checkpoints) must still restore:
    flax from_bytes is strict on dict keys, so load_aux_state falls back to a
    key-merge that keeps template defaults for missing leaves."""
    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.utils.checkpoint import load_aux_state, save_aux_state

    occ = init_occ_state(OccGridConfig(resolution=4, levels=2), 2)
    legacy = {k: v for k, v in occ.items() if k != "ready_after"}
    legacy["num_updates"] = jnp.asarray(9)
    save_aux_state(tmp_path, "last", "occ", legacy)

    tpl = init_occ_state(OccGridConfig(resolution=4, levels=2), 2)
    restored = load_aux_state(tmp_path, "occ", tpl)
    assert restored is not None
    assert int(restored["num_updates"]) == 9
    # missing leaf falls back to the template default
    assert int(restored["ready_after"]) == int(tpl["ready_after"])

    # but a topology mismatch must still be rejected (grids dropped loudly,
    # not silently reshaped)
    tpl_bad = init_occ_state(OccGridConfig(resolution=8, levels=2), 2)
    assert load_aux_state(tmp_path, "occ", tpl_bad) is None


def test_expert_map_matches_vmap():
    """lax.map and vmap expert-axis strategies are pure layout choices: the
    step must produce the same losses, params, and metrics either way."""
    import dataclasses

    statics = make_statics()
    batch = make_batch(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(7)
    outs = {}
    for em in (True, False):
        meta = dataclasses.replace(META, expert_map=em)
        params = init_container_params(jax.random.PRNGKey(0), CFG)
        tx = build_optimizer(OptimConfig(outer_steps=10),
                             param_group_labels(params))
        opt_state = tx.init(params)
        step = make_train_step(meta, CFG, tx)
        new_params, _, aux = step(params, opt_state, statics, batch, key)
        outs[em] = (new_params, aux)

    a, b = outs[True], outs[False]
    np.testing.assert_allclose(float(a[1]["loss_out"]),
                               float(b[1]["loss_out"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]["region_loss_out"]),
                               np.asarray(b[1]["region_loss_out"]), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(a[0]),
                      jax.tree_util.tree_leaves(b[0])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("knob", ["expert_unroll", "task_unroll"])
def test_unroll_knobs_match_scan(knob):
    """expert_unroll / task_unroll (unrolled programs in one traced
    graph) are pure scheduling choices: same losses/params as the
    lax.map / lax.scan defaults."""
    import dataclasses

    statics = make_statics()
    batch = make_batch(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(7)
    outs = {}
    for unroll in (False, True):
        meta = dataclasses.replace(META, expert_map=True,
                                   **{knob: unroll})
        params = init_container_params(jax.random.PRNGKey(0), CFG)
        tx = build_optimizer(OptimConfig(outer_steps=10),
                             param_group_labels(params))
        opt_state = tx.init(params)
        step = make_train_step(meta, CFG, tx)
        new_params, _, aux = step(params, opt_state, statics, batch, key)
        outs[unroll] = (new_params, aux)

    a, b = outs[False], outs[True]
    np.testing.assert_allclose(float(a[1]["loss_out"]),
                               float(b[1]["loss_out"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]["region_loss_out"]),
                               np.asarray(b[1]["region_loss_out"]),
                               rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(a[0]),
                      jax.tree_util.tree_leaves(b[0])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-5, rtol=1e-4)


def test_expert_map_matches_vmap_eval():
    import dataclasses

    statics = make_statics()
    batch = make_batch(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(11)
    params = init_container_params(jax.random.PRNGKey(1), CFG)
    res = {}
    for em in (True, False):
        meta = dataclasses.replace(META, expert_map=em)
        ev = make_eval_step(meta, CFG, tto=1)
        res[em] = ev(params, statics, batch, key)
    np.testing.assert_allclose(float(res[True]["loss_out"]),
                               float(res[False]["loss_out"]), rtol=1e-5)


def test_trainer_fixed_eval_reuses_episodes(tmp_path):
    """fixed_eval pins the eval batch + key: identical params must produce
    identical eval metrics at every eval point."""
    from nerfsys_tpu.pipelines.offline.trainer import meta_trainer

    statics = make_statics()
    params = init_container_params(jax.random.PRNGKey(0), CFG)
    meta = MetaConfig(algo="fomaml", inner_iter=0, inner_lr=0.0,
                      ray_samples=8)  # inner_iter=0 + lr 0: params frozen
    tx = build_optimizer(OptimConfig(outer_steps=10, lr=0.0, encoding_lr=0.0,
                                     sigma_lr=0.0, color_lr=0.0, bg_lr=0.0),
                         param_group_labels(params))
    opt_state = tx.init(params)
    step = make_train_step(meta, CFG, tx)
    ev = make_eval_step(meta, CFG, tto=0)

    class _Loader:
        def __iter__(self):
            k = jax.random.PRNGKey(9)
            while True:
                k, kk = jax.random.split(k)
                yield make_batch(kk)

    evals = []

    class _Log:
        def log(self, msg):
            if "query psnr" in msg:
                evals.append(float(msg.split("psnr ")[1].split(" ")[0]))

        def scalars(self, *a, **k):
            pass

        def scalar(self, *a, **k):
            pass

    meta_trainer(
        params=params, opt_state=opt_state, train_step=step, eval_step=ev,
        statics=statics, train_loader=_Loader(), eval_loader=_Loader(),
        outer_steps=4, eval_every=2, save_every=0, print_every=100,
        run_dir=None, logger=_Log(), fixed_eval=True,
    )
    assert len(evals) == 2
    assert evals[0] == evals[1]  # same params + same episodes + same key


def test_trainer_metric_lag_equivalent(tmp_path):
    """metric_lag=1 (deferred fetch) must report the same losses and run
    the same number of steps as the exact-sync metric_lag=0 path."""
    from nerfsys_tpu.pipelines.offline.trainer import meta_trainer

    statics = make_statics()
    meta = MetaConfig(algo="fomaml", inner_iter=1, inner_lr=0.01,
                      ray_samples=8)

    class _Loader:
        def __iter__(self):
            k = jax.random.PRNGKey(9)
            while True:
                k, kk = jax.random.split(k)
                yield make_batch(kk)

    def run(lag):
        params = init_container_params(jax.random.PRNGKey(0), CFG)
        tx = build_optimizer(OptimConfig(outer_steps=10),
                             param_group_labels(params))
        opt_state = tx.init(params)
        step = make_train_step(meta, CFG, tx)
        logged = []

        class _Log:
            def log(self, msg):
                if msg.startswith("step "):
                    logged.append(msg.split("loss_out: ")[1].split(" ")[0])

            def scalars(self, *a, **k):
                pass

            def scalar(self, *a, **k):
                pass

        p, _, _ = meta_trainer(
            params=params, opt_state=opt_state, train_step=step,
            eval_step=None, statics=statics, train_loader=_Loader(),
            outer_steps=3, eval_every=0, save_every=0, print_every=1,
            run_dir=None, logger=_Log(), metric_lag=lag,
        )
        return p, logged

    p0, logs0 = run(0)
    p1, logs1 = run(1)
    # identical final params (the lag only moves the fetch, not the math)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # all three steps' losses reported under both modes, same values
    assert logs0 == logs1 and len(logs0) == 1  # step 0 prints (step%50==0)


def test_weight_decay_l2_coupled():
    """--weight_decay is L2 added to the gradient BEFORE the moment updates
    for adam/sgd (the reference passes weight_decay straight to torch
    Adam/SGD, common/utils.py:54-70): under ZERO gradients, wd>0 must
    shrink weights, wd=0 must leave them untouched."""
    import dataclasses
    import optax

    params = init_container_params(jax.random.PRNGKey(0), CFG)
    labels = param_group_labels(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    for name in ("adam", "sgd"):
        cfg = OptimConfig(optimizer=name, weight_decay=1e-2,
                          use_scheduler=False, grad_clip=None)
        tx = build_optimizer(cfg, labels)
        upd, _ = tx.update(zeros, tx.init(params), params)
        new = optax.apply_updates(params, upd)
        w0 = np.abs(np.asarray(params["experts"]["sigma_head"]["w"]))
        w1 = np.abs(np.asarray(new["experts"]["sigma_head"]["w"]))
        assert (w1 <= w0 + 1e-12).all() and (w1 < w0 - 1e-9).any(), name

        cfg0 = dataclasses.replace(cfg, weight_decay=0.0)
        tx0 = build_optimizer(cfg0, labels)
        upd0, _ = tx0.update(zeros, tx0.init(params), params)
        new0 = optax.apply_updates(params, upd0)
        np.testing.assert_array_equal(
            np.asarray(new0["experts"]["sigma_head"]["w"]),
            np.asarray(params["experts"]["sigma_head"]["w"]))
