"""utils/diagnostics: grad_summary + tstats (reference analyze_grads /
_tstats parity, SURVEY.md §5.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.utils.diagnostics import grad_summary, tstats


def test_grad_summary_global_norm_matches_optax(capsys):
    import optax

    tree = {
        "a": jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                         jnp.float32),
        "b": {"w": jnp.ones((3,)), "bias": jnp.zeros(())},
    }
    got = grad_summary(tree, name="test")
    want = float(optax.global_norm(tree))
    assert np.isclose(got, want, rtol=1e-5)
    out = capsys.readouterr().out
    assert "Global grad norm" in out
    assert "a" in out and "b/w" in out  # leaf paths named


def test_grad_summary_rel_scale_and_empty(capsys):
    g = {"w": jnp.full((4,), 2.0)}
    p = {"w": jnp.full((4,), 4.0)}
    grad_summary(g, p, name="rel")
    out = capsys.readouterr().out
    # |g|/|p| = 0.5
    assert "rel=5.00e-01" in out
    assert grad_summary({}, name="none") == 0.0
    assert "No valid gradients" in capsys.readouterr().out


def test_grad_summary_quiet_returns_norm():
    g = (jnp.asarray([3.0]), jnp.asarray([4.0]))
    assert np.isclose(grad_summary(g, verbose=False), 5.0)


def test_tstats_healthy():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    s = tstats(x, verbose=False)
    assert s["min"] == 1.0 and s["max"] == 4.0
    assert np.isclose(s["mean"], 2.5)
    assert s["n_finite"] == 4 and s["n_nan"] == 0 and s["n_inf"] == 0
    assert s["shape"] == (2, 2)


def test_tstats_nonfinite_masked(capsys):
    x = jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf, 5.0])
    s = tstats(x, name="sick")
    # stats computed over the FINITE entries only (reference masks them)
    assert s["min"] == 1.0 and s["max"] == 5.0
    assert np.isclose(s["mean"], 3.0)
    assert s["n_finite"] == 2 and s["n_nan"] == 1 and s["n_inf"] == 2
    assert "nan=1 inf=2" in capsys.readouterr().out


def test_tstats_all_nonfinite(capsys):
    s = tstats(jnp.asarray([jnp.nan, jnp.nan]), name="dead")
    assert s["n_finite"] == 0
    assert "ALL NON-FINITE" in capsys.readouterr().out


def test_tstats_empty():
    s = tstats(jnp.zeros((0, 3)), verbose=False)
    assert s["n_finite"] == 0 and s["n"] == 0


def test_grad_summary_on_real_step_grads():
    """Works on the actual container params pytree shape."""
    from nerfsys_tpu.models.container import (
        ContainerConfig, init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig

    cfg = ContainerConfig(num_experts=2,
                          expert=NGPConfig(hidden=16, color_hidden=16))
    params = init_container_params(jax.random.PRNGKey(0), cfg)
    fake_grads = jax.tree_util.tree_map(jnp.ones_like, params)
    gn = grad_summary(fake_grads, params, verbose=False)
    assert gn > 0.0 and np.isfinite(gn)
