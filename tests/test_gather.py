"""row_gather primitive: rule coverage (impl, batching collapse, AD).

The primitive exists purely for performance (ops/gather.py: vmap batch
collapsed into the gather row axis); these tests pin that every transform
path produces the same VALUES as the plain XLA gather it replaces.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsys_tpu.ops.gather import row_gather


def _ref(table, idx):
    return np.asarray(table)[np.asarray(idx)]


def test_forward_matches_plain_gather():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    i = jnp.asarray(rng.integers(0, 64, size=(37,)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(row_gather(t, i)), _ref(t, i))
    # multi-dim indices
    i2 = i.reshape(37, 1)[:6].reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(row_gather(t, i2)), _ref(t, i2))


def test_bool_and_int_tables():
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, size=(32,)), bool)
    ti = jnp.asarray(rng.integers(0, 100, size=(32, 4)), jnp.int32)
    i = jnp.asarray(rng.integers(0, 32, size=(11,)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(row_gather(tb, i)), _ref(tb, i))
    np.testing.assert_array_equal(np.asarray(row_gather(ti, i)), _ref(ti, i))


def test_vmap_batched_table_and_idx_collapses_correctly():
    """The whole point: batched (K,R,F) tables + (K,N) indices must equal
    per-expert plain gathers."""
    rng = np.random.default_rng(2)
    K, R, F, N = 5, 16, 3, 29
    t = jnp.asarray(rng.normal(size=(K, R, F)), jnp.float32)
    i = jnp.asarray(rng.integers(0, R, size=(K, N)), jnp.int32)
    out = jax.jit(jax.vmap(row_gather))(t, i)
    for k in range(K):
        np.testing.assert_array_equal(np.asarray(out[k]), _ref(t[k], i[k]))


def test_vmap_shared_table_batched_idx():
    rng = np.random.default_rng(3)
    t = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    i = jnp.asarray(rng.integers(0, 16, size=(4, 7)), jnp.int32)
    out = jax.vmap(lambda ii: row_gather(t, ii))(i)
    np.testing.assert_array_equal(np.asarray(out), _ref(t, i))


def test_vmap_batched_table_shared_idx():
    rng = np.random.default_rng(4)
    t = jnp.asarray(rng.normal(size=(4, 16, 3)), jnp.float32)
    i = jnp.asarray(rng.integers(0, 16, size=(7,)), jnp.int32)
    out = jax.vmap(lambda tt: row_gather(tt, i))(t)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(out[k]), _ref(t[k], i))


def test_nested_vmap():
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.normal(size=(2, 3, 8, 2)), jnp.float32)
    i = jnp.asarray(rng.integers(0, 8, size=(2, 3, 5)), jnp.int32)
    out = jax.vmap(jax.vmap(row_gather))(t, i)
    for a in range(2):
        for b in range(3):
            np.testing.assert_array_equal(
                np.asarray(out[a, b]), _ref(t[a, b], i[a, b])
            )


def test_grad_is_scatter_add():
    """Transpose rule: d/dtable sum(ct * gather) accumulates duplicates."""
    t = jnp.zeros((8, 2))
    i = jnp.asarray([1, 1, 3], jnp.int32)
    g = jax.grad(lambda tt: row_gather(tt, i).sum())(t)
    expect = np.zeros((8, 2))
    expect[1] = 2.0
    expect[3] = 1.0
    np.testing.assert_array_equal(np.asarray(g), expect)


def test_grad_under_vmap_and_scan_remat():
    rng = np.random.default_rng(6)
    K, R, F, N = 3, 10, 2, 6
    t = jnp.asarray(rng.normal(size=(K, R, F)), jnp.float32)
    i = jnp.asarray(rng.integers(0, R, size=(K, N)), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(K, N, F)), jnp.float32)

    def loss(tt):
        return (jax.vmap(row_gather)(tt, i) * ct).sum()

    g = jax.grad(loss)(t)
    expect = np.zeros((K, R, F), np.float32)
    for k in range(K):
        for n in range(N):
            expect[k, int(i[k, n])] += np.asarray(ct)[k, n]
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-6)

    # remat + scan compose
    f = jax.checkpoint(lambda tt: (jax.vmap(row_gather)(tt, i) * ct).sum())

    def body(c, _):
        return c + jax.grad(f)(t).sum(), None

    out, _ = jax.lax.scan(body, 0.0, jnp.arange(2))
    assert np.isfinite(float(out))


def test_jvp_forward_mode():
    t = jnp.asarray(np.arange(12.0).reshape(6, 2), jnp.float32)
    i = jnp.asarray([0, 4], jnp.int32)
    dt = jnp.ones_like(t)
    out, tang = jax.jvp(lambda tt: row_gather(tt, i), (t,), (dt,))
    np.testing.assert_array_equal(np.asarray(out), _ref(t, i))
    np.testing.assert_array_equal(np.asarray(tang), np.ones((2, 2)))
