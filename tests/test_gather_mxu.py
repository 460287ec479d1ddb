"""gather_rows (MXU one-hot gather): forward + VJP parity vs indexed gather."""

import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.render.gather_mxu import gather_rows


def _reference(table, idx):
    B = table.shape[0]
    b_idx = jnp.arange(B)[:, None]
    safe = jnp.maximum(idx, 0)
    out = table[b_idx, safe]
    return out * (idx >= 0).astype(table.dtype)[..., None]


def test_gather_rows_forward_matches_indexed():
    rng = np.random.RandomState(0)
    B, F, D, P = 2, 37, 9, 300
    table = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 100.0)
    idx = jnp.asarray(rng.randint(-1, F, size=(B, P)).astype(np.int32))
    out = gather_rows(table, idx, True)
    ref = _reference(table, idx)
    # hi/lo bf16 split: ~2^-16 relative
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-3)


def test_gather_rows_vjp_matches_indexed():
    rng = np.random.RandomState(1)
    B, F, D, P = 2, 19, 5, 257
    table = jnp.asarray(rng.randn(B, F, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(-1, F, size=(B, P)).astype(np.int32))
    ct = jnp.asarray(rng.randn(B, P, D).astype(np.float32))

    def f(t):
        return jnp.vdot(gather_rows(t, idx, True), ct)

    def f_ref(t):
        return jnp.vdot(_reference(t, idx), ct)

    g = jax.grad(f)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=3e-5,
                               atol=3e-3)


def test_gather_rows_large_table_f_blocked():
    """F > the 2048-row block: exercises the F-blocked accumulation path
    (the NIMBLE skin mesh has ~10k faces)."""
    rng = np.random.RandomState(2)
    B, F, D, P = 1, 5000, 7, 400
    table = jnp.asarray(rng.randn(B, F, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(-1, F, size=(B, P)).astype(np.int32))
    out = gather_rows(table, idx, True)
    ref = _reference(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-3)
    ct = jnp.asarray(rng.randn(B, P, D).astype(np.float32))
    g = jax.grad(lambda t: jnp.vdot(gather_rows(t, idx, True), ct))(table)
    g_ref = jax.grad(lambda t: jnp.vdot(_reference(t, idx), ct))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=3e-5,
                               atol=3e-3)


def test_gather_rows_background_no_gradient_leak():
    table = jnp.ones((1, 4, 3), jnp.float32)
    idx = jnp.full((1, 64), -1, jnp.int32)
    out = gather_rows(table, idx, True)
    assert float(jnp.abs(out).max()) == 0.0
    g = jax.grad(lambda t: jnp.sum(gather_rows(t, idx, True)))(table)
    assert float(jnp.abs(g).max()) == 0.0
