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


def test_scatter_rows_matches_segment_sum():
    """scatter_rows (the gather transpose, public API): forward == a numpy
    segment-sum; VJP w.r.t. values == gather with the same indices."""
    from hifihr_tpu.render.gather_mxu import scatter_rows

    rng = np.random.RandomState(3)
    B, P, F, D = 2, 300, 37, 5
    vals = jnp.asarray(rng.randn(B, P, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(-1, F, size=(B, P)).astype(np.int32))
    out = scatter_rows(vals, idx, F, True)
    ref = np.zeros((B, F, D), np.float32)
    for b in range(B):
        for p in range(P):
            if int(idx[b, p]) >= 0:
                ref[b, int(idx[b, p])] += np.asarray(vals)[b, p]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-3)

    ct = jnp.asarray(rng.randn(B, F, D).astype(np.float32))
    g = jax.grad(lambda v: jnp.vdot(scatter_rows(v, idx, F, True), ct))(vals)
    g_ref = np.asarray(ct)[np.arange(B)[:, None], np.maximum(np.asarray(idx), 0)]
    g_ref = g_ref * (np.asarray(idx) >= 0)[..., None]
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=3e-5, atol=3e-3)


def test_accumulate_corners_large_mesh_matches_scatter():
    """The large-mesh bf16 incidence-matmul path agrees with the exact
    per-corner scatter-add to bf16 tolerance, and the fused
    vertex_normals_and_tangents matches the separate functions."""
    from hifihr_tpu.render import mesh as mesh_mod

    rng = np.random.RandomState(4)
    V, F, B, D = 40, 70, 2, 4
    faces = rng.randint(0, V, size=(F, 3)).astype(np.int32)
    per_face = jnp.asarray(rng.randn(B, F, D).astype(np.float32))
    ref = np.zeros((B, V, D), np.float32)
    for k in range(3):
        np.add.at(ref, (np.arange(B)[:, None], faces[None, :, k]),
                  np.asarray(per_face))
    # force the large-mesh path by shrinking the one-hot limit
    old = mesh_mod._ONEHOT_LIMIT
    try:
        mesh_mod._ONEHOT_LIMIT = 0
        out = mesh_mod.accumulate_corners(per_face, jnp.asarray(faces), V)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)

        verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
        face_uv = jnp.asarray(rng.rand(F, 3, 2).astype(np.float32))
        n2, t2 = mesh_mod.vertex_normals_and_tangents(
            verts, jnp.asarray(faces), face_uv)
        n1 = mesh_mod.vertex_normals(verts, jnp.asarray(faces))
        t1 = mesh_mod.vertex_tangents(verts, jnp.asarray(faces), face_uv)
    finally:
        mesh_mod._ONEHOT_LIMIT = old
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=3e-2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=3e-2)
