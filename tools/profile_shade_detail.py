"""Decompose the NIMBLE corner-shade cost (the largest render stage).

All medians subtract the measured null-program floor: on the tunneled axon
backend every synced measurement carries a ~27-32 ms host round trip
(bench.py chains 5 steps per fetch for the same reason), which inflated the
earlier stage profiles.

Stages (batch argv[1], default 32):
  null        — trivial jitted scalar (the sync floor itself)
  raster      — MSAA face selection fwd (F=11926, Morton-sorted)
  normals     — vertex_normals + vertex_tangents fwd+bwd
  corner_tex  — corner PCA einsum fwd+bwd
  gather      — gather_rows fwd at the corner-shade config (D=48)
  gather_bwd  — gather_rows fwd+bwd
  interp      — fragment_interpolate fwd+bwd (gather + bary math)
  shade       — full corner render fwd+bwd (everything)

Usage: python tools/profile_shade_detail.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/hifihr_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIZE = 224
STEPS = 10


def _median_ms(fn, *args, steps=STEPS):
    out = float(jnp.asarray(fn(*args)).sum())
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = float(jnp.asarray(fn(*args)).sum())
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out)
    return 1e3 * float(np.median(times))


def _geom():
    from hifihr_tpu.hand.nimble import NimbleLayer
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    layer = NimbleLayer()
    rng = np.random.RandomState(0)
    params = {
        "pose_params": jnp.asarray(rng.randn(BATCH, 30) * 0.1, jnp.float32),
        "shape_params": jnp.asarray(rng.randn(BATCH, 20) * 0.1, jnp.float32),
    }
    verts = layer(params)["verts"] + jnp.asarray([0.0, 0.0, 0.5])
    f = SIZE * 1.8
    K = jnp.asarray(np.tile(np.asarray(
        [[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1]], np.float32)[None],
        (BATCH, 1, 1)))
    renderer = PhongRenderer(
        layer.skin_faces, RenderSettings(image_size=SIZE, aa_mode="msaa"),
        face_uv=layer.face_uv_np, sort_template=layer.v_template_np,
        corner_mean=layer.corner_mean_np, corner_basis=layer.corner_basis_np)
    coef = jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32)
    return layer, renderer, verts, K, coef


def main():
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.gather_mxu import gather_rows
    from hifihr_tpu.render.interpolate import fragment_interpolate
    from hifihr_tpu.render.mesh import vertex_normals, vertex_tangents
    from hifihr_tpu.render.shading import DirectionalLight

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
          f"batch {BATCH}", flush=True)

    layer, renderer, verts, K, coef = _geom()
    faces = renderer.faces
    F = int(faces.shape[0])
    light = DirectionalLight.default(BATCH)

    @jax.jit
    def null(x):
        return x.sum()

    floor = _median_ms(null, jnp.ones((8,), jnp.float32))
    print(f"{'null (sync floor)':28s} {floor:8.1f} ms", flush=True)

    def report(name, ms):
        real = ms - floor
        print(f"{name:28s} {ms:8.1f} ms | -floor {real:7.1f} ms "
              f"({BATCH / max(real, 1e-6) * 1e3:7.1f} img/s)", flush=True)

    # raster fwd
    @jax.jit
    def rast(v, K):
        fid, cov = renderer._select_faces_msaa(v, K)
        return cov.sum() + (fid >= 0).sum()

    report("raster fwd", _median_ms(rast, verts, K))

    # normals + tangents fwd+bwd
    @jax.jit
    def norm_fb(v):
        def f(v):
            n = vertex_normals(v, faces)
            t = vertex_tangents(v, faces, renderer.face_uv)
            return jnp.sum(n ** 2) + jnp.sum(t ** 2)
        return jax.grad(f)(v).sum()

    report("normals+tangents fwd+bwd", _median_ms(norm_fb, verts))

    # corner PCA einsum fwd+bwd
    @jax.jit
    def ctex_fb(c):
        def f(c):
            t = renderer.corner_mean[None] + jnp.einsum(
                "fkct,bt->bfkc", renderer.corner_basis, c)
            return jnp.sum(jnp.clip(t, 0.0, 1.0) ** 2)
        return jax.grad(f)(c).sum()

    report("corner einsum fwd+bwd", _median_ms(ctex_fb, coef))

    # gather at the corner-shade config: row = 9 + 3*6 + 3*7 = 48
    vs = raster_jax.project_to_screen(verts, K)
    fid, _ = jax.jit(renderer._select_faces_msaa)(verts, K)
    table = jnp.asarray(
        np.random.RandomState(1).rand(BATCH, F, 48), jnp.float32)
    idx2 = fid.reshape(BATCH, SIZE * SIZE)

    @jax.jit
    def gat(t, i):
        return gather_rows(t, i).sum()

    report("gather fwd (D=48)", _median_ms(gat, table, idx2))

    @jax.jit
    def gat_fb(t, i):
        return jax.grad(lambda t: gather_rows(t, i).sum())(t).sum()

    report("gather fwd+bwd (D=48)", _median_ms(gat_fb, table, idx2))

    # fragment_interpolate fwd+bwd (gather + bary + einsum)
    attrs = jnp.asarray(np.random.RandomState(2).rand(
        BATCH, verts.shape[1], 6), jnp.float32)
    ctex = jnp.asarray(np.random.RandomState(3).rand(BATCH, F, 3, 7), jnp.float32)

    @jax.jit
    def interp_fb(v, a, c):
        def f(v, a, c):
            vs = raster_jax.project_to_screen(v, K)
            pix, mask, zbuf = fragment_interpolate(
                fid, vs, faces, a, corner_attrs_batched=c)
            return jnp.sum(pix ** 2) + jnp.sum(jnp.where(
                jnp.isfinite(zbuf), zbuf, 0.0) ** 2)
        g = jax.grad(f, argnums=(0, 1, 2))(v, a, c)
        return g[0].sum() + g[1].sum() + g[2].sum()

    report("fragment_interp fwd+bwd", _median_ms(interp_fb, verts, attrs, ctex))

    # full corner shade fwd+bwd
    @jax.jit
    def shade_fb(v, c):
        def f(v, c):
            rgba = renderer(v, jnp.zeros((BATCH, verts.shape[1], 3)), K,
                            tex_coef=c)
            return jnp.sum(rgba ** 2)
        g = jax.grad(f, argnums=(0, 1))(v, c)
        return g[0].sum() + g[1].sum()

    report("corner shade fwd+bwd", _median_ms(shade_fb, verts, coef))


if __name__ == "__main__":
    main()
