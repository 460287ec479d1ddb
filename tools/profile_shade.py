"""Decompose the NIMBLE textured-shade time (the dominant stage in
tools/profile_nimble.py): fragment interpolation vs UV texture sampling vs
normals/tangents assembly, each fwd+bwd at the production scale.

Usage: python tools/profile_shade.py [batch]
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
    from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas
    from hifihr_tpu.render.renderer import morton_face_order

    layer = NimbleLayer()
    rng = np.random.RandomState(0)
    params = {
        "pose_params": jnp.asarray(rng.randn(BATCH, 30) * 0.1, jnp.float32),
        "shape_params": jnp.asarray(rng.randn(BATCH, 20) * 0.1, jnp.float32),
        "texture_params": jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32),
    }
    out = layer(params)
    verts = out["verts"] + jnp.asarray([0.0, 0.0, 0.5])
    f = SIZE * 1.8
    K = jnp.asarray(np.tile(np.asarray(
        [[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1]], np.float32)[None],
        (BATCH, 1, 1)))
    order = morton_face_order(layer.v_template_np, layer.faces_np)
    faces = jnp.asarray(layer.faces_np[order])
    face_uv = jnp.asarray(np.asarray(layer.face_uv)[order])
    vs = raster_jax.project_to_screen(verts, K)
    fid, cov, _ = rasterize_msaa_pallas(vs, faces, SIZE, samples=3)
    return layer, verts, out["textures"], K, faces, face_uv, fid, cov


def main():
    layer, verts, tex, K, faces, face_uv, fid, cov = _geom()
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.interpolate import fragment_interpolate
    from hifihr_tpu.render.mesh import vertex_normals, vertex_tangents
    from hifihr_tpu.render.texture import sample_texture

    B = BATCH
    F = faces.shape[0]
    print(f"batch {B}, F={F}, tex {tex.shape}", flush=True)

    # 1) fragment interpolate (D=9 per-vertex + 2 static uv) fwd+bwd
    @jax.jit
    def interp(verts):
        vs = raster_jax.project_to_screen(verts, K)
        attrs = jnp.concatenate(
            [vertex_tangents(verts, faces, face_uv),
             vertex_normals(verts, faces), verts], axis=-1)
        def f(vs, attrs):
            pix, _, _ = fragment_interpolate(fid, vs, faces, attrs,
                                             corner_attrs_static=face_uv)
            return jnp.sum(pix ** 2)
        g = jax.grad(f, argnums=(0, 1))(vs, attrs)
        return g[0].sum() + g[1].sum()

    # 2) texture sampling alone fwd+bwd (uv from a fixed interp pass)
    vs0 = raster_jax.project_to_screen(verts, K)
    attrs0 = jnp.concatenate(
        [vertex_tangents(verts, faces, face_uv),
         vertex_normals(verts, faces), verts], axis=-1)
    pix0, _, _ = fragment_interpolate(fid, vs0, faces, attrs0,
                                      corner_attrs_static=face_uv)
    uv0 = jax.block_until_ready(pix0[..., -2:])

    @jax.jit
    def sample(tex, uv):
        def f(tex, uv):
            return jnp.sum(sample_texture(tex, uv) ** 2)
        g = jax.grad(f, argnums=(0, 1))(tex, uv)
        return g[0].sum() + g[1].sum()

    # 3) normals+tangents assembly alone fwd+bwd
    @jax.jit
    def norm_tan(verts):
        def f(v):
            return jnp.sum(vertex_normals(v, faces) ** 2) + jnp.sum(
                vertex_tangents(v, faces, face_uv) ** 2)
        return jax.grad(f)(verts).sum()

    rows = [
        ("fragment interp fwd+bwd", lambda: _median_ms(interp, verts)),
        ("sample_texture fwd+bwd", lambda: _median_ms(sample, tex, uv0)),
        ("normals+tangents fwd+bwd", lambda: _median_ms(norm_tan, verts)),
    ]
    for name, fn in rows:
        ms = fn()
        print(f"{name:28s} {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
