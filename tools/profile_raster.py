"""Split the MSAA rasteriser time into XLA prep vs Pallas kernel.

The NIMBLE step profile (tools/profile_nimble.py) shows the F=11926 raster
is the single largest render stage (~74 ms at batch 32, Morton-sorted).
This tool answers WHERE that time goes:

  prep    — edge/z coefficient packing + per-tile compacted bin lists
            (_msaa_prep: the cumsum + count-compare runs over
            n_rows x n_rowbin slots per tile — O(F^2/64) compare work)
  kernel  — full rasterize (prep + pallas_call + assemble); kernel time
            is the difference

swept over tile_h (bin tightness vs program count) for the NIMBLE skin mesh
and the MANO mesh, batch from argv (default 32).

Usage: python tools/profile_raster.py [batch]
"""

from __future__ import annotations

import functools
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


def _nimble_screen():
    from hifihr_tpu.hand.nimble import NimbleLayer
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.renderer import morton_face_order

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
    faces = jnp.asarray(
        layer.faces_np[morton_face_order(layer.v_template_np, layer.faces_np)])
    return raster_jax.project_to_screen(verts, K), faces


def _mano_screen():
    from hifihr_tpu.hand.mano import ManoLayer
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.renderer import morton_face_order

    mano = ManoLayer(ncomps=45)
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(BATCH, 48) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32)
    verts = mano(pose, beta).verts + jnp.asarray([0.0, 0.0, 0.5])
    f = SIZE * 1.8
    K = jnp.asarray(np.tile(np.asarray(
        [[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1]], np.float32)[None],
        (BATCH, 1, 1)))
    faces = jnp.asarray(
        mano.faces_np[morton_face_order(mano.v_template_np, mano.faces_np)])
    return raster_jax.project_to_screen(verts, K), faces


def main():
    from hifihr_tpu.render.raster_msaa import _msaa_prep, rasterize_msaa_pallas

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
          f"batch {BATCH}", flush=True)
    for mesh_name, make in (("nimble F=11926", _nimble_screen),
                            ("mano   F=1538", _mano_screen)):
        vs, faces = make()

        @functools.partial(jax.jit, static_argnames=("tile_h",))
        def prep(vs, faces, tile_h=16):
            idx, packed, _, _ = _msaa_prep(vs, faces, SIZE, 128, tile_h)
            return idx.sum() + packed.sum()

        for tile_h in (8, 16, 32):
            p = _median_ms(lambda v: prep(v, faces, tile_h=tile_h), vs)

            def full(v, _th=tile_h):
                fid, cov, _ = rasterize_msaa_pallas(
                    v, faces, SIZE, tile_h=_th, samples=3)
                return cov.sum() + fid.sum()

            t = _median_ms(full, vs)
            print(f"{mesh_name} tile_h={tile_h:2d}: prep {p:7.1f} ms | "
                  f"full {t:7.1f} ms | kernel+assemble {t - p:7.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
