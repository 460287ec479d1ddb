"""Decompose the NIMBLE train-step time (VERDICT r2 task #3).

NIMBLE is the reference paper's flagship model (models_res_nimble.py:57,
132-142): 5990-vert skin mesh, 11926 faces, UV-atlas appearance maps —
~7.8x the MANO face count through the same binned-MSAA render path.

Stages (batch from argv, default 32):
  full        — complete NIMBLE train step (fwd + losses + bwd + adam)
  norender    — same step with render=False
  layer       — NimbleLayer fwd+bwd alone (LBS + correctives + UV maps)
  raster      — MSAA face selection fwd at F=11926
  shade       — full textured render fwd+bwd (raster + interp + UV sample +
                phong with normal/spec maps)

Usage: python tools/profile_nimble.py [batch]
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


def _train_step_ms(render: bool):
    from __graft_entry__ import _fake_batch
    from hifihr_tpu.config import Config
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    losses = ["joint_3d", "joint_2d", "vert_3d", "mscale", "mshape", "mpose"]
    if render:
        losses += ["sil", "iou", "bone_direc"]
    cfg = Config(pretrain="res50", hand_model="nimble", render=render,
                 light_estimation=render, image_size=SIZE, aa_factor=3,
                 aa_mode="msaa", losses=tuple(losses))
    model = HiFiHR(config=cfg)
    batch = _fake_batch(BATCH, SIZE)
    rng = np.random.RandomState(0)
    batch["imgs"] = batch["imgs"] + rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, LossComputer(cfg), "FreiHand", cfg)
    sched = make_sched(cfg, 0)

    def run(state, batch, sched):
        s, d = step(state, batch, sched)
        return d["total"]

    return _median_ms(run, state, batch, sched)


def _layer_ms():
    from hifihr_tpu.hand.nimble import NimbleLayer

    layer = NimbleLayer()
    rng = np.random.RandomState(0)
    params = {
        "pose_params": jnp.asarray(rng.randn(BATCH, 30) * 0.1, jnp.float32),
        "shape_params": jnp.asarray(rng.randn(BATCH, 20) * 0.1, jnp.float32),
        "texture_params": jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32),
        "rot": jnp.asarray(rng.randn(BATCH, 3) * 0.1, jnp.float32),
    }

    @jax.jit
    def fwd_bwd(p):
        def f(p):
            out = layer(p)
            return (jnp.sum(out["verts"] ** 2) + jnp.sum(out["joints"] ** 2)
                    + jnp.sum(out["textures"] ** 2))
        return jax.grad(lambda q: f(q))(p)["pose_params"].sum()

    return _median_ms(fwd_bwd, params)


def _nimble_geom():
    from hifihr_tpu.hand.nimble import NimbleLayer

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
    return layer, verts, out["textures"], K


def _raster_ms(sort: bool = False):
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas

    layer, verts, _, K = _nimble_geom()
    faces = layer.skin_faces
    if sort:  # production ordering (renderer.morton_face_order)
        from hifihr_tpu.render.renderer import morton_face_order

        faces = jnp.asarray(
            layer.faces_np[morton_face_order(layer.v_template_np, layer.faces_np)]
        )

    @jax.jit
    def run(verts, K):
        vs = raster_jax.project_to_screen(verts, K)
        fid, cov, _ = rasterize_msaa_pallas(vs, faces, SIZE, samples=3)
        return cov.sum()

    return _median_ms(run, verts, K)


def _shade_ms(corner: bool = False):
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    layer, verts, textures, K = _nimble_geom()
    renderer = PhongRenderer(layer.skin_faces,
                             RenderSettings(image_size=SIZE, aa_mode="msaa"),
                             face_uv=layer.face_uv_np,
                             sort_template=layer.v_template_np,
                             corner_mean=layer.corner_mean_np if corner else None,
                             corner_basis=layer.corner_basis_np if corner else None)
    colors = jnp.ones((BATCH, verts.shape[1], 3), jnp.float32) * 0.5
    rng = np.random.RandomState(1)
    coef = jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32)

    @jax.jit
    def run(verts, textures, coef):
        def f(v, t, c):
            if corner:
                rgba = renderer(v, colors, K, tex_coef=c)
                return jnp.sum(rgba ** 2)
            rgba = renderer(v, colors, K, texture_image=t)
            return jnp.sum(rgba ** 2)
        args = (2,) if corner else (1,)
        g = jax.grad(f, argnums=(0,) + args)(verts, textures, coef)
        return g[0].sum() + g[1].sum()

    return _median_ms(run, verts, textures, coef)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, batch {BATCH}",
          flush=True)
    stages = [
        ("nimble layer fwd+bwd", _layer_ms),
        ("raster F=11926 (MSAA fwd)", _raster_ms),
        ("raster F=11926 morton-sorted", lambda: _raster_ms(sort=True)),
        ("shade textured (fwd+bwd)", _shade_ms),
        ("shade corner-tex (fwd+bwd)", lambda: _shade_ms(corner=True)),
        ("train step, no render", lambda: _train_step_ms(False)),
        ("train step, full nimble", lambda: _train_step_ms(True)),
    ]
    @jax.jit
    def null(x):
        return x.sum()

    floor = _median_ms(null, jnp.ones((8,), jnp.float32))
    print(f"{'null (sync floor)':34s} {floor:8.1f} ms", flush=True)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, fn in stages:
        if only and not any(o in name for o in only):
            continue
        ms = fn()
        real = ms - floor
        print(f"{name:34s} {ms:8.1f} ms | -floor {real:7.1f} ms "
              f"({BATCH / max(real, 1e-6) * 1e3:7.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
