"""Decompose the flagship train-step time on the attached device.

Times each pipeline stage as its own jitted program (synchronized medians),
so perf work can target the actual bottleneck instead of guessing:

  full        — complete train step (fwd + losses + bwd + adam), flagship cfg
  norender    — same step with render=False (keypoint/vert losses only)
  encoder     — ResNet50 fwd+bwd alone at the flagship batch
  raster      — MSAA Pallas face-selection forward (no gradient by design)
  shade       — interpolate + Phong + coverage fwd+bwd (grad wrt verts/colors)

Usage: python tools/profile_step.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZE = 224
STEPS = 10


def _median_ms(fn, *args, steps=STEPS):
    """fn must reduce to a SCALAR; sync via float() — on the tunneled axon
    backend `jax.block_until_ready` does not reliably block, so value
    fetches are the only honest synchronisation."""
    out = float(jnp.asarray(fn(*args)).sum())
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = float(jnp.asarray(fn(*args)).sum())
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out)
    return 1e3 * float(np.median(times))


def _train_step_ms(render: bool, loss_set: str = "bench"):
    """loss_set: 'bench' = the bench.py flagship set (sil+iou+bone_direc and
    the presence-gated photometric texture/mrgb/ssim branches fire),
    'geo' = keypoint/vert losses only, 'sil' = geo + silhouette only —
    the deltas isolate the loss-stack cost from the render cost."""
    from __graft_entry__ import _fake_batch
    from hifihr_tpu.config import Config
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    losses = ["joint_3d", "joint_2d", "vert_3d", "mscale", "mshape", "mpose"]
    if render and loss_set == "sil":
        losses += ["sil"]
    elif render and loss_set == "bench":
        # identical to bench.py LOSSES; the fake batch's segms_gt/texture_con
        # make the presence-gated photometric branches fire as in bench
        losses += ["sil", "iou", "bone_direc"]
    cfg = Config(pretrain="res50", hand_model="mano", render=render,
                 light_estimation=render, image_size=SIZE, aa_factor=3,
                 aa_mode="msaa", losses=tuple(losses))
    model = HiFiHR(config=cfg)
    batch = _fake_batch(BATCH, SIZE)
    if render and loss_set == "sil":
        # texture_con's presence gates the photometric texture/mrgb/ssim
        # branches (losses/stack.py:184) — drop it to isolate them
        batch.pop("texture_con")
    rng = np.random.RandomState(0)
    batch["imgs"] = batch["imgs"] + rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, LossComputer(cfg), "FreiHand", cfg)
    sched = make_sched(cfg, 0)

    def run(state, batch, sched):
        s, d = step(state, batch, sched)
        return d["total"]

    return _median_ms(run, state, batch, sched)


def _encoder_ms():
    from hifihr_tpu.networks.resnet import ResNetEncoder

    enc = ResNetEncoder(variant="res50", dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), imgs, train=False)

    @jax.jit
    def fwd_bwd(params, imgs):
        def f(p):
            low, feat = enc.apply({"params": p, "batch_stats": variables["batch_stats"]},
                                  imgs, train=False)
            return jnp.sum(feat ** 2) + jnp.sum(low ** 2)
        return jax.grad(f)(params)

    return _median_ms(lambda p, i: jax.tree_util.tree_leaves(fwd_bwd(p, i))[0],
                      variables["params"], imgs)


def _hand_geometry(batch):
    from hifihr_tpu.hand.mano import ManoLayer

    mano = ManoLayer(ncomps=45)
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(batch, 48) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.randn(batch, 10) * 0.1, jnp.float32)
    out = mano(pose, beta)
    verts = out.verts + jnp.asarray([0.0, 0.0, 0.5])
    f = SIZE * 1.8
    K = jnp.asarray(np.tile(np.asarray(
        [[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1]], np.float32)[None],
        (batch, 1, 1)))
    return verts, mano.faces, K


def _raster_ms():
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas

    verts, faces, K = _hand_geometry(BATCH)

    @jax.jit
    def run(verts, K):
        vs = raster_jax.project_to_screen(verts, K)
        fid, cov, _ = rasterize_msaa_pallas(vs, faces, SIZE, samples=3)
        return cov.sum()

    return _median_ms(run, verts, K)


def _shade_ms():
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts, faces, K = _hand_geometry(BATCH)
    colors = jnp.ones((BATCH, verts.shape[1], 3), jnp.float32) * 0.5
    renderer = PhongRenderer(faces, RenderSettings(image_size=SIZE, aa_mode="msaa"))

    @jax.jit
    def run(verts, colors):
        def f(v, c):
            rgba = renderer(v, c, K)
            return jnp.sum(rgba ** 2)
        g = jax.grad(f, argnums=(0, 1))(verts, colors)
        return g[0].sum() + g[1].sum()

    return _median_ms(run, verts, colors)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, batch {BATCH}",
          flush=True)

    @jax.jit
    def null(x):
        return x.sum()

    floor = _median_ms(null, jnp.ones((8,), jnp.float32))
    print(f"{'null (sync floor)':34s} {floor:8.1f} ms", flush=True)
    stages = [
        ("raster (MSAA select fwd)", _raster_ms),
        ("shade (interp+phong fwd+bwd)", _shade_ms),
        ("encoder res50 bf16 fwd+bwd", _encoder_ms),
        ("train step, no render", lambda: _train_step_ms(False)),
        ("train step, render+sil only", lambda: _train_step_ms(True, "sil")),
        ("train step, full flagship", lambda: _train_step_ms(True)),
    ]
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
