"""Decompose the no-render train step (encoder vs hand layer vs losses).

The full-NIMBLE step is now render-dominated no more (318 ms at batch 64, of
which ~94 raster + ~150 interp/shade); the no-render remainder (~69 ms)
exceeds a res50-bf16 fwd+bwd estimate by ~5x.  Stages, each fwd+bwd where
applicable, batch from argv (default 64):

  encoder    — res50 trunk+heads fwd+bwd alone
  mano       — ManoLayer fwd+bwd alone
  nimble     — NimbleLayer fwd+bwd alone (step-path outputs only; the UV
               texture image is excluded like XLA's DCE excludes it in-step)
  losses     — loss stack on fixed outputs, grads w.r.t. outputs
  adam       — optimizer update alone on the flagship param tree

Usage: python tools/profile_norender.py [batch]  (run ALONE on the box)
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


def _median_ms(fn, *args, steps=10):
    out = float(jnp.asarray(fn(*args)).sum())
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = float(jnp.asarray(fn(*args)).sum())
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out)
    return 1e3 * float(np.median(times))


def _encoder_ms(train: bool = True):
    from hifihr_tpu.networks.resnet import ResNetEncoder

    enc = ResNetEncoder(variant="res50", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), imgs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def run(params, imgs):
        def f(p):
            out = enc.apply(
                {"params": p, "batch_stats": batch_stats}, imgs,
                train=train, mutable=["batch_stats"] if train else False)
            feats = out[0] if train else out
            leaves = jax.tree_util.tree_leaves(feats)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves
                       if hasattr(l, "dtype"))
        return jax.tree_util.tree_leaves(jax.grad(f)(params))[0].sum()

    return _median_ms(run, params, imgs)


def _mano_ms():
    from hifihr_tpu.hand.mano import ManoLayer

    layer = ManoLayer(ncomps=45)
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(BATCH, 48) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32)

    @jax.jit
    def run(pose, beta):
        def f(p, b):
            out = layer(p, b)
            return jnp.sum(out.verts ** 2) + jnp.sum(out.joints ** 2)
        g = jax.grad(f, argnums=(0, 1))(pose, beta)
        return g[0].sum() + g[1].sum()

    return _median_ms(run, pose, beta)


def _nimble_ms():
    from hifihr_tpu.hand.nimble import NimbleLayer

    layer = NimbleLayer()
    rng = np.random.RandomState(0)
    params = {
        "pose_params": jnp.asarray(rng.randn(BATCH, 30) * 0.1, jnp.float32),
        "shape_params": jnp.asarray(rng.randn(BATCH, 20) * 0.1, jnp.float32),
        "texture_params": jnp.asarray(rng.randn(BATCH, 10) * 0.1, jnp.float32),
    }

    @jax.jit
    def run(p):
        def f(p):
            out = layer(p)
            # step-path outputs only: verts + joints (textures/UV image is
            # DCE'd inside the real train step's corner-texture path)
            return jnp.sum(out["verts"] ** 2) + jnp.sum(out["joints"] ** 2)
        return jax.grad(lambda q: f(q))(p)["pose_params"].sum()

    return _median_ms(run, params)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
          f"batch {BATCH}", flush=True)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, fn in [("encoder res50 fwd+bwd", _encoder_ms),
                     ("mano layer fwd+bwd", _mano_ms),
                     ("nimble layer fwd+bwd (step path)", _nimble_ms)]:
        if only and not any(o in name for o in only):
            continue
        ms = fn()
        print(f"{name:34s} {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
