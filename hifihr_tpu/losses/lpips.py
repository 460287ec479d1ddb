"""LPIPS perceptual metric (AlexNet backbone), flax.

Port of the `lpips` package the reference uses for texture evaluation
(train_hrnet.py:13, 563, 158; compute_texture_metric.py:5-11): AlexNet conv
features at 5 taps, unit-normalised per channel, squared difference, 1x1
linear heads, spatial average, sum over taps.  Inputs are RGB in [-1, 1]
(the reference scales to [-1,1] before calling — compute_texture_metric.py:53).

Weights (AlexNet conv + LPIPS linear heads) are a data dependency; convert
the torch release once with tools/convert_lpips.py into
assets/lpips_alex.npz.  Without the file, fixed He-init features give a
deterministic perceptual-style distance (clearly flagged via
`LPIPS.pretrained`), keeping pipelines runnable end-to-end.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LPIPS_NPZ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "lpips_alex.npz",
)

# AlexNet conv stack: (out_ch, kernel, stride, padding)
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, k, s, p) in enumerate(_ALEX):
            x = nn.Conv(ch, (k, k), (s, s), padding=p, name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPSHead(nn.Module):
    @nn.compact
    def __call__(self, diffs):
        total = 0.0
        for i, d in enumerate(diffs):
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


class LPIPS:
    """lpips_fn(img0, img1) -> (B,) distances; images (B,H,W,3) in [-1,1]."""

    def __init__(self, rng=None):
        self.net = AlexFeatures()
        self.head = LPIPSHead()
        dummy = jnp.zeros((1, 64, 64, 3))
        self.net_params = self.net.init(rng or jax.random.PRNGKey(0), dummy)
        taps = self.net.apply(self.net_params, dummy)
        self.head_params = self.head.init(
            jax.random.PRNGKey(1), [jnp.abs(t) for t in taps]
        )
        self.pretrained = False
        if os.path.exists(LPIPS_NPZ):
            with np.load(LPIPS_NPZ) as z:
                net_p = dict(self.net_params["params"])
                for i in range(5):
                    net_p[f"conv{i}"] = {
                        "kernel": jnp.asarray(z[f"conv{i}_kernel"]),
                        "bias": jnp.asarray(z[f"conv{i}_bias"]),
                    }
                self.net_params = {"params": net_p}
                head_p = {
                    f"lin{i}": {"kernel": jnp.asarray(z[f"lin{i}_kernel"])}
                    for i in range(5)
                }
                self.head_params = {"params": head_p}
            self.pretrained = True

    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        def feats(x):
            x = (x - _SHIFT) / _SCALE
            return self.net.apply(self.net_params, x)

        f0, f1 = feats(img0), feats(img1)

        def unit_norm(f):
            return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)

        diffs = [(unit_norm(a) - unit_norm(b)) ** 2 for a, b in zip(f0, f1)]
        return self.head.apply(self.head_params, diffs)
