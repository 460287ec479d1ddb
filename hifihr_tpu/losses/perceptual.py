"""VGG19 perceptual loss (flax).

Mirrors reference utils/perceptual_loss.py:9-45: imagenet-normalised inputs
through VGG19 features up to relu3_2 (torchvision `features[:14]`), L2 between
feature maps, target branch detached.

Pretrained imagenet weights are a data dependency (like the MANO pickle):
convert once with `tools/convert_torch_weights.py vgg <vgg19.pth>
hifihr_tpu/assets/vgg19_features.npz`.  If the file is absent the module
falls back to fixed random (He) features — still a valid perceptual-style
metric, and the loss API stays identical; the Trainer logs a loud DEGRADED
warning at startup (hifihr_tpu/utils/weights.py).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.networks.resnet import normalize_imagenet

_CFG = [64, 64, "M", 128, 128, "M", 256, 256]  # through relu3_2
VGG_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets", "vgg19_features.npz")


class VGG19Features(nn.Module):
    """Input (B, H, W, 3) in [0,1] -> relu3_2 feature map (B, H/4, W/4, 256)."""

    @nn.compact
    def __call__(self, x):
        x = normalize_imagenet(x)
        i = 0
        for v in _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{i}")(x)
                x = nn.relu(x)
                i += 1
        return x


def load_or_init_vgg(rng=None):
    """Returns (module, params). Loads converted torch weights if present."""
    module = VGG19Features()
    dummy = jnp.zeros((1, 224, 224, 3))
    params = module.init(rng or jax.random.PRNGKey(0), dummy)
    path = os.path.normpath(VGG_NPZ)
    if os.path.exists(path):
        with np.load(path) as z:
            loaded = dict(params["params"])
            for i in range(6):
                k = f"conv{i}"
                loaded[k] = {
                    "kernel": jnp.asarray(z[f"{k}_kernel"]),
                    "bias": jnp.asarray(z[f"{k}_bias"]),
                }
            params = {"params": loaded}
    return module, params


def perceptual_loss(module, params, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L2 between VGG features; target branch is stop-gradiented."""
    f_pred = module.apply(params, pred)
    f_tgt = jax.lax.stop_gradient(module.apply(params, target))
    return jnp.mean((f_pred - f_tgt) ** 2)
