"""Regression heads: MMPool, HandEncoder, LightEstimator (flax, NHWC).

Mirrors reference network/res_encoder.py:
  * MMPool — learned sigmoid mix of global max/avg pooling (:247-268)
  * HandEncoder — MLP heads for pose/shape/texture/trans/rot/scale (:53-167)
  * LightEstimator — conv stack -> 3 diffuse colors (hardtanh) + 3 direction (:169-209)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MMPool(nn.Module):
    """Global pool: sigmoid(p) * max + (1 - sigmoid(p)) * avg over H,W."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, C)
        p = self.param("p", nn.initializers.zeros, (1,))
        w = nn.sigmoid(p.astype(x.dtype))
        x_max = jnp.max(x, axis=(1, 2))
        x_avg = jnp.mean(x, axis=(1, 2))
        return x_max * w + x_avg * (1.0 - w)


def _mlp_head(x, hidden: tuple[int, ...], out: int, name: str):
    """Linear(+ReLU) stack ending in a linear projection to `out`."""
    for i, h in enumerate(hidden):
        x = nn.Dense(h, kernel_init=nn.initializers.kaiming_normal(),
                     name=f"{name}_fc{i}")(x)
        x = nn.relu(x)
    return nn.Dense(out, kernel_init=nn.initializers.kaiming_normal(),
                    name=f"{name}_out")(x)


class HandEncoder(nn.Module):
    """features [B, in_dim] -> hand parameter dict.

    ncomps = (shape_ncomp, pose_ncomp, tex_ncomp); for hand_model='mano'
    tex_ncomp is None and a 3-dof rot head is added (the MANO pose vector
    already carries global rotation in its first 3 entries; the separate rot
    head exists for interface parity — reference res_encoder.py:114-122).
    """

    hand_model: str  # 'mano' | 'nimble'
    shape_ncomp: int
    pose_ncomp: int
    tex_ncomp: int | None = None
    use_mean_shape: bool = False
    if_render: bool = True

    @nn.compact
    def __call__(self, features, train: bool = False):
        b = features.shape[0]
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=name)
        x = nn.Dense(1024, kernel_init=nn.initializers.kaiming_normal(), name="base_fc0")(features)
        x = nn.relu(norm("base_bn0")(x))
        x = nn.Dense(512, kernel_init=nn.initializers.kaiming_normal(), name="base_fc1")(x)
        base = nn.relu(norm("base_bn1")(x))

        pose_params = _mlp_head(base, (128,), self.pose_ncomp, "pose")
        scale = _mlp_head(base, (128, 32), 1, "scale")
        trans = _mlp_head(base, (128, 32), 3, "trans")
        rot = _mlp_head(base, (128, 32), 3, "rot") if self.hand_model == "mano" else None

        if self.hand_model == "nimble":
            if self.if_render:
                texture_params = _mlp_head(base, (128,), self.tex_ncomp, "tex")
            else:
                texture_params = jnp.zeros((b, self.tex_ncomp), features.dtype)
        else:
            texture_params = None

        if self.use_mean_shape:
            shape_params = jnp.zeros((b, self.shape_ncomp), features.dtype)
        else:
            shape_params = _mlp_head(base, (128,), self.shape_ncomp, "shape")

        return {
            "pose_params": pose_params,
            "shape_params": shape_params,
            "texture_params": texture_params,
            "scale": scale,
            "trans": trans,
            "rot": rot,
        }


class LightEstimator(nn.Module):
    """low features [B, 28, 28, C] (or [B,56,56,32] for effb3) -> directional light.

    Returns {'colors': (B,3) in [-1,1] via hardtanh, 'directions': (B,3)}.
    """

    @nn.compact
    def __call__(self, low):
        c = low.shape[-1]
        if c == 32:  # efficientnet-b3 low features are 56x56x32
            x = nn.Conv(48, (1, 1), (4, 4), padding="VALID", name="conv1")(low)
        else:
            x = nn.Conv(48, (1, 1), (2, 2), padding="VALID", name="conv1")(low)
        x = nn.relu(x)  # [B,14,14,48]
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = nn.relu(x)  # [B,12,12,48]
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.Conv(64, (3, 3), (2, 2), padding="VALID", name="conv3")(x)
        x = nn.relu(x)  # [B,5,5,64]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # [B,2,2,64]
        x = x.reshape(x.shape[0], -1)  # [B,256]
        x = nn.relu(nn.Dense(64, kernel_init=nn.initializers.kaiming_normal(), name="fc0")(x))
        lights = nn.Dense(6, kernel_init=nn.initializers.kaiming_normal(), name="fc1")(x)
        colors = jnp.clip(lights[:, :3], -1.0, 1.0)  # hardtanh
        directions = lights[:, 3:]
        return {"colors": colors, "directions": directions}
