"""Stacked hourglass heatmap network (flax).

Counterpart of the reference's legacy `Net_HM_HG` (network/net_hg.py:1-166):
conv stem to stride 4, N stacked hourglass modules each emitting 21-channel
heatmaps with intermediate supervision, plus the soft-argmax uv decoding the
driver's hm_integral losses consume (utils/visualize_util.py:826-880
compute_uv_from_integral).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class HGResidual(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        y = nn.relu(norm("bn1")(x))
        y = nn.Conv(self.features // 2, (1, 1), name="conv1")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features // 2, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(norm("bn3")(y))
        y = nn.Conv(self.features, (1, 1), name="conv3")(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), name="skip")(x)
        return x + y


class Hourglass(nn.Module):
    features: int
    depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        # clamp recursion so the innermost pool never hits 0 px (shapes are
        # static, so this resolves at trace time)
        depth = min(self.depth, max(1, int(math.log2(min(x.shape[1], x.shape[2])))))

        def hg(level, x):
            up1 = HGResidual(self.features, name=f"up_{level}")(x, train)
            low = nn.max_pool(x, (2, 2), strides=(2, 2))
            low = HGResidual(self.features, name=f"low1_{level}")(low, train)
            if level > 1:
                low = hg(level - 1, low)
            else:
                low = HGResidual(self.features, name=f"low2_{level}")(low, train)
            low = HGResidual(self.features, name=f"low3_{level}")(low, train)
            up2 = jax.image.resize(low, up1.shape, "nearest")
            return up1 + up2

        return hg(depth, x)


class NetHMHG(nn.Module):
    """images (B, 256, 256, 3) -> list of (B, 64, 64, 21) heatmaps per stack."""

    num_stacks: int = 2
    features: int = 256
    num_joints: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        from hifihr_tpu.networks.resnet import StemConvS2D

        # 7x7/s2 C_in=3 stem in space-to-depth form (see StemConvS2D)
        x = StemConvS2D(64, kernel_size=7, pad_lo=3, use_bias=True,
                        name="stem_conv")(x)
        x = nn.relu(norm("stem_bn")(x))
        x = HGResidual(128, name="stem_res1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = HGResidual(128, name="stem_res2")(x, train)
        x = HGResidual(self.features, name="stem_res3")(x, train)

        outs = []
        for s in range(self.num_stacks):
            y = Hourglass(self.features, name=f"hg{s}")(x, train)
            y = HGResidual(self.features, name=f"post_res{s}")(y, train)
            y = nn.relu(
                nn.BatchNorm(use_running_average=not train, name=f"post_bn{s}")(
                    nn.Conv(self.features, (1, 1), name=f"post_conv{s}")(y)
                )
            )
            hm = nn.Conv(self.num_joints, (1, 1), name=f"hm{s}")(y)
            outs.append(hm)
            if s < self.num_stacks - 1:
                x = (
                    x
                    + nn.Conv(self.features, (1, 1), name=f"merge_feat{s}")(y)
                    + nn.Conv(self.features, (1, 1), name=f"merge_hm{s}")(hm)
                )
        return outs


def heatmaps_to_uv(hm: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax (integral) uv decoding: (B, H, W, J) -> (B, J, 2) in pixels.

    Reference: compute_uv_from_integral (utils/visualize_util.py:826-880).
    """
    b, h, w, j = hm.shape
    flat = hm.reshape(b, h * w, j)
    prob = jax.nn.softmax(flat, axis=1).reshape(b, h, w, j)
    xs = jnp.arange(w, dtype=hm.dtype) + 0.5
    ys = jnp.arange(h, dtype=hm.dtype) + 0.5
    u = jnp.einsum("bhwj,w->bj", prob, xs)
    v = jnp.einsum("bhwj,h->bj", prob, ys)
    return jnp.stack([u, v], axis=-1)
