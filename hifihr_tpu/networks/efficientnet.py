"""EfficientNet-B0..B3 encoder (flax, NHWC).

Replaces the reference's vendored torch EfficientNet
(network/efficientnet_pt/model.py) used through EffiEncoder
(network/effnet_encoder.py): `extract_features` returns the 1536-ch head
feature map plus the low-level 32-ch 56x56 feature (output of flattened block
index 4, model.py:195-215) consumed by the LightEstimator.

Standard MBConv with squeeze-excite and swish; torchvision-compatible
structure for weight conversion.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from hifihr_tpu.networks.resnet import normalize_imagenet

# (expand_ratio, channels, repeats, stride, kernel)
_BASE_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
_PARAMS = {  # width, depth coefficients
    "effb0": (1.0, 1.0),
    "effb1": (1.0, 1.1),
    "effb2": (1.1, 1.2),
    "effb3": (1.2, 1.4),
}


def _round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3,
                                         dtype=self.dtype, name=name)
        inp = x
        c_mid = self.in_ch * self.expand
        if self.expand != 1:
            x = nn.Conv(c_mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = nn.swish(norm("bn0")(x))
        x = nn.Conv(
            c_mid, (self.kernel, self.kernel), (self.stride, self.stride),
            padding="SAME", feature_group_count=c_mid, use_bias=False,
            dtype=self.dtype, name="depthwise_conv",
        )(x)
        x = nn.swish(norm("bn1")(x))
        # squeeze-excite
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                             name="se_reduce")(s))
        s = nn.sigmoid(nn.Conv(c_mid, (1, 1), dtype=self.dtype,
                               name="se_expand")(s))
        x = x * s
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = norm("bn2")(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp
        return x


class EfficientNet(nn.Module):
    variant: str = "effb3"
    low_block_idx: int = 4  # flattened block whose output is the low feature
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth = _PARAMS[self.variant]
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3,
                                         dtype=self.dtype, name=name)
        c_stem = _round_filters(32, width)
        # 3x3/s2 "same"-padded stem in space-to-depth form (C_in=3 starves
        # the MXU lanes otherwise; see resnet.StemConvS2D).  SAME padding for
        # stride 2 at even sizes = (0, 1) -> pad_lo 0.
        from hifihr_tpu.networks.resnet import StemConvS2D

        x = StemConvS2D(c_stem, kernel_size=3, pad_lo=0, dtype=self.dtype,
                        name="conv_stem")(x)
        x = nn.swish(norm("bn_stem")(x))

        low = None
        idx = 0
        in_ch = c_stem
        for expand, ch, reps, stride, kernel in _BASE_BLOCKS:
            out_ch = _round_filters(ch, width)
            for r in range(_round_repeats(reps, depth)):
                x = MBConv(in_ch, out_ch, expand, stride if r == 0 else 1,
                           kernel, dtype=self.dtype, name=f"block{idx}")(x, train)
                in_ch = out_ch
                if idx == self.low_block_idx:
                    low = x
                idx += 1
        c_head = _round_filters(1280, width)
        x = nn.Conv(c_head, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = nn.swish(norm("bn_head")(x))
        return low, x


class EffNetEncoder(nn.Module):
    """imagenet-normalise -> EfficientNet -> (low [B,56,56,32], feat [B,1536])."""

    variant: str = "effb3"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = normalize_imagenet(images).astype(self.dtype)
        low, feat = EfficientNet(self.variant, dtype=self.dtype,
                                 name="backbone")(x, train)
        feat = jnp.mean(feat, axis=(1, 2), dtype=jnp.float32)
        return low, feat
