"""ResNet-18/50/101 image encoders (flax, NHWC).

Architecture matches torchvision ResNet v1 so pretrained torch weights can be
converted 1:1 (hifihr_tpu/tools weight converter), with the reference's
detail-preserving trick: layer4's downsampling stride is removed so the final
feature map stays 14x14 at 224^2 input (reference: network/res_encoder.py:
354-373).  Optional 4-channel input concatenates a heatmap channel
(reference: res_encoder.py:356-358).

Returns (low_features [B,28,28,512], features [B,14,14,C_out]) like the
reference's Resnet_4C.forward (res_encoder.py:364-373).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(images: jnp.ndarray) -> jnp.ndarray:
    """NHWC float images in [0,1] -> imagenet-normalised; supports 3 or 4 ch.

    4th channel (heatmap) is shifted to [-0.5, 0.5] like the reference
    (network/res_encoder.py:218-222).
    """
    c = images.shape[-1]
    mean = jnp.asarray(IMAGENET_MEAN + (0.5,) * (c - 3), images.dtype)
    std = jnp.asarray(IMAGENET_STD + (1.0,) * (c - 3), images.dtype)
    return (images - mean) / std


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output channels = 4 * filters
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


_CONFIGS = {
    "res18": (BasicBlock, (2, 2, 2, 2), 512),
    "res50": (Bottleneck, (3, 4, 6, 3), 2048),
    "res101": (Bottleneck, (3, 4, 23, 3), 2048),
}


def _s2d_geometry(kernel_size: int, pad_lo: int):
    """For a k x k / stride-2 conv with zero padding pad_lo on the low side:
    source offsets off = k_i - pad_lo decompose as off = 2*(m + mlo) + d with
    d in {0, 1}; returns (n_taps M, mlo, s2d conv padding (lo, hi))."""
    mlo = (-pad_lo) // 2
    mhi = (kernel_size - pad_lo - 1) // 2
    return mhi - mlo + 1, mlo, (-mlo, mhi)


class StemConvS2D(nn.Module):
    """A stride-2 stem conv in space-to-depth form — exact same math.

    A direct kxk/s2 conv over C_in=3 uses ~2% of the MXU's 128 contraction
    lanes (the ResNet 7x7 stem alone cost ~34 ms fwd+bwd at batch 64 on v5e —
    more than the REST of ResNet50 combined).  Patchifying the input 2x2 ->
    (H/2, W/2, 4*C_in) and convolving stride-1 with the correspondingly
    rearranged kernel computes the identical output with 4x the lane
    utilisation.  Kernel params are stored in the transformed layout; the
    weight converters perform the same rearrangement on torch weights
    (tools/convert_torch_weights.py).

    Geometry: 7x7 pad 3 -> 4x4 s2d taps, padding (2, 1) (ResNet);
    3x3 pad (1, x) -> 2x2, padding (1, 0) (HRNet); 3x3 "same" pad (0, 1) ->
    2x2, padding (0, 1) (EfficientNet).
    """

    features: int = 64
    kernel_size: int = 7
    pad_lo: int = 3  # zero padding of the ORIGINAL conv on the low side
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def transform_kernel(w: "jnp.ndarray", pad_lo: int = 3) -> "jnp.ndarray":
        """(k, k, C, O) standard stride-2 kernel -> (M, M, 4C, O) s2d kernel.

        y[i] = sum_k x[2i + k - pad_lo] w[k]; substituting
        2i + k - pad_lo = 2(i + m + mlo) + d with d in {0, 1} gives
        w2[m, n, (d_i, d_j, c), o] = w[2(m + mlo) + d_i + pad_lo, ..., c, o]
        (zero where the source index leaves [0, k))."""
        import numpy as np

        w = np.asarray(w)
        k, kw_, c, o = w.shape
        assert k == kw_
        M, mlo, _ = _s2d_geometry(k, pad_lo)
        w2 = np.zeros((M, M, 2, 2, c, o), w.dtype)
        for m in range(M):
            for n in range(M):
                for di in range(2):
                    for dj in range(2):
                        k1 = 2 * (m + mlo) + di + pad_lo
                        k2 = 2 * (n + mlo) + dj + pad_lo
                        if 0 <= k1 < k and 0 <= k2 < k:
                            w2[m, n, di, dj] = w[k1, k2]
        return jnp.asarray(w2.reshape(M, M, 4 * c, o))

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(
                f"StemConvS2D needs even spatial dims for the 2x2 patchify, "
                f"got {h}x{w}; pad the input by one row/column first"
            )
        M, _, pad = _s2d_geometry(self.kernel_size, self.pad_lo)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h // 2, w // 2, 4 * c)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (M, M, 4 * c, self.features),
        )
        y = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [pad, pad], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ResNet(nn.Module):
    """Backbone producing (low 28x28 stage-2 features, 14x14 stage-4 features)."""

    variant: str = "res50"
    layer4_stride1: bool = True  # reference's 14x14 trick (res_encoder.py:360-362)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, depths, _ = _CONFIGS[self.variant]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        x = StemConvS2D(64, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        low = None
        widths = (64, 128, 256, 512)
        for stage, (depth, width) in enumerate(zip(depths, widths)):
            stride = 1 if stage == 0 else 2
            if stage == 3 and self.layer4_stride1:
                stride = 1
            for i in range(depth):
                x = block_cls(width, stride if i == 0 else 1, dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train)
            if stage == 1:
                low = x  # [B, 28, 28, 512] for res50/101
        return low, x

    @property
    def out_channels(self) -> int:
        return _CONFIGS[self.variant][2]


class ResNetEncoder(nn.Module):
    """Imagenet-normalise -> ResNet -> (low, pooled features).

    Pooling is MMPool, a learned max/avg mix (reference res_encoder.py:247-268).
    """

    variant: str = "res50"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        from hifihr_tpu.networks.heads import MMPool

        x = normalize_imagenet(images).astype(self.dtype)
        low, feat = ResNet(self.variant, dtype=self.dtype, name="backbone")(x, train)
        pooled = MMPool(name="mmpool")(feat)
        return low, pooled.astype(jnp.float32)
