"""HRNet-W18-small-v2 encoder (flax, NHWC).

Replaces the reference's timm `hrnet_w18_small_v2` with
features_only/out_indices=[4] (network/res_encoder.py:375-394): multi-
resolution branches with repeated fusion, then the classification head
(incremental bottlenecks + strided downsample merge) producing a
[B, 7, 7, 1024] feature map at 224^2 input.

Like the reference, HRNet provides no 28x28 low-level feature for the light
estimator (HRnet_4C.forward returns None low — res_encoder.py:391-394); the
model falls back to the default directional light in that configuration.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifihr_tpu.networks.resnet import BasicBlock, Bottleneck, normalize_imagenet

# hrnet_w18_small_v2 config
_STAGES = [
    # (num_modules, num_branches, num_blocks, channels)
    (1, 2, (2, 2), (18, 36)),
    (3, 3, (2, 2, 2), (18, 36, 72)),
    (2, 4, (2, 2, 2, 2), (18, 36, 72, 144)),
]
_HEAD_CHANNELS = (32, 64, 128, 256)  # incre bottleneck widths (x4 expansion)


def _resize_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="nearest")


class FuseLayer(nn.Module):
    """Full cross-resolution fusion: every output branch sums contributions
    from every input branch (upsample via nearest+1x1, downsample via strided
    3x3 chains)."""

    channels: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, dtype=self.dtype,
                                         name=name)
        n = len(self.channels)
        outs = []
        for i in range(n):  # output branch
            acc = None
            for j in range(n):  # input branch
                y = xs[j]
                if j > i:  # upsample
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"up_{i}_{j}_conv")(y)
                    y = norm(f"up_{i}_{j}_bn")(y)
                    y = _resize_to(y, xs[i].shape[1], xs[i].shape[2])
                elif j < i:  # downsample chain
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), (2, 2), padding=1, use_bias=False,
                                    dtype=self.dtype,
                                    name=f"down_{i}_{j}_{k}_conv")(y)
                        y = norm(f"down_{i}_{j}_{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    channels: tuple
    num_blocks: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ys = []
        for b, (x, ch) in enumerate(zip(xs, self.channels)):
            for k in range(self.num_blocks[b]):
                x = BasicBlock(ch, dtype=self.dtype,
                               name=f"branch{b}_block{k}")(x, train)
            ys.append(x)
        return FuseLayer(self.channels, dtype=self.dtype, name="fuse")(ys, train)


class HRNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, dtype=self.dtype,
                                         name=name)
        # stem: /4 — first conv (C_in=3) in space-to-depth form
        # (see resnet.StemConvS2D); conv2 runs on 64 channels, left direct
        from hifihr_tpu.networks.resnet import StemConvS2D

        x = StemConvS2D(64, kernel_size=3, pad_lo=1, dtype=self.dtype,
                        name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        # stage 1: 2 bottlenecks at 64 planes (256 out)
        for k in range(2):
            x = Bottleneck(64, dtype=self.dtype, name=f"layer1_{k}")(x, train)

        branches = [x]
        for s, (num_modules, num_branches, num_blocks, channels) in enumerate(_STAGES):
            # transition: adapt/extend branch list
            new_branches = []
            for b in range(num_branches):
                if b < len(branches):
                    src = branches[b]
                    if src.shape[-1] != channels[b]:
                        y = nn.Conv(channels[b], (3, 3), padding=1, use_bias=False,
                                    dtype=self.dtype, name=f"t{s}_conv{b}")(src)
                        y = nn.relu(norm(f"t{s}_bn{b}")(y))
                    else:
                        y = src
                else:
                    y = nn.Conv(channels[b], (3, 3), (2, 2), padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"t{s}_conv{b}")(branches[-1])
                    y = nn.relu(norm(f"t{s}_bn{b}")(y))
                new_branches.append(y)
            branches = new_branches
            for m in range(num_modules):
                branches = HRModule(channels, num_blocks, dtype=self.dtype,
                                    name=f"stage{s}_mod{m}")(branches, train)

        # classification head: incre bottlenecks + strided merge
        y = Bottleneck(_HEAD_CHANNELS[0], dtype=self.dtype,
                       name="incre0")(branches[0], train)
        for i in range(1, 4):
            z = Bottleneck(_HEAD_CHANNELS[i], dtype=self.dtype,
                           name=f"incre{i}")(branches[i], train)
            y = nn.Conv(_HEAD_CHANNELS[i] * 4, (3, 3), (2, 2), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"downsamp{i}_conv")(y)
            y = nn.relu(norm(f"downsamp{i}_bn")(y))
            y = y + z
        return y  # [B, 7, 7, 1024]


class HRNetEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = normalize_imagenet(images).astype(self.dtype)
        feat = HRNet(dtype=self.dtype, name="backbone")(x, train)
        from hifihr_tpu.networks.heads import MMPool

        return None, MMPool(name="mmpool")(feat)
