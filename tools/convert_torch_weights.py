"""Convert pretrained torch checkpoints into the npz formats the flax models load.

No torchvision/timm required — takes a saved `state_dict` (.pth) and maps
parameter names.  Supported:

  resnet:  torchvision resnet18/50/101 state_dict -> flax ResNet param tree npz
  vgg:     torchvision vgg19 state_dict -> assets/vgg19_features.npz
  lpips:   lpips AlexNet checkpoint -> assets/lpips_alex.npz

Usage:
  python tools/convert_torch_weights.py vgg /path/vgg19.pth hifihr_tpu/assets/vgg19_features.npz
  python tools/convert_torch_weights.py lpips /path/alex.pth /path/lpips_lin.pth hifihr_tpu/assets/lpips_alex.npz
  python tools/convert_torch_weights.py resnet50 /path/resnet50.pth /path/out.npz

Conv kernels transpose OIHW -> HWIO; linear kernels transpose (out,in) ->
(in,out).  BatchNorm running stats map to flax batch_stats.
"""

from __future__ import annotations

import sys

import numpy as np
import torch


def _conv(w):
    return np.transpose(w.numpy(), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_vgg(src: str, dst: str):
    sd = torch.load(src, map_location="cpu", weights_only=True)
    # torchvision vgg19 features conv layers at indices 0,2,5,7,10,12 (<=relu3_2)
    idxs = [0, 2, 5, 7, 10, 12]
    out = {}
    for i, li in enumerate(idxs):
        out[f"conv{i}_kernel"] = _conv(sd[f"features.{li}.weight"])
        out[f"conv{i}_bias"] = sd[f"features.{li}.bias"].numpy()
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}")


def convert_lpips(alex_src: str, lin_src: str, dst: str):
    alex = torch.load(alex_src, map_location="cpu", weights_only=True)
    lin = torch.load(lin_src, map_location="cpu", weights_only=True)
    conv_idx = [0, 3, 6, 8, 10]  # torchvision alexnet features
    out = {}
    for i, li in enumerate(conv_idx):
        out[f"conv{i}_kernel"] = _conv(alex[f"features.{li}.weight"])
        out[f"conv{i}_bias"] = alex[f"features.{li}.bias"].numpy()
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        out[f"lin{i}_kernel"] = _conv(lin[key])
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}")


def convert_resnet(src: str, dst: str):
    sd = torch.load(src, map_location="cpu", weights_only=True)
    out = {}

    def put(flax_name, torch_prefix):
        out[f"params/{flax_name}/kernel"] = _conv(sd[f"{torch_prefix}.weight"])

    def put_bn(flax_name, torch_prefix):
        out[f"params/{flax_name}/scale"] = sd[f"{torch_prefix}.weight"].numpy()
        out[f"params/{flax_name}/bias"] = sd[f"{torch_prefix}.bias"].numpy()
        out[f"batch_stats/{flax_name}/mean"] = sd[f"{torch_prefix}.running_mean"].numpy()
        out[f"batch_stats/{flax_name}/var"] = sd[f"{torch_prefix}.running_var"].numpy()

    # stem kernel is stored in space-to-depth layout (networks/resnet.py
    # StemConvS2D): rearrange the torchvision 7x7 kernel accordingly
    from hifihr_tpu.networks.resnet import StemConvS2D

    out["params/conv1/kernel"] = np.asarray(
        StemConvS2D.transform_kernel(_conv(sd["conv1.weight"]))
    )
    put_bn("bn1", "bn1")
    depths = {
        "layer1": 0, "layer2": 0, "layer3": 0, "layer4": 0,
    }
    for l in range(1, 5):
        i = 0
        while f"layer{l}.{i}.conv1.weight" in sd:
            p = f"layer{l}.{i}"
            f = f"layer{l}_{i}"
            n_convs = 3 if f"{p}.conv3.weight" in sd else 2
            for c in range(1, n_convs + 1):
                put(f"{f}/conv{c}", f"{p}.conv{c}")
                put_bn(f"{f}/bn{c}", f"{p}.bn{c}")
            if f"{p}.downsample.0.weight" in sd:
                put(f"{f}/downsample_conv", f"{p}.downsample.0")
                put_bn(f"{f}/downsample_bn", f"{p}.downsample.1")
            i += 1
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays)")


def convert_efficientnet(src: str, dst: str):
    """efficientnet_pytorch-style state_dict (the reference's vendored
    network/efficientnet_pt/model.py naming) -> flax EfficientNet npz."""
    sd = torch.load(src, map_location="cpu", weights_only=True)
    out = {}

    def put_bn(flax_name, torch_prefix):
        out[f"params/{flax_name}/scale"] = sd[f"{torch_prefix}.weight"].numpy()
        out[f"params/{flax_name}/bias"] = sd[f"{torch_prefix}.bias"].numpy()
        out[f"batch_stats/{flax_name}/mean"] = sd[f"{torch_prefix}.running_mean"].numpy()
        out[f"batch_stats/{flax_name}/var"] = sd[f"{torch_prefix}.running_var"].numpy()

    from hifihr_tpu.networks.resnet import StemConvS2D

    # stem stored in space-to-depth layout (SAME 3x3/s2 -> pad_lo 0)
    out["params/conv_stem/kernel"] = np.asarray(
        StemConvS2D.transform_kernel(_conv(sd["_conv_stem.weight"]), pad_lo=0)
    )
    put_bn("bn_stem", "_bn0")
    i = 0
    while f"_blocks.{i}._depthwise_conv.weight" in sd:
        p, f = f"_blocks.{i}", f"block{i}"
        if f"{p}._expand_conv.weight" in sd:
            out[f"params/{f}/expand_conv/kernel"] = _conv(sd[f"{p}._expand_conv.weight"])
            put_bn(f"{f}/bn0", f"{p}._bn0")
        out[f"params/{f}/depthwise_conv/kernel"] = _conv(sd[f"{p}._depthwise_conv.weight"])
        put_bn(f"{f}/bn1", f"{p}._bn1")
        for se in ("se_reduce", "se_expand"):
            out[f"params/{f}/{se}/kernel"] = _conv(sd[f"{p}._{se}.weight"])
            out[f"params/{f}/{se}/bias"] = sd[f"{p}._{se}.bias"].numpy()
        out[f"params/{f}/project_conv/kernel"] = _conv(sd[f"{p}._project_conv.weight"])
        put_bn(f"{f}/bn2", f"{p}._bn2")
        i += 1
    out["params/conv_head/kernel"] = _conv(sd["_conv_head.weight"])
    put_bn("bn_head", "_bn1")
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays, {i} blocks)")


def convert_hrnet(src: str, dst: str):
    """Official/timm HRNet (hrnet_w18_small_v2) state_dict -> flax HRNet npz.

    Covers the subgraph the encoder consumes (features_only out_indices=[4],
    reference network/res_encoder.py:375-394): stem, layer1, transitions,
    stages (branches + fuse layers), incre + downsample head.  Validated by a
    structural roundtrip test until a real released checkpoint is on disk.
    """
    sd = torch.load(src, map_location="cpu", weights_only=True)
    out = {}

    def put(flax_name, key):
        out[f"params/{flax_name}/kernel"] = _conv(sd[f"{key}.weight"])
        if f"{key}.bias" in sd:
            out[f"params/{flax_name}/bias"] = sd[f"{key}.bias"].numpy()

    def put_bn(flax_name, key):
        out[f"params/{flax_name}/scale"] = sd[f"{key}.weight"].numpy()
        out[f"params/{flax_name}/bias"] = sd[f"{key}.bias"].numpy()
        out[f"batch_stats/{flax_name}/mean"] = sd[f"{key}.running_mean"].numpy()
        out[f"batch_stats/{flax_name}/var"] = sd[f"{key}.running_var"].numpy()

    def put_block(flax_prefix, torch_prefix, n_convs):
        for c in range(1, n_convs + 1):
            put(f"{flax_prefix}/conv{c}", f"{torch_prefix}.conv{c}")
            put_bn(f"{flax_prefix}/bn{c}", f"{torch_prefix}.bn{c}")
        if f"{torch_prefix}.downsample.0.weight" in sd:
            put(f"{flax_prefix}/downsample_conv", f"{torch_prefix}.downsample.0")
            put_bn(f"{flax_prefix}/downsample_bn", f"{torch_prefix}.downsample.1")

    from hifihr_tpu.networks.resnet import StemConvS2D

    # first stem conv stored in space-to-depth layout (3x3/s2 pad 1)
    out["params/conv1/kernel"] = np.asarray(
        StemConvS2D.transform_kernel(_conv(sd["conv1.weight"]), pad_lo=1)
    )
    put_bn("bn1", "bn1")
    put("conv2", "conv2")
    put_bn("bn2", "bn2")
    k = 0
    while f"layer1.{k}.conv1.weight" in sd:
        put_block(f"layer1_{k}", f"layer1.{k}", 3)
        k += 1
    # transitions: existing-branch adapters are Sequential(Conv,BN,ReLU);
    # new-branch adders nest one deeper (.0.0 / .0.1)
    for s in range(3):
        t = f"transition{s + 1}"
        # pass-through branches are None in the official net (no keys) —
        # scan all possible branch slots instead of stopping at the first gap
        for b in range(4):
            if f"{t}.{b}.0.weight" in sd:
                put(f"t{s}_conv{b}", f"{t}.{b}.0")
                put_bn(f"t{s}_bn{b}", f"{t}.{b}.1")
            elif f"{t}.{b}.0.0.weight" in sd:
                put(f"t{s}_conv{b}", f"{t}.{b}.0.0")
                put_bn(f"t{s}_bn{b}", f"{t}.{b}.0.1")
        # stage modules
        m = 0
        while f"stage{s + 2}.{m}.branches.0.0.conv1.weight" in sd:
            sp, fp = f"stage{s + 2}.{m}", f"stage{s}_mod{m}"
            br = 0
            while f"{sp}.branches.{br}.0.conv1.weight" in sd:
                blk = 0
                while f"{sp}.branches.{br}.{blk}.conv1.weight" in sd:
                    put_block(f"{fp}/branch{br}_block{blk}",
                              f"{sp}.branches.{br}.{blk}", 2)
                    blk += 1
                br += 1
            for i in range(br):
                for j in range(br):
                    if j > i and f"{sp}.fuse_layers.{i}.{j}.0.weight" in sd:
                        put(f"{fp}/fuse/up_{i}_{j}_conv", f"{sp}.fuse_layers.{i}.{j}.0")
                        put_bn(f"{fp}/fuse/up_{i}_{j}_bn", f"{sp}.fuse_layers.{i}.{j}.1")
                    elif j < i:
                        for kk in range(i - j):
                            key = f"{sp}.fuse_layers.{i}.{j}.{kk}.0"
                            if f"{key}.weight" in sd:
                                put(f"{fp}/fuse/down_{i}_{j}_{kk}_conv", key)
                                put_bn(f"{fp}/fuse/down_{i}_{j}_{kk}_bn",
                                       f"{sp}.fuse_layers.{i}.{j}.{kk}.1")
            m += 1
    for i in range(4):
        if f"incre_modules.{i}.0.conv1.weight" in sd:
            put_block(f"incre{i}", f"incre_modules.{i}.0", 3)
        if i >= 1 and f"downsamp_modules.{i - 1}.0.weight" in sd:
            put(f"downsamp{i}_conv", f"downsamp_modules.{i - 1}.0")
            put_bn(f"downsamp{i}_bn", f"downsamp_modules.{i - 1}.1")
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays)")


def expand_conv1_to_4ch(kernel: np.ndarray) -> np.ndarray:
    """(kh, kw, 3, out) -> (kh, kw, 4, out): heatmap channel initialised from
    the RGB mean (reference res_encoder.py:356-358; the reference's own
    `mean(weight, dim=-1) * 0.1` has a shape bug, so the intended
    mean-over-input-channels is used)."""
    extra = kernel.mean(axis=2, keepdims=True) * 0.1
    return np.concatenate([kernel, extra], axis=2)


def load_resnet_npz_into_variables(npz_path: str, variables: dict) -> dict:
    """Merge a converted npz into a flax variables tree (backbone scope).
    Canonical implementation lives in hifihr_tpu.utils.weights so the runtime
    can warm-start encoders without importing tools/."""
    from hifihr_tpu.utils.weights import merge_npz_into_variables

    return merge_npz_into_variables(npz_path, variables)


if __name__ == "__main__":
    kind = sys.argv[1]
    if kind == "vgg":
        convert_vgg(sys.argv[2], sys.argv[3])
    elif kind == "lpips":
        convert_lpips(sys.argv[2], sys.argv[3], sys.argv[4])
    elif kind.startswith("res"):
        convert_resnet(sys.argv[2], sys.argv[3])
    elif kind.startswith("eff"):
        convert_efficientnet(sys.argv[2], sys.argv[3])
    elif kind.startswith("hr"):
        convert_hrnet(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown kind {kind}")
