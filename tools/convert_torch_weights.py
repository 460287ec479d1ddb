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

    put("conv1", "conv1")
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


def load_resnet_npz_into_variables(npz_path: str, variables: dict) -> dict:
    """Merge a converted resnet npz into a flax variables tree (backbone scope)."""
    import flax

    flat = dict(np.load(npz_path))
    params = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}), sep="/")
    for key, arr in flat.items():
        kind, rest = key.split("/", 1)
        tree = params if kind == "params" else stats
        for cand in list(tree):
            if cand.endswith(rest) or cand.endswith(rest.replace("/", "/")):
                if tree[cand].shape == arr.shape:
                    tree[cand] = np.asarray(arr)
                break
    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(params, sep="/")
    if stats:
        out["batch_stats"] = flax.traverse_util.unflatten_dict(stats, sep="/")
    return out


if __name__ == "__main__":
    kind = sys.argv[1]
    if kind == "vgg":
        convert_vgg(sys.argv[2], sys.argv[3])
    elif kind == "lpips":
        convert_lpips(sys.argv[2], sys.argv[3], sys.argv[4])
    elif kind.startswith("res"):
        convert_resnet(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown kind {kind}")
