"""End-to-end torch→flax weight-conversion parity (VERDICT r1 item 4).

A CPU-torch state_dict (torchvision naming) is serialized, run through
tools/convert_torch_weights.py, loaded into the flax port, and the flax
forward must match the torch forward to float32 tolerance.  This proves the
conversion path works before the real zoo checkpoints ever appear on disk
(reference loads: network/res_encoder.py:349-362, utils/perceptual_loss.py:28,
train_hrnet.py:563)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.dirname(__file__))

import convert_torch_weights as conv  # noqa: E402
import torch_refs  # noqa: E402


def _nhwc(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))


def test_resnet50_conversion_parity(tmp_path, rng):
    torch.manual_seed(0)
    tm = torch_refs.TorchResNet50Trunk(layer4_stride1=True).eval()
    # non-trivial running stats so batch_stats conversion is actually tested
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd_path, npz_path = str(tmp_path / "r50.pth"), str(tmp_path / "r50.npz")
    torch.save(tm.state_dict(), sd_path)
    conv.convert_resnet(sd_path, npz_path)

    from hifihr_tpu.networks.resnet import ResNet

    model = ResNet(variant="res50", layer4_stride1=True)
    x = torch.rand(1, 3, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x), train=False)
    variables = conv.load_resnet_npz_into_variables(npz_path, dict(variables))

    with torch.no_grad():
        low_t, feat_t = tm(x)
    with jax.default_matmul_precision("highest"):
        low_j, feat_j = model.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(
        np.asarray(low_j), low_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.numpy().transpose(0, 2, 3, 1), atol=2e-3
    )


def test_vgg19_conversion_parity(tmp_path):
    torch.manual_seed(1)
    tm = torch_refs.TorchVGG19Relu32().eval()
    sd_path = str(tmp_path / "vgg19.pth")
    npz_path = str(tmp_path / "vgg19_features.npz")
    torch.save(tm.state_dict(), sd_path)
    conv.convert_vgg(sd_path, npz_path)

    from hifihr_tpu.losses import perceptual

    old = perceptual.VGG_NPZ
    perceptual.VGG_NPZ = npz_path
    try:
        module, params = perceptual.load_or_init_vgg()
    finally:
        perceptual.VGG_NPZ = old

    x01 = torch.rand(1, 3, 64, 64)  # flax side normalises internally
    from hifihr_tpu.networks.resnet import IMAGENET_MEAN, IMAGENET_STD

    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        feat_t = tm((x01 - mean) / std)
    with jax.default_matmul_precision("highest"):
        feat_j = module.apply(params, _nhwc(x01))
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_lpips_conversion_parity(tmp_path):
    torch.manual_seed(2)
    alex = torch_refs.TorchAlexFeatures().eval()
    lin_sd = torch_refs.lpips_lin_state_dict()
    alex_path = str(tmp_path / "alex.pth")
    lin_path = str(tmp_path / "lin.pth")
    npz_path = str(tmp_path / "lpips_alex.npz")
    torch.save(alex.state_dict(), alex_path)
    torch.save(lin_sd, lin_path)
    conv.convert_lpips(alex_path, lin_path, npz_path)

    from hifihr_tpu.losses import lpips as lpips_mod

    old = lpips_mod.LPIPS_NPZ
    lpips_mod.LPIPS_NPZ = npz_path
    try:
        metric = lpips_mod.LPIPS()
    finally:
        lpips_mod.LPIPS_NPZ = old
    assert metric.pretrained

    img0 = torch.rand(2, 3, 64, 64) * 2 - 1
    img1 = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        d_t = torch_refs.torch_lpips_distance(alex, lin_sd, img0, img1)
    with jax.default_matmul_precision("highest"):
        d_j = metric(_nhwc(img0), _nhwc(img1))
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-5)
    # identical inputs -> zero distance
    assert float(jnp.max(jnp.abs(metric(_nhwc(img0), _nhwc(img0))))) < 1e-6


@pytest.mark.slow
def test_efficientnet_conversion_parity(tmp_path):
    """Parity against the reference's OWN vendored torch EfficientNet
    (network/efficientnet_pt/model.py) — the exact net its checkpoints load."""
    sys.path.insert(0, "/root/reference")
    from network.efficientnet_pt import EfficientNet as TorchEffNet

    torch.manual_seed(3)
    tm = TorchEffNet.from_name("efficientnet-b3").eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    sd_path, npz_path = str(tmp_path / "b3.pth"), str(tmp_path / "b3.npz")
    torch.save(tm.state_dict(), sd_path)
    conv.convert_efficientnet(sd_path, npz_path)

    from hifihr_tpu.networks.efficientnet import EfficientNet

    model = EfficientNet(variant="effb3")
    x = torch.rand(1, 3, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x), train=False)
    variables = conv.load_resnet_npz_into_variables(npz_path, dict(variables))
    with torch.no_grad():
        feat_t, low_t = tm.extract_features(x)
    with jax.default_matmul_precision("highest"):
        low_j, feat_j = model.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(
        np.asarray(low_j), low_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.numpy().transpose(0, 2, 3, 1), atol=2e-3
    )


@pytest.mark.slow
def test_hrnet_conversion_roundtrip(tmp_path):
    """No releasable HRNet checkpoint is on disk, so validate the mapping
    structurally: synthesize an official-naming state_dict shaped after our
    flax tree, convert, and check full coverage + value/transpose fidelity."""
    from flax import traverse_util

    from hifihr_tpu.networks.hrnet import HRNet

    model = HRNet()
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    flat_p = traverse_util.flatten_dict(variables["params"], sep="/")
    flat_s = traverse_util.flatten_dict(variables["batch_stats"], sep="/")

    # inverse of the converter's name map: flax path -> official torch key
    def torch_key(path: str) -> str | None:
        import re

        p = path
        if p.startswith(("conv1/", "conv2/")):
            return p.split("/")[0]
        if p.startswith(("bn1/", "bn2/")):
            return p.split("/")[0]
        m = re.match(r"layer1_(\d+)/(.*)", p)
        if m:
            return f"layer1.{m.group(1)}.{_tb(m.group(2))}"
        m = re.match(r"t(\d)_(conv|bn)(\d+)/", p)
        if m:
            s, kind, b = m.groups()
            # our t{s}_conv{b} exists only where the flax model created it;
            # emit the existing-branch form (.0/.1) — the converter also
            # accepts the nested new-branch form
            return f"transition{int(s) + 1}.{b}.{0 if kind == 'conv' else 1}"
        m = re.match(r"stage(\d)_mod(\d+)/branch(\d+)_block(\d+)/(.*)", p)
        if m:
            s, mm, br, blk, rest = m.groups()
            return f"stage{int(s) + 2}.{mm}.branches.{br}.{blk}.{_tb(rest)}"
        m = re.match(r"stage(\d)_mod(\d+)/fuse/up_(\d)_(\d)_(conv|bn)/", p)
        if m:
            s, mm, i, j, kind = m.groups()
            return f"stage{int(s) + 2}.{mm}.fuse_layers.{i}.{j}.{0 if kind == 'conv' else 1}"
        m = re.match(r"stage(\d)_mod(\d+)/fuse/down_(\d)_(\d)_(\d)_(conv|bn)/", p)
        if m:
            s, mm, i, j, k, kind = m.groups()
            return (f"stage{int(s) + 2}.{mm}.fuse_layers.{i}.{j}.{k}."
                    f"{0 if kind == 'conv' else 1}")
        m = re.match(r"incre(\d)/(.*)", p)
        if m:
            return f"incre_modules.{m.group(1)}.0.{_tb(m.group(2))}"
        m = re.match(r"downsamp(\d)_(conv|bn)/", p)
        if m:
            i, kind = m.groups()
            return f"downsamp_modules.{int(i) - 1}.{0 if kind == 'conv' else 1}"
        return None

    def _tb(rest: str) -> str:
        name = rest.split("/")[0]
        if name == "downsample_conv":
            return "downsample.0"
        if name == "downsample_bn":
            return "downsample.1"
        return name

    rng = np.random.RandomState(1)
    sd = {}
    for path, arr in flat_p.items():
        key = torch_key(path)
        assert key is not None, f"unmapped flax param {path}"
        leaf = path.split("/")[-1]
        if path == "conv1/kernel":
            # stem stored s2d in flax; the torch source is the plain 3x3
            w = rng.randn(64, 3, 3, 3).astype(np.float32)
            sd["conv1.weight"] = torch.from_numpy(w)
        elif leaf == "kernel":
            w = rng.randn(*np.transpose(arr, (3, 2, 0, 1)).shape).astype(np.float32)
            sd[f"{key}.weight"] = torch.from_numpy(w)
        elif leaf == "scale":
            sd[f"{key}.weight"] = torch.from_numpy(
                rng.rand(*arr.shape).astype(np.float32))
        else:  # bias
            sd[f"{key}.bias"] = torch.from_numpy(
                rng.randn(*arr.shape).astype(np.float32))
    for path, arr in flat_s.items():
        key = torch_key(path)
        leaf = path.split("/")[-1]
        stat = "running_mean" if leaf == "mean" else "running_var"
        sd[f"{key}.{stat}"] = torch.from_numpy(
            rng.rand(*arr.shape).astype(np.float32))

    sd_path, npz_path = str(tmp_path / "hr.pth"), str(tmp_path / "hr.npz")
    torch.save(sd, sd_path)
    conv.convert_hrnet(sd_path, npz_path)
    loaded = conv.load_resnet_npz_into_variables(npz_path, dict(variables))
    new_p = traverse_util.flatten_dict(loaded["params"], sep="/")
    n_changed = 0
    for path in flat_p:
        key = torch_key(path)
        leaf = path.split("/")[-1]
        if path == "conv1/kernel":
            from hifihr_tpu.networks.resnet import StemConvS2D

            expect = np.asarray(StemConvS2D.transform_kernel(
                np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)), pad_lo=1
            ))
        elif leaf == "kernel":
            expect = np.transpose(sd[f"{key}.weight"].numpy(), (2, 3, 1, 0))
        elif leaf == "scale":
            expect = sd[f"{key}.weight"].numpy()
        else:
            expect = sd[f"{key}.bias"].numpy()
        np.testing.assert_array_equal(np.asarray(new_p[path]), expect, err_msg=path)
        n_changed += 1
    assert n_changed == len(flat_p)


def test_openpose_conversion_parity(tmp_path):
    """Parity against the reference's vendored CPM handpose_model
    (utils/openpose_detector/src/model.py:143-220) through
    tools/convert_openpose.py — validates conv mapping, concat order
    (heatmaps-first), relu placement and padding."""
    sys.path.insert(0, "/root/reference")
    from utils.openpose_detector.src.model import handpose_model

    torch.manual_seed(4)
    tm = handpose_model().eval()
    sd_path = str(tmp_path / "hand_pose_model.pth")
    npz_path = str(tmp_path / "openpose_hand.npz")
    torch.save(tm.state_dict(), sd_path)
    import convert_openpose

    convert_openpose.main(sd_path, npz_path)

    from hifihr_tpu.networks.openpose_hand import HandposeCPM

    model = HandposeCPM()
    with np.load(npz_path) as z:
        p = {}
        for key in z.files:
            layer, kind = key.rsplit("_", 1)
            p.setdefault(layer, {})[kind] = jnp.asarray(z[key])
    x = torch.rand(1, 3, 64, 64) - 0.5
    with torch.no_grad():
        hm_t = tm(x)
    with jax.default_matmul_precision("highest"):
        hm_j = model.apply({"params": p}, _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(hm_j), hm_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_expand_conv1_to_4ch():
    k = np.random.RandomState(0).randn(7, 7, 3, 64).astype(np.float32)
    k4 = conv.expand_conv1_to_4ch(k)
    assert k4.shape == (7, 7, 4, 64)
    np.testing.assert_array_equal(k4[:, :, :3], k)
    np.testing.assert_allclose(k4[:, :, 3], k.mean(axis=2) * 0.1, rtol=1e-6)
