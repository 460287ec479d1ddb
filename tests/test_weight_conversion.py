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
