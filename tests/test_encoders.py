import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.networks.resnet import ResNet, ResNetEncoder, normalize_imagenet
from hifihr_tpu.networks.heads import HandEncoder, LightEstimator, MMPool


def test_normalize_imagenet_3c():
    x = jnp.full((1, 2, 2, 3), 0.485)
    y = np.asarray(normalize_imagenet(x))
    assert abs(y[0, 0, 0, 0]) < 1e-6  # exactly mean -> 0


@pytest.mark.parametrize("variant,cout", [("res18", 512), ("res50", 2048)])
def test_resnet_shapes(variant, cout):
    model = ResNet(variant=variant)
    x = jnp.zeros((2, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    low, feat = model.apply(vars_, x, train=False)
    assert low.shape == (2, 28, 28, 512 if variant != "res18" else 128)
    assert feat.shape == (2, 14, 14, cout)  # layer4 stride-1 trick


def test_resnet_encoder_pooled():
    model = ResNetEncoder(variant="res50")
    x = jnp.zeros((2, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    low, feat = model.apply(vars_, x, train=False)
    assert feat.shape == (2, 2048)
    assert low.shape == (2, 28, 28, 512)


def test_hand_encoder_mano():
    enc = HandEncoder(hand_model="mano", shape_ncomp=10, pose_ncomp=48)
    f = jnp.zeros((4, 2048))
    vars_ = enc.init(jax.random.PRNGKey(0), f, train=False)
    out = enc.apply(vars_, f, train=False)
    assert out["pose_params"].shape == (4, 48)
    assert out["shape_params"].shape == (4, 10)
    assert out["scale"].shape == (4, 1)
    assert out["trans"].shape == (4, 3)
    assert out["rot"].shape == (4, 3)
    assert out["texture_params"] is None


def test_hand_encoder_nimble_mean_shape():
    enc = HandEncoder(hand_model="nimble", shape_ncomp=20, pose_ncomp=30,
                      tex_ncomp=10, use_mean_shape=True)
    f = jnp.ones((2, 2048))
    vars_ = enc.init(jax.random.PRNGKey(0), f, train=False)
    out = enc.apply(vars_, f, train=False)
    assert out["texture_params"].shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(out["shape_params"]), 0)
    assert out["rot"] is None


def test_light_estimator():
    le = LightEstimator()
    low = jnp.zeros((2, 28, 28, 512))
    vars_ = le.init(jax.random.PRNGKey(0), low)
    out = le.apply(vars_, low)
    assert out["colors"].shape == (2, 3)
    assert out["directions"].shape == (2, 3)
    assert float(jnp.abs(out["colors"]).max()) <= 1.0


def test_mmpool_mix():
    pool = MMPool()
    x = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
    x = x.at[1, 0, 0, 0].set(3.0)
    vars_ = pool.init(jax.random.PRNGKey(0), x)
    out = np.asarray(pool.apply(vars_, x))
    # p=0 -> sigmoid=0.5 -> 0.5*max + 0.5*avg
    expect_b1 = 0.5 * 3.0 + 0.5 * float(np.mean(np.asarray(x[1])))
    np.testing.assert_allclose(out[1, 0], expect_b1, rtol=1e-6)


@pytest.mark.slow
def test_effnet_encoder_shapes():
    from hifihr_tpu.networks.efficientnet import EffNetEncoder

    model = EffNetEncoder(variant="effb3")
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    low, feat = model.apply(vars_, x, train=False)
    assert low.shape == (1, 56, 56, 32)  # flattened block idx 4 output
    assert feat.shape == (1, 1536)


@pytest.mark.slow
def test_hrnet_encoder_shapes():
    from hifihr_tpu.networks.hrnet import HRNetEncoder

    model = HRNetEncoder()
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    low, feat = model.apply(vars_, x, train=False)
    assert low is None  # hr18sv2 provides no low-level features (ref parity)
    assert feat.shape == (1, 1024)


def test_stem_s2d_matches_direct_stride2_conv(rng):
    """StemConvS2D with transform_kernel(w) must equal the direct k x k
    stride-2 conv with the original kernel, for all three pad geometries used
    by the encoders (ADVICE r2: the roundtrip test alone would let a geometry
    bug cancel out)."""
    import jax
    import jax.numpy as jnp

    from hifihr_tpu.networks.resnet import StemConvS2D

    for k, pad_lo, pad_hi in ((7, 3, 3), (3, 1, 1), (3, 0, 1)):
        x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, 3, 8), jnp.float32) * 0.1
        direct = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(pad_lo, pad_hi), (pad_lo, pad_hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mod = StemConvS2D(8, kernel_size=k, pad_lo=pad_lo)
        out = mod.apply(
            {"params": {"kernel": StemConvS2D.transform_kernel(w, pad_lo)}}, x
        )
        assert out.shape == direct.shape, (k, pad_lo, out.shape, direct.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                                   atol=1e-5, rtol=1e-5)


def test_stem_s2d_odd_input_raises():
    import jax.numpy as jnp
    import pytest as _pytest

    from hifihr_tpu.networks.resnet import StemConvS2D

    mod = StemConvS2D(8, kernel_size=3, pad_lo=1)
    w = jnp.zeros((2, 2, 12, 8), jnp.float32)
    with _pytest.raises(ValueError, match="even spatial"):
        mod.apply({"params": {"kernel": w}}, jnp.zeros((1, 15, 16, 3)))
