"""NIMBLE layer: contract shapes, MANO-subset consistency, model integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.hand.nimble import NimbleLayer, load_nimble_model


@pytest.fixture(scope="module")
def layer():
    return NimbleLayer()


def _params(b=2, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "pose_params": jnp.asarray(rng.randn(b, 30).astype(np.float32) * 0.3),
        "shape_params": jnp.asarray(rng.randn(b, 20).astype(np.float32) * 0.3),
        "texture_params": jnp.asarray(rng.randn(b, 10).astype(np.float32) * 0.3),
        "rot": jnp.asarray(rng.randn(b, 3).astype(np.float32) * 0.2),
    }


def test_contract_shapes(layer):
    out = layer(_params())
    assert out["nimble_joints"].shape == (2, 25, 3)
    assert out["verts"].shape == (2, 5990, 3)
    assert out["mano_verts"].shape == (2, 778, 3)
    assert out["joints"].shape == (2, 21, 3)
    assert out["skin_albedo"].shape == (2, 5990, 3)
    assert float(jnp.min(out["skin_albedo"])) >= 0.0
    assert float(jnp.max(out["skin_albedo"])) <= 1.0


def test_mano_subset_at_rest(layer):
    """At zero shape, the 778 mano verts equal MANO's template deformed by the
    mean pose through the shared skeleton (prefix subset of the skin)."""
    b = 1
    params = {
        "pose_params": jnp.zeros((b, 30)),
        "shape_params": jnp.zeros((b, 20)),
        "texture_params": None,
        "rot": jnp.zeros((b, 3)),
    }
    out = layer(params)
    # the prefix subset IS the downsample map
    np.testing.assert_array_equal(
        np.asarray(out["mano_verts"]), np.asarray(out["verts"][:, :778])
    )
    extent = np.ptp(np.asarray(out["verts"][0]), axis=0)
    assert 0.05 < float(extent.max()) < 0.3  # hand-sized, metres


def test_grad_finite(layer):
    params = _params(1)

    def loss(pose, shape, tex):
        out = layer({**params, "pose_params": pose, "shape_params": shape,
                     "texture_params": tex})
        return (
            jnp.sum(out["verts"] ** 2)
            + jnp.sum(out["joints"] ** 2)
            + jnp.sum(out["skin_albedo"])
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(
        params["pose_params"], params["shape_params"], params["texture_params"]
    )
    for x in g:
        assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_model_integration_nimble():
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR

    S = 32
    cfg = Config(pretrain="res18", hand_model="nimble", render=True,
                 light_estimation=False, image_size=S, aa_factor=2)
    model = HiFiHR(config=cfg)
    imgs = jnp.zeros((1, S, S, 3))
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    root = jnp.asarray([[[0.0, 0.0, 0.5]]])
    variables = model.init(jax.random.PRNGKey(0), imgs, K, root, train=False)
    out = model.apply(variables, imgs, K, root, train=False)
    assert out["joints"].shape == (1, 21, 3)
    assert out["nimble_joints"].shape == (1, 25, 3)
    assert out["re_img"].shape == (1, S, S, 3)
    assert out["texture_params"].shape == (1, 10)
    # nimble root-centering: joint 11 at origin
    np.testing.assert_allclose(np.asarray(out["nimble_joints"][:, 11]), 0.0, atol=1e-6)
