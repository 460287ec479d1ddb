"""Composite model forward: output-key parity + shapes + jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.config import Config
from hifihr_tpu.models.hifihr import HiFiHR, attach_j2d

B, S = 2, 32


def _fake_K(batch, size):
    K = np.asarray([[size * 2.0, 0, size / 2], [0, size * 2.0, size / 2], [0, 0, 1.0]], np.float32)
    return jnp.asarray(np.tile(K[None], (batch, 1, 1)))


@pytest.fixture(scope="module")
def model_and_vars():
    # light_estimation needs 224^2 inputs (28x28 low features); tiny test
    # images use the default directional light instead
    cfg = Config(pretrain="res18", hand_model="mano", render=True,
                 light_estimation=False, image_size=S, aa_factor=2)
    model = HiFiHR(config=cfg)
    imgs = jnp.zeros((B, S, S, 3))
    Ks = _fake_K(B, S)
    root = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]]), (B, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), imgs, Ks, root, train=False)
    return cfg, model, variables


def test_forward_output_keys_and_shapes(model_and_vars):
    cfg, model, variables = model_and_vars
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, S, S, 3).astype(np.float32))
    Ks = _fake_K(B, S)
    root = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]]), (B, 1, 1))
    out = model.apply(variables, imgs, Ks, root, train=False)
    assert out["pose_params"].shape == (B, 48)
    assert out["shape_params"].shape == (B, 10)
    assert out["scale"].shape == (B, 1)
    assert out["trans"].shape == (B, 3)
    assert out["rot"].shape == (B, 3)
    assert out["joints"].shape == (B, 21, 3)
    assert out["mano_verts"].shape == (B, 778, 3)
    assert out["tsa_poses"].shape == (B, 16, 3)
    assert out["re_img"].shape == (B, S, S, 3)
    assert out["re_sil"].shape == (B, S, S, 1)
    assert out["maskRGBs"].shape == (B, S, S, 3)
    assert out["mano_faces"].shape == (1538, 3)
    # root-centering: frei joint 9 at origin
    np.testing.assert_allclose(np.asarray(out["joints"][:, 9]), 0.0, atol=1e-6)
    # legacy 0/255 silhouette convention
    sil = np.asarray(out["re_sil"])
    assert set(np.unique(sil)).issubset({0.0, 255.0})


def test_attach_j2d(model_and_vars):
    cfg, model, variables = model_and_vars
    imgs = jnp.zeros((B, S, S, 3))
    Ks = _fake_K(B, S)
    root = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]]), (B, 1, 1))
    out = model.apply(variables, imgs, Ks, root, train=False)
    out = attach_j2d(out, Ks=Ks, root_xyz=root)
    assert out["j2d"].shape == (B, 21, 2)
    # hand at z=0.5 in front of a focal-64 camera: joints project near center
    assert np.all(np.isfinite(np.asarray(out["j2d"])))


def test_train_mode_updates_batch_stats(model_and_vars):
    cfg, model, variables = model_and_vars
    imgs = jnp.asarray(np.random.RandomState(1).rand(B, S, S, 3).astype(np.float32))
    Ks = _fake_K(B, S)
    root = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]]), (B, 1, 1))
    out, mutated = model.apply(
        variables, imgs, Ks, root, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    # running stats actually changed
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.slow
def test_mano_new_path():
    """YTBHand baseline (hand_model='mano_new') output contract."""
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR

    cfg = Config(pretrain="res50", hand_model="mano_new", render=False,
                 light_estimation=False, image_size=S, aa_factor=2)
    model = HiFiHR(config=cfg)
    imgs = jnp.zeros((1, S, S, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model.apply(variables, imgs, train=False)
    assert out["pose_params"].shape == (1, 48)
    assert out["shape_params"].shape == (1, 10)
    assert out["verts"].shape == (1, 778, 3)
    assert out["joints"].shape == (1, 21, 3)
    np.testing.assert_allclose(np.asarray(out["joints"][:, 9]), 0.0, atol=1e-6)
