import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.config import Config
from hifihr_tpu.models.hifihr import HiFiHR
from hifihr_tpu.training.checkpoint import CheckpointManager
from hifihr_tpu.training.train_state import create_train_state


def _state(cfg, seed=0):
    model = HiFiHR(config=cfg)
    batch = {
        "imgs": jnp.zeros((2, 32, 32, 3)),
        "Ks": jnp.tile(jnp.asarray([[[64.0, 0, 16], [0, 64.0, 16], [0, 0, 1]]]), (2, 1, 1)),
        "root_xyz": jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]]), (2, 1, 1)),
    }
    return create_train_state(model, cfg, jax.random.PRNGKey(seed), batch)


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = Config(pretrain="res18", hand_model="mano", render=False,
                 light_estimation=False, image_size=32, aa_factor=2)
    state = _state(cfg, seed=0)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_mode="separately")
    mgr.save(jax.device_get(state), epoch=3)

    fresh = _state(cfg, seed=1)
    restored, epoch = mgr.restore(fresh)
    assert epoch == 3
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_selective_restore_across_variants(tmp_path):
    """A render=False checkpoint warm-starts a render=True model: shared
    submodules restore, the new vert_tex param keeps its fresh init
    (reference utils/train_utils.py:14-113 semantics)."""
    cfg_a = Config(pretrain="res18", hand_model="mano", render=False,
                   light_estimation=False, image_size=32, aa_factor=2)
    state_a = _state(cfg_a, seed=0)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_mode="only_latest")
    mgr.save(jax.device_get(state_a), epoch=1)

    cfg_b = Config(pretrain="res18", hand_model="mano", render=True,
                   light_estimation=False, image_size=32, aa_factor=2)
    state_b = _state(cfg_b, seed=1)
    restored, _ = mgr.restore(state_b)
    # encoder weights came from the checkpoint
    k_a = state_a.params["encoder"]["backbone"]["conv1"]["kernel"]
    k_r = restored.params["encoder"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k_a), np.asarray(k_r))
    # vert_tex survived as fresh init (not present in the checkpoint)
    assert "vert_tex" in restored.params
