"""Loader -> train-step integration for RHD and DART (schema compatibility)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hifihr_tpu.config import Config

# full loader->jitted-train-step integration: ~25 s per dataset on one CPU
pytestmark = pytest.mark.slow
from hifihr_tpu.data.base import BatchLoader, ConcatLoader
from hifihr_tpu.losses.stack import LossComputer
from hifihr_tpu.models.hifihr import HiFiHR
from hifihr_tpu.training.steps import make_sched, make_train_step
from hifihr_tpu.training.train_state import create_train_state

from tests.test_real_loaders import rhd_root, dart_root  # fixtures  # noqa: F401

S = 32


def _shrink(batch, s=S):
    """Downscale fixture batches to tiny test resolution."""
    out = dict(batch)
    img = batch["imgs"]
    k = img.shape[1] // s
    out["imgs"] = img[:, ::k, ::k][:, :s, :s]
    if "segms_gt" in batch:
        out["segms_gt"] = batch["segms_gt"][:, ::k, ::k][:, :s, :s]
    if "Ks" in batch:
        scale = np.diag([1 / k, 1 / k, 1]).astype(np.float32)
        out["Ks"] = scale @ batch["Ks"]
    if "j2d_gt" in batch:
        out["j2d_gt"] = batch["j2d_gt"] / k
    return out


def _run_step(cfg, batch, dat_name):
    model = HiFiHR(config=cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), jb)
    step = make_train_step(model, LossComputer(cfg), dat_name, cfg)
    state, loss_dic = step(state, jb, make_sched(cfg, 0))
    assert np.isfinite(float(loss_dic["total"])), loss_dic
    return loss_dic


def test_rhd_batch_through_train_step(rhd_root):  # noqa: F811
    from hifihr_tpu.data.rhd import RHD

    ds = RHD(rhd_root, split="training")
    batch = next(iter(BatchLoader(ds, batch_size=2)))
    batch = _shrink(batch)
    cfg = Config(pretrain="res18", hand_model="mano", render=False,
                 light_estimation=False, image_size=S,
                 losses=("joint_3d", "joint_2d", "scale", "mscale", "mpose",
                         "mshape", "bone_direc"))
    d = _run_step(cfg, batch, "RHD")
    assert "scale" in d and "joint_2d" in d


def test_dart_batch_through_train_step_ortho(dart_root):  # noqa: F811
    from hifihr_tpu.data.dart import DARTset

    ds = DARTset(dart_root, split="train")
    batch = next(iter(BatchLoader(ds, batch_size=2)))
    out = dict(batch)
    out["imgs"] = batch["imgs"][:, ::7, ::7][:, :S, :S]
    out["segms_gt"] = batch["segms_gt"][:, ::7, ::7][:, :S, :S]
    out["j2d_gt"] = batch["j2d_gt"] / 7
    out["ortho_intr"] = batch["ortho_intr"] / np.asarray([7, 7, 7], np.float32)
    cfg = Config(pretrain="res18", hand_model="mano", render=False,
                 light_estimation=False, image_size=S,
                 losses=("joint_3d", "joint_2d", "vert_3d", "mpose", "mshape"))
    d = _run_step(cfg, out, "Dart")
    assert "joint_2d" in d  # j2d produced by the DART ortho projection branch


def test_concat_mixed_datasets_per_loss_sets(rhd_root, dart_root):  # noqa: F811
    """ConcatLoader round-robin with per-dataset loss sets through real steps."""
    from hifihr_tpu.data.dart import DARTset
    from hifihr_tpu.data.rhd import RHD
    from hifihr_tpu.data.synthetic import SyntheticHandDataset

    synth = SyntheticHandDataset(size=4, image_size=S)
    rhd = RHD(rhd_root, split="training")
    cat = ConcatLoader([BatchLoader(synth, 2), BatchLoader(rhd, 2)])
    names = [b["dataset"] for b in cat]
    assert set(names) == {"FreiHand", "RHD"}
