"""rgb2hm heatmap-branch integration: model wiring, hm losses, freezing,
test-time refinement hooks (reference utils/train_utils.py:104-111,206-208;
losses.py:14-44; traineval_util.py:505-596)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.config import Config
from hifihr_tpu.losses.stack import LossComputer
from hifihr_tpu.models.hifihr import HiFiHR

S = 64
B = 2


def _batch(rng):
    f = S * 1.8
    K = np.asarray([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    return {
        "imgs": jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        "Ks": jnp.asarray(np.tile(K[None], (B, 1, 1))),
        "root_xyz": jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]], jnp.float32), (B, 1, 1)),
        "joints": jnp.zeros((B, 21, 3), jnp.float32),
        "j2d_gt": jnp.asarray(rng.rand(B, 21, 2).astype(np.float32) * S),
        "open_2dj": jnp.asarray(rng.rand(B, 21, 2).astype(np.float32) * S),
        "open_2dj_con": jnp.ones((B, 21, 1), jnp.float32),
    }


def _model_outputs(rng, cfg):
    model = HiFiHR(config=cfg)
    batch = _batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["Ks"], batch["root_xyz"],
        train=False,
    )
    out = model.apply(variables, batch["imgs"], batch["Ks"], batch["root_xyz"],
                      train=False)
    return model, variables, batch, out


def test_rgb2hm_outputs_and_losses(rng):
    cfg = Config(
        pretrain="res18", hand_model="mano", render=False,
        light_estimation=False, image_size=S, rgb2hm=True,
        losses=("hm_integral", "hm_integral_gt", "kp_cons", "mpose"),
    )
    model, variables, batch, out = _model_outputs(rng, cfg)
    assert "hm_j2d" in out and out["hm_j2d"].shape == (B, 21, 2)
    assert len(out["hm_j2d_list"]) == 2  # two hourglass stacks
    # uv are in image pixels (soft-argmax of near-uniform init ~ center)
    uv = np.asarray(out["hm_j2d"])
    assert (uv >= 0).all() and (uv <= S).all()

    from hifihr_tpu.models.hifihr import attach_j2d

    out = attach_j2d(out, Ks=batch["Ks"], root_xyz=batch["root_xyz"])
    lc = LossComputer(cfg)
    d = lc(batch, out, "FreiHand")
    for k in ("hm_integral", "hm_integral_gt", "kp_cons", "mpose"):
        assert k in d and np.isfinite(float(d[k])) and float(d[k]) > 0, k


@pytest.mark.slow
def test_freeze_hm_estimator_and_texture_freeze(rng):
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    cfg = Config(
        pretrain="res18", hand_model="mano", render=True,
        light_estimation=False, image_size=32, aa_factor=2, rgb2hm=True,
        freeze_hm_estimator=True, only_train_texture=True,
        losses=("joint_3d", "mpose", "sil"),
    )
    model = HiFiHR(config=cfg)
    f = 32 * 1.8
    K = np.asarray([[f, 0, 16], [0, f, 16], [0, 0, 1]], np.float32)
    batch = {
        "imgs": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
        "Ks": jnp.asarray(np.tile(K[None], (2, 1, 1))),
        "root_xyz": jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]], jnp.float32), (2, 1, 1)),
        "joints": jnp.zeros((2, 21, 3)),
        "segms_gt": jnp.ones((2, 32, 32)),
        "texture_con": jnp.ones((2,)),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, LossComputer(cfg), "FreiHand", cfg)
    new_state, _ = step(state, batch, make_sched(cfg, 0))

    from flax import traverse_util

    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(new_state.params)
    moved, frozen_same = [], []
    for k in before:
        path = "/".join(map(str, k))
        same = bool(jnp.all(before[k] == after[k]))
        if path.startswith(("encoder", "rgb2hm", "hand_encoder/base",
                            "hand_encoder/pose", "hand_encoder/shape")):
            frozen_same.append((path, same))
        elif path.startswith("vert_tex"):
            moved.append((path, same))
    assert frozen_same and all(s for _, s in frozen_same), [
        p for p, s in frozen_same if not s
    ]
    # texture params must still train
    assert moved and not all(s for _, s in moved), moved


def test_refinement_improves_reprojection(rng):
    """Trainer._refine-style fitting against GT 2D must reduce 2D error."""
    from hifihr_tpu.geometry.projection import perspective_project
    from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
    from hifihr_tpu.training.fitting import make_fitting_fn

    mano = ManoLayer(ncomps=45)
    fit = make_fitting_fn(mano, n_steps=30)
    pose_gt = jnp.asarray(rng.randn(B, 48).astype(np.float32) * 0.1)
    betas_gt = jnp.zeros((B, 10))
    f = S * 1.8
    Ks = jnp.asarray(np.tile(
        np.asarray([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)[None],
        (B, 1, 1)))
    root = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5]]], jnp.float32), (B, 1, 1))

    def j2d_of(pose, betas, trans, scale):
        out = mano(pose, betas)
        j = regress_joints_frei(out.verts, mano.J_regressor)
        j = j - j[:, 9:10]
        j3d = j * jnp.abs(scale)[:, None, :] + root + trans[:, None, :]
        return perspective_project(j3d, Ks)

    scale = jnp.ones((B, 1))
    trans = jnp.zeros((B, 3))
    target = j2d_of(pose_gt, betas_gt, trans, scale)
    pose0 = pose_gt + 0.3 * jnp.asarray(rng.randn(B, 48).astype(np.float32))
    err0 = float(jnp.mean(jnp.abs(j2d_of(pose0, betas_gt, trans, scale) - target)))
    p = fit(pose0, betas_gt, trans, scale, Ks, target,
            jnp.ones((B, 21, 1)), root)
    err1 = float(jnp.mean(jnp.abs(
        j2d_of(p["pose"], p["betas"], p["trans"], p["scale"]) - target)))
    assert err1 < err0, (err0, err1)
