"""Test-time MANO fitting + submission dump + visualization smoke."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.geometry.projection import perspective_project
from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
from hifihr_tpu.training.fitting import make_fitting_fn
from hifihr_tpu.training.submission import dump_predictions, to_ho3d_convention


@pytest.mark.slow
def test_fitting_reduces_reprojection_error(rng):
    mano = ManoLayer()
    fit = make_fitting_fn(mano, n_steps=30)
    B = 1
    # target: joints of a "true" pose; start: zero pose
    true_pose = jnp.asarray(rng.randn(B, 48).astype(np.float32) * 0.2)
    betas = jnp.zeros((B, 10))
    root = jnp.asarray([[[0.0, 0.0, 0.45]]])
    K = jnp.asarray([[[300.0, 0, 112], [0, 300.0, 112], [0, 0, 1]]])
    out = mano(true_pose, betas)
    tj = regress_joints_frei(out.verts, mano.J_regressor)
    tj = tj - tj[:, 9:10]
    target_2d = perspective_project(tj + root, K)
    conf = jnp.ones((B, 21, 1))

    def reproj_err(pose, betas, trans, scale):
        o = mano(pose, betas)
        j = regress_joints_frei(o.verts, mano.J_regressor)
        j = j - j[:, 9:10]
        j3d = j * jnp.abs(scale)[:, None, :] + root + trans[:, None, :]
        return float(jnp.mean(jnp.linalg.norm(
            perspective_project(j3d, K) - target_2d, axis=-1)))

    pose0 = jnp.zeros((B, 48))
    trans0 = jnp.zeros((B, 3))
    scale0 = jnp.ones((B, 1))
    err0 = reproj_err(pose0, betas, trans0, scale0)
    fitted = fit(pose0, betas, trans0, scale0, K, target_2d, conf, root)
    err1 = reproj_err(fitted["pose"], fitted["betas"], fitted["trans"], fitted["scale"])
    assert err1 < err0, (err0, err1)


def test_submission_dump_formats(tmp_path, rng):
    xyz = rng.randn(3, 21, 3).astype(np.float32)
    verts = rng.randn(3, 778, 3).astype(np.float32)
    path = dump_predictions(str(tmp_path / "pred.json"), xyz, verts, "FreiHand")
    with open(path) as f:
        data = json.load(f)
    assert len(data) == 2
    assert np.asarray(data[0]).shape == (3, 21, 3)
    assert np.asarray(data[1]).shape == (3, 778, 3)

    # HO3D convention: order remap + y/z flip roundtrips through HO3D2Frei
    from hifihr_tpu.geometry.joints import HO3D_TO_FREI

    ho3d = to_ho3d_convention(xyz)
    back = ho3d[:, HO3D_TO_FREI] * np.asarray([1, -1, -1], np.float32)
    np.testing.assert_allclose(back, xyz, atol=1e-6)


def test_visualize_smoke(tmp_path, rng):
    from hifihr_tpu.utils import visualize

    imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
    examples = {"imgs": imgs, "j2d_gt": rng.rand(2, 21, 2).astype(np.float32) * 32}
    outputs = {
        "j2d": rng.rand(2, 21, 2).astype(np.float32) * 32,
        "re_img": imgs,
        "re_sil": (rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32) * 255,
    }
    p = visualize.save_prediction_grid(str(tmp_path / "grid.png"), examples, outputs)
    assert os.path.exists(p)
    verts = rng.randn(10, 3).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    p = visualize.save_obj(str(tmp_path / "m.obj"), verts, faces,
                           vert_colors=np.ones((10, 3)) * 0.5)
    lines = open(p).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 10
    assert sum(1 for l in lines if l.startswith("f ")) == 2
    errs = visualize.save_2d_errors(str(tmp_path / "e"),
                                    outputs["j2d"], examples["j2d_gt"])
    assert errs.shape == (2,)
