"""HO-3D v2 loader: fixture tests, train-step integration, pred.json dump.

Covers the reference's trickiest data path (data/dataset.py:1023-1215 HO3D
branch, :1928-2057 HO3D class, train_hrnet.py:284-293 submission dump):
cam_extr diag(1,-1,-1) merge, bbox-vs-joint crop selection, the openpose
detect.json pseudo-labels, and the final K/joints y-z flip.
"""

import json
import os
import pickle

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from hifihr_tpu.geometry.joints import HO3D_TO_FREI  # noqa: E402

FLIP_YZ = np.asarray([1.0, -1.0, -1.0], np.float32)
CAM_MAT = np.asarray([[614.6, 0, 320.0], [0, 614.6, 240.0], [0, 0, 1.0]], np.float32)


def _save_img(path, arr_u8):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr_u8).save(path)


def _project_native(j3d_native):
    """Project HO3D-native (OpenGL-ish, y/z negated) joints with camMat."""
    jf = j3d_native * FLIP_YZ  # to camera-space with positive depth
    uvw = jf @ CAM_MAT.T
    return uvw[:, :2] / uvw[:, 2:3]


@pytest.fixture()
def ho3d_root(tmp_path):
    """Two training frames in one sequence + one evaluation frame, with seg
    masks and openpose detect.json pseudo-labels."""
    root = tmp_path / "ho3d"
    root.mkdir()
    rng = np.random.RandomState(7)

    frames = ["ABF10/0000", "ABF10/0001"]
    (root / "train.txt").write_text("".join(f + "\n" for f in frames))
    native_joints = []
    coords, confs = [], []
    for i, frame in enumerate(frames):
        seq, fid = frame.split("/")
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        _save_img(str(root / "train" / seq / "rgb" / f"{fid}.png"), img)
        # joints centered in view: camera-space (positive depth) then flip
        jf = rng.randn(21, 3).astype(np.float32) * 0.03 + [0, 0, 0.6]
        j3d = (jf * FLIP_YZ).astype(np.float32)
        native_joints.append(j3d)
        meta = {
            "camMat": CAM_MAT,
            "handJoints3D": j3d,
            "handPose": rng.randn(48).astype(np.float32) * 0.1,
            "handBeta": rng.randn(10).astype(np.float32) * 0.1,
            "handTrans": np.zeros(3, np.float32),
            "objCorners3D": rng.randn(8, 3).astype(np.float32),
        }
        os.makedirs(root / "train" / seq / "meta", exist_ok=True)
        with open(root / "train" / seq / "meta" / f"{fid}.pkl", "wb") as f:
            pickle.dump(meta, f)
        seg = np.zeros((480, 640, 3), np.uint8)
        seg[180:300, 250:400, 0] = 255
        _save_img(str(root / "train" / seq / "seg" / f"{fid}.png"), seg)
        uv = _project_native(j3d)
        coords.append(uv.tolist())
        confs.append((0.5 + 0.5 * rng.rand(21, 1)).tolist())
    os.makedirs(root / "openpose" / "ABF10", exist_ok=True)
    with open(root / "openpose" / "ABF10" / "detect.json", "w") as f:
        json.dump([coords, confs], f)

    # evaluation frame: wrist-only joints + handBoundingBox
    (root / "evaluation.txt").write_text("SM1/0000\nSM1/0001\n")
    for fid in ("0000", "0001"):
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        _save_img(str(root / "evaluation" / "SM1" / "rgb" / f"{fid}.png"), img)
        wrist = (np.asarray([0.02, -0.05, -0.62]) + 0.01 * rng.randn(3)).astype(
            np.float32
        )
        meta = {
            "camMat": CAM_MAT,
            "handJoints3D": wrist,
            "handBoundingBox": [250.0, 170.0, 390.0, 310.0],
        }
        os.makedirs(root / "evaluation" / "SM1" / "meta", exist_ok=True)
        with open(root / "evaluation" / "SM1" / "meta" / f"{fid}.pkl", "wb") as f:
            pickle.dump(meta, f)

    return str(root), native_joints


def test_ho3d_train_loader(ho3d_root):
    """Training split: cam_extr merge + crop + final y/z flip must keep the
    projection invariant — projecting the emitted `joints` with the emitted
    `Ks` reproduces `j2d_gt` exactly (traineval_util.py:115-146)."""
    from hifihr_tpu.data.ho3d import HO3D

    root, native_joints = ho3d_root
    ds = HO3D(root, split="training", train=False)  # deterministic crop
    assert len(ds) == 2
    s = ds.get_sample(0)
    assert s["imgs"].shape == (224, 224, 3) and s["imgs"].dtype == np.uint8
    assert s["joints"].shape == (21, 3)
    assert s["Ks"].shape == (3, 3)
    assert s["segms_gt"].shape == (224, 224)
    assert set(np.unique(s["segms_gt"])).issubset({0, 1})
    assert s["segms_gt"].sum() > 0  # the seg blob survives the crop

    # joints: HO3D order -> FreiHAND order, y/z negated (positive depth)
    expect_joints = native_joints[0][HO3D_TO_FREI] * FLIP_YZ
    np.testing.assert_allclose(s["joints"], expect_joints, atol=1e-6)
    np.testing.assert_allclose(s["root_xyz"], expect_joints[9:10], atol=1e-6)
    assert (s["joints"][:, 2] > 0).all()

    # projection invariant through the whole K_crop = T @ S @ (camMat @ extr)
    # chain including the final flip merged into K
    uvw = s["joints"] @ s["Ks"].T
    j2d = uvw[:, :2] / uvw[:, 2:3]
    np.testing.assert_allclose(j2d, s["j2d_gt"], atol=1e-2)
    # the crop frames the hand: all joints inside the 224 crop with margin
    assert (s["j2d_gt"] > 0).all() and (s["j2d_gt"] < 224).all()


def test_ho3d_openpose_pseudolabels(ho3d_root):
    """detect.json [coords][frame] / [confs][frame] indexing
    (data/dataset.py:1963, 2046-2057). Fixture coords ARE the GT projections,
    so open_2dj must equal j2d_gt up to the HO3D->Frei remap."""
    from hifihr_tpu.data.ho3d import HO3D

    root, _ = ho3d_root
    ds = HO3D(root, split="training", train=False)
    for idx in range(2):
        s = ds.get_sample(idx)
        assert s["open_2dj"].shape == (21, 2)
        assert s["open_2dj_con"].shape == (21, 1)
        np.testing.assert_allclose(
            s["open_2dj"][HO3D_TO_FREI], s["j2d_gt"], atol=1e-2
        )
        assert 0.5 <= float(s["texture_con"]) <= 1.0


def test_ho3d_train_crop_noise_bounded(ho3d_root):
    """train=True jitters the crop (center +-5px gaussian, scale in
    [0.9, 1.0], dataset.py:1100-1110) but the projection invariant and the
    in-frame property must survive the noise."""
    from hifihr_tpu.data.ho3d import HO3D

    root, _ = ho3d_root
    ds = HO3D(root, split="training", train=True, seed=3)
    s = ds.get_sample(1)
    uvw = s["joints"] @ s["Ks"].T
    j2d = uvw[:, :2] / uvw[:, 2:3]
    np.testing.assert_allclose(j2d, s["j2d_gt"], atol=1e-2)
    assert (s["j2d_gt"] > -20).all() and (s["j2d_gt"] < 244).all()


def test_ho3d_eval_loader(ho3d_root):
    """Evaluation split: wrist-only handJoints3D becomes root_xyz (y/z
    negated), crop comes from handBoundingBox, and no GT joints leak."""
    from hifihr_tpu.data.ho3d import HO3D

    root, _ = ho3d_root
    ds = HO3D(root, split="evaluation")
    assert len(ds) == 2
    assert ds.train is False
    s = ds.get_sample(0)
    assert "joints" not in s and "j2d_gt" not in s
    assert s["imgs"].shape == (224, 224, 3)
    assert s["root_xyz"].shape == (1, 3)
    assert s["root_xyz"][0, 2] > 0  # flipped to positive depth
    # bbox center must map to the crop center through the emitted K chain:
    # undo the final column flip, then project the bbox-center ray
    K_unflipped = s["Ks"] * FLIP_YZ[None, :]
    center_ray = np.linalg.solve(CAM_MAT, np.asarray([320.0, 240.0, 1.0]))
    # bbox center (320, 240) is the image center here by construction
    uvw = (center_ray * 0.6) @ K_unflipped.T
    np.testing.assert_allclose(uvw[:2] / uvw[2], [112.0, 112.0], atol=1.0)


@pytest.mark.slow
def test_ho3d_batch_through_train_step(ho3d_root):
    """Loader -> jitted train step schema integration (same tier as RHD/DART,
    tests/test_dataset_train_integration.py)."""
    import jax
    import jax.numpy as jnp

    from hifihr_tpu.config import Config
    from hifihr_tpu.data.base import BatchLoader
    from hifihr_tpu.data.ho3d import HO3D
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    S = 32
    root, _ = ho3d_root
    ds = HO3D(root, split="training")
    batch = next(iter(BatchLoader(ds, batch_size=2, shuffle=False)))
    k = 224 // S
    batch["imgs"] = batch["imgs"][:, ::k, ::k][:, :S, :S]
    batch["segms_gt"] = batch["segms_gt"][:, ::k, ::k][:, :S, :S]
    batch["Ks"] = np.diag([1 / k, 1 / k, 1]).astype(np.float32) @ batch["Ks"]
    batch["j2d_gt"] = batch["j2d_gt"] / k
    batch["open_2dj"] = batch["open_2dj"] / k

    cfg = Config(pretrain="res18", hand_model="mano", render=False,
                 light_estimation=False, image_size=S,
                 losses=("joint_3d", "joint_2d", "open_2dj", "mscale",
                         "mshape", "mpose"))
    model = HiFiHR(config=cfg)
    jb = {k_: jnp.asarray(v) for k_, v in batch.items() if not isinstance(v, str)}
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), jb)
    step = make_train_step(model, LossComputer(cfg), "HO3D", cfg)
    state, loss_dic = step(state, jb, make_sched(cfg, 0))
    assert np.isfinite(float(loss_dic["total"])), loss_dic
    assert "open_2dj" in loss_dic and "joint_2d" in loss_dic


@pytest.mark.slow
def test_ho3d_eval_pred_json_roundtrip(ho3d_root, tmp_path):
    """Full eval epoch on the HO3D evaluation fixture -> pred.json in the
    official submission format ([xyz, verts], Frei->HO3D remap + y/z flip,
    train_hrnet.py:284-293, train_utils.py:242-254)."""
    from hifihr_tpu.config import Config
    from hifihr_tpu.data.base import BatchLoader
    from hifihr_tpu.data.ho3d import HO3D
    from hifihr_tpu.geometry.joints import FREI_TO_HO3D
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer

    root, _ = ho3d_root
    out = str(tmp_path / "out")
    cfg = Config(pretrain="res18", hand_model="mano", render=False,
                 light_estimation=False, image_size=224, val_batch=2,
                 losses=("joint_3d",), base_out_path=out)
    model = HiFiHR(config=cfg)
    ds = HO3D(root, split="evaluation")
    loader = BatchLoader(ds, batch_size=2, shuffle=False)
    tr = Trainer(cfg, model, loader, loader, out_dir=out)
    result = tr.evaluate(epoch=0)
    pred_path = result["pred_json"]
    assert os.path.exists(pred_path)
    with open(pred_path) as f:
        xyz_list, verts_list = json.load(f)
    xyz = np.asarray(xyz_list, np.float32)
    verts = np.asarray(verts_list, np.float32)
    assert xyz.shape == (2, 21, 3) and verts.shape == (2, 778, 3)
    assert np.isfinite(xyz).all() and np.isfinite(verts).all()
    # undo the submission convention -> back to the model's Frei-order output,
    # root-relative at the HO3D wrist (models_res_nimble.py:159-172)
    back = xyz[:, HO3D_TO_FREI] * FLIP_YZ
    np.testing.assert_allclose(back[:, 0], 0.0, atol=1e-5)  # wrist-rooted
    assert np.abs(back).max() < 1.0  # meters, hand-sized
    roundtrip = back[:, FREI_TO_HO3D] * FLIP_YZ
    np.testing.assert_allclose(roundtrip, xyz, atol=1e-6)
