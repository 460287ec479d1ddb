import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.config import Config
from hifihr_tpu.losses import basic
from hifihr_tpu.losses.ssim import ssim
from hifihr_tpu.losses.stack import LossComputer


def test_tsa_pose_loss_zero_inside_limits():
    pose = np.zeros((2, 16, 3), np.float32)
    pose[:, 0, 0] = 3.14  # root tilt inside [3.13, 3.15]
    assert float(basic.tsa_pose_loss(jnp.asarray(pose))) == 0.0
    # push one joint outside
    pose[:, 1, 0] = 1.0  # way over 5 degrees
    val = float(basic.tsa_pose_loss(jnp.asarray(pose)))
    # hand-computed: err = 1.0 - 5deg on 1 of 96 entries, channel weight 1,
    # mean over (2,16,3) incl x2 azimuth weights in the weight tensor
    expect = (1.0 - 5 * np.pi / 180) * 2 / (2 * 16 * 3)
    np.testing.assert_allclose(val, expect, rtol=1e-5)


def test_bone_direction_loss_zero_for_identical():
    j = jnp.asarray(np.random.RandomState(0).randn(2, 21, 2).astype(np.float32))
    conf = jnp.ones((2, 21, 1))
    assert float(basic.bone_direction_loss(j, j, conf)) < 1e-10


def test_bone_direction_loss_translation_invariant():
    rng = np.random.RandomState(1)
    j = rng.randn(2, 21, 2).astype(np.float32)
    conf = jnp.ones((2, 21, 1))
    shifted = j + np.asarray([5.0, -3.0], np.float32)
    assert float(basic.bone_direction_loss(jnp.asarray(j), jnp.asarray(shifted), conf)) < 1e-9


def test_edge_length_loss():
    faces = np.asarray([[0, 1, 2]], np.int32)
    v1 = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    v2 = jnp.asarray([[[0.0, 0, 0], [2, 0, 0], [0, 1, 0]]])
    # edge diffs: |1-2|=1, |1-1|=0, |sqrt2-sqrt5|
    expect = (1.0 + 0.0 + abs(np.sqrt(2) - np.sqrt(5))) / 3
    np.testing.assert_allclose(float(basic.edge_length_loss(v1, v2, faces)), expect, rtol=1e-5)


def test_iou_loss():
    a = jnp.zeros((1, 4, 4)).at[0, :2].set(1.0)
    b = jnp.zeros((1, 4, 4)).at[0, 1:3].set(1.0)
    # inter = 4, union = 12
    np.testing.assert_allclose(float(basic.iou_loss(a, b)), 1 - 4 / 12, rtol=1e-5)


def test_ssim_identical_and_different():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(ssim(img, 1.0 - img)) < 0.5


def test_huber_2d_distance():
    a = jnp.asarray([[[0.0, 0.0]]])
    b_near = jnp.asarray([[[3.0, 0.0]]])
    b_far = jnp.asarray([[[10.0, 0.0]]])
    np.testing.assert_allclose(float(basic.huber_2d_distance(a, b_near)[0, 0]), 0.9, rtol=1e-5)
    np.testing.assert_allclose(float(basic.huber_2d_distance(a, b_far)[0, 0]), 7.5, rtol=1e-5)


def test_loss_computer_full_sup(rng):
    cfg = Config(
        losses=("joint_3d", "joint_2d", "vert_3d", "mscale", "mshape", "mpose",
                "bone_direc", "edge_length"),
        render=False,
    )
    lc = LossComputer(cfg)
    B = 2
    faces = np.asarray([[0, 1, 2]], np.int32)
    outputs = {
        "joints": jnp.asarray(rng.randn(B, 21, 3).astype(np.float32)) * 0.01,
        "j2d": jnp.asarray(rng.randn(B, 21, 2).astype(np.float32)),
        "mano_verts": jnp.asarray(rng.randn(B, 778, 3).astype(np.float32)) * 0.01,
        "mano_faces": faces,
        "shape_params": jnp.ones((B, 10)),
        "pose_params": jnp.ones((B, 48)),
    }
    examples = {
        "joints": jnp.zeros((B, 21, 3)),
        "j2d_gt": jnp.zeros((B, 21, 2)),
        "verts": jnp.zeros((B, 778, 3)),
    }
    d = lc(examples, outputs, "FreiHand")
    for k in ("joint_3d", "joint_2d", "vert_3d", "mscale", "mshape", "mpose",
              "bone_direc", "edge_length", "total"):
        assert k in d and np.isfinite(float(d[k])), k
    assert float(d["total"]) > 0
    # lambda transfer: mshape = lambda * mean(shape^2) = 1e-5 * 1
    np.testing.assert_allclose(float(d["mshape"]), 1e-5, rtol=1e-5)


def test_loss_computer_photometric(rng):
    cfg = Config(losses=("sil", "iou"), render=True)
    lc = LossComputer(cfg)
    B, S = 1, 16
    re_sil = jnp.zeros((B, S, S, 1)).at[:, 4:12, 4:12].set(255.0)
    segms = jnp.zeros((B, S, S)).at[:, 4:12, 4:12].set(1.0)
    imgs = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    re_img = imgs * (segms[..., None] > 0)
    outputs = {"re_img": re_img, "re_sil": re_sil,
               "maskRGBs": re_img}
    examples = {"imgs": imgs, "segms_gt": segms,
                "texture_con": jnp.ones((B,))}
    d = lc(examples, outputs, "FreiHand")
    assert "texture_self" in d and "ssim_tex_self" in d and "texture" in d
    # re_img perfectly matches the masked gt -> texture loss 0
    np.testing.assert_allclose(float(d["texture"]), 0.0, atol=1e-7)
    assert np.isfinite(float(d["total"]))


def test_stepped_lambda_schedule():
    cfg = Config(lambda_pose_list=(1.0, 0.5, 0.1), lambda_pose_steps=(10, 20))
    assert cfg.lambda_at_epoch("pose", 0) == 1.0
    assert cfg.lambda_at_epoch("pose", 10) == 0.5
    assert cfg.lambda_at_epoch("pose", 25) == 0.1


def test_config_validation():
    with pytest.raises(ValueError):
        Config(pretrain="efficientnet")  # the reference's stale enum
    with pytest.raises(ValueError):
        Config(hand_model="smpl")


def test_per_dataset_loss_override():
    cfg = Config(losses=("mscale",), losses_frei=("joint_3d",),
                 losses_rhd=("joint_2d",), render=False)
    lc = LossComputer(cfg)
    outputs = {"joints": jnp.zeros((1, 21, 3)), "j2d": jnp.zeros((1, 21, 2))}
    examples = {"joints": jnp.ones((1, 21, 3)), "j2d_gt": jnp.ones((1, 21, 2))}
    d_frei = lc(examples, outputs, "FreiHand")
    d_rhd = lc(examples, outputs, "RHD")
    d_ho3d = lc(examples, outputs, "HO3D")
    assert "joint_3d" in d_frei and "joint_2d" not in d_frei
    assert "joint_2d" in d_rhd and "joint_3d" not in d_rhd
    assert "mscale" in d_ho3d  # falls back to the global loss set


@pytest.mark.slow
def test_every_configured_loss_name_fires(rng):
    """Every loss name listed by any shipped config must produce a nonzero
    entry on a synthetic batch (VERDICT r1: tsa_poses and triangle silently
    no-oped; reference hard-asserts preconditions, losses.py:246,423)."""
    import glob
    import json
    import os

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = set()
    for p in glob.glob(os.path.join(cfg_dir, "**", "*.json"), recursive=True):
        with open(p) as f:
            c = json.load(f)
        for k in ("losses", "losses_frei", "losses_rhd"):
            names |= set(c.get(k) or ())
    assert names, "no configs found"

    cfg = Config(losses=tuple(sorted(names)), render=True)
    # constructed WITHOUT mano_faces, as the Trainer does: the Laplacian for
    # 'triangle' must self-load from the MANO asset
    lc = LossComputer(cfg)
    assert lc.laplacian is not None

    from hifihr_tpu.assets import load_mano_model

    faces = np.asarray(load_mano_model().faces, np.int32)
    B, S = 2, 16
    sil = np.zeros((B, S, S), np.float32)
    sil[:, 4:12, 4:12] = 1.0
    imgs = rng.rand(B, S, S, 3).astype(np.float32)
    re_img = np.clip(imgs + 0.3 * rng.rand(B, S, S, 3).astype(np.float32), 0, 1)
    outputs = {
        "joints": jnp.asarray(rng.randn(B, 21, 3).astype(np.float32)) * 0.05,
        "j2d": jnp.asarray(rng.randn(B, 21, 2).astype(np.float32) * 10),
        "mano_verts": jnp.asarray(rng.randn(B, 778, 3).astype(np.float32)) * 0.01,
        "mano_faces": faces,
        "shape_params": jnp.ones((B, 10)),
        "pose_params": jnp.ones((B, 48)),
        "texture_params": jnp.asarray(rng.randn(B, 10).astype(np.float32)),
        "tsa_poses": jnp.asarray(rng.randn(B, 16, 3).astype(np.float32)),
        "re_img": jnp.asarray(re_img),
        "re_sil": jnp.asarray(sil[..., None] * 255.0),
        "maskRGBs": jnp.asarray(imgs * sil[..., None]),
    }
    examples = {
        "imgs": jnp.asarray(imgs),
        "segms_gt": jnp.asarray(sil),
        "texture_con": jnp.ones((B,)),
        "joints": jnp.zeros((B, 21, 3)),
        "j2d_gt": jnp.zeros((B, 21, 2)),
        "verts": jnp.zeros((B, 778, 3)),
        "scales": jnp.full((B,), 0.03),
        "open_2dj": jnp.asarray(rng.randn(B, 21, 2).astype(np.float32) * 5),
        "open_2dj_con": jnp.ones((B, 21, 1)),
    }
    d = lc(examples, outputs, "FreiHand")
    for name in sorted(names):
        assert name in d, f"configured loss {name!r} did not fire"
        val = float(d[name])
        assert np.isfinite(val) and abs(val) > 0, f"{name}: {val}"


def test_unfired_loss_warns():
    import warnings

    cfg = Config(losses=("tsa_poses", "mtex", "open_2dj"), render=False)
    lc = LossComputer(cfg)
    outputs = {"joints": jnp.zeros((1, 21, 3)), "texture_params": None}
    examples = {"joints": jnp.zeros((1, 21, 3))}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lc(examples, outputs, "HO3D")
    assert any("did not fire" in str(x.message) for x in w)


def test_chamfer_loss_zero_identical(rng):
    pts = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    a, b = basic.chamfer_loss(pts, pts)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-5)


def test_depth_to_pointcloud_roundtrip(rng):
    from hifihr_tpu.geometry.projection import depth_to_pointcloud, perspective_project

    K = jnp.asarray([[[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]]])
    depth = jnp.zeros((1, 16, 16)).at[0, 4, 6].set(0.7)
    pc = depth_to_pointcloud(depth, K)
    valid = np.asarray(pc[0, :, 3]) > 0
    assert valid.sum() == 1
    pt = np.asarray(pc[0][valid][0, :3])
    uv = np.asarray(perspective_project(jnp.asarray(pt[None, None]), K))[0, 0]
    np.testing.assert_allclose(uv, [6.0, 4.0], atol=1e-4)
