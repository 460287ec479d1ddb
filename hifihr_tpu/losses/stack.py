"""The configurable ~20-loss supervision stack.

JAX port of the reference's `LossFunction.__call__` (losses.py:234-453) plus
the weak/self-supervision branches that only exist in the deprecated
`loss_func` but are listed by shipped configs (open_2dj :46-56,
open_bone_direc :80-85, kp_cons :97-105, tsa pose prior :128-133) — SURVEY.md
§2 flags these as must-port.

Conventions preserved for λ-compatibility with the 42 shipped JSON configs:
  * re_sil is {0, 255}; segms_gt is {0, 1} (yes, the reference mixes units in
    the sil/iou losses — reproduced verbatim so loss magnitudes match).
  * texture_con weighting uses conf**2 normalisation.

`loss_used`, `dat_name` and the Config are static; per-epoch stepped lambdas
enter through the dynamic `sched` dict so the train step never recompiles.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp

from hifihr_tpu.config import Config
from hifihr_tpu.losses import basic
from hifihr_tpu.losses.ssim import ssim
from hifihr_tpu.losses.perceptual import load_or_init_vgg, perceptual_loss
from hifihr_tpu.render.mesh import uniform_laplacian

REF_BONE_LENGTH = 0.0282  # metres, FreiHAND joints 9-10 prior (losses.py:297)


def _mean_loss(base: str):
    if base == "L1":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    return lambda a, b: jnp.mean((a - b) ** 2)


class LossComputer:
    """Construct once per experiment; `__call__` is jit-traceable."""

    def __init__(self, config: Config, mano_faces=None, with_perceptual: bool | None = None):
        self.config = config
        self.base_loss = _mean_loss(config.base_loss_fn)
        self.laplacian = None
        all_used = set(config.losses) | set(config.losses_frei or ()) | set(config.losses_rhd or ())
        if "triangle" in all_used:
            if mano_faces is None:
                # the reference asserts faces are present (losses.py:423);
                # here the MANO topology is a fixed asset, so self-supply it
                from hifihr_tpu.assets import load_mano_model

                mano_faces = load_mano_model().faces
            n_verts = int(jnp.max(jnp.asarray(mano_faces))) + 1
            self.laplacian = uniform_laplacian(n_verts, mano_faces)
        use_percep = (
            "perceptual" in config.losses if with_perceptual is None else with_perceptual
        )
        if use_percep:
            self.vgg, self.vgg_params = load_or_init_vgg()
        else:
            self.vgg = None

    def __call__(
        self,
        examples: Mapping[str, jnp.ndarray],
        outputs: Mapping[str, jnp.ndarray],
        dat_name: str,
        sched: Mapping[str, jnp.ndarray] | None = None,
    ) -> dict:
        cfg = self.config
        # per-dataset loss-set overrides for mixed-dataset training
        # (reference args.losses_frei/losses_rhd, train_hrnet.py per-batch)
        if dat_name == "FreiHand" and cfg.losses_frei:
            loss_used = cfg.losses_frei
        elif dat_name == "RHD" and cfg.losses_rhd:
            loss_used = cfg.losses_rhd
        else:
            loss_used = cfg.losses
        sched = sched or {}
        lam_j2d_gt = sched.get("lambda_j2d_gt", cfg.lambda_at_epoch("j2d_gt", 0))
        lam_shape = sched.get("lambda_shape", cfg.lambda_at_epoch("shape", 0))
        lam_pose = sched.get("lambda_pose", cfg.lambda_at_epoch("pose", 0))
        lam_tex_reg = sched.get("lambda_tex_reg", cfg.lambda_at_epoch("tex_reg", 0))

        d = {}
        base = self.base_loss

        if "joint_2d" in loss_used:
            d["joint_2d"] = lam_j2d_gt * base(examples["j2d_gt"], outputs["j2d"])

        if "joint_3d" in loss_used:
            d["joint_3d"] = cfg.lambda_j3d * base(outputs["joints"], examples["joints"])

        if "vert_3d" in loss_used:
            d["vert_3d"] = cfg.lambda_vert_3d * base(outputs["mano_verts"], examples["verts"])

        if "bone_direc" in loss_used:
            conf = jnp.ones_like(examples["j2d_gt"][..., :1])
            d["bone_direc"] = cfg.lambda_bone_direc * basic.bone_direction_loss(
                outputs["j2d"], examples["j2d_gt"], conf
            )

        if "bone_direc_3d" in loss_used:
            conf = jnp.ones_like(examples["joints"][..., :1])
            d["bone_direc_3d"] = cfg.lambda_bone_direc_3d * basic.bone_direction_loss(
                outputs["joints"], examples["joints"], conf
            )

        if "edge_length" in loss_used:
            d["edge_length"] = cfg.lambda_edge_len * basic.edge_length_loss(
                outputs["mano_verts"], examples["verts"], outputs["mano_faces"]
            )

        if "mscale" in loss_used:
            bone = jnp.linalg.norm(outputs["joints"][:, 9] - outputs["joints"][:, 10], axis=-1)
            d["mscale"] = cfg.lambda_mscale * jnp.mean(jnp.abs(bone - REF_BONE_LENGTH))

        if "scale" in loss_used and dat_name in ("FreiHand", "RHD"):
            cal = jnp.linalg.norm(outputs["joints"][:, 9] - outputs["joints"][:, 10], axis=-1)
            d["scale"] = cfg.lambda_scale * jnp.mean((cal - examples["scales"]) ** 2)

        # ---- weak supervision against openpose pseudo-labels (ported from
        # the deprecated loss_func; required by self-sup configs) ----
        if "open_2dj" in loss_used and "open_2dj" in examples:
            dist = basic.huber_2d_distance(examples["open_2dj"], outputs["j2d"])  # (B,21)
            kp_w = jnp.asarray(
                [2, 1, 1, 1, 1.5, 1, 1, 1, 1.5, 1, 1, 1, 1.5, 1, 1, 1, 1.5, 1, 1, 1, 1.5],
                dist.dtype,
            )
            conf = examples["open_2dj_con"][..., 0] * kp_w[None]
            d["open_2dj"] = cfg.lambda_j2d * (
                jnp.sum(dist * conf**2) / jnp.maximum(jnp.sum(conf**2), 1e-8)
            )

        if "open_2dj_de" in loss_used and "open_2dj" in examples:
            # downgrade variant: plain MSE to the pseudo-labels (losses.py:58-63)
            d["open_2dj_de"] = cfg.lambda_j2d_de * jnp.mean(
                (examples["open_2dj"] - outputs["j2d"]) ** 2
            )

        if "joint_3d_norm" in loss_used and "joints" in examples:
            # root-relative 3D joints (losses.py:71-74)
            po = outputs["joints"] - outputs["joints"][:, 9:10]
            pe = examples["joints"] - examples["joints"][:, 9:10]
            d["joint_3d_norm"] = cfg.lambda_j3d_norm * jnp.mean((po - pe) ** 2)

        if "open_bone_direc" in loss_used and "open_2dj" in examples:
            d["open_bone_direc"] = cfg.lambda_bone_direc * basic.bone_direction_loss(
                outputs["j2d"], examples["open_2dj"], examples["open_2dj_con"]
            )

        if "kp_cons" in loss_used and "hm_j2d" in outputs:
            dist = basic.huber_2d_distance(outputs["hm_j2d"], outputs["j2d"])
            d["kp_cons"] = cfg.lambda_kp_cons * jnp.mean(dist)

        # heatmap-integral supervision: per-stack soft-argmax uv vs pseudo/GT
        # labels (reference losses.py:14-44, summed over hm_j2d_list)
        if "hm_integral" in loss_used and "open_2dj" in examples and "hm_j2d_list" in outputs:
            con = examples["open_2dj_con"][..., 0]
            acc = 0.0
            for hm_j2d in outputs["hm_j2d_list"]:
                dist = jnp.sqrt(
                    jnp.sum((examples["open_2dj"] - hm_j2d) ** 2, -1) + 1e-12
                )
                acc = acc + jnp.sum(dist * con**2) / jnp.maximum(jnp.sum(con**2), 1e-8)
            d["hm_integral"] = cfg.lambda_hm * acc

        if "hm_integral_gt" in loss_used and "j2d_gt" in examples and "hm_j2d_list" in outputs:
            acc = 0.0
            for hm_j2d in outputs["hm_j2d_list"]:
                dist = jnp.sqrt(
                    jnp.sum((examples["j2d_gt"] - hm_j2d) ** 2, -1) + 1e-12
                )
                acc = acc + jnp.mean(dist)
            d["hm_integral_gt"] = cfg.lambda_hm * acc

        # configs list this loss as "tsa_poses" (reference losses.py:128-133
        # fires whenever tsa_poses is in outputs); accept the singular too
        if ("tsa_poses" in loss_used or "tsa_pose" in loss_used) and "tsa_poses" in outputs:
            d["tsa_poses"] = lam_pose * basic.tsa_pose_loss(outputs["tsa_poses"])

        # ---- photometric: self-supervised (confidence-weighted) ----
        if "re_img" in outputs and "re_sil" in outputs and "texture_con" in examples:
            re_img = outputs["re_img"]
            mask_rgbs = outputs["maskRGBs"]
            con = examples["texture_con"]  # (B,)
            con_img = con[:, None, None, None] ** 2
            d["texture_self"] = cfg.lambda_texture * (
                jnp.sum(jnp.abs(re_img - mask_rgbs) * con_img)
                / jnp.maximum(jnp.sum(jnp.broadcast_to(con_img, re_img.shape)), 1e-8)
            )
            mean_diff = jnp.abs(
                jnp.mean(re_img.reshape(re_img.shape[0], -1), axis=1)
                - jnp.mean(mask_rgbs.reshape(mask_rgbs.shape[0], -1), axis=1)
            )
            d["mrgb_self"] = cfg.lambda_mrgb * (
                jnp.sum(mean_diff * con**2) / jnp.maximum(jnp.sum(con**2), 1e-8)
            )
            d["ssim_tex_self"] = cfg.lambda_ssim_tex * (1.0 - ssim(re_img, mask_rgbs))

        # ---- photometric: full supervision against GT masks ----
        if "re_img" in outputs and "re_sil" in outputs and "segms_gt" in examples:
            gt_masked = examples["segms_gt"][..., None] * examples["imgs"]
            re_img = outputs["re_img"] * (outputs["re_sil"] / 255.0)
            d["texture"] = cfg.lambda_texture * jnp.mean(jnp.abs(re_img - gt_masked))
            d["mrgb"] = cfg.lambda_mrgb * (jnp.mean(gt_masked) - jnp.mean(re_img)) ** 2
            d["ssim_tex"] = cfg.lambda_ssim_tex * (1.0 - ssim(re_img, gt_masked))

        if "perceptual" in loss_used and self.vgg is not None:
            seg = examples["segms_gt"][..., None]
            composite = outputs["re_img"] * seg + examples["imgs"] * (1.0 - seg)
            d["perceptual"] = cfg.lambda_percep * perceptual_loss(
                self.vgg, self.vgg_params, composite, examples["imgs"]
            )

        if "sil" in loss_used:
            d["sil"] = cfg.lambda_silhouette * jnp.mean(
                jnp.abs(outputs["re_sil"][..., 0] - examples["segms_gt"])
            )

        if "iou" in loss_used:
            d["iou"] = cfg.lambda_iou * basic.iou_loss(
                outputs["re_sil"][..., 0], examples["segms_gt"]
            )

        if "triangle" in loss_used and self.laplacian is not None:
            d["triangle"] = cfg.lambda_laplacian * basic.laplacian_loss(
                outputs["mano_verts"], self.laplacian
            )

        if "mshape" in loss_used:
            d["mshape"] = lam_shape * jnp.mean(outputs["shape_params"] ** 2)

        if "mpose" in loss_used:
            d["mpose"] = lam_pose * jnp.mean(outputs["pose_params"] ** 2)

        if "mtex" in loss_used and outputs.get("texture_params") is not None:
            d["mtex"] = lam_tex_reg * jnp.mean(outputs["texture_params"] ** 2)

        # Loud guard: the reference hard-asserts the preconditions of every
        # listed loss (losses.py:246,423); a silently skipped branch hides a
        # wiring gap.  Gates are static python, so this fires at trace time.
        expected_unfired = {"scale"} if dat_name not in ("FreiHand", "RHD") else set()
        unfired = [
            n for n in loss_used
            if n not in d and n != "tsa_pose" and n not in expected_unfired
        ]
        if unfired:
            import warnings

            key = (tuple(unfired), dat_name)
            if key not in _WARNED_UNFIRED:
                _WARNED_UNFIRED.add(key)
                warnings.warn(
                    f"configured losses {unfired} did not fire for dataset "
                    f"{dat_name}: missing model outputs or batch keys "
                    f"(reference asserts these preconditions, losses.py:246)",
                    stacklevel=2,
                )

        d["total"] = sum(d.values()) if d else jnp.zeros(())
        return d


_WARNED_UNFIRED: set = set()
