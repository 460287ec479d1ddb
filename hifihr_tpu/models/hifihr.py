"""Composite single-image hand reconstruction model (flax).

JAX counterpart of the reference's `Model` (models_res_nimble.py:32-235):
encoder -> light estimator -> hand parameter heads -> parametric hand layer
-> root-centering -> differentiable render.  One `apply` produces the full
outputs dict; everything is static-shaped and jit/pjit-friendly.

Output-key parity with the reference forward (models_res_nimble.py:102-225):
pose_params, shape_params, texture_params, scale, trans, rot, joints (21,
FreiHAND order), mano_verts, tsa_poses, re_img (B,224,224,3), re_sil
(B,224,224,1; {0,255} legacy convention), maskRGBs, mano_faces.  Images are
NHWC (TPU-native) rather than NCHW.

MANO texture: the reference cannot actually render its 'mano' branch (no
textures on the Meshes; only NIMBLE carries a PCA appearance model).  Here the
mano branch gets a learnable per-vertex albedo ('vert' texture_mode from
options/train_options.py:46) so photometric self-supervision works end-to-end.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifihr_tpu.config import Config
from hifihr_tpu.geometry.projection import perspective_project, orthographic_project
from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
from hifihr_tpu.networks.heads import HandEncoder, LightEstimator
from hifihr_tpu.networks.resnet import ResNetEncoder
from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings
from hifihr_tpu.render.shading import DirectionalLight

ROOT_ID = 9  # FreiHAND middle-MCP root (models_res_nimble.py:33)
ROOT_ID_NIMBLE = 11  # nimble 25-joint root (models_res_nimble.py:33)


class HiFiHR(nn.Module):
    """config-driven composite model."""

    config: Config

    def setup(self):
        cfg = self.config
        if cfg.hand_model == "mano_new":
            # YTBHand baseline (reference utils/Freihand_GNN_mano/
            # mano_network_PCA.py:155-226): ResNet50 -> beta(10)+theta(48)
            # -> MANO verts; joints regressed from the mesh by the driver.
            self.encoder = ResNetEncoder(variant="res50")
            self.beta_head = [nn.Dense(512, name="beta_fc0"), nn.Dense(10, name="beta_fc1")]
            self.theta_head = [nn.Dense(512, name="theta_fc0"), nn.Dense(48, name="theta_fc1")]
            self.mano = ManoLayer(ncomps=45)
            return
        enc_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.pretrain in ("res18", "res50", "res101"):
            self.encoder = ResNetEncoder(variant=cfg.pretrain, dtype=enc_dtype)
            feat_dim = 512 if cfg.pretrain == "res18" else 2048
        elif cfg.pretrain == "effb3":
            from hifihr_tpu.networks.efficientnet import EffNetEncoder

            self.encoder = EffNetEncoder(dtype=enc_dtype)
            feat_dim = 1536
        elif cfg.pretrain == "hr18sv2":
            from hifihr_tpu.networks.hrnet import HRNetEncoder

            self.encoder = HRNetEncoder(dtype=enc_dtype)
            feat_dim = 1024
        else:
            raise ValueError(cfg.pretrain)

        shape_nc, pose_nc, tex_nc = cfg.ncomps
        self.hand_encoder = HandEncoder(
            hand_model=cfg.hand_model,
            shape_ncomp=shape_nc,
            pose_ncomp=pose_nc,
            tex_ncomp=tex_nc,
            use_mean_shape=cfg.use_mean_shape,
            if_render=cfg.render,
        )
        if cfg.light_estimation:
            self.light_estimator = LightEstimator()
        if cfg.rgb2hm:
            # stacked-hourglass heatmap branch (reference rgb2hm,
            # utils/train_utils.py:104-111; legacy net_hg.py Net_HM_HG)
            from hifihr_tpu.networks.hourglass import NetHMHG

            self.rgb2hm = NetHMHG()

        if cfg.hand_model == "mano":
            self.mano = ManoLayer(ncomps=pose_nc - 3)
            if cfg.render:
                self.vert_tex = self.param("vert_tex", nn.initializers.zeros, (778, 3))
        elif cfg.hand_model == "nimble":
            from hifihr_tpu.hand.nimble import NimbleLayer

            self.nimble = NimbleLayer()
            self.mano = ManoLayer()  # for mano_verts/faces utilities
        del feat_dim

    def _vertex_albedo(self, batch: int):
        albedo = nn.sigmoid(self.vert_tex + jnp.asarray([1.0, 0.2, -0.2]))  # skin-ish init
        return jnp.broadcast_to(albedo[None], (batch, 778, 3))

    def __call__(
        self,
        images: jnp.ndarray,  # (B, 224, 224, 3) float in [0,1]
        Ks: jnp.ndarray | None = None,  # (B, 3, 3)
        root_xyz: jnp.ndarray | None = None,  # (B, 1, 3)
        dat_name: str = "FreiHand",
        mode_train: bool = True,
        train: bool = False,
    ) -> dict[str, Any]:
        cfg = self.config
        b = images.shape[0]

        if cfg.hand_model == "mano_new":
            _, feat = self.encoder(images, train=train)
            beta = feat
            for layer in self.beta_head[:-1]:
                beta = nn.relu(layer(beta))
            beta = self.beta_head[-1](beta)
            if cfg.use_mean_shape:
                beta = jnp.zeros_like(beta)
            theta = feat
            for layer in self.theta_head[:-1]:
                theta = nn.relu(layer(theta))
            theta = self.theta_head[-1](theta)
            mano_out = self.mano(theta, beta)
            joints = regress_joints_frei(mano_out.verts, self.mano.J_regressor)
            root = joints[:, ROOT_ID : ROOT_ID + 1]
            return {
                "pose_params": theta,
                "shape_params": beta,
                "verts": mano_out.verts,
                "mano_verts": mano_out.verts - root,
                "joints": joints - root,
                "mano_faces": self.mano.faces,
            }

        low, features = self.encoder(images, train=train)
        light_params = None
        if cfg.light_estimation and low is not None:
            light_params = self.light_estimator(low)

        hand_params = self.hand_encoder(features, train=train)
        outputs = dict(hand_params)

        if cfg.rgb2hm:
            # heatmap 2D branch: per-stack soft-argmax uv in image pixels
            # (compute_uv_from_integral, utils/visualize_util.py:859-880 —
            # bilinear-upsample + integral ≈ integral at heatmap res × scale)
            from hifihr_tpu.networks.hourglass import heatmaps_to_uv

            hms = self.rgb2hm(images, train=train)
            hm_scale = images.shape[1] / hms[-1].shape[1]
            hm_uv = tuple(heatmaps_to_uv(h) * hm_scale for h in hms)
            outputs["hm_j2d_list"] = hm_uv
            outputs["hm_j2d"] = hm_uv[-1]

        if cfg.hand_model == "mano":
            mano_out = self.mano(hand_params["pose_params"], hand_params["shape_params"])
            verts = mano_out.verts
            # active path regresses frei-order joints from the mesh
            # (models_res_nimble.py:150-153)
            joints = regress_joints_frei(verts, self.mano.J_regressor)
            outputs["tsa_poses"] = mano_out.full_pose
            outputs["mano_verts"] = verts
        else:  # nimble
            nimble_out = self.nimble(hand_params)
            outputs.update(nimble_out)
            # nimble joints come in legacy mano order -> FreiHAND order
            # (models_res_nimble.py:156)
            from hifihr_tpu.geometry.joints import MANO_TO_FREI, remap

            joints = remap(nimble_out["joints"], MANO_TO_FREI)
            verts = nimble_out["mano_verts"]

        # root-relative (models_res_nimble.py:159-172)
        if dat_name == "HO3D" and not mode_train:
            pred_root = joints[:, 0:1]
        else:
            pred_root = joints[:, ROOT_ID : ROOT_ID + 1]
        joints = joints - pred_root
        outputs["joints"] = joints
        outputs["mano_verts"] = outputs["mano_verts"] - pred_root
        render_root = pred_root
        if cfg.hand_model == "nimble":
            if dat_name == "HO3D" and not mode_train:
                nroot = outputs["nimble_joints"][:, 0:1]
            else:
                nroot = outputs["nimble_joints"][:, ROOT_ID_NIMBLE : ROOT_ID_NIMBLE + 1]
            outputs["nimble_joints"] = outputs["nimble_joints"] - nroot
            render_root = nroot  # renderer offsets by the nimble root (:169-205)

        if cfg.render and Ks is not None and root_xyz is not None:
            texture_image = None
            vert_uv = None
            face_uv = None
            # faces/templates as HOST arrays: the renderer's spatial face
            # ordering (morton_face_order) is a static precomputation and the
            # layer's jnp attributes can be tracers inside a traced setup
            if cfg.hand_model == "mano":
                render_verts = outputs["mano_verts"] + root_xyz
                albedo = self._vertex_albedo(b)
                faces = self.mano.faces_np
                sort_template = self.mano.v_template_np
            else:
                render_verts = outputs["skin_verts"] - render_root + root_xyz
                albedo = outputs["skin_albedo"]
                faces = self.nimble.faces_np
                sort_template = self.nimble.v_template_np
                # NIMBLE appearance: PCA UV diffuse(+normal+spec) maps
                # sampled per-fragment through the seamed per-corner atlas
                # (reference models_res_nimble.py:132-142)
                if self.nimble.vert_uv is not None:
                    vert_uv = self.nimble.vert_uv
                    face_uv = self.nimble.face_uv_np
                    texture_image = outputs["textures"]
            renderer = PhongRenderer(
                faces,
                RenderSettings(image_size=cfg.image_size, aa_factor=cfg.aa_factor,
                               aa_mode=cfg.aa_mode, with_depth=True),
                vert_uv=vert_uv, face_uv=face_uv, sort_template=sort_template,
                # corner-sampled appearance (fast path; renderer falls back
                # to per-fragment UV sampling when absent, in ssaa mode, or
                # when config.nimble_corner_tex disables it for the
                # training-equivalence arm)
                corner_mean=(self.nimble.corner_mean_np
                             if cfg.hand_model == "nimble"
                             and cfg.nimble_corner_tex else None),
                corner_basis=(self.nimble.corner_basis_np
                              if cfg.hand_model == "nimble"
                              and cfg.nimble_corner_tex else None),
            )
            if light_params is not None:
                light = DirectionalLight.from_estimator(
                    light_params["colors"], light_params["directions"]
                )
            else:
                light = DirectionalLight.default(b, images.dtype)
            rgba = renderer(render_verts, albedo, Ks[:, :3, :3], light,
                            texture_image=texture_image,
                            tex_coef=(hand_params.get("texture_params")
                                      if cfg.hand_model == "nimble" else None))
            re_sil = (rgba[..., 3:4] > 0).astype(images.dtype) * 255.0
            outputs["re_img"] = rgba[..., :3]
            outputs["re_sil"] = re_sil
            # legacy renderer triple's depth map (traineval_util.py:583)
            outputs["re_depth"] = rgba[..., 4]
            outputs["maskRGBs"] = images * (re_sil > 0).astype(images.dtype)

        outputs["mano_faces"] = self.mano.faces
        if light_params is not None:
            outputs["light_params"] = light_params
        return outputs


def attach_j2d(outputs: dict, Ks=None, root_xyz=None, ortho_intr=None, dat_name="FreiHand"):
    """Project predicted joints to 2D, mirroring the driver's wiring
    (train_hrnet.py:70-88: perspective via K after restoring root; DART via
    fitted ortho camera)."""
    if dat_name == "Dart":
        outputs["j2d"] = orthographic_project(outputs["joints"], ortho_intr)
        if "nimble_joints" in outputs:
            outputs["nimble_j2d"] = orthographic_project(outputs["nimble_joints"], ortho_intr)
    else:
        j3d = outputs["joints"] + root_xyz
        outputs["j2d"] = perspective_project(j3d, Ks[:, :3, :3])
        if "nimble_joints" in outputs:
            outputs["nimble_j2d"] = perspective_project(
                outputs["nimble_joints"] + root_xyz, Ks[:, :3, :3]
            )
    return outputs


def build_model(config: Config):
    return HiFiHR(config=config)
