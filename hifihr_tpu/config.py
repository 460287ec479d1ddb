"""Typed experiment configuration.

Replaces the reference's argparse-namespace + JSON-setattr override
(reference: options/train_options.py:4-201, train_hrnet.py:505-510) with one
dataclass that (a) loads the same JSON config schema the reference ships 42
of, (b) actually validates enums (the reference silently accepts stale values
like pretrain='efficientnet', SURVEY.md §5), and (c) is hashable/static so it
can parameterise jitted train steps.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Sequence

ENCODERS = ("res18", "res50", "res101", "hr18sv2", "effb3", "none")
HAND_MODELS = ("mano", "nimble", "mano_new")
DATASETS = ("FreiHand", "RHD", "HO3D", "Dart")
BASE_LOSS_FNS = ("L1", "L2")
OPTIMIZERS = ("Adam", "AdamW")


# JSON keys that are intentionally not modelled:
#  * train_requires/test_requires — raw reference names; the porter emits the
#    normalised train_queries/val_queries alongside (tools/port_configs.py)
#  * scalar lambda_pose / lambda_j2d_gt — the reference driver clobbers these
#    with its stepped schedule anyway (train_hrnet.py:453-465,516)
#  * writer_topic/demo_freq_evaluation/mode_0 — cosmetic/stale reference keys
#  * pretrain_segmnet — the reference's loading branch (train_utils.py:18-24)
#    only fires for a legacy model class with a `segmnet` attribute; the
#    active Model (models_res_nimble.py) has none, so the key is dead upstream
#  * new_model — selects the legacy models.py driver, which is ABSENT from the
#    reference tree (train_hrnet.py:7); only new_model=true configs run there
#  * task — keys the reference's per-submodule partial save_model variants
#    (train_utils.py:134-199); orbax checkpoints here store the full state and
#    restore selectively (CheckpointManager.restore_submodules), subsuming it
#  * val_interval — defined in train_options.py:65 but read nowhere in the
#    reference; eval cadence is save_interval (train_hrnet.py:475-484)
_KNOWN_IGNORED_KEYS = frozenset({
    "train_requires", "test_requires", "writer_topic",
    "demo_freq_evaluation", "mode_0", "lambda_pose", "lambda_j2d_gt",
    "pretrain_segmnet", "new_model", "task", "val_interval",
})


@dataclass(frozen=True)
class Config:
    # model
    pretrain: str = "res50"  # encoder selection (models_res_nimble.py:42-53)
    hand_model: str = "mano"
    use_mean_shape: bool = False
    render: bool = True
    light_estimation: bool = True
    four_channel: bool = False
    image_size: int = 224
    aa_factor: int = 3
    # 'msaa' = in-kernel subsample coverage (fast; identical silhouette alpha);
    # 'ssaa' = reference-exact supersampled shading + average pool
    aa_mode: str = "msaa"
    # NIMBLE appearance path: corner-sampled PCA (fast, default) vs
    # per-fragment UV sampling (reference-structured; the equivalence
    # experiment arm — AA_EQUIVALENCE.json 'corner' section)
    nimble_corner_tex: bool = True
    # heatmap branch (reference rgb2hm stacked hourglass; train_utils.py:104-111)
    rgb2hm: bool = False
    freeze_hm_estimator: bool = False
    # parallelism: fsdp>1 selects the 2-D ('data','fsdp') mesh — hybrid DP +
    # ZeRO-style param/optimizer sharding (parallel/mesh.py). 1 = pure DP.
    fsdp: int = 1
    # encoder compute dtype; params stay float32. bfloat16 doubles MXU rate.
    compute_dtype: str = "bfloat16"

    # data
    train_datasets: tuple = ("FreiHand",)
    val_datasets: tuple = ("FreiHand",)
    train_queries: tuple = ("trans_images", "trans_Ks", "trans_joints")
    val_queries: tuple = ("images", "Ks", "joints")
    train_queries_frei: tuple = ()
    train_queries_rhd: tuple = ()
    train_queries_ho3d: tuple = ()
    train_queries_dart: tuple = ()
    freihand_base_path: str | None = None
    rhd_base_path: str | None = None
    ho3d_base_path: str | None = None
    dart_base_path: str | None = None
    controlled_exp: bool = False
    controlled_size: int = 3000
    semi_ratio: float | None = None

    # losses (losses_frei/_rhd override per dataset under ConcatLoader mixing,
    # reference options/train_options.py:51-53)
    losses: tuple = ("mscale",)
    losses_frei: tuple = ()
    losses_rhd: tuple = ()
    base_loss_fn: str = "L2"
    lambda_laplacian: float = 0.1
    lambda_texture: float = 0.003
    lambda_silhouette: float = 0.005
    lambda_j2d: float = 1e-3
    lambda_j2d_de: float = 1e-4
    lambda_j3d: float = 100.0
    lambda_j3d_norm: float = 100.0
    lambda_vert_3d: float = 100.0
    lambda_mrgb: float = 1e-3
    lambda_iou: float = 1e-3
    lambda_bone_direc: float = 0.1
    lambda_bone_direc_3d: float = 0.1
    lambda_edge_len: float = 0.1
    lambda_percep: float = 1e-5
    lambda_hm: float = 1e-3
    lambda_kp_cons: float = 2e-4
    lambda_ssim_tex: float = 0.001
    lambda_scale: float = 100.0
    lambda_mscale: float = 0.1
    # stepped schedules: value_list[i] applies from epoch steps[i-1] (steps
    # strictly increasing; reference train_hrnet.py:453-465)
    lambda_j2d_gt_list: tuple = (1e-5,)
    lambda_j2d_gt_steps: tuple = ()
    lambda_shape_list: tuple = (1e-5,)
    lambda_shape_steps: tuple = ()
    lambda_pose_list: tuple = (1e-4,)
    lambda_pose_steps: tuple = ()
    lambda_tex_reg_list: tuple = (1e-5,)
    lambda_tex_reg_steps: tuple = ()

    # optimisation
    optimizer: str = "Adam"
    init_lr: float = 1e-3
    force_init_lr: float = -1.0
    lr_steps: tuple = (50,)
    lr_gamma: float = 0.001
    total_epochs: int = 100
    train_batch: int = 8
    val_batch: int = 8
    num_workers: int = 8
    # one-time decoded-uint8 snapshot dir for the input pipeline (epoch 2+
    # skips JPEG decode entirely; "" disables). See data/cache.py.
    decode_cache: str = ""
    save_interval: int = 1
    save_mode: str = "separately"
    only_train_regressor: bool = False
    only_train_texture: bool = False

    # checkpointing / resume
    pretrain_model: str | None = None
    pretrain_texture_model: str | None = None
    pretrain_rgb2hm: str | None = None
    # converted-imagenet encoder warm start (reference loads torchvision/timm
    # pretrained encoders, res_encoder.py:349-353); default resolves
    # assets/imagenet_<pretrain>.npz if present
    encoder_imagenet_npz: str | None = None

    # init seed for params (Trainer); the reference relies on torch's global
    # default seeding — an explicit knob enables seed-variance experiments
    seed: int = 0

    # logging
    base_out_path: str = "output/debug"
    demo_freq: int = 100
    print_freq: int = 100
    is_write_tb: bool = False

    # misc reference passthroughs (kept for JSON compatibility)
    mode: tuple = ("training",)
    is_val: bool = False
    if_test: bool = True
    test_refinement: bool = False
    save_2d: bool = False
    save_3d: bool = False
    img_wise_save: bool = False

    def __post_init__(self):
        if self.pretrain not in ENCODERS:
            raise ValueError(f"unknown encoder pretrain={self.pretrain!r}; valid: {ENCODERS}")
        if self.hand_model not in HAND_MODELS:
            raise ValueError(f"unknown hand_model={self.hand_model!r}; valid: {HAND_MODELS}")
        for d in tuple(self.train_datasets) + tuple(self.val_datasets):
            if d not in DATASETS:
                raise ValueError(f"unknown dataset {d!r}; valid: {DATASETS}")
        if self.base_loss_fn not in BASE_LOSS_FNS:
            raise ValueError(f"base_loss_fn must be one of {BASE_LOSS_FNS}")
        if self.optimizer not in OPTIMIZERS:
            raise ValueError(f"optimizer must be one of {OPTIMIZERS}")
        for name in ("lambda_j2d_gt", "lambda_shape", "lambda_pose", "lambda_tex_reg"):
            lst = getattr(self, f"{name}_list")
            steps = getattr(self, f"{name}_steps")
            if len(lst) != len(steps) + 1:
                raise ValueError(f"{name}_list must have len(steps)+1 entries")

    # -- stepped λ schedules -------------------------------------------------
    def lambda_at_epoch(self, name: str, epoch: int) -> float:
        """Current value of a stepped lambda ('j2d_gt'|'shape'|'pose'|'tex_reg')."""
        lst = getattr(self, f"lambda_{name}_list")
        steps = getattr(self, f"lambda_{name}_steps")
        i = sum(1 for s in steps if epoch >= s)
        return float(lst[i])

    @property
    def ncomps(self):
        """(shape, pose, tex) component counts (models_res_nimble.py:55-60)."""
        if self.hand_model == "nimble":
            return (20, 30, 10)
        return (10, 48, None)

    # -- JSON loading --------------------------------------------------------
    @staticmethod
    def from_json(path: str, **overrides) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        raw.update(overrides)
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Config":
        fields = {f.name: f for f in dataclasses.fields(Config)}
        kwargs = {}
        dropped = []
        for k, v in raw.items():
            if k not in fields:
                if k not in _KNOWN_IGNORED_KEYS:
                    dropped.append(k)  # reference-only keys we don't model
                continue
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        if dropped:
            import warnings

            warnings.warn(
                f"config keys not modelled by Config (ignored): {sorted(dropped)}",
                stacklevel=2,
            )
        return Config(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
