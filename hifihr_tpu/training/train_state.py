"""Train state + optimiser (optax) matching the reference recipe.

Reference: Adam/AdamW + MultiStepLR(lr_steps, lr_gamma)
(train_hrnet.py:546-554) with `force_init_lr` override on resume (:557-558)
and per-epoch stepped λ schedules handled by Config.lambda_at_epoch.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from hifihr_tpu.config import Config


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def make_lr_schedule(config: Config, steps_per_epoch: int):
    """MultiStepLR: lr *= lr_gamma at each epoch in lr_steps."""
    lr = config.init_lr if config.force_init_lr <= 0 else config.force_init_lr
    boundaries = {
        int(e) * steps_per_epoch: config.lr_gamma for e in config.lr_steps
    }
    return optax.piecewise_constant_schedule(lr, boundaries)


def make_optimizer(config: Config, steps_per_epoch: int):
    schedule = make_lr_schedule(config, steps_per_epoch)
    if config.optimizer == "AdamW":
        return optax.adamw(schedule)
    return optax.adam(schedule)


def create_train_state(
    model, config: Config, rng, sample_batch: dict, steps_per_epoch: int = 1000
) -> TrainState:
    from hifihr_tpu.training.steps import normalize_batch

    sample_batch = normalize_batch(dict(sample_batch))
    variables = model.init(
        rng,
        sample_batch["imgs"],
        sample_batch.get("Ks"),
        sample_batch.get("root_xyz"),
        train=False,
    )
    # converted-imagenet encoder warm start (reference res_encoder.py:349-353)
    from hifihr_tpu.utils.weights import encoder_npz_for, merge_npz_into_variables

    npz = encoder_npz_for(config)
    if npz:
        variables = merge_npz_into_variables(npz, variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, steps_per_epoch)
    # module freezing (reference utils/train_utils.py:205-240):
    # only_train_texture freezes the encoder AND the hand_encoder base/pose/
    # shape heads (train_utils.py:222-240) so only texture/light/albedo train;
    # only_train_regressor freezes the encoder + light estimator.
    frozen: tuple[str, ...] = ()
    if config.only_train_regressor:
        # reference also freezes texture + light estimators (:209-221)
        frozen = ("encoder", "light_estimator", "hand_encoder/tex", "vert_tex")
    elif config.only_train_texture:
        frozen = (
            "encoder",
            "rgb2hm",
            "hand_encoder/base",
            "hand_encoder/pose",
            "hand_encoder/shape",
        )
    if config.freeze_hm_estimator:  # reference train_utils.py:206-208
        frozen = frozen + ("rgb2hm",)
    tx = freeze_submodules(tx, params, frozen)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )


def freeze_submodules(tx, params, frozen_prefixes: tuple[str, ...]):
    """Zero updates for any parameter whose '/'-joined path starts with one of
    `frozen_prefixes` (e.g. 'encoder' or 'hand_encoder/pose').

    TPU-native counterpart of the reference's requires_grad freezing
    (utils/train_utils.py:205-240: freeze encoder / train-texture-only modes).
    """
    if not frozen_prefixes:
        return tx
    from flax import traverse_util

    def label(params_tree):
        flat = traverse_util.flatten_dict(params_tree)
        labels = {
            k: (
                "frozen"
                if any("/".join(map(str, k)).startswith(p) for p in frozen_prefixes)
                else "trained"
            )
            for k in flat
        }
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform(
        {"trained": tx, "frozen": optax.set_to_zero()}, label
    )
