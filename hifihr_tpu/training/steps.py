"""Jitted train/eval steps (SPMD-ready).

One compiled program does forward, the ~20-loss stack, backward, and the
optimiser update; under a sharded batch the XLA partitioner turns the gradient
reduction into an ICI all-reduce — the TPU-native replacement for the
reference's DataParallel scatter/gather + Python loss loop
(train_hrnet.py:93-113).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from hifihr_tpu.config import Config
from hifihr_tpu.losses.stack import LossComputer
from hifihr_tpu.models.hifihr import attach_j2d


def make_sched(config: Config, epoch: int) -> dict:
    """Dynamic per-epoch stepped lambdas (train_hrnet.py:453-465)."""
    return {
        "lambda_j2d_gt": jnp.float32(config.lambda_at_epoch("j2d_gt", epoch)),
        "lambda_shape": jnp.float32(config.lambda_at_epoch("shape", epoch)),
        "lambda_pose": jnp.float32(config.lambda_at_epoch("pose", epoch)),
        "lambda_tex_reg": jnp.float32(config.lambda_at_epoch("tex_reg", epoch)),
    }


def _forward(model, params, batch_stats, batch, dat_name, config, train: bool):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs = dict(
        dat_name=dat_name,
        mode_train=train,
        train=train,
    )
    if train:
        outputs, mutated = model.apply(
            variables,
            batch["imgs"],
            batch.get("Ks"),
            batch.get("root_xyz"),
            mutable=["batch_stats"],
            **kwargs,
        )
    else:
        outputs = model.apply(
            variables, batch["imgs"], batch.get("Ks"), batch.get("root_xyz"), **kwargs
        )
        mutated = {"batch_stats": batch_stats}
    outputs = attach_j2d(
        outputs,
        Ks=batch.get("Ks"),
        root_xyz=batch.get("root_xyz"),
        ortho_intr=batch.get("ortho_intr"),
        dat_name=dat_name,
    )
    return outputs, mutated


def normalize_batch(batch: dict) -> dict:
    """Device-side u8 -> float normalisation (runs inside jit, fuses into the
    first consumer).  Loaders emit images/masks as uint8 so the host->device
    transfer is 4x smaller than float32 — on a remote/tunneled device the H2D
    link is the real-data throughput ceiling (measured ~29 MB/s here: a b64
    224^2 float batch costs 1.35 s to move, u8 0.42 s)."""
    batch = dict(batch)
    if "imgs" in batch and batch["imgs"].dtype == jnp.uint8:
        batch["imgs"] = batch["imgs"].astype(jnp.float32) / 255.0
    if "segms_gt" in batch and batch["segms_gt"].dtype == jnp.uint8:
        batch["segms_gt"] = batch["segms_gt"].astype(jnp.float32)
    return batch


def _root_center_targets(batch: dict, dat_name: str) -> dict:
    """GT joints/verts -> root-relative, like the reference driver
    (train_hrnet.py:64-68).  Loaders emit camera-absolute targets + root_xyz;
    the model predicts root-relative geometry."""
    if "root_xyz" in batch and "joints" in batch and dat_name != "HO3D_eval":
        batch = dict(batch)
        batch["joints"] = batch["joints"] - batch["root_xyz"]
        if "verts" in batch:
            batch["verts"] = batch["verts"] - batch["root_xyz"]
    return batch


def make_train_step(model, loss_computer: LossComputer, dat_name: str, config: Config) -> Callable:
    """Returns jitted train_step(state, batch, sched) -> (state, loss_dict)."""

    @jax.jit
    def train_step(state, batch, sched):
        batch = normalize_batch(batch)
        batch = _root_center_targets(batch, dat_name)

        def loss_fn(params):
            outputs, mutated = _forward(
                model, params, state.batch_stats, batch, dat_name, config, train=True
            )
            loss_dic = loss_computer(batch, outputs, dat_name, sched)
            return loss_dic["total"], (loss_dic, mutated)

        grads, (loss_dic, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        # On-device degenerate-batch guard (reference train_hrnet.py:106-108
        # skips batches with loss < 1e-10; we also skip non-finite).  Keeping
        # the guard inside the compiled step lets the host loop run sync-free:
        # a skipped step is a no-op on params/opt-state/step-counter, so the
        # host counts skips later as `steps_run - (state.step - step0)`
        # without fetching a scalar every step (a host round-trip costs
        # ~32 ms on a tunneled backend).  lax.cond (not jnp.where over the
        # state tree) so the common ok-path pays no whole-state select —
        # the tree-wide select measured ~8% of the flagship step.
        total = loss_dic["total"]
        ok = jnp.isfinite(total) & (total > 1e-10)
        new_stats = mutated.get("batch_stats", state.batch_stats)

        new_state = jax.lax.cond(
            ok,
            lambda: state.apply_gradients(grads=grads, batch_stats=new_stats),
            # skipped: keep params/opt/step; BN stats did update in the
            # forward (the reference detects the bad loss only after forward)
            lambda: state.replace(batch_stats=new_stats),
        )
        loss_dic["skipped"] = 1.0 - ok.astype(jnp.float32)
        return new_state, loss_dic

    return train_step


def make_eval_step(model, dat_name: str, config: Config) -> Callable:
    """Returns jitted eval_step(state, batch) -> outputs (joints/verts/j2d/...)."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(state, batch):
        batch = normalize_batch(batch)
        outputs, _ = _forward(
            model, state.params, state.batch_stats, batch, dat_name, config, train=False
        )
        keep = {
            k: outputs[k]
            for k in (
                "joints", "mano_verts", "j2d", "re_img", "re_sil", "re_depth",
                # raw MANO params + heatmap uv feed test-time refinement
                # (reference mano_fitting, traineval_util.py:505-596)
                "pose_params", "shape_params", "trans", "scale", "hm_j2d",
            )
            if k in outputs and outputs[k] is not None
        }
        return keep

    return eval_step
