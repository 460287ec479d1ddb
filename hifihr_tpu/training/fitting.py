"""Test-time MANO fitting refinement.

Counterpart of reference `mano_fitting` (utils/traineval_util.py:505-596):
starting from the network's predicted MANO parameters, run a short Adam
optimisation minimising 2D reprojection to detected keypoints plus bone
direction and pose/shape/scale priors.  The reference runs a 151-step Python
loop of optimizer.step(); here the whole refinement is ONE jitted
`lax.fori_loop` — no host round-trips, so it can run per-batch on TPU.

LR schedule mirrors the reference: 0.01, /2 at step 50, /2 again at 100.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hifihr_tpu.geometry.projection import perspective_project
from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
from hifihr_tpu.losses.basic import bone_direction_loss, tsa_pose_loss

N_STEPS = 151


def make_fitting_fn(mano: ManoLayer, n_steps: int = N_STEPS):
    schedule = optax.piecewise_constant_schedule(
        0.01, {50: 0.5, 100: 0.5}
    )
    tx = optax.adam(schedule)

    @jax.jit
    def fit(pose, betas, trans, scale, Ks, target_2d, target_conf, root_xyz):
        """All (B, ...) batched. Returns refined (pose, betas, trans, scale)."""

        params = {"pose": pose, "betas": betas, "trans": trans, "scale": scale}

        def loss_fn(p):
            out = mano(p["pose"], p["betas"])
            joints = regress_joints_frei(out.verts, mano.J_regressor)
            joints = joints - joints[:, 9:10]
            j3d = joints * jnp.abs(p["scale"])[:, None, :] + root_xyz + p["trans"][:, None, :]
            j2d = perspective_project(j3d, Ks)
            reproj = jnp.mean(
                jnp.sum((j2d - target_2d) ** 2, axis=-1) * target_conf[..., 0]
            )
            bone = bone_direction_loss(j2d, target_2d, target_conf)
            pose_prior = tsa_pose_loss(out.full_pose)
            shape_prior = jnp.mean(p["betas"] ** 2)
            scale_prior = jnp.mean((jnp.abs(p["scale"]) - 1.0) ** 2)
            return (
                1e-3 * reproj
                + 0.1 * bone
                + 0.1 * pose_prior
                + 1e-3 * shape_prior
                + 1e-2 * scale_prior
            )

        opt_state = tx.init(params)

        def body(_, carry):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, n_steps, body, (params, opt_state))
        return params

    return fit
