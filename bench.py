"""Benchmark: flagship training-step throughput (images/sec/chip).

Runs the full train step (ResNet50 + MANO + 672^2-supersampled Pallas render
+ loss stack + backward + Adam) on synthetic data on the attached device and
prints ONE JSON line for the driver.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against REF_GPU_IMAGES_PER_SEC, a conservative estimate of the PyTorch
reference's single-GPU training throughput at the same work (batch 8-32,
PyTorch3D 672^2 raster) — revisit when a measured reference baseline lands in
BASELINE.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# persistent compilation cache: the flagship graph takes many minutes to
# compile cold on the remote-compile TPU path; cache makes reruns instant
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/hifihr_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REF_GPU_IMAGES_PER_SEC = 30.0  # estimated PyTorch+V100 reference throughput (batch 8-48, PyTorch3D 672^2)

BATCH = 64
IMAGE_SIZE = 224
STEPS = 20


def main():
    from __graft_entry__ import _fake_batch
    from hifihr_tpu.config import Config
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    cfg = Config(
        pretrain="res50",
        hand_model="mano",
        render=True,
        light_estimation=True,
        image_size=IMAGE_SIZE,
        aa_factor=3,
        losses=(
            "joint_3d", "joint_2d", "vert_3d", "mscale", "mshape", "mpose",
            "sil", "iou", "bone_direc",
        ),
    )
    model = HiFiHR(config=cfg)
    batch = _fake_batch(BATCH, IMAGE_SIZE)
    rng = np.random.RandomState(0)
    batch["imgs"] = batch["imgs"] + rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(
        np.float32
    )

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    lc = LossComputer(cfg)
    step = make_train_step(model, lc, "FreiHand", cfg)
    sched = make_sched(cfg, 0)

    # compile + warmup (2 steps)
    for _ in range(2):
        state, loss_dic = step(state, batch, sched)
    jax.block_until_ready(loss_dic["total"])

    # synchronise every step: robust against async/dispatch artifacts on
    # tunneled backends, at the cost of a pipeline bubble per step
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        state, loss_dic = step(state, batch, sched)
        total = float(loss_dic["total"])  # forces execution
        times.append(time.perf_counter() - t0)
    assert np.isfinite(total)
    dt = float(np.median(times))
    ips = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / REF_GPU_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
