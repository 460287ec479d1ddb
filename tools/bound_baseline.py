"""Bound the PyTorch+GPU reference baseline with measurements, not a guess.

The reference publishes NO throughput numbers (BASELINE.md); bench.py's
`vs_baseline` has so far divided by a 30 img/s per-op ESTIMATE.  This tool
produces an auditable interval from two measured quantities:

 1. torch CPU wall-clock of the reference's non-renderer step (ResNet50
    fwd+bwd via the same replica used for weight-conversion parity,
    tests/torch_refs.py) — a hard anchor that the model math is what we think
    it is (reported, not extrapolated).
 2. The compiled FLOP count of OUR no-render flagship step (XLA
    cost_analysis) — encoder + MANO + losses + backward + Adam; the
    reference computes the equivalent work.

Derivation of the bound (documented in the output):
  * V100 fp32 peak 15.7 TFLOP/s (published spec); sustained convnet
    utilization 30-60% (common range for ResNet-class models in fp32).
  * non-raster step time = flops / (peak * util)
  * rasterizer+shade at 672^2 with AA pooling: PyTorch3D's CUDA forward +
    backward on a 1.5k-face mesh — bounded 10..60 ms/batch32 from its tiled
    design (no public single-number citation is available offline; the
    interval is wide on purpose).
  * images/sec = batch / (t_nonraster + t_raster)

Writes BASELINE_BOUND.json at the repo root; bench.py merges it into the
benchmark record when present.

Usage: python tools/bound_baseline.py  (takes ~2-4 min on 1 CPU core)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

V100_PEAK_FP32 = 15.7e12
UTIL_RANGE = (0.30, 0.60)
RASTER_MS_RANGE_B32 = (10.0, 60.0)  # PyTorch3D fwd+bwd, 672^2, ~1.5k faces
# NIMBLE: 11926 faces (7.8x) + 5990-vert textured Meshes at 672^2.  PyTorch3D
# binned rasterisation scales sublinearly with F at fixed coverage, but
# per-pixel texturing of the UV maps and the bigger packed meshes add real
# cost; a deliberately generous window keeps the bound's top end high (i.e.
# the target conservative).
RASTER_MS_RANGE_NIMBLE_B32 = (15.0, 90.0)
BATCH = 32


def measure_torch_cpu_resnet(batch: int = 2, steps: int = 3) -> float:
    """seconds/image for ResNet50 fwd+bwd on this machine's CPU torch."""
    import torch

    from torch_refs import TorchResNet50Trunk

    torch.manual_seed(0)
    net = TorchResNet50Trunk()
    x = torch.randn(batch, 3, 224, 224)
    out = net(x)[0].sum()
    out.backward()  # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        net.zero_grad()
        net(x)[0].sum().backward()
    return (time.perf_counter() - t0) / (steps * batch)


def flops_no_render_step(batch: int = BATCH, hand_model: str = "mano") -> float:
    """XLA-reported FLOPs of one no-render train step (mano or nimble)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _fake_batch
    from hifihr_tpu.config import Config
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    cfg = Config(pretrain="res50", hand_model=hand_model, render=False,
                 light_estimation=False, image_size=224,
                 losses=("joint_3d", "joint_2d", "vert_3d", "mscale",
                         "mshape", "mpose", "bone_direc"))
    model = HiFiHR(config=cfg)
    batch_d = _fake_batch(batch, 224)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch_d)
    step = make_train_step(model, LossComputer(cfg), "FreiHand", cfg)
    lowered = jax.jit(lambda s, b, sc: step(s, b, sc)).lower(
        state, batch_d, make_sched(cfg, 0)
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def main():
    cpu_s_per_img = measure_torch_cpu_resnet()
    flops = flops_no_render_step()
    flops_nimble = flops_no_render_step(hand_model="nimble")

    lo_util, hi_util = UTIL_RANGE

    def bounds(fl, raster_ms):
        t = [fl / (V100_PEAK_FP32 * u) for u in (hi_util, lo_util)]
        return (round(BATCH / (t[1] + raster_ms[1] / 1e3), 1),
                round(BATCH / (t[0] + raster_ms[0] / 1e3), 1))

    lo_ips, hi_ips = bounds(flops, RASTER_MS_RANGE_B32)
    lo_n, hi_n = bounds(flops_nimble, RASTER_MS_RANGE_NIMBLE_B32)

    record = {
        "ref_gpu_images_per_sec_bounds": [lo_ips, hi_ips],
        # the reference paper's flagship model (models_res_nimble.py:57):
        # same derivation with the NIMBLE no-render FLOPs and a generous
        # raster window for the 11926-face textured mesh
        "ref_gpu_nimble_images_per_sec_bounds": [lo_n, hi_n],
        "derivation": {
            "no_render_step_flops_b32": flops,
            "no_render_nimble_step_flops_b32": flops_nimble,
            "v100_peak_fp32_flops": V100_PEAK_FP32,
            "utilization_range": UTIL_RANGE,
            "raster_ms_range_b32_672sq": RASTER_MS_RANGE_B32,
            "raster_ms_range_nimble_b32_672sq": RASTER_MS_RANGE_NIMBLE_B32,
        },
        "torch_cpu_resnet50_s_per_img": round(cpu_s_per_img, 3),
        "torch_cpu_anchor_note": (
            "measured on this machine's 1-core CPU torch via the parity "
            "replica (tests/torch_refs.py); reported as an auditable anchor "
            "that the encoder work is as modelled, not extrapolated to GPU"
        ),
        "note": (
            "reference publishes no numbers; interval from XLA-counted FLOPs "
            "of the equivalent non-render step + V100 spec + utilization "
            "range + a wide PyTorch3D rasterizer window"
        ),
    }
    out = os.path.join(REPO, "BASELINE_BOUND.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
