"""Qualify the bf16 encoder compute path (VERDICT r3 weak #2).

Config.compute_dtype='bfloat16' (the default) runs the encoder convolutions
in bf16 with fp32 params/grads (models/hifihr.py).  This tool records BOTH
halves of the qualification the round-3 verdict asked for:

 1. SPEED: median train-step time, bf16 vs fp32 compute, res50 and effb3
    encoders (the config bank's majority cases), flagship losses, batch 64.
 2. ACCURACY: two short smoke_render trainings identical except for
    compute_dtype (same seed/data/steps) — final train loss and eval
    PA-MPJPE/PCK side by side.

Writes BF16_CHECK.json at the repo root.
Usage: python tools/bf16_check.py [epochs]   (run ALONE on the box — 1 CPU)
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/hifihr_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = 64


def step_ms(pretrain: str, compute_dtype: str, steps: int = 10) -> float:
    from __graft_entry__ import _fake_batch
    from hifihr_tpu.config import Config
    from hifihr_tpu.losses.stack import LossComputer
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.steps import make_sched, make_train_step
    from hifihr_tpu.training.train_state import create_train_state

    cfg = Config(pretrain=pretrain, hand_model="mano", render=True,
                 light_estimation=True, image_size=224, aa_factor=3,
                 aa_mode="msaa", compute_dtype=compute_dtype,
                 losses=("joint_3d", "joint_2d", "vert_3d", "mscale",
                         "mshape", "mpose", "sil", "iou", "bone_direc"))
    model = HiFiHR(config=cfg)
    batch = _fake_batch(BATCH, 224)
    rng = np.random.RandomState(0)
    batch["imgs"] = batch["imgs"] + rng.rand(BATCH, 224, 224, 3).astype(np.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, LossComputer(cfg), "FreiHand", cfg)
    sched = make_sched(cfg, 0)
    for _ in range(2):
        state, d = step(state, batch, sched)
    float(d["total"])
    times = []
    for _ in range(max(1, steps // 5)):
        t0 = time.perf_counter()
        for _ in range(5):
            state, d = step(state, batch, sched)
        total = float(d["total"])
        times.append((time.perf_counter() - t0) / 5)
    assert np.isfinite(total)
    return 1e3 * float(np.median(times))


def train_smoke(compute_dtype: str, epochs: int) -> dict:
    from hifihr_tpu.config import Config
    from hifihr_tpu.data.synthetic import SyntheticHandDataset
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer
    from train import build_loaders, load_eval_gt

    config = Config.from_json(
        os.path.join(ROOT, "configs/smoke_render.json"),
        compute_dtype=compute_dtype, total_epochs=epochs,
        base_out_path=f"output/bf16_check_{compute_dtype}")
    os.makedirs(config.base_out_path, exist_ok=True)
    model = HiFiHR(config=config)
    train_loader, val_loader = build_loaders(config)
    eval_gt = load_eval_gt(config)
    if eval_gt is None and val_loader is not None:
        ds = getattr(val_loader, "dataset", None)
        if isinstance(ds, SyntheticHandDataset):
            eval_gt = {"xyz": ds.joints, "verts": ds.verts}
    trainer = Trainer(config, model, train_loader, val_loader,
                      eval_gt=eval_gt, out_dir=config.base_out_path)
    rec = {}
    for epoch in range(epochs):
        rec = trainer.train_epoch(epoch)
    ev = trainer.evaluate(epochs - 1)
    out = {"final_train_loss": float(rec.get("train_loss", float("nan")))}
    out.update({k: float(v) for k, v in ev.items()
                if isinstance(v, (int, float)) and k != "epoch"})
    return out


def _flush(record):
    # incremental + atomic: a wall-clock kill mid-write cannot truncate the
    # artifact (write temp in the same dir, then rename over the target)
    target = os.path.join(ROOT, "BF16_CHECK.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=2)
    os.replace(tmp, target)


def main():
    logging.basicConfig(level=logging.INFO)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    record = {"batch": BATCH, "note": (
        "params/grads stay fp32 in both; compute_dtype only changes the "
        "encoder conv dtype. Accuracy arms share seed/data/steps.")}
    for enc in ("res50", "effb3"):
        for dt in ("bfloat16", "float32"):
            key = f"{enc}_{dt}_step_ms"
            record[key] = round(step_ms(enc, dt), 1)
            print(key, record[key], flush=True)
            _flush(record)
        record[f"{enc}_speedup_bf16"] = round(
            record[f"{enc}_float32_step_ms"] / record[f"{enc}_bfloat16_step_ms"], 3)
        _flush(record)
    for dt in ("bfloat16", "float32"):
        record[f"train_{dt}"] = train_smoke(dt, epochs)
        print(dt, record[f"train_{dt}"], flush=True)
        _flush(record)
    deltas = {}
    for k, v in record["train_bfloat16"].items():
        w = record["train_float32"].get(k)
        if isinstance(v, float) and isinstance(w, float):
            deltas[k] = round(v - w, 6)
    record["bf16_minus_fp32"] = deltas
    _flush(record)
    print(json.dumps(deltas))


if __name__ == "__main__":
    main()
