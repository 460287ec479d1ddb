"""Settle the longrun late-epoch regression (VERDICT r4 task #7).

The 30-epoch longrun (evidence/longrun_smoke/) ends 6% worse than its best
(PA-MPJPE 0.537 @ epoch 23 -> 0.568 @ epoch 29) right after lambda_pose steps
10x at epoch 20 — "convergence plateau" was asserted, not shown.  This runs
the controlled experiment: train the longrun config to epoch 19 once, then
branch TWO arms from that checkpoint for epochs 20-29,

  stepped — lambda_pose_list unchanged: 0.01 -> 0.1 at epoch 20
            (the reference's schedule shape, train_hrnet.py:453-465)
  flat    — lambda_pose held at 0.01

identical seed/data/everything else.  Per-epoch PA-MPJPE/PCK curves for both
arms land in evidence/lambda_ablation.json: if both regress alike, the
regression is noise/plateau; if only the stepped arm regresses, the schedule
step is too aggressive for this (synthetic) smoke set.

Usage: python tools/lambda_ablation.py [base_epochs] [arm_epochs]
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/hifihr_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_OUT = "output/lambda_ablation"


def _trainer(total_epochs: int, out: str, **overrides):
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer
    from train import build_loaders, load_eval_gt

    config = Config.from_json(
        os.path.join(ROOT, "configs/longrun_smoke.json"),
        total_epochs=total_epochs, base_out_path=out, **overrides)
    os.makedirs(config.base_out_path, exist_ok=True)
    model = HiFiHR(config=config)
    train_loader, val_loader = build_loaders(config)
    eval_gt = load_eval_gt(config)
    if eval_gt is None and val_loader is not None:
        from hifihr_tpu.data.synthetic import SyntheticHandDataset

        ds = getattr(val_loader, "dataset", None)
        if isinstance(ds, SyntheticHandDataset):
            eval_gt = {"xyz": ds.joints, "verts": ds.verts}
    return Trainer(config, model, train_loader, val_loader,
                   eval_gt=eval_gt, out_dir=config.base_out_path), config


def _run_arm(name: str, base_ckpt: str, start: int, end: int,
             **overrides) -> list[dict]:
    trainer, _ = _trainer(end, f"{BASE_OUT}/{name}",
                          pretrain_model=base_ckpt, **overrides)
    assert trainer.start_epoch == start, (trainer.start_epoch, start)
    curve = []
    for epoch in range(start, end):
        rec = trainer.train_epoch(epoch)
        ev = trainer.evaluate(epoch)
        curve.append({
            "epoch": epoch,
            "pa_mpjpe_cm": round(float(ev.get("pa_mpjpe_cm", float("nan"))), 5),
            "pck_auc": round(float(ev.get("pck_auc", float("nan"))), 5),
            "train_loss": round(float(rec.get("train_loss", float("nan"))), 5),
        })
        print(name, curve[-1], flush=True)
    return curve


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    base_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    arm_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t0 = time.time()

    base_out = f"{BASE_OUT}/base"
    base_ckpt = os.path.join(base_out, "model")
    # base run to epoch base_epochs-1 with a checkpoint at the last epoch
    if not os.path.exists(base_ckpt):
        trainer, _ = _trainer(base_epochs, base_out,
                              save_interval=base_epochs, if_test=False)
        trainer.fit()
        print(f"base run done ({time.time() - t0:.0f}s)", flush=True)

    end = base_epochs + arm_epochs
    stepped = _run_arm("stepped", base_ckpt, base_epochs, end)
    flat = _run_arm("flat", base_ckpt, base_epochs, end,
                    lambda_pose_list=(0.0001, 0.01, 0.01))

    best = lambda c: min(x["pa_mpjpe_cm"] for x in c)
    out = {
        "what": ("two arms from the same epoch-%d checkpoint of "
                 "configs/longrun_smoke.json, epochs %d-%d; lambda_pose "
                 "stepped 0.01->0.1 at epoch 20 vs held at 0.01"
                 % (base_epochs - 1, base_epochs, end - 1)),
        "stepped": stepped,
        "flat": flat,
        "final_pa_mpjpe_stepped": stepped[-1]["pa_mpjpe_cm"],
        "final_pa_mpjpe_flat": flat[-1]["pa_mpjpe_cm"],
        "best_pa_mpjpe_stepped": best(stepped),
        "best_pa_mpjpe_flat": best(flat),
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(ROOT, "evidence", "lambda_ablation.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps({k: out[k] for k in out if k.startswith(("final", "best"))}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
