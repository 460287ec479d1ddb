"""MSAA-vs-SSAA TRAINING-level equivalence experiment (VERDICT r2 task #4).

The headline bench number uses the binned-MSAA renderer; its forward
equivalence to the reference's supersample-then-pool (SSAA) is pinned by
tests (bit-comparable silhouette alpha, interior shading within 0.02,
tests/test_msaa.py) — but gradients differ structurally (per-pixel shading
at the pixel center vs averaged subsample shading; reference pooling at
models_res_nimble.py:74-77, 209-211).  This script converts the assumption
into evidence: it trains `configs/smoke_render.json` TWICE — identical
seed, data order and step count, aa_mode the only difference — and records
final eval metrics side by side.

Usage: python tools/aa_equivalence.py [epochs]
Writes AA_EQUIVALENCE.json at the repo root.
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


def run_one(aa_mode: str, epochs: int) -> dict:
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer
    from train import build_loaders, load_eval_gt

    # batch 8 for BOTH arms: the SSAA arm's supersampled activations OOM HBM
    # at the smoke config's batch 16 (24.1G vs 15.75G — this is what killed
    # the round-3 attempt); the comparison stays like-for-like.
    config = Config.from_json(
        os.path.join(ROOT, "configs/smoke_render.json"), aa_mode=aa_mode,
        total_epochs=epochs, train_batch=8, val_batch=8,
        base_out_path=f"output/aa_equiv_{aa_mode}")
    os.makedirs(config.base_out_path, exist_ok=True)

    model = HiFiHR(config=config)
    train_loader, val_loader = build_loaders(config)
    eval_gt = load_eval_gt(config)
    if eval_gt is None and val_loader is not None:
        from hifihr_tpu.data.synthetic import SyntheticHandDataset

        ds = getattr(val_loader, "dataset", None)
        if isinstance(ds, SyntheticHandDataset):
            eval_gt = {"xyz": ds.joints, "verts": ds.verts}
    trainer = Trainer(config, model, train_loader, val_loader,
                      eval_gt=eval_gt, out_dir=config.base_out_path)
    t0 = time.perf_counter()
    curve = []
    ev = {}
    for epoch in range(epochs):
        trainer.train_epoch(epoch)
        ev = trainer.evaluate(epoch)
        curve.append(round(float(ev.get("pa_mpjpe_cm", float("nan"))), 4))
    wall = time.perf_counter() - t0
    keep = {k: float(v) for k, v in ev.items()
            if isinstance(v, (int, float)) and k not in ("epoch",)}
    keep["pa_mpjpe_cm_curve"] = curve
    keep["wall_s"] = round(wall, 1)
    return keep


def main():
    logging.basicConfig(level=logging.INFO)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = {"config": "configs/smoke_render.json", "epochs": epochs,
           "note": ("same seed/data/steps; aa_mode is the only delta. "
                    "MSAA shades once per pixel with in-kernel 3x3 coverage; "
                    "SSAA is the reference-exact supersample+avgpool.")}
    for mode in ("msaa", "ssaa"):
        out[mode] = run_one(mode, epochs)
        print(mode, out[mode])
    deltas = {}
    for k in out["msaa"]:
        if k in out["ssaa"] and isinstance(out["msaa"][k], float) and k != "wall_s":
            deltas[k] = round(out["msaa"][k] - out["ssaa"][k], 6)
    out["msaa_minus_ssaa"] = deltas
    with open(os.path.join(ROOT, "AA_EQUIVALENCE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["msaa_minus_ssaa"]))


if __name__ == "__main__":
    main()
