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


def run_one(aa_mode: str, epochs: int, **overrides) -> dict:
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer
    from train import build_loaders, load_eval_gt

    # batch 8 for BOTH arms: the SSAA arm's supersampled activations OOM HBM
    # at the smoke config's batch 16 (24.1G vs 15.75G — this is what killed
    # the round-3 attempt); the comparison stays like-for-like.
    tag = overrides.pop("tag", aa_mode)
    config = Config.from_json(
        os.path.join(ROOT, "configs/smoke_render.json"), aa_mode=aa_mode,
        total_epochs=epochs, train_batch=8, val_batch=8,
        base_out_path=f"output/aa_equiv_{tag}", **overrides)
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


def _deltas(a: dict, b: dict) -> dict:
    return {k: round(a[k] - b[k], 6) for k in a
            if k in b and isinstance(a[k], float) and k != "wall_s"}


def _merge_write(update: dict) -> None:
    """Merge into AA_EQUIVALENCE.json (atomic) so the aa and corner
    experiments accumulate in one artifact."""
    path = os.path.join(ROOT, "AA_EQUIVALENCE.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out.update(update)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, path)


def run_aa(epochs: int) -> None:
    out = {"config": "configs/smoke_render.json", "epochs": epochs,
           "note": ("same seed/data/steps; aa_mode is the only delta. "
                    "MSAA shades once per pixel with in-kernel 3x3 coverage; "
                    "SSAA is the reference-exact supersample+avgpool.")}
    for mode in ("msaa", "ssaa"):
        out[mode] = run_one(mode, epochs)
        print(mode, out[mode])
    out["msaa_minus_ssaa"] = _deltas(out["msaa"], out["ssaa"])
    _merge_write(out)
    print(json.dumps(out["msaa_minus_ssaa"]))


def run_corner(epochs: int) -> None:
    """NIMBLE appearance-path equivalence (VERDICT r4 task #5): the round-4
    speedup replaced per-fragment UV sampling of the PCA texture maps
    (reference textured Meshes, models_res_nimble.py:132-142) with
    barycentric interpolation of the PCA evaluated at face-corner UVs —
    a second gradient-structure deviation.  Train both arms, same
    seed/data/steps, nimble_corner_tex the only delta."""
    arms = {}
    for name, corner in (("corner", True), ("perfrag", False)):
        arms[name] = run_one("msaa", epochs, hand_model="nimble",
                             nimble_corner_tex=corner, tag=f"nimble_{name}")
        print(name, arms[name])
    _merge_write({
        "corner_experiment": {
            "config": "configs/smoke_render.json + hand_model=nimble",
            "epochs": epochs,
            "note": ("same seed/data/steps; nimble_corner_tex is the only "
                     "delta: corner-sampled PCA appearance vs per-fragment "
                     "UV sampling of the PCA texture maps."),
            "corner": arms["corner"],
            "perfrag": arms["perfrag"],
            "corner_minus_perfrag": _deltas(arms["corner"], arms["perfrag"]),
        }
    })
    print(json.dumps(_deltas(arms["corner"], arms["perfrag"])))


def main():
    logging.basicConfig(level=logging.INFO)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    experiment = sys.argv[2] if len(sys.argv) > 2 else "aa"
    if experiment == "aa":
        run_aa(epochs)
    elif experiment == "corner":
        run_corner(epochs)
    else:
        raise SystemExit(f"unknown experiment {experiment!r} (aa | corner)")


if __name__ == "__main__":
    main()
