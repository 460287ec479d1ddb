"""CLI driver: `python train.py --config_json configs/FreiHAND/evaluation.json`.

Interface parity with the reference's single entry point
(train_hrnet.py:499-577): JSON config selects datasets, supervision level,
encoder, hand model and λ weights; the same script trains and evaluates.
"""

from __future__ import annotations

import argparse
import logging
import os


def build_loaders(config):
    from hifihr_tpu.data.base import BatchLoader, ConcatLoader, Subset
    from hifihr_tpu.data.synthetic import SyntheticHandDataset

    def dataset_for(name: str, split: str, queries):
        if name == "FreiHand":
            if config.freihand_base_path and os.path.exists(config.freihand_base_path):
                from hifihr_tpu.data.freihand import FreiHand

                return FreiHand(config.freihand_base_path, split=split,
                                queries=queries, semi_ratio=config.semi_ratio,
                                four_channel=config.four_channel,
                                decode_cache=config.decode_cache or None)
            logging.warning("FreiHAND data not found; using the synthetic stand-in")
            size = config.controlled_size if config.controlled_exp else 256
            return SyntheticHandDataset(size=size, image_size=config.image_size)
        if name == "RHD":
            from hifihr_tpu.data.rhd import RHD

            return RHD(config.rhd_base_path, split=split, queries=queries)
        if name == "HO3D":
            from hifihr_tpu.data.ho3d import HO3D

            return HO3D(config.ho3d_base_path, split=split, queries=queries)
        if name == "Dart":
            from hifihr_tpu.data.dart import DARTset

            return DARTset(config.dart_base_path, split=split)
        raise ValueError(name)

    train_loaders = []
    for name in config.train_datasets:
        q = {
            "FreiHand": config.train_queries_frei,
            "RHD": config.train_queries_rhd,
            "HO3D": config.train_queries_ho3d,
            "Dart": config.train_queries_dart,
        }.get(name) or config.train_queries
        ds = dataset_for(name, "training", q)
        # controlled-size experiments subset ANY training dataset
        # (reference data/dataset.py:97-106 limit_size)
        if config.controlled_exp and not isinstance(ds, SyntheticHandDataset):
            ds = Subset(ds, config.controlled_size)
        train_loaders.append(
            BatchLoader(ds, config.train_batch, num_workers=config.num_workers)
        )
    train_loader = (
        ConcatLoader(train_loaders) if len(train_loaders) > 1 else train_loaders[0]
    )

    val_loader = None
    if config.val_datasets:
        ds = dataset_for(config.val_datasets[0], "evaluation", config.val_queries)
        val_loader = BatchLoader(ds, config.val_batch, shuffle=False,
                                 drop_last=False, num_workers=config.num_workers)
    return train_loader, val_loader


def load_eval_gt(config):
    import json

    import numpy as np

    base = config.freihand_base_path
    if not base:
        return None
    xyz_p = os.path.join(base, "evaluation_xyz.json")
    verts_p = os.path.join(base, "evaluation_verts.json")
    if os.path.exists(xyz_p) and os.path.exists(verts_p):
        with open(xyz_p) as f:
            xyz = np.asarray(json.load(f), np.float32)
        with open(verts_p) as f:
            verts = np.asarray(json.load(f), np.float32)
        return {"xyz": xyz, "verts": verts}
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_json", type=str, required=True)
    parser.add_argument("--mode", type=str, default=None, choices=["training", "evaluation"])
    args = parser.parse_args()

    import jax

    # persistent compile cache shared with bench.py/tools: the flagship step
    # takes minutes to compile cold on the remote-compile TPU path
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/hifihr_jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR
    from hifihr_tpu.training.loop import Trainer

    config = Config.from_json(args.config_json)
    os.makedirs(config.base_out_path, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(config.base_out_path, "train.log")),
        ],
    )
    logging.info("config: %s", config)

    model = HiFiHR(config=config)
    train_loader, val_loader = build_loaders(config)
    eval_gt = load_eval_gt(config)
    if eval_gt is None and val_loader is not None:
        from hifihr_tpu.data.synthetic import SyntheticHandDataset

        ds = getattr(val_loader, "dataset", None)
        if isinstance(ds, SyntheticHandDataset):
            # synthetic stand-in carries exact GT -> PA-MPJPE works in smoke
            # runs too (Procrustes alignment absorbs the root convention)
            eval_gt = {"xyz": ds.joints, "verts": ds.verts}
    trainer = Trainer(
        config, model, train_loader, val_loader,
        eval_gt=eval_gt, out_dir=config.base_out_path,
    )

    mode = args.mode or (config.mode[0] if config.mode else "training")
    if mode == "evaluation":
        result = trainer.evaluate()
        logging.info("evaluation: %s", result)
    else:
        best = trainer.fit()
        logging.info("best PA-MPJPE (cm): %s", best)


if __name__ == "__main__":
    main()
