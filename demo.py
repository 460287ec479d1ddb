"""Single-image inference demo: image -> mesh OBJ + rendered overlay grid.

Usage:
  python demo.py --image path.jpg --checkpoint output/run/model [--out demo_out]

Loads the flagship model, runs one forward pass, writes the predicted hand
mesh (vertex-colored OBJ), a prediction panel and a 20-view turntable strip —
the reference's demo/visualisation outputs (utils/visualize_util.py) as one
entry point.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--config_json", default=None)
    parser.add_argument("--out", default="demo_out")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hifihr_tpu.config import Config
    from hifihr_tpu.data.freihand import _load_image
    from hifihr_tpu.models.hifihr import HiFiHR, attach_j2d
    from hifihr_tpu.utils import visualize

    cfg = (
        Config.from_json(args.config_json)
        if args.config_json
        else Config(pretrain="res50", hand_model="mano", render=True,
                    light_estimation=True)
    )
    model = HiFiHR(config=cfg)

    img = _load_image(args.image)
    s = cfg.image_size
    if img.shape[:2] != (s, s):
        from hifihr_tpu.geometry.crops import resized_crop

        img = resized_crop(img, 0, 0, img.shape[0], img.shape[1], [s, s])
    imgs = jnp.asarray(img[None, ..., :3])
    f = s * 1.5
    K = jnp.asarray([[[f, 0, s / 2], [0, f, s / 2], [0, 0, 1]]], jnp.float32)
    root = jnp.asarray([[[0.0, 0.0, 0.5]]])

    variables = model.init(jax.random.PRNGKey(0), imgs, K, root, train=False)
    if args.checkpoint:
        from hifihr_tpu.training.checkpoint import CheckpointManager
        from hifihr_tpu.training.train_state import create_train_state

        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   {"imgs": imgs, "Ks": K, "root_xyz": root})
        state, _ = CheckpointManager(args.checkpoint, cfg.save_mode).restore(state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    out = model.apply(variables, imgs, K, root, train=False, mode_train=False)
    out = attach_j2d(out, Ks=K, root_xyz=root)

    os.makedirs(args.out, exist_ok=True)
    if cfg.hand_model == "nimble" and out["textures"].ndim == 4:
        # UV-textured NIMBLE skin dump (reference save_textured_nimble,
        # visualize_util.py:16,27)
        from hifihr_tpu.hand.nimble import NimbleLayer

        nimble = NimbleLayer()
        verts = np.asarray(out["skin_verts"][0])
        faces = np.asarray(nimble.skin_faces)
        visualize.save_obj(
            os.path.join(args.out, "hand.obj"), verts, faces,
            vert_uv=np.asarray(nimble.vert_uv),
            texture_image=np.asarray(out["textures"][0]),
        )
    else:
        verts = np.asarray(out["mano_verts"][0] + np.asarray(root[0]))
        faces = np.asarray(out["mano_faces"])
        visualize.save_obj(os.path.join(args.out, "hand.obj"), verts, faces)
    visualize.save_prediction_grid(
        os.path.join(args.out, "panel.png"), {"imgs": imgs}, out, max_rows=1
    )
    colors = np.full((len(verts), 3), 0.7, np.float32)
    frames = visualize.multiview_render(verts, faces, colors, n_views=8)
    strip = np.concatenate(list(frames[..., :3]), axis=1)
    visualize.write_png(os.path.join(args.out, "turntable.png"), strip)
    print(f"wrote {args.out}/hand.obj, panel.png, turntable.png")


if __name__ == "__main__":
    main()
