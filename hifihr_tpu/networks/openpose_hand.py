"""CPM hand keypoint detector (openpose-style), flax — pseudo-label generator.

Port of the reference's offline 2D keypoint labeller
(utils/openpose_detector/src/model.py handpose_model:143-220, src/hand.py):
VGG-style stem to 128ch stride-8 features, a 22-channel stage-1 head, then 5
refinement stages over concat(heatmaps, features) with 7x7 convs.  Produces
the `open_2dj`/`open_2dj_con` weak supervision consumed at training time.

Inference differences from the reference, TPU-first: the multi-scale loop
(4 scales), resize-to-original and per-keypoint peak extraction run as one
batched jit program (argmax over a blurred heatmap) instead of per-image
cv2/scipy/skimage host code.  Weights: convert the caffe-torch
hand_pose_model.pth with tools/convert_openpose.py -> assets/openpose_hand.npz.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

OPENPOSE_NPZ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "openpose_hand.npz",
)

_STEM = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool", None),
    ("conv2_1", 128), ("conv2_2", 128), ("pool", None),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool", None),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3_CPM", 128),
]


class HandposeCPM(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), values in [-0.5, 0.5]
        for name, ch in _STEM:
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name)(x))
        feat = x  # (B, H/8, W/8, 128)
        h = nn.relu(nn.Conv(512, (1, 1), name="conv6_1_CPM")(feat))
        h = nn.Conv(22, (1, 1), name="conv6_2_CPM")(h)
        for stage in range(2, 7):
            y = jnp.concatenate([h, feat], axis=-1)
            for i in range(1, 6):
                y = nn.relu(
                    nn.Conv(128, (7, 7), padding=3, name=f"Mconv{i}_stage{stage}")(y)
                )
            y = nn.relu(nn.Conv(128, (1, 1), name=f"Mconv6_stage{stage}")(y))
            h = nn.Conv(22, (1, 1), name=f"Mconv7_stage{stage}")(y)
        return h  # (B, H/8, W/8, 22)


class HandDetector:
    """Multi-scale heatmap inference + peak extraction -> (peaks, confidence)."""

    def __init__(self, image_size: int = 368, scales=(0.5, 1.0, 1.5, 2.0)):
        self.model = HandposeCPM()
        self.image_size = image_size
        self.scales = scales
        dummy = jnp.zeros((1, image_size, image_size, 3))
        self.params = self.model.init(jax.random.PRNGKey(0), dummy)
        self.pretrained = False
        if os.path.exists(OPENPOSE_NPZ):
            with np.load(OPENPOSE_NPZ) as z:
                p = {}
                for key in z.files:
                    layer, kind = key.rsplit("_", 1)
                    p.setdefault(layer, {})[kind] = jnp.asarray(z[key])
                self.params = {"params": p}
            self.pretrained = True

        @jax.jit
        def _infer(params, images):
            """images (B, S, S, 3) in [0,1] -> heatmaps (B, S, S, 21), peaks."""
            s = images.shape[1]
            acc = jnp.zeros((images.shape[0], s, s, 22))
            for scale in self.scales:
                size = int(round(s * scale / 8)) * 8
                scaled = jax.image.resize(
                    images, (images.shape[0], size, size, 3), "cubic"
                )
                hm = self.model.apply(params, scaled - 0.5)
                hm = jax.image.resize(hm, acc.shape, "cubic")
                acc = acc + hm / len(self.scales)
            hm21 = acc[..., :21]
            # 5x5 average blur before the peak (stands in for gaussian_filter)
            kernel = jnp.ones((5, 5, 1, 1)) / 25.0
            blurred = jax.lax.conv_general_dilated(
                hm21, jnp.tile(kernel, (1, 1, 1, 21)), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=21,
            )
            flat = blurred.reshape(images.shape[0], -1, 21)
            idx = jnp.argmax(flat, axis=1)
            ys, xs = idx // s, idx % s
            conf = jnp.take_along_axis(
                hm21.reshape(images.shape[0], -1, 21), idx[:, None, :], axis=1
            )[:, 0, :]
            peaks = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
            return peaks, conf

        self._infer = _infer

    def __call__(self, images: np.ndarray):
        """(B, S, S, 3) float [0,1] -> (peaks (B,21,2), conf (B,21,1))."""
        peaks, conf = self._infer(self.params, jnp.asarray(images))
        return np.asarray(peaks), np.asarray(conf)[..., None]


def detect_directory(image_dir: str, out_json: str, batch: int = 16):
    """Walk a dataset image dir and write detect.json [[coords, conf], ...]
    (the format FreiHand/HO3D loaders consume — data/dataset.py:1430, 1960)."""
    import json

    from hifihr_tpu.data.freihand import _load_image

    det = HandDetector()
    if not det.pretrained:
        print("WARNING: assets/openpose_hand.npz absent; using random features")
    names = sorted(
        f for f in os.listdir(image_dir) if f.endswith((".jpg", ".png"))
    )
    results = []
    for i in range(0, len(names), batch):
        imgs = np.stack(
            [_load_image(os.path.join(image_dir, n)) for n in names[i : i + batch]]
        )
        peaks, conf = det(imgs)
        for p, c in zip(peaks, conf):
            results.append([p.tolist(), c.tolist()])
    with open(out_json, "w") as f:
        json.dump(results, f)
    return out_json
