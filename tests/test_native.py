"""Native C++ image pipeline: build, decode, warp parity vs numpy path."""

import io

import numpy as np
import pytest

from hifihr_tpu.data import native
from hifihr_tpu.geometry import crops


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_decode_jpeg_roundtrip(rng):
    from PIL import Image

    # smooth gradient image (JPEG handles it near-losslessly)
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([x * 3, y * 4, (x + y) * 2], axis=-1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    out = native.decode_jpeg(buf.getvalue())
    assert out is not None and out.shape == (48, 64, 3)
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 4.0
    # PIL's decoder agrees with ours
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    np.testing.assert_allclose(out.astype(float), pil.astype(float), atol=2)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_warp_batch_matches_numpy(rng):
    imgs = (rng.rand(3, 40, 40, 3) * 255).astype(np.uint8)
    affines = []
    for i in range(3):
        total, _ = crops.get_affine_transform(
            np.asarray([20, 20]), 30 + i * 5, [32, 32], rot=0.2 * i
        )
        affines.append(total)
    affines = np.stack(affines).astype(np.float32)
    got = native.warp_affine_batch(imgs, affines, (32, 32))
    assert got is not None
    for i in range(3):
        want = crops.transform_img(imgs[i].astype(np.float32) / 255.0, affines[i], [32, 32])
        np.testing.assert_allclose(got[i], want, atol=2e-2)
