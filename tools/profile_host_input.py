"""Host-side input-pipeline profile: where does the real-data batch time go?

Times every stage of the disk->device path on the same 2048-image FreiHAND
fixture bench.py uses (batch 64, 224^2):

  read      raw JPEG bytes from disk (page-cache warm)
  decode    native libjpeg-turbo decode (hifihr_tpu/native)
  mask      mask JPEG decode + binarize
  warp      native affine warp (rotation aug, u8 -> u8)
  mask_warp mask warp
  sample    full FreiHand.get_sample (everything above + K update, j2d, ...)
  cached    get_sample with the decoded-uint8 mmap snapshot (data/cache.py)
  collate   np.stack of 64 samples
  h2d       jax.device_put of one collated batch (blocked)

Writes HOST_PROFILE.json at the repo root — the committed evidence for why
the uncached real-data number trails the device rate on this 1-core host
(VERDICT r4 task #4 / weak #2), and what the decode cache removes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 64
N_PROFILE = 256  # images per stage measurement


def _rate(dt: float, n: int) -> dict:
    return {"ms_per_image": round(1e3 * dt / n, 3),
            "ms_per_batch64": round(1e3 * dt / n * BATCH, 1),
            "images_per_sec": round(n / dt, 1)}


def main() -> None:
    from hifihr_tpu.data import native
    from hifihr_tpu.data.base import collate
    from hifihr_tpu.data.freihand import FreiHand, _load_image
    from hifihr_tpu.geometry import crops
    from tools.make_freihand_fixture import make_fixture

    n_img = 2048
    fixture = os.environ.get("HIFIHR_FIXTURE_DIR", "/tmp/hifihr_fixture_2048")
    make_fixture(fixture, n=n_img, image_size=224)
    queries = ("trans_images", "trans_Ks", "trans_joints", "trans_verts",
               "scales", "trans_masks", "open_2dj")
    out: dict = {"host": {"nproc": os.cpu_count()},
                 "native_pipeline": native.available(),
                 "batch": BATCH, "n_profiled": N_PROFILE}

    ds = FreiHand(fixture, split="training", db_size=n_img, n_versions=1,
                  queries=queries)
    idxs = list(range(N_PROFILE))
    paths = [os.path.join(ds.img_dir, "%08d.jpg" % i) for i in idxs]

    # warm the page cache so `read` measures the syscall/memcpy, not the disk
    for p in paths:
        open(p, "rb").read()

    t0 = time.perf_counter()
    blobs = [open(p, "rb").read() for p in paths]
    out["read"] = _rate(time.perf_counter() - t0, N_PROFILE)

    t0 = time.perf_counter()
    imgs = [native.decode_jpeg(b) if native.available() else _load_image(p, True)
            for b, p in zip(blobs, paths)]
    out["decode"] = _rate(time.perf_counter() - t0, N_PROFILE)

    t0 = time.perf_counter()
    masks = [ds.get_mask(i, as_u8=True) for i in idxs]
    out["mask"] = _rate(time.perf_counter() - t0, N_PROFILE)

    rng = np.random.RandomState(0)
    affs = []
    for _ in idxs:
        rot = rng.uniform(-np.pi, np.pi)
        aff, _post = crops.get_affine_transform(
            np.asarray([112, 112]), 224, [224, 224], rot=rot)
        affs.append(aff)
    t0 = time.perf_counter()
    warped = [crops.transform_img(im, a, [224, 224], out_u8=True)
              for im, a in zip(imgs, affs)]
    out["warp"] = _rate(time.perf_counter() - t0, N_PROFILE)

    t0 = time.perf_counter()
    _ = [crops.transform_img(m, a, [224, 224], out_u8=True)
         for m, a in zip(masks, affs)]
    out["mask_warp"] = _rate(time.perf_counter() - t0, N_PROFILE)

    t0 = time.perf_counter()
    samples = [ds.get_sample(i) for i in idxs]
    out["sample_uncached"] = _rate(time.perf_counter() - t0, N_PROFILE)

    cache_dir = os.environ.get("HIFIHR_DECODE_CACHE", "/tmp/hifihr_decode_cache")
    ds_c = FreiHand(fixture, split="training", db_size=n_img, n_versions=1,
                    queries=queries, decode_cache=cache_dir)
    for i in idxs:  # fill pass
        ds_c.get_sample(i)
    t0 = time.perf_counter()
    _ = [ds_c.get_sample(i) for i in idxs]
    out["sample_cached"] = _rate(time.perf_counter() - t0, N_PROFILE)

    drop = ("idxs", "open_2dj", "open_2dj_con")
    for s in samples:
        for k in drop:
            s.pop(k, None)
    n_batches = N_PROFILE // BATCH
    t0 = time.perf_counter()
    batches = [collate(samples[b * BATCH:(b + 1) * BATCH])
               for b in range(n_batches)]
    out["collate"] = _rate(time.perf_counter() - t0, n_batches * BATCH)

    # H2D: the packed single-buffer transfer the train loop uses
    try:
        import jax

        from hifihr_tpu.data.pipeline import _to_device
        from hifihr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        dev = _to_device(dict(batches[0]), mesh)  # compile/warm
        jax.block_until_ready(list(dev.values()))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            dev = _to_device(dict(batches[0]), mesh)
            jax.block_until_ready(list(dev.values()))
        out["h2d_blocked"] = _rate(time.perf_counter() - t0, reps * BATCH)
        out["h2d_note"] = ("blocked per-batch H2D incl. one tunnel round trip;"
                           " the train loop overlaps this via prefetch")
    except Exception as exc:  # noqa: BLE001
        out["h2d_blocked"] = f"failed: {exc}"

    per_batch = {k: out[k]["ms_per_batch64"] for k in
                 ("read", "decode", "mask", "warp", "mask_warp")}
    out["summary"] = {
        "uncached_host_ms_per_batch64": out["sample_uncached"]["ms_per_batch64"],
        "cached_host_ms_per_batch64": out["sample_cached"]["ms_per_batch64"],
        "decode_share_of_uncached": round(
            (out["decode"]["ms_per_batch64"] + out["mask"]["ms_per_batch64"])
            / out["sample_uncached"]["ms_per_batch64"], 3),
        "stage_ms_per_batch64": per_batch,
    }
    path = os.path.join(REPO, "HOST_PROFILE.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps(out["summary"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
