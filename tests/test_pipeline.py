import numpy as np

from hifihr_tpu.data.base import BatchLoader
from hifihr_tpu.data.pipeline import prefetch_to_device
from hifihr_tpu.data.synthetic import SyntheticHandDataset
from hifihr_tpu.parallel.mesh import make_mesh


def test_prefetch_yields_all_batches_sharded():
    ds = SyntheticHandDataset(size=32, image_size=32)
    loader = BatchLoader(ds, batch_size=8, shuffle=False)
    mesh = make_mesh()
    batches = list(prefetch_to_device(loader, mesh))
    assert len(batches) == 4
    b = batches[0]
    assert b["dataset"] == "FreiHand"
    assert b["imgs"].shape == (8, 32, 32, 3)
    assert len(b["imgs"].sharding.device_set) == len(mesh.devices.ravel())
    # content matches the plain loader
    plain = next(iter(BatchLoader(ds, batch_size=8, shuffle=False)))
    np.testing.assert_allclose(np.asarray(b["imgs"]), plain["imgs"], atol=1e-6)


def test_pack_unpack_roundtrip():
    """Packed single-buffer transfer must reproduce every field bit-exactly
    (f32 bitcast, u8 passthrough, MSB-first mask bitpack, int64->int32)."""
    import jax
    import numpy as np

    from hifihr_tpu.data.pipeline import _unpack_fn, pack_batch

    rng = np.random.RandomState(0)
    batch = {
        "imgs": (rng.rand(4, 16, 16, 3) * 255).astype(np.uint8),
        "segms_gt": (rng.rand(4, 15, 15) > 0.5).astype(np.uint8),  # odd size
        "joints": rng.randn(4, 21, 3).astype(np.float32),
        "texture_con": rng.rand(4).astype(np.float32),
        "idxs": np.arange(4, dtype=np.int64),
    }
    packed, spec = pack_batch(batch)
    assert packed.dtype == np.uint8 and packed.shape[0] == 4
    # masks travel bit-packed: 8x smaller than raw u8
    seg_field = next(f for f in spec if f[0] == "segms_gt")
    assert seg_field[4] == -(-15 * 15 // 8)
    out = jax.jit(lambda b: _unpack_fn(spec)(b))(packed)
    np.testing.assert_array_equal(np.asarray(out["imgs"]), batch["imgs"])
    np.testing.assert_array_equal(np.asarray(out["segms_gt"]), batch["segms_gt"])
    np.testing.assert_array_equal(np.asarray(out["joints"]), batch["joints"])
    np.testing.assert_array_equal(np.asarray(out["texture_con"]), batch["texture_con"])
    np.testing.assert_array_equal(np.asarray(out["idxs"]),
                                  batch["idxs"].astype(np.int32))


def test_prefetch_packed_matches_host(synth_loader_factory=None):
    """prefetch_to_device through the packed path must deliver the same
    values as the host batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hifihr_tpu.data.base import BatchLoader
    from hifihr_tpu.data.pipeline import prefetch_to_device
    from hifihr_tpu.data.synthetic import SyntheticHandDataset
    from hifihr_tpu.parallel.mesh import make_mesh

    ds = SyntheticHandDataset(size=16, image_size=16)
    loader = BatchLoader(ds, batch_size=8, shuffle=False)
    host = list(loader)
    mesh = make_mesh()
    dev = list(prefetch_to_device(BatchLoader(ds, batch_size=8, shuffle=False), mesh))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        for k, v in h.items():
            if isinstance(v, str):
                continue
            got = np.asarray(d[k])
            want = np.asarray(v)
            if want.dtype == np.int64:
                want = want.astype(np.int32)
            np.testing.assert_allclose(got, want.astype(got.dtype), atol=1e-6)
