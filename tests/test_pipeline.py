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
