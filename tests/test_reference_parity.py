"""Numeric parity against the REFERENCE's own torch MANO layer.

Runs /root/reference's vendored manopth ManoLayer (utils/my_mano.py:225-483)
on CPU torch — with its pytorch3d import and chumpy asset loader stubbed —
and compares verts/joints against hifihr_tpu's fused JAX layer on identical
inputs.  This is the direct "converted checkpoints behave identically"
guarantee; skipped when the reference tree or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)


@pytest.fixture(scope="module")
def ref_mano_layer():
    # stub pytorch3d (only Meshes is imported at module scope)
    for mod in ("pytorch3d", "pytorch3d.structures", "pytorch3d.structures.meshes"):
        m = types.ModuleType(mod)
        sys.modules.setdefault(mod, m)
    sys.modules["pytorch3d.structures.meshes"].Meshes = object

    sys.path.insert(0, REF)
    try:
        # stub the chumpy loader: ready_arguments returns objects exposing .r
        import utils.mano.webuser.smpl_handpca_wrapper_HAND_only as wrapper

        from hifihr_tpu.assets import load_mano_model

        m = load_mano_model()

        class _R:
            def __init__(self, a):
                self.r = a

        class _Sparse:
            def __init__(self, a):
                self._a = a

            def toarray(self):
                return self._a

        def fake_ready_arguments(path, posekey4vposed="pose"):
            return {
                "betas": _R(np.zeros(10, np.float64)),
                "shapedirs": _R(m.shapedirs.astype(np.float64)),
                "posedirs": _R(m.posedirs.astype(np.float64)),
                "v_template": _R(m.v_template.astype(np.float64)),
                "J_regressor": _Sparse(m.J_regressor.astype(np.float64)),
                "weights": _R(m.lbs_weights.astype(np.float64)),
                "f": m.faces.astype(np.uint32),
                "hands_components": m.hands_components.astype(np.float64),
                "hands_mean": m.hands_mean.astype(np.float64),
                "kintree_table": np.stack(
                    [np.concatenate([[2**32 - 1], m.parents[1:]]).astype(np.int64),
                     np.arange(16, dtype=np.int64)]
                ),
            }

        wrapper.ready_arguments = fake_ready_arguments
        import importlib

        import utils.my_mano as ref_my_mano

        importlib.reload(ref_my_mano)
        layer = ref_my_mano.ManoLayer(
            center_idx=9, flat_hand_mean=False, side="right",
            mano_root=os.path.join(REF, "utils", "mano"), use_pca=True, ncomps=45,
        )
        return layer
    finally:
        sys.path.remove(REF)


def test_mano_verts_joints_match_reference(ref_mano_layer, rng):
    from hifihr_tpu.hand.mano import ManoLayer as JaxMano
    import jax.numpy as jnp

    pose = rng.randn(4, 48).astype(np.float32) * 0.5
    betas = rng.randn(4, 10).astype(np.float32) * 0.5

    with torch.no_grad():
        th_verts, th_joints = ref_mano_layer(
            torch.from_numpy(pose), torch.from_numpy(betas)
        )

    jl = JaxMano(ncomps=45)
    out = jl(jnp.asarray(pose), jnp.asarray(betas))

    np.testing.assert_allclose(
        np.asarray(out.verts), th_verts.numpy(), atol=3e-6,
        err_msg="verts diverge from reference manopth layer",
    )
    np.testing.assert_allclose(
        np.asarray(out.joints), th_joints.numpy(), atol=3e-6,
        err_msg="joints diverge from reference manopth layer",
    )
