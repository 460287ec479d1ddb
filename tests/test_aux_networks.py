"""Hourglass heatmap net + CPM openpose detector: shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.networks.hourglass import NetHMHG, heatmaps_to_uv
from hifihr_tpu.networks.openpose_hand import HandposeCPM


@pytest.mark.slow
def test_hourglass_shapes():
    model = NetHMHG(num_stacks=2, features=64)  # slim for CPU test
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(vars_, x, train=False)
    assert len(outs) == 2
    assert outs[0].shape == (1, 16, 16, 21)  # stride 4


def test_heatmaps_to_uv_peak():
    hm = jnp.full((1, 16, 16, 21), -10.0)
    hm = hm.at[0, 5, 9, :].set(10.0)  # peak at row 5, col 9
    uv = np.asarray(heatmaps_to_uv(hm))
    np.testing.assert_allclose(uv[0, :, 0], 9.5, atol=0.1)  # u = col + 0.5
    np.testing.assert_allclose(uv[0, :, 1], 5.5, atol=0.1)


@pytest.mark.slow
def test_cpm_handpose_shapes():
    model = HandposeCPM()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    hm = model.apply(vars_, x)
    assert hm.shape == (1, 8, 8, 22)  # stride 8, 21 kp + background
