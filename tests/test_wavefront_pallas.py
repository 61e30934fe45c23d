"""VMEM-resident Pallas wavefront kernel vs the XLA reference path
(interpret mode on CPU; real-device numbers in docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.ops.wavefront_pallas import wavefront_costs_pallas
from rust_robotics_tpu.planning.wavefront import goal_raster, wavefront_costs


def _random_maps(b=3, w=32, h=32, p_free=0.75, seed=0):
    key = jax.random.PRNGKey(seed)
    free = jax.random.uniform(key, (b, w, h)) < p_free
    free = free.at[:, 0, 0].set(True).at[:, -1, -1].set(True)
    goals = jnp.broadcast_to(
        goal_raster((w, h), jnp.array([w - 1, h - 1])), (b, w, h))
    return free, goals


@pytest.mark.parametrize("connectivity", [4, 8])
def test_pallas_wavefront_matches_xla(connectivity):
    free, goals = _random_maps()
    ref = wavefront_costs(free, goals, connectivity=connectivity)
    got = wavefront_costs_pallas(free, goals, connectivity=connectivity,
                                 k_sweeps=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_wavefront_corner_cutting_variant():
    free, goals = _random_maps(seed=3)
    ref = wavefront_costs(free, goals, corner_cutting=True)
    got = wavefront_costs_pallas(free, goals, corner_cutting=True,
                                 k_sweeps=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_wavefront_unbatched_and_unreachable():
    free, goals = _random_maps(b=1, seed=5)
    free2 = free[0].at[:, 10].set(False)  # wall splits the map
    ref = wavefront_costs(free2, goals[0])
    got = wavefront_costs_pallas(free2, goals[0], interpret=True)
    assert got.shape == (32, 32)
    np.testing.assert_array_equal(np.isinf(np.asarray(got)),
                                  np.isinf(np.asarray(ref)))
    finite = np.isfinite(np.asarray(ref))
    np.testing.assert_allclose(np.asarray(got)[finite],
                               np.asarray(ref)[finite], rtol=1e-6)
