"""Multi-chip particle sharding on the 8-device virtual CPU mesh:
collectives-based force strategies must agree with single-device engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.api import Simulation
from nbody_tpu.parallel.sharded import ShardedSimulation
from nbody_tpu.scenes import self_gravitating_disc

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

BH_OPTS = dict(max_level=4, group_size=128, subgroups=8, window_pad=64,
               frontier_cap=2048, accept_cap=1024, near_cell_cap=512,
               near_particle_cap=512, start_level=1, chunk_groups=1)


def run_pair(engine, strategy=None, steps=10, n=500, capacity=1024,
             **engine_options):
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    # identical capacity on both sides: BH group partitioning depends on the
    # padded size, and approximation differences amplify chaotically
    common = dict(dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
                  dtype=jnp.float64, capacity=capacity)
    kw = dict(engine=engine, n_devices=8, **common)
    if strategy:
        kw["strategy"] = strategy
    if engine_options:
        kw["engine_options"] = engine_options
    sharded = ShardedSimulation(pos, vel, mass, **kw)
    single = Simulation(pos, vel, mass, engine=engine,
                        engine_options=engine_options or None, **common)
    sharded.run(steps)
    single.run(steps)
    ps, _, _, _ = sharded.get_points()
    p1, _, _, _ = single.get_points()
    return ps, p1, sharded, single


def test_allgather_matches_single():
    ps, p1, sh, si = run_pair("brute", "allgather")
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-9, atol=1e-11)


def test_ring_matches_single():
    ps, p1, sh, si = run_pair("brute", "ring")
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-9, atol=1e-11)


def test_sharded_bh_matches_single():
    ps, p1, sh, si = run_pair("bh", steps=5, **BH_OPTS)
    assert sh.n_alive == si.n_alive
    # same tree, same traversal parameters -> identical up to collective
    # reduction order
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_sharded_settings_and_reset():
    pos, vel, mass = self_gravitating_disc(300, seed=1)
    sim = ShardedSimulation(pos, vel, mass, engine="brute", n_devices=8,
                            dt=3e-2, g_soft=0.02, dtype=jnp.float64)
    sim.run(3)
    assert sim.elapsed > 0
    sim.set_settings(dt=1e-3)
    sim.step()
    sim.reset()
    assert sim.elapsed == 0.0
    assert sim.n_alive == 301
