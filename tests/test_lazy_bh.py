"""Incremental (lazy-rebuild) Barnes-Hut — parity with the reference midterm
engine's incremental tree update (src/llm/barnes_hut_midterm.rs:628-672)."""

import jax.numpy as jnp
import pytest
import numpy as np

from nbody_tpu.api import Simulation
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel, bh_accel_lazy
from nbody_tpu.ops.tree import build_octree
from nbody_tpu.scenes import self_gravitating_disc

CFG = BHConfig(
    max_level=5, group_size=256, subgroups=16, window_pad=256,
    frontier_cap=4096, accept_cap=2048, near_cell_cap=1024,
    near_particle_cap=2048, start_level=1, chunk_groups=1,
)


@pytest.mark.slow
def test_refresh_equals_rebuild_when_static():
    """With unmoved particles, refresh must reproduce the full build."""
    pos, vel, mass = self_gravitating_disc(800, seed=1)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=0.5, dtype=jnp.float64)
    m = st.effective_mass()
    tree = build_octree(st.pos, m, params.bounds, CFG.max_level)
    a_ref, _ = bh_accel(st.pos, m, params.bounds, params.theta2,
                        params.g, params.g_soft, CFG)
    a_lazy, stats, tree2 = bh_accel_lazy(
        st.pos, m, params.bounds, params.theta2, params.g, params.g_soft,
        tree, CFG,
    )
    assert int(stats["rebuilt"]) == 0
    np.testing.assert_allclose(np.asarray(a_lazy), np.asarray(a_ref),
                               rtol=1e-12, atol=1e-14)


def test_rebuild_triggers_on_bulk_motion():
    """Move most particles by several cells -> rebuild fires."""
    pos, vel, mass = self_gravitating_disc(500, seed=2)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=0.5, dtype=jnp.float64)
    m = st.effective_mass()
    tree = build_octree(st.pos, m, params.bounds, CFG.max_level)
    shifted = st.pos + jnp.asarray([1.0, 0.0, 0.0])  # ~3 leaf cells at L=5
    _, stats, _ = bh_accel_lazy(
        shifted, m, params.bounds, params.theta2, params.g, params.g_soft,
        tree, CFG,
    )
    assert int(stats["rebuilt"]) == 1
    assert float(stats["moved_frac"]) > 0.9


@pytest.mark.slow
def test_lazy_engine_trajectory_close_to_fresh():
    """20 benchmark steps with the lazy engine track the always-rebuild
    engine closely (staleness between rebuilds is bounded by move_cells)."""
    pos, vel, mass = self_gravitating_disc(400, seed=3)
    common = dict(bounds_width=10.0, dtype=jnp.float64,
                  dt=3e-2, g_soft=0.02, theta2=0.5)
    opts = dict(max_level=5, group_size=256, subgroups=16, window_pad=256,
                frontier_cap=4096, accept_cap=2048, near_cell_cap=1024,
                near_particle_cap=2048, start_level=1, chunk_groups=1)
    sim_lazy = Simulation(pos, vel, mass, engine="bh-lazy",
                          engine_options=opts, **common)
    sim_ref = Simulation(pos, vel, mass, engine="bh",
                         engine_options=opts, **common)
    sim_lazy.run(20)
    sim_ref.run(20)
    p1, _, _, _ = sim_lazy.get_points()
    p2, _, _, _ = sim_ref.get_points()
    assert sim_lazy.n_alive == sim_ref.n_alive
    err = np.linalg.norm(p1 - p2, axis=1)
    assert np.median(err) < 1e-3, np.median(err)


def test_lazy_engine_reset():
    pos, vel, mass = self_gravitating_disc(300, seed=4)
    sim = Simulation(
        pos, vel, mass, engine="bh-lazy",
        engine_options=dict(max_level=5, group_size=256, subgroups=16,
                            window_pad=256, frontier_cap=4096,
                            accept_cap=2048, near_cell_cap=1024,
                            near_particle_cap=2048, start_level=1,
                            chunk_groups=1),
        dt=3e-2, g_soft=0.02, dtype=jnp.float64,
    )
    p0, _, _, _ = sim.get_points()
    sim.run(5)
    sim.reset()
    p1, _, _, _ = sim.get_points()
    np.testing.assert_allclose(p1, p0)
    assert sim.elapsed == 0.0
