"""BH correctness across scene geometries (the disc is quasi-2D and
boundary-aligned; the cube and Plummer sphere stress different tree shapes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_tiled
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import plummer_sphere, uniform_cube

# budgets sized so nothing overflows at the shipped defaults (the round-2
# accept_margin=0.8 default opens ~20% more nodes than the literal
# reference rule, so the frontier/accept budgets carry that headroom)
CFG = BHConfig(
    max_level=5, group_size=256, subgroups=16, window_pad=256,
    frontier_cap=8192, accept_cap=4096, near_cell_cap=1024,
    near_particle_cap=4096, start_level=1, chunk_groups=1,
)


@pytest.mark.parametrize("scene,kw,width", [
    (uniform_cube, dict(width=8.0), 10.0),
    (plummer_sphere, dict(scale=1.0), 30.0),
])
def test_bh_accuracy_scene(scene, kw, width):
    pos, vel, mass = scene(2000, seed=7, **kw)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(
        g_soft=0.05, theta2=0.5, bounds_width=width, dtype=jnp.float64
    )
    m = st.effective_mass()
    acc, stats = bh_accel(
        st.pos, m, params.bounds, params.theta2, params.g, params.g_soft, CFG
    )
    assert int(stats["accept_dropped"]) == 0
    assert int(stats["frontier_fallback"]) == 0
    assert int(stats["near_fallback"]) == 0
    ref = force_tiled(st.pos, m, params)
    alive = np.asarray(st.alive)
    a, r = np.asarray(acc)[alive], np.asarray(ref)[alive]
    rel = np.linalg.norm(a - r, axis=1) / np.maximum(
        np.linalg.norm(r, axis=1), 1e-12
    )
    assert np.median(rel) < 3e-3, np.median(rel)
    assert np.percentile(rel, 99) < 5e-2, np.percentile(rel, 99)


def test_bh_fallback_is_graceful_not_catastrophic():
    """Starved budgets must degrade accuracy modestly (monopole fallback),
    never produce wild forces."""
    pos, vel, mass = uniform_cube(2000, width=8.0, seed=8)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(
        g_soft=0.05, theta2=0.5, bounds_width=10.0, dtype=jnp.float64
    )
    m = st.effective_mass()
    tiny = BHConfig(
        max_level=5, group_size=256, subgroups=16, window_pad=64,
        frontier_cap=512, accept_cap=2048, near_cell_cap=64,
        near_particle_cap=256, start_level=1, chunk_groups=1,
    )
    acc, stats = bh_accel(
        st.pos, m, params.bounds, params.theta2, params.g, params.g_soft, tiny
    )
    assert int(stats["near_fallback"]) > 0  # budgets really are starved
    ref = force_tiled(st.pos, m, params)
    alive = np.asarray(st.alive)
    a, r = np.asarray(acc)[alive], np.asarray(ref)[alive]
    rel = np.linalg.norm(a - r, axis=1) / np.maximum(
        np.linalg.norm(r, axis=1), 1e-12
    )
    # degraded but sane: no force is wildly wrong
    assert np.median(rel) < 2e-2, np.median(rel)
    assert rel.max() < 1.0, rel.max()
