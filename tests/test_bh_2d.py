"""2D (quadtree) Barnes-Hut — dimension-genericity parity with the
reference's Particle<F, D> / BarnesHutSimulation<F, D, ...> generics
(src/shared.rs:46, src/manual/barnes_hut.rs:93)."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.api import Simulation
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.ops import morton
from nbody_tpu.ops.traversal import BHConfig, bh_accel

CFG2D = dict(
    max_level=6, group_size=128, subgroups=8, window_pad=128,
    frontier_cap=2048, accept_cap=1024, near_cell_cap=1024,
    near_particle_cap=2048, start_level=1, chunk_groups=1,
)


def disc_2d(n, seed=0):
    rng = np.random.default_rng(seed)
    r = 1.0 + 3.0 * np.sqrt(rng.random(n))
    phi = rng.random(n) * 2 * np.pi
    pos = np.stack([r * np.cos(phi), r * np.sin(phi)], axis=1)
    v = np.sqrt(1.0 / r)
    vel = np.stack([v * np.sin(phi), -v * np.cos(phi)], axis=1)
    mass = np.concatenate([[1.0], np.full(n - 1, 0.2 / n)])
    pos[0] = 0.0
    vel[0] = 0.0
    return pos, vel, mass


def test_morton2_roundtrip(rng):
    ix = jnp.asarray(rng.integers(0, 1 << 15, 500), jnp.uint32)
    iy = jnp.asarray(rng.integers(0, 1 << 15, 500), jnp.uint32)
    code = morton.encode2(ix, iy)
    jx, jy = morton.decode2(code)
    np.testing.assert_array_equal(np.asarray(jx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(jy), np.asarray(iy))


def test_bh_2d_accuracy():
    pos, vel, mass = disc_2d(1500, seed=1)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(
        g_soft=0.02, theta2=0.5, bounds_center=(0.0, 0.0),
        bounds_width=10.0, dtype=jnp.float64,
    )
    m = st.effective_mass()
    cfg = BHConfig(dim=2, **CFG2D)
    acc, stats = bh_accel(
        st.pos, m, params.bounds, params.theta2, params.g, params.g_soft, cfg
    )
    assert int(stats["accept_dropped"]) == 0
    ref = force_dense(st.pos, m, params)
    alive = np.asarray(st.alive)
    a, r = np.asarray(acc)[alive], np.asarray(ref)[alive]
    assert a.shape[1] == 2
    rel = np.linalg.norm(a - r, axis=1) / np.maximum(
        np.linalg.norm(r, axis=1), 1e-12
    )
    assert np.median(rel) < 3e-3, np.median(rel)
    assert np.percentile(rel, 99) < 5e-2, np.percentile(rel, 99)


def test_bh_2d_engine_steps():
    pos, vel, mass = disc_2d(500, seed=2)
    sim = Simulation(
        pos, vel, mass, engine="bh", engine_options=CFG2D,
        bounds_center=(0.0, 0.0), bounds_width=10.0,
        dt=1e-3, g_soft=0.02, theta2=0.5, dtype=jnp.float64,
    )
    e0 = sim.energy()
    sim.run(100)
    e1 = sim.energy()
    assert sim.n_alive == 500
    assert abs((e1 - e0) / e0) < 1e-5
    p, _, _, _ = sim.get_points()
    assert p.shape[1] == 2
