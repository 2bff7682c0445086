"""Energy diagnostics + conservation (new capability; the reference computes
no energy anywhere — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.core.energy import kinetic_energy, potential_energy, total_energy
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.scenes import self_gravitating_disc


def numpy_pe(pos, mass, g=1.0, g_soft=0.0):
    n = len(pos)
    pe = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            r2 = np.sum((pos[i] - pos[j]) ** 2) + g_soft * g_soft
            pe -= g * mass[i] * mass[j] / np.sqrt(r2)
    return pe


def test_pe_matches_naive(rng):
    n = 37  # deliberately not a tile multiple
    pos = rng.normal(size=(n, 3))
    mass = rng.random(n) + 0.1
    st = ParticleState.create(pos, rng.normal(size=(n, 3)), mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.05, dtype=jnp.float64)
    got = float(potential_energy(st, params, tile=16))
    want = numpy_pe(pos, mass, g_soft=0.05)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ke(rng):
    n = 10
    vel = rng.normal(size=(n, 3))
    mass = rng.random(n)
    st = ParticleState.create(np.zeros((n, 3)), vel, mass, dtype=jnp.float64)
    got = float(kinetic_energy(st))
    want = 0.5 * np.sum(mass * np.sum(vel ** 2, axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_energy_conservation_disc():
    """Leapfrog on the benchmark disc scene conserves energy to high accuracy
    at small dt (f64).  This is the oracle for the rebound-parity target."""
    pos, vel, mass = self_gravitating_disc(200, seed=3)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(
        dt=1e-3, g_soft=0.02, bounds_width=10.0, dtype=jnp.float64
    )
    run = make_run(force_dense)
    e0 = float(total_energy(st, params))
    out = run(st, params, 200)
    e1 = float(total_energy(out, params))
    assert int(out.n_alive()) == 201  # nothing escapes this quickly
    drift = abs((e1 - e0) / e0)
    assert drift < 1e-8, f"energy drift {drift:.3e}"


def test_energy_drift_benchmark_config():
    """The benchmark config (dt=3e-2, eps=0.02, theta irrelevant for brute):
    drift should stay small-but-finite; record the scale leapfrog delivers."""
    pos, vel, mass = self_gravitating_disc(200, seed=3)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(
        dt=3e-2, g_soft=0.02, bounds_width=10.0, dtype=jnp.float64
    )
    run = make_run(force_dense)
    e0 = float(total_energy(st, params))
    out = run(st, params, 1000)
    e1 = float(total_energy(out, params))
    drift = abs((e1 - e0) / e0)
    # leapfrog at dt=3e-2 with close encounters: bounded, no secular blowup
    assert drift < 0.05, f"energy drift {drift:.3e}"


def test_bh_potential_matches_exact():
    """Tree PE estimator (VERDICT r2 #8) vs the exact pair PE at 8k/θ²=1:
    window/near pairs are exact and node monopole errors largely cancel in
    the aggregate — the estimator must sit ~1e-4 relative, far below the
    drift levels the diagnostic watches."""
    from nbody_tpu.core.energy import potential_energy_bh
    from nbody_tpu.ops.traversal import BHConfig

    pos, vel, mass = self_gravitating_disc(8191, seed=0)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=10.0,
                              dtype=jnp.float64)
    exact = float(potential_energy(st, params))
    cfg = BHConfig.auto_for(st.capacity, multipole="mono", fb_cap=2048)
    got = float(potential_energy_bh(st, params, cfg=cfg))
    rel = abs(got - exact) / abs(exact)
    assert rel < 1e-3, (exact, got, rel)
    # method='bh' rides through total_energy
    tb = float(total_energy(st, params, method="bh"))
    te = float(total_energy(st, params, method="exact"))
    # |total| ~ |PE|/2 (virial), so the PE estimator's relative error
    # roughly doubles on the total (measured 1.1e-3 here)
    assert abs(tb - te) / abs(te) < 3e-3


def test_bh_potential_translated_scene_and_dead():
    """Grid-frame recentring + dead particles: the estimator must ignore
    dead mass and survive a far-from-origin scene."""
    from nbody_tpu.core.energy import potential_energy_bh

    pos, vel, mass = self_gravitating_disc(2047, seed=1)
    shift = np.array([2048.0, -4096.0, 1024.0])
    st = ParticleState.create(pos + shift, vel, mass, dtype=jnp.float64)
    # kill a band of particles
    alive = np.ones(st.capacity, bool)
    alive[:200] = False
    alive[2048:] = False
    st = ParticleState(pos=st.pos, vel=st.vel, acc=st.acc, mass=st.mass,
                       alive=jnp.asarray(alive), time=st.time)
    params = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=10.0,
                              bounds_center=tuple(shift), dtype=jnp.float64)
    exact = float(potential_energy(st, params))
    got = float(potential_energy_bh(st, params))
    assert abs(got - exact) / abs(exact) < 2e-3, (exact, got)
