"""Compensated (double-float) integration — VERDICT r2 #4.

The f32 energy drift at benchmark dt is dominated by the integrator's state
update losing the low mantissa bits of ``vel*dt`` against ``pos``
(|pos|/|vel*dt| ~ 2^12 at the benchmark scene), not by force error.
``make_step_comp`` (core/stepper.py) carries an f32 low word per pos/vel
component and accumulates through an error-free TwoSum.  These tests pin:
  * two_sum_add is error-free where plain f32 addition loses everything,
  * the compensated trajectory tracks an f64 reference far closer than the
    plain f32 one over a long horizon,
  * energy drift improves by a large factor on a drift-dominated config,
  * dead particles freeze both words; API wiring (Simulation, reset,
    checkpoint round-trip) preserves the carry.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.api import Simulation
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import (
    init_comp,
    make_run,
    make_run_comp,
    make_step_comp,
    two_sum_add,
)
from nbody_tpu.core.energy import total_energy
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc


def test_two_sum_add_exact_tiny_increments():
    """1e6 additions of 1e-8 to 1.0: plain f32 accumulates nothing (the
    increment is below 1 ulp), TwoSum recovers the full 0.01."""
    d = jnp.float32(1e-8)

    def body(carry, _):
        hi, lo = carry
        return two_sum_add(hi, lo, d), None

    (hi, lo), _ = jax.lax.scan(
        body, (jnp.float32(1.0), jnp.float32(0.0)), None, length=1_000_000
    )
    plain = 1.0  # 1.0 + 1e-8 == 1.0 in f32, a million times over
    exact = 1.0 + 1e-2
    assert abs(float(hi) + float(lo) - exact) < 1e-6
    assert abs(plain - exact) > 9e-3  # the error the carry recovered


def _disc_state(n=2048, dtype=jnp.float32):
    pos, vel, mass = self_gravitating_disc(n, seed=4)
    state = ParticleState.create(pos, vel, mass, dtype=dtype)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=dtype)
    return state, params


def _as_f64(state, params):
    cast = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
    s = ParticleState(pos=cast(state.pos), vel=cast(state.vel),
                      acc=cast(state.acc), mass=cast(state.mass),
                      alive=state.alive, time=cast(state.time))
    p = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                         bounds_width=10.0, dtype=jnp.float64)
    return s, p


def test_comp_tracks_f64_closer_than_plain_orbit():
    """Non-chaotic two-body circular orbit, 10k small-dt steps: vs an f64
    leapfrog at the SAME dt the discretization error cancels exactly, so the
    residual is pure floating-point rounding — the thing compensation
    removes.  (An N-body disc is chaotic: at any useful horizon the f32
    force noise is exponentially amplified identically in both runs, which
    is why this test uses an integrable system.)"""
    # equal masses m=0.5 at ±0.5 on x, circular: v = sqrt(G*M_tot/4r)... use
    # the standard reduced form: G=1, m1=m2=0.5, separation 1, each orbits
    # the COM at r=0.5 with v=0.5.
    pos = np.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float64)
    vel = np.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]], np.float64)
    mass = np.array([0.5, 0.5], np.float64)

    def make(dtype):
        st = ParticleState.create(pos, vel, mass, dtype=dtype)
        pr = SimParams.create(dt=1e-3, g_soft=0.0, bounds_width=10.0,
                              dtype=dtype)
        return st, pr

    force = get_engine("brute").force
    st32, pr32 = make(jnp.float32)
    st64, pr64 = make(jnp.float64)
    out_p = make_run(force)(st32, pr32, 10_000)
    out_c, _ = make_run_comp(force)(st32, init_comp(st32), pr32, 10_000)
    out_64 = make_run(force)(st64, pr64, 10_000)

    ref = np.asarray(out_64.pos)
    err_p = np.abs(np.asarray(out_p.pos) - ref).max()
    err_c = np.abs(np.asarray(out_c.pos) - ref).max()
    # measured on CPU: plain ~1e-4, comp ~1e-6 (the remaining gap is f32
    # force rounding fed through the orbit's linear phase sensitivity)
    assert err_c < 0.2 * err_p, (err_p, err_c)


def test_comp_energy_drift_improves():
    """Energy drift over 500 benchmark-dt steps: compensated f32 must cut
    the drift vs plain f32 (this is the BASELINE 1e-6 story on the flagship
    config, VALIDATION.md §8)."""
    force = get_engine("brute").force
    state, params = _disc_state()
    e0 = float(total_energy(state, params))

    out_p = make_run(force)(state, params, 500)
    out_c, _ = make_run_comp(force)(state, init_comp(state), params, 500)
    ep = abs(float(total_energy(out_p, params)) - e0) / abs(e0)
    ec = abs(float(total_energy(out_c, params)) - e0) / abs(e0)

    s64, p64 = _as_f64(state, params)
    out_64 = make_run(force)(s64, p64, 500)
    e64 = abs(float(total_energy(out_64, p64)) -
              float(total_energy(s64, p64))) / abs(float(total_energy(s64, p64)))

    # the compensated drift must close most of the gap between plain f32
    # and the f64 envelope (not merely beat plain by a hair)
    assert ec < max(0.5 * ep, 3.0 * e64 + 1e-7), (ep, ec, e64)


def test_comp_dead_particles_frozen():
    """A particle leaving the box dies; its pos/vel AND low words freeze."""
    pos = np.array([[0.0, 0.0, 0.0], [4.9, 0.0, 0.0]], np.float32)
    vel = np.array([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]], np.float32)
    mass = np.array([1.0, 1.0], np.float32)
    state = ParticleState.create(pos, vel, mass, dtype=jnp.float32)
    params = SimParams.create(dt=1e-2, bounds_width=10.0)
    step = make_step_comp(get_engine("brute").force)
    lo = init_comp(state)
    s1, lo1 = step(state, lo, params)
    assert not bool(s1.alive[1])
    s2, lo2 = step(s1, lo1, params)
    np.testing.assert_array_equal(np.asarray(s1.pos[1]), np.asarray(s2.pos[1]))
    np.testing.assert_array_equal(np.asarray(lo1[0][1]), np.asarray(lo2[0][1]))
    np.testing.assert_array_equal(np.asarray(lo1[1][1]), np.asarray(lo2[1][1]))


def test_simulation_compensated_api(tmp_path):
    """Simulation(compensated=True): runs, resets, and checkpoint round-trips
    carry the low words."""
    pos, vel, mass = self_gravitating_disc(512, seed=1)
    sim = Simulation(pos, vel, mass, engine="brute", compensated=True,
                     dt=3e-2, g_soft=0.02, bounds_width=10.0)
    sim.run(50)
    lo_mag = float(jnp.max(jnp.abs(sim._lo[0])))
    assert lo_mag > 0.0  # the carry is actually accumulating
    p = str(tmp_path / "ck.pkl")
    sim.save(p)
    sim.run(10)
    sim.load(p)
    assert float(jnp.max(jnp.abs(sim._lo[0]))) == pytest.approx(lo_mag)
    # load() makes the restored point the new reset target (same semantics
    # as _initial for the state itself), carry included
    sim.run(10)
    sim.reset()
    assert float(jnp.max(jnp.abs(sim._lo[0]))) == pytest.approx(lo_mag)


def test_simulation_compensated_rejects_stateful():
    pos, vel, mass = self_gravitating_disc(256, seed=2)
    with pytest.raises(ValueError):
        Simulation(pos, vel, mass, engine="bh-lazy", compensated=True)
