"""Integrator semantics: leapfrog DKD order, time-reversal rewind, culling."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_step, make_run
from nbody_tpu.engines.brute_force import force_dense


def two_body_state(dtype=jnp.float64):
    """Equal-mass circular binary: m=1 each, separation 2, G=1.
    Circular speed of each body around the COM: v^2 = G m / (4 r) with r=1."""
    v = np.sqrt(1.0 / 4.0)
    pos = [[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]]
    vel = [[0.0, v, 0.0], [0.0, -v, 0.0]]
    return ParticleState.create(pos, vel, [1.0, 1.0], dtype=dtype)


def test_circular_orbit_accuracy():
    """Period T = 2*pi*r/v; after one period positions should return, with
    error scaling as dt^2 (leapfrog is 2nd order)."""
    params = SimParams.create(dt=1e-3, bounds_width=100.0, dtype=jnp.float64)
    run = make_run(force_dense)
    st = two_body_state()
    v = np.sqrt(0.25)
    period = 2 * np.pi * 1.0 / v
    n = int(round(period / 1e-3))
    out = run(st, params.replace(dt=period / n), n)
    np.testing.assert_allclose(
        np.asarray(out.pos[:2]), np.asarray(st.pos[:2]), atol=5e-5
    )


def test_leapfrog_rewind():
    """Negative-dt stepping retraces the trajectory (reference rewind,
    src/vis.rs:236-252) — exact up to float roundoff for leapfrog."""
    params = SimParams.create(dt=1e-2, bounds_width=100.0, dtype=jnp.float64)
    step = make_step(force_dense)
    st = two_body_state()
    fwd = st
    for _ in range(50):
        fwd = step(fwd, params)
    back = fwd
    for _ in range(50):
        back = step(back, params, -params.dt)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(st.pos), atol=1e-11)
    np.testing.assert_allclose(np.asarray(back.vel), np.asarray(st.vel), atol=1e-11)
    assert np.isclose(float(back.time), 0.0, atol=1e-12)


def test_out_of_bounds_culling():
    """A particle crossing the box face dies (effective mass 0, frozen), the
    analog of points.retain (src/manual/brute_force.rs:86)."""
    # one fast particle headed out of a tiny box, one safe particle at rest
    st = ParticleState.create(
        [[0.9, 0.0, 0.0], [0.0, 0.0, 0.0]],
        [[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
        [1e-12, 1e-12],
        dtype=jnp.float64,
    )
    params = SimParams.create(dt=0.1, bounds_width=2.0, dtype=jnp.float64)
    step = make_step(force_dense)
    out = step(st, params)
    alive = np.asarray(out.alive)
    assert not alive[0]  # escaped (0.9 + 10*0.05 = 1.4 > 1.0)
    assert alive[1]
    # dead particle frozen at its post-drift position
    out2 = step(out, params)
    np.testing.assert_allclose(np.asarray(out2.pos[0]), np.asarray(out.pos[0]))
    assert int(out2.n_alive()) == 1


def test_step_matches_reference_sequence():
    """One hand-computed DKD step with a constant-force setup.

    Two bodies far apart with huge softening -> nearly constant acceleration;
    verify x' = x + v dt/2 ... order matches drift-cull-force-kick-drift."""
    st = ParticleState.create(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
        [1.0, 1.0],
        dtype=jnp.float64,
    )
    dt = 0.01
    params = SimParams.create(dt=dt, g_soft=0.02, bounds_width=10.0, dtype=jnp.float64)
    step = make_step(force_dense)
    out = step(st, params)
    # manual: drift (v=0 so no move), acc = G*m*(p2-p1)/(1+eps^2)^1.5
    a = 1.0 / (1.0 + 0.02 ** 2) ** 1.5
    v1 = a * dt
    x1 = 0.0 + v1 * dt / 2
    np.testing.assert_allclose(float(out.vel[0, 0]), v1, rtol=1e-14)
    np.testing.assert_allclose(float(out.pos[0, 0]), x1, rtol=1e-14)
    np.testing.assert_allclose(float(out.pos[1, 0]), 1.0 - x1, rtol=1e-14)
