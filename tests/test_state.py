"""Tests for core state: padding, alive masking, add/remove, bounds."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import Bounds, ParticleState, SimParams


def make_state(n=10, d=3, dtype=jnp.float32, seed=0):
    r = np.random.default_rng(seed)
    return ParticleState.create(
        r.normal(size=(n, d)), r.normal(size=(n, d)), r.random(n) + 0.5, dtype=dtype
    )


def test_capacity_padding():
    st = make_state(10)
    assert st.capacity == 128  # padded to lane multiple
    assert int(st.n_alive()) == 10
    assert st.pos.shape == (128, 3)
    # dead slots have zero effective mass
    assert float(jnp.sum(st.effective_mass())) > 0
    assert float(jnp.sum(st.effective_mass()[10:])) == 0.0


def test_get_points_roundtrip():
    r = np.random.default_rng(1)
    pos = r.normal(size=(7, 3))
    vel = r.normal(size=(7, 3))
    mass = r.random(7)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    p, v, a, m = st.get_points()
    np.testing.assert_allclose(p, pos)
    np.testing.assert_allclose(v, vel)
    np.testing.assert_allclose(m, mass)
    assert np.all(a == 0)


def test_add_remove_point():
    st = make_state(5)
    st2 = st.add_point([1.0, 2.0, 3.0], [0.0, 0.0, 0.0], 2.5)
    assert int(st2.n_alive()) == 6
    p, _, _, m = st2.get_points()
    assert any(np.allclose(row, [1, 2, 3]) for row in p)
    st3 = st2.remove_point(0)
    assert int(st3.n_alive()) == 5
    # removed particle's mass no longer counts
    assert float(jnp.sum(st3.effective_mass())) < float(jnp.sum(st2.effective_mass()))


def test_bounds_contains_inclusive():
    # reference contains is >= min && <= max (src/shared.rs:210-213)
    b = Bounds.cube([0.0, 0.0, 0.0], 10.0, dtype=jnp.float64)
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [5.0, 5.0, 5.0],  # exactly on the max corner -> inside
            [-5.0, -5.0, -5.0],  # exactly on the min corner -> inside
            [5.0000001, 0.0, 0.0],  # just outside
            [0.0, -5.1, 0.0],
        ]
    )
    got = b.contains(pts)
    np.testing.assert_array_equal(np.asarray(got), [True, True, True, False, False])


def test_params_defaults_match_reference():
    # defaults g=1, g_soft=0, dt=1e-3, theta2=0.5 (src/shared.rs:69-78)
    p = SimParams.create()
    assert float(p.g) == 1.0
    assert float(p.g_soft) == 0.0
    assert np.isclose(float(p.dt), 1e-3)
    assert float(p.theta2) == 0.5
    assert float(p.bounds.width) == 10.0


def test_params_replace():
    p = SimParams.create()
    q = p.replace(dt=3e-2, g_soft=0.02, theta2=1.0)
    assert np.isclose(float(q.dt), 3e-2)
    assert np.isclose(float(q.g_soft), 0.02)
    assert float(q.theta2) == 1.0
    r2 = q.replace(bounds_width=20.0)
    assert float(r2.bounds.width) == 20.0
