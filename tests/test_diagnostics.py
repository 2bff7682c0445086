"""Conservation diagnostics + fused trajectory recorder."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.diagnostics import (
    angular_momentum,
    diagnostics,
    make_recorder,
    momentum,
)
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.scenes import self_gravitating_disc


def setup(n=300):
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(dt=1e-3, g_soft=0.02, bounds_width=10.0,
                              dtype=jnp.float64)
    return st, params


def test_momentum_conserved():
    st, params = setup()
    run = make_run(force_dense)
    p0 = np.asarray(momentum(st))
    out = run(st, params, 200)
    p1 = np.asarray(momentum(out))
    assert int(out.n_alive()) == 301  # no culls -> exact conservation regime
    np.testing.assert_allclose(p1, p0, atol=1e-13)


def test_angular_momentum_conserved():
    st, params = setup()
    run = make_run(force_dense)
    l0 = np.asarray(angular_momentum(st))
    out = run(st, params, 200)
    l1 = np.asarray(angular_momentum(out))
    np.testing.assert_allclose(l1, l0, atol=1e-10)


def test_diagnostics_dict():
    st, params = setup(100)
    d = diagnostics(st, params)
    assert set(d) >= {"kinetic", "potential", "energy", "momentum",
                      "angular_momentum", "com", "n_alive", "time"}
    assert float(d["kinetic"]) > 0
    assert float(d["potential"]) < 0


def test_recorder():
    st, params = setup(100)
    rec = make_recorder(force_dense, every=10, with_energy=True)
    final, traj = rec(st, params, 50)
    assert traj["pos"].shape == (5, st.capacity, 3)
    assert traj["time"].shape == (5,)
    np.testing.assert_allclose(np.asarray(traj["time"]),
                               (np.arange(1, 6)) * 10 * 1e-3)
    np.testing.assert_array_equal(np.asarray(traj["pos"][-1]),
                                  np.asarray(final.pos))
    e = np.asarray(traj["kinetic"]) + np.asarray(traj["potential"])
    assert np.abs((e - e[0]) / e[0]).max() < 1e-8
