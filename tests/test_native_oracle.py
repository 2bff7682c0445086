"""Cross-implementation parity vs the native C++ oracle — the role rebound's
tree code plays for the reference (reference/main.c): an independent,
serial, strict-FP implementation of the same physics."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.energy import total_energy
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.scenes import self_gravitating_disc

native = pytest.importorskip("nbody_tpu.utils.native")

try:
    native.build()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="no C++ toolchain")


def test_forces_match_oracle():
    pos, vel, mass = self_gravitating_disc(300, seed=4)
    want = native.oracle_forces(pos, mass, method="brute", g_soft=0.02)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.02, dtype=jnp.float64)
    got = np.asarray(force_dense(st.pos, st.effective_mass(), params))
    alive = np.asarray(st.alive)
    np.testing.assert_allclose(got[alive], want, rtol=1e-12, atol=1e-14)


def test_energy_matches_oracle():
    pos, vel, mass = self_gravitating_disc(200, seed=5)
    want = native.oracle_energy(pos, vel, mass, g_soft=0.02)
    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(g_soft=0.02, dtype=jnp.float64)
    got = float(total_energy(st, params, tile=64))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _drift_pair(n, dt, steps, seed):
    pos, vel, mass = self_gravitating_disc(n, seed=seed)
    p1, v1, m1 = native.oracle_run(pos, vel, mass, method="brute",
                                   steps=steps, dt=dt, g_soft=0.02)
    e0 = native.oracle_energy(pos, vel, mass, g_soft=0.02)
    e_oracle = native.oracle_energy(p1, v1, m1, g_soft=0.02)

    st = ParticleState.create(pos, vel, mass, dtype=jnp.float64)
    params = SimParams.create(bounds_width=10.0, dtype=jnp.float64,
                              dt=dt, g_soft=0.02)
    run = make_run(force_dense)
    out = run(st, params, steps)
    e_ours = float(total_energy(out, params))
    assert int(out.n_alive()) == len(m1), "culling parity"
    com_o = (p1 * m1[:, None]).sum(0) / m1.sum()
    pp, _, _, mm = out.get_points()
    com_j = (pp * mm[:, None]).sum(0) / mm.sum()
    return (abs((e_ours - e0) / e0), abs((e_oracle - e0) / e0), com_j, com_o)


def test_energy_drift_parity_resolved_1000_steps():
    """The rebound-parity target (BASELINE.md): energy drift matching the
    independent oracle to 1e-6 over 1000 steps, in the resolved-dt regime
    where the drift is a property of the scheme rather than of chaos."""
    ours, oracle, com_j, com_o = _drift_pair(300, 1e-3, 1000, seed=6)
    assert abs(ours - oracle) < 1e-6, (ours, oracle)
    np.testing.assert_allclose(com_j, com_o, atol=1e-9)


def test_energy_drift_parity_benchmark_config():
    """At the benchmark dt=3e-2 the disc is chaotic (close encounters at
    eps=0.02), so exact trajectory parity is impossible; the *drift level*
    must still agree: same scheme, same physics."""
    ours, oracle, com_j, com_o = _drift_pair(300, 3e-2, 1000, seed=6)
    assert abs(ours - oracle) / max(oracle, 1e-12) < 0.05, (ours, oracle)
    # COM wanders slightly: culls happen at chaos-divergent times
    np.testing.assert_allclose(com_j, com_o, atol=1e-3)
