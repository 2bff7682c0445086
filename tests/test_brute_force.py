"""Brute-force engine correctness vs a float64 numpy oracle implementing the
reference pair loop (src/manual/brute_force.rs:64-82)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import SimParams
from nbody_tpu.engines.brute_force import force_dense, force_tiled


def numpy_oracle(pos, mass, g=1.0, g_soft=0.0):
    """Direct transcription of the reference force law in float64:
    a_i += (p_j - p_i) * G * m_j / (|r|^2 + eps^2)^{3/2}, j != i."""
    n = pos.shape[0]
    acc = np.zeros_like(pos)
    for i in range(n):
        r = pos[i] - pos  # p_i - p_j, shape [n, 3]
        r2 = np.sum(r * r, axis=1) + g_soft * g_soft
        w = g / np.maximum(r2, 1e-300) ** 1.5
        w[i] = 0.0
        acc[i] = -(r * (w * mass)[:, None]).sum(axis=0)
    return acc


@pytest.mark.parametrize("force", [force_dense, force_tiled])
@pytest.mark.parametrize("g_soft", [0.0, 0.02])
def test_matches_oracle(force, g_soft, rng):
    n = 128
    pos = rng.normal(size=(n, 3))
    mass = rng.random(n) + 0.1
    params = SimParams.create(g=1.0, g_soft=g_soft, dtype=jnp.float64)
    got = np.asarray(force(jnp.asarray(pos), jnp.asarray(mass), params))
    want = numpy_oracle(pos, mass, g=1.0, g_soft=g_soft)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_dense_vs_tiled_agree(rng):
    n = 384
    pos = jnp.asarray(rng.normal(size=(n, 3)))
    mass = jnp.asarray(rng.random(n) + 0.1)
    params = SimParams.create(g_soft=0.01, dtype=jnp.float64)
    a = force_dense(pos, mass, params)
    b = force_tiled(pos, mass, params)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14)


def test_momentum_conservation(rng):
    """Newton's third law: total force sums to ~zero (the reference enforces
    this structurally via the symmetric pair loop)."""
    n = 256
    pos = jnp.asarray(rng.normal(size=(n, 3)))
    mass = jnp.asarray(rng.random(n) + 0.1)
    params = SimParams.create(g_soft=0.05, dtype=jnp.float64)
    acc = force_dense(pos, mass, params)
    ptot = np.asarray(jnp.sum(acc * mass[:, None], axis=0))
    np.testing.assert_allclose(ptot, 0.0, atol=1e-10)


def test_dead_particles_exert_no_force(rng):
    n = 64
    pos = rng.normal(size=(n, 3))
    mass = rng.random(n) + 0.1
    params = SimParams.create(g_soft=0.01, dtype=jnp.float64)
    # kill half by zeroing effective mass (what the stepper feeds the engine)
    mass_eff = mass.copy()
    mass_eff[32:] = 0.0
    got = np.asarray(
        force_dense(jnp.asarray(pos), jnp.asarray(mass_eff), params)
    )[:32]
    want = numpy_oracle(pos[:32], mass[:32], g_soft=0.01)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_f32_accuracy(rng):
    """f32 engine should match the f64 oracle to typical single-precision
    accuracy on a well-conditioned configuration."""
    n = 256
    pos = rng.normal(size=(n, 3))
    mass = rng.random(n) + 0.1
    params = SimParams.create(g_soft=0.02, dtype=jnp.float32)
    got = np.asarray(
        force_tiled(jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32), params)
    )
    want = numpy_oracle(pos, mass, g_soft=0.02)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-4 * scale)
