"""Simulation API parity tests: the reference Simulation trait surface
(src/shared.rs:80-97) plus determinism and checkpointing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.api import Simulation
from nbody_tpu.scenes import self_gravitating_disc


def make(n=200, **kw):
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    kw.setdefault("engine", "brute")
    kw.setdefault("dt", 3e-2)
    kw.setdefault("g_soft", 0.02)
    kw.setdefault("dtype", jnp.float64)
    return Simulation(pos, vel, mass, **kw)


def test_step_and_elapsed():
    sim = make()
    assert sim.elapsed == 0.0
    sim.step()
    assert np.isclose(sim.elapsed, 3e-2)
    sim.step_by(1e-3)
    assert np.isclose(sim.elapsed, 3.1e-2)
    sim.step_by(-1e-3)  # rewind
    assert np.isclose(sim.elapsed, 3e-2)


def test_determinism():
    """Pure functional core: identical inputs give bitwise identical
    trajectories (the TPU answer to the reference relying on Rust/rayon for
    race freedom, SURVEY.md §5)."""
    a = make(300)
    b = make(300)
    a.run(50)
    b.run(50)
    pa, va, _, _ = a.get_points()
    pb, vb, _, _ = b.get_points()
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(va, vb)


def test_add_remove_points_mid_run():
    sim = make(100)
    sim.run(5)
    n0 = sim.n_alive
    sim.add_point([2.0, 0.0, 0.0], [0.0, 0.5, 0.0], 1e-3)
    assert sim.n_alive == n0 + 1
    sim.run(5)
    assert sim.n_alive <= n0 + 1  # may cull escapers
    sim.remove_point(0)
    assert sim.n_alive <= n0


def test_update_forces():
    sim = make(100)
    sim.update_forces()
    _, _, acc, _ = sim.get_points()
    assert np.all(np.isfinite(acc))
    assert np.abs(acc).max() > 0


def test_checkpoint_roundtrip_orbax(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    sim = make(100)
    sim.run(5)
    path = os.path.join(tmp_path, "ck_orbax")
    sim.save(path, format="orbax")
    p0, v0, _, _ = sim.get_points()
    sim2 = make(100)
    sim2.load(path, format="orbax")
    p1, v1, _, _ = sim2.get_points()
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(v0, v1)


def test_checkpoint_roundtrip(tmp_path):
    sim = make(150)
    sim.run(10)
    path = os.path.join(tmp_path, "ckpt.pkl")
    sim.save(path)
    p0, v0, _, _ = sim.get_points()
    e0 = sim.elapsed

    sim2 = make(150)
    sim2.load(path)
    p1, v1, _, _ = sim2.get_points()
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(v0, v1)
    assert sim2.elapsed == e0
    # and it keeps stepping identically
    sim.run(5)
    sim2.run(5)
    pa, _, _, _ = sim.get_points()
    pb, _, _, _ = sim2.get_points()
    np.testing.assert_array_equal(pa, pb)


def test_settings_live_update_no_recompile():
    sim = make(100)
    sim.run(2)
    n_compiles_before = sim._run._cache_size() if hasattr(sim._run, "_cache_size") else None
    sim.set_settings(theta2=0.7, g=1.5, dt=1e-2)
    sim.run(2)
    assert np.isclose(float(sim.settings.g), 1.5)
    if n_compiles_before is not None:
        assert sim._run._cache_size() == n_compiles_before


def test_2d_brute_force():
    """The reference is dimension-generic (Particle<F, D>); the direct-sum
    engines here are too — a 2D state integrates fine."""
    rng = np.random.default_rng(0)
    n = 50
    pos = rng.normal(size=(n, 2))
    vel = rng.normal(size=(n, 2)) * 0.1
    mass = np.full(n, 1e-3)
    sim = Simulation(pos, vel, mass, engine="brute",
                     bounds_center=(0.0, 0.0), bounds_width=20.0,
                     dt=1e-3, g_soft=0.05, dtype=jnp.float64)
    e0 = sim.energy()
    sim.run(100)
    e1 = sim.energy()
    assert abs((e1 - e0) / e0) < 1e-6
    p, _, _, _ = sim.get_points()
    assert p.shape[1] == 2
