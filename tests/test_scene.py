"""Scene generator parity checks (reference src/main.rs:52-89)."""

import numpy as np

from nbody_tpu.scenes import self_gravitating_disc, plummer_sphere, uniform_cube


def test_disc_structure():
    n = 5000
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    assert pos.shape == (n + 1, 3)
    # star: m=1 at origin at rest (src/main.rs:52-57)
    assert mass[0] == 1.0
    np.testing.assert_array_equal(pos[0], 0.0)
    np.testing.assert_array_equal(vel[0], 0.0)
    # disc masses: disc_mass/N each (src/main.rs:82)
    np.testing.assert_allclose(mass[1:], 0.2 / n)
    # radii within [box/10, box/2/1.2] (src/main.rs:62-63)
    r = np.sqrt(pos[1:, 0] ** 2 + pos[1:, 1] ** 2)
    assert r.min() >= 1.0 - 1e-9
    assert r.max() <= 10.0 / 2.4 + 1e-9
    # z in [-5e-4, a*1e-3 - 5e-4] (src/main.rs:74)
    assert pos[1:, 2].min() >= -5e-4 - 1e-12
    assert pos[1:, 2].max() <= r.max() * 1e-3
    # velocity is tangential Keplerian: v . r_hat ~ 0, |v| = sqrt(mu/a)
    vr = np.abs(np.sum(vel[1:, :2] * pos[1:, :2], axis=1) / r)
    np.testing.assert_allclose(vr, 0.0, atol=1e-12)
    speed = np.linalg.norm(vel[1:, :2], axis=1)
    assert np.all(speed > np.sqrt(1.0 / r))  # mu > 1 always
    # inner edge faster than outer edge on average
    assert speed[r < 2].mean() > speed[r > 3].mean()


def test_disc_deterministic_by_seed():
    a = self_gravitating_disc(100, seed=7)
    b = self_gravitating_disc(100, seed=7)
    c = self_gravitating_disc(100, seed=8)
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])


def test_plummer_virial():
    pos, vel, mass = plummer_sphere(20000, seed=1)
    # virial ratio 2T/|W| ~ 1 for equilibrium
    ke = 0.5 * np.sum(mass * np.sum(vel ** 2, axis=1))
    # exact Plummer potential energy: W = -3*pi/32 * G M^2 / a
    w = 3 * np.pi / 32
    assert 0.8 < 2 * ke / w < 1.2


def test_uniform_cube():
    pos, vel, mass = uniform_cube(1000, width=4.0, seed=2)
    assert np.all(np.abs(pos) <= 2.0)
    np.testing.assert_allclose(mass.sum(), 1.0)
