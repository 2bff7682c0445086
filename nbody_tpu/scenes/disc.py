"""The benchmark scene: rebound's "Self-gravitating disc" example.

Parity with the reference scene builder (src/main.rs:52-89) and the rebound
baseline driver (reference/main.c:41-61): a central star of mass 1 at the
origin plus N disc particles with

  * semi-major axis ``a`` drawn from a power law via inverse-transform
    sampling over [box/10, box/2/1.2]:
        a = ((amax^-1/2 - amin^-1/2) * u + amin^-1/2)^-2
    (src/main.rs:68-70; equivalently rebound's reb_random_powerlaw(slope -3/2))
  * uniform azimuth phi; z = a * u * 1e-3 - 5e-4          (src/main.rs:71-74)
  * circular Keplerian speed from the enclosed-mass proxy
        mu = 1 + disc_mass * (a^-3/2 - amin^-3/2) / (amax^-3/2 - amin^-3/2)
        v  = sqrt(mu / a), tangential (+v sin phi, -v cos phi, 0)
    (src/main.rs:75-81)
  * per-particle mass disc_mass / N with disc_mass = 0.2   (src/main.rs:61,82)

Generation happens in float64 on host (the reference samples f64), then is
cast to the simulation dtype.
"""

from __future__ import annotations

import numpy as np


def self_gravitating_disc(
    n: int,
    *,
    box_width: float = 10.0,
    disc_mass: float = 0.2,
    star_mass: float = 1.0,
    seed: int = 0,
):
    """Return (pos [n+1, 3], vel [n+1, 3], mass [n+1]) float64 arrays —
    particle 0 is the central star."""
    rng = np.random.default_rng(seed)
    amax = box_width / 2.0 / 1.2
    amin = box_width / 10.0

    u_a = rng.random(n)
    a = ((amax ** -0.5 - amin ** -0.5) * u_a + amin ** -0.5) ** -2.0
    phi = rng.random(n) * 2.0 * np.pi
    x = a * np.cos(phi)
    y = a * np.sin(phi)
    z = a * rng.random(n) * 0.001 - 0.0005
    mu = 1.0 + disc_mass * (a ** -1.5 - amin ** -1.5) / (amax ** -1.5 - amin ** -1.5)
    vkep = np.sqrt(mu / a)
    vx = vkep * np.sin(phi)
    vy = -vkep * np.cos(phi)
    vz = np.zeros(n)

    pos = np.concatenate([np.zeros((1, 3)), np.stack([x, y, z], axis=-1)])
    vel = np.concatenate([np.zeros((1, 3)), np.stack([vx, vy, vz], axis=-1)])
    mass = np.concatenate([[star_mass], np.full(n, disc_mass / n)])
    return pos, vel, mass
