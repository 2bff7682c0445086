"""Symplectic integrators as pure split-step functions.

Mirrors the reference ``Integrator`` trait (src/shared.rs:99-104): an
integrator is a pair of pure functions applied around the force evaluation,

    pre_force : (pos, vel, dt)      -> pos
    after_force : (pos, vel, acc, dt) -> (pos, vel)

``LeapFrogIntegrator`` (src/shared.rs:106-149) is drift-kick-drift:
pre-force ``x += v*dt/2``; after-force ``v += a*dt; x += v*dt/2``.  Like the
reference it is stateless and exactly time-reversible in exact arithmetic,
which is what makes negative-``dt`` rewind work (reference src/vis.rs:236-252).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class Integrator:
    name: str
    pre_force: Callable  # (pos, vel, dt) -> pos
    after_force: Callable  # (pos, vel, acc, dt) -> (pos, vel)
    # drift/kick decomposition for the compensated (double-float) stepper
    # (core/stepper.py make_step_comp): both shipped integrators are
    # "drift pre_frac*dt -> force -> kick dt -> drift post_frac*dt"
    pre_drift_frac: float = 0.5
    post_drift_frac: float = 0.5


def _leapfrog_pre(pos, vel, dt):
    # reference src/shared.rs:135-140
    return pos + vel * (dt * 0.5)


def _leapfrog_after(pos, vel, acc, dt):
    # reference src/shared.rs:141-148
    vel = vel + acc * dt
    pos = pos + vel * (dt * 0.5)
    return pos, vel


def _euler_pre(pos, vel, dt):
    return pos


def _euler_after(pos, vel, acc, dt):
    # symplectic (semi-implicit) Euler: kick then full drift
    vel = vel + acc * dt
    pos = pos + vel * dt
    return pos, vel


LEAPFROG = Integrator("leapfrog", _leapfrog_pre, _leapfrog_after,
                      pre_drift_frac=0.5, post_drift_frac=0.5)
EULER = Integrator("euler", _euler_pre, _euler_after,
                   pre_drift_frac=0.0, post_drift_frac=1.0)

INTEGRATORS = {i.name: i for i in (LEAPFROG, EULER)}


def get_integrator(name) -> Integrator:
    if isinstance(name, Integrator):
        return name
    try:
        return INTEGRATORS[name]
    except KeyError:
        raise KeyError(
            f"unknown integrator {name!r}; available: {sorted(INTEGRATORS)}"
        ) from None
