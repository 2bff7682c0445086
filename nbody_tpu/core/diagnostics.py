"""Conserved-quantity diagnostics beyond energy: momentum, angular momentum,
center of mass — plus a fused trajectory recorder.

The reference exposes no physics diagnostics at all (SURVEY.md §4-5); these
support the validation pyramid (leapfrog conserves momentum exactly in exact
arithmetic; angular momentum up to the softening's central-force symmetry).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.energy import kinetic_energy, potential_energy
from nbody_tpu.core.stepper import make_step


def momentum(state: ParticleState) -> jax.Array:
    m = state.effective_mass()
    return jnp.sum(state.vel * m[:, None], axis=0)


def angular_momentum(state: ParticleState) -> jax.Array:
    """L = sum m (r x v) about the origin (3D states)."""
    m = state.effective_mass()
    return jnp.sum(jnp.cross(state.pos, state.vel) * m[:, None], axis=0)


def center_of_mass(state: ParticleState) -> jax.Array:
    m = state.effective_mass()
    # dtype-aware guard: a float64 literal like 1e-300 underflows to 0 in f32
    tiny = jnp.asarray(jnp.finfo(m.dtype).tiny, m.dtype)
    return jnp.sum(state.pos * m[:, None], axis=0) / jnp.maximum(jnp.sum(m), tiny)


def diagnostics(state: ParticleState, params: SimParams) -> dict:
    ke = kinetic_energy(state)
    pe = potential_energy(state, params)
    return {
        "kinetic": ke,
        "potential": pe,
        "energy": ke + pe,
        "momentum": momentum(state),
        "angular_momentum": angular_momentum(state),
        "com": center_of_mass(state),
        "n_alive": state.n_alive(),
        "time": state.time,
    }


def make_recorder(force_fn, integrator="leapfrog", every: int = 1,
                  with_energy: bool = False):
    """Build ``record(state, params, n_steps) -> (final_state, trajectory)``
    — n fused steps under one scan, stacking a snapshot every ``every``
    steps.  Trajectory entries: pos, vel, time (+ energy terms if asked).
    The device-side analog of the reference vis layer's history-by-rewind."""
    step = make_step(force_fn, integrator)

    @partial(jax.jit, static_argnames=("n_steps",))
    def record(state: ParticleState, params: SimParams, n_steps: int):
        assert n_steps % every == 0

        def inner(s, _):
            def one(ss, __):
                return step(ss, params), None

            s, _ = jax.lax.scan(one, s, None, length=every)
            snap = {"pos": s.pos, "vel": s.vel, "time": s.time,
                    "n_alive": s.n_alive()}
            if with_energy:
                snap["kinetic"] = kinetic_energy(s)
                snap["potential"] = potential_energy(s, params)
            return s, snap

        state, traj = jax.lax.scan(inner, state, None, length=n_steps // every)
        return state, traj

    return record
