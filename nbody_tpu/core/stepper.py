"""The simulation step: integrator + open-boundary cull + force engine, fused
into one pure function for XLA.

Reproduces the reference ``step_by`` sequence, identical across all four
reference engines and load-bearing for parity (SURVEY.md §2.2; reference
src/manual/brute_force.rs:84-90):

    1. integrator pre-force (leapfrog half drift)
    2. cull particles outside the domain box   (``points.retain(contains)``)
    3. update forces (engine-specific)
    4. integrator after-force (kick + half drift); elapsed += dt

Culling is mask-clearing, not deletion (see core/state.py).  Dead particles
are frozen: their position/velocity stop updating, their effective mass is
zero, so they neither move nor gravitate — observationally identical to the
reference's deletion while keeping all shapes static under ``jit``.

A force engine is a function ``force(pos, mass_eff, params) -> acc`` where
``mass_eff`` is already zeroed for dead particles.  Engines live in
``nbody_tpu.engines``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.integrators import Integrator, get_integrator


def make_step(force_fn: Callable, integrator="leapfrog") -> Callable:
    """Build ``step(state, params, dt=None) -> state``.

    ``dt`` defaults to ``params.dt`` (reference ``Simulation::step``,
    src/shared.rs:86-88); pass an explicit (possibly negative) value for
    ``step_by`` / rewind semantics (reference src/vis.rs:236-252).
    """
    integ: Integrator = get_integrator(integrator)

    def step(state: ParticleState, params: SimParams, dt=None) -> ParticleState:
        if dt is None:
            dt = params.dt
        dt = jnp.asarray(dt, dtype=state.dtype)
        alive_col = state.alive[:, None]

        # 1. half drift (only alive particles move)
        pos = jnp.where(alive_col, integ.pre_force(state.pos, state.vel, dt), state.pos)

        # 2. open boundary: particles outside the box die
        alive = state.alive & params.bounds.contains(pos)
        alive_col = alive[:, None]
        mass_eff = jnp.where(alive, state.mass, jnp.zeros_like(state.mass))

        # 3. forces
        acc = force_fn(pos, mass_eff, params)
        acc = jnp.where(alive_col, acc, jnp.zeros_like(acc))

        # 4. kick + half drift
        new_pos, new_vel = integ.after_force(pos, state.vel, acc, dt)
        pos = jnp.where(alive_col, new_pos, pos)
        vel = jnp.where(alive_col, new_vel, state.vel)

        return ParticleState(
            pos=pos,
            vel=vel,
            acc=acc,
            mass=state.mass,
            alive=alive,
            time=state.time + dt,
        )

    return step


def make_run(force_fn: Callable, integrator="leapfrog") -> Callable:
    """Build ``run(state, params, n_steps, dt=None) -> state`` — ``n_steps``
    fused steps under one ``lax.scan`` so the whole benchmark loop (reference
    src/main.rs:119-122 runs 1000 steps) is a single XLA program with no
    host round-trips."""
    step = make_step(force_fn, integrator)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(state: ParticleState, params: SimParams, n_steps: int, dt=None):
        def body(s, _):
            return step(s, params, dt), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


def make_step_stateful(engine, integrator="leapfrog") -> Callable:
    """Like make_step, for engines that carry a cache between steps (e.g.
    the incremental octree): ``step(state, carry, params, dt=None) ->
    (state, carry)``."""
    integ: Integrator = get_integrator(integrator)

    def step(state: ParticleState, carry, params: SimParams, dt=None):
        if dt is None:
            dt = params.dt
        dt = jnp.asarray(dt, dtype=state.dtype)
        alive_col = state.alive[:, None]

        pos = jnp.where(alive_col, integ.pre_force(state.pos, state.vel, dt), state.pos)
        alive = state.alive & params.bounds.contains(pos)
        alive_col = alive[:, None]
        mass_eff = jnp.where(alive, state.mass, jnp.zeros_like(state.mass))

        acc, carry = engine.force_carry(pos, mass_eff, params, carry)
        acc = jnp.where(alive_col, acc, jnp.zeros_like(acc))

        new_pos, new_vel = integ.after_force(pos, state.vel, acc, dt)
        pos = jnp.where(alive_col, new_pos, pos)
        vel = jnp.where(alive_col, new_vel, state.vel)

        return (
            ParticleState(
                pos=pos, vel=vel, acc=acc, mass=state.mass, alive=alive,
                time=state.time + dt,
            ),
            carry,
        )

    return step


def make_run_stateful(engine, integrator="leapfrog") -> Callable:
    step = make_step_stateful(engine, integrator)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(state, carry, params: SimParams, n_steps: int, dt=None):
        def body(sc, _):
            s, c = sc
            return step(s, c, params, dt), None

        (state, carry), _ = jax.lax.scan(
            body, (state, carry), None, length=n_steps
        )
        return state, carry

    return run
