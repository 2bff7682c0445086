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


# ---------------------------------------------------------------------------
# Compensated (double-float) stepping — VERDICT r2 #4.
#
# The f32 energy drift at benchmark dt (1.2e-4 / 200 steps @1M) is NOT force
# error: it is the integrator's state update losing the low bits of
# ``vel*dt`` against ``pos`` every step (|pos| / |vel*dt| ~ 2^12 at the
# benchmark scene, so each drift discards ~half the increment's mantissa).
# The TPU-native fix is to carry a second f32 "low word" per component and
# accumulate with an error-free TwoSum — ~12 VPU adds per component per
# step, invisible next to the force kernel (the same machinery the tree
# build uses for its double-float prefix scans, ops/tree.py).  The force
# still sees only the high word: its own error floor (BH ~1e-3) is far
# above the 2^-24 the low word carries.
# ---------------------------------------------------------------------------


def two_sum_add(hi, lo, d):
    """Add ``d`` to the double-float value (hi, lo); branch-free TwoSum +
    renormalize.  Exact: hi' + lo' == fl(hi + lo + d) to ~2^-48 relative."""
    s = hi + d
    bb = s - hi
    err = (hi - (s - bb)) + (d - bb)
    lo = lo + err
    hi2 = s + lo
    return hi2, lo - (hi2 - s)


def init_comp(state: ParticleState):
    """Zero low words for (pos, vel) — the compensated step's side carry."""
    return (jnp.zeros_like(state.pos), jnp.zeros_like(state.vel))


def make_step_comp(force_fn: Callable, integrator="leapfrog") -> Callable:
    """Compensated variant of make_step: ``step(state, lo, params, dt=None)
    -> (state, lo)`` where ``lo = (pos_lo, vel_lo)`` (init_comp).

    Same step_by sequence (drift/cull/force/kick/drift) with every pos/vel
    accumulation routed through two_sum_add.  Dead particles freeze both
    words.  The drift increment includes the velocity low word
    ((vel + vel_lo) * dt) so kick compensation propagates into positions.
    """
    integ: Integrator = get_integrator(integrator)
    pre_f, post_f = integ.pre_drift_frac, integ.post_drift_frac

    def step(state: ParticleState, lo, params: SimParams, dt=None):
        if dt is None:
            dt = params.dt
        dt = jnp.asarray(dt, dtype=state.dtype)
        pos_lo, vel_lo = lo
        alive_col = state.alive[:, None]

        # 1. pre drift (compensated)
        pos, vel = state.pos, state.vel
        if pre_f:
            d = (vel + vel_lo) * (dt * pre_f)
            p2, pl2 = two_sum_add(pos, pos_lo, d)
            pos = jnp.where(alive_col, p2, pos)
            pos_lo = jnp.where(alive_col, pl2, pos_lo)

        # 2. open boundary cull (on the high word — the low word is ~2^-24
        #    relative, far below the box-face quantum)
        alive = state.alive & params.bounds.contains(pos)
        alive_col = alive[:, None]
        mass_eff = jnp.where(alive, state.mass, jnp.zeros_like(state.mass))

        # 3. forces (high word only)
        acc = force_fn(pos, mass_eff, params)
        acc = jnp.where(alive_col, acc, jnp.zeros_like(acc))

        # 4. kick + post drift (compensated)
        v2, vl2 = two_sum_add(vel, vel_lo, acc * dt)
        vel = jnp.where(alive_col, v2, vel)
        vel_lo = jnp.where(alive_col, vl2, vel_lo)
        if post_f:
            d = (vel + vel_lo) * (dt * post_f)
            p2, pl2 = two_sum_add(pos, pos_lo, d)
            pos = jnp.where(alive_col, p2, pos)
            pos_lo = jnp.where(alive_col, pl2, pos_lo)

        new_state = ParticleState(
            pos=pos, vel=vel, acc=acc, mass=state.mass, alive=alive,
            time=state.time + dt,
        )
        return new_state, (pos_lo, vel_lo)

    return step


def make_run_comp(force_fn: Callable, integrator="leapfrog") -> Callable:
    """``run(state, lo, params, n_steps, dt=None) -> (state, lo)`` — the
    compensated analog of make_run (one lax.scan, no host round-trips)."""
    step = make_step_comp(force_fn, integrator)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(state, lo, params: SimParams, n_steps: int, dt=None):
        def body(carry, _):
            s, l = carry
            return step(s, l, params, dt), None

        (state, lo), _ = jax.lax.scan(
            body, (state, lo), None, length=n_steps
        )
        return state, lo

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
