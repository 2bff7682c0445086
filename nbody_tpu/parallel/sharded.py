"""Multi-chip particle sharding: the step loop under ``shard_map`` over a 1-D
device mesh, with per-step ICI collectives.

Replaces the reference's rayon thread-pool scaling (src/main.rs:46-50) — this
is the capability the reference does not have (SURVEY.md §2.5: no distributed
backend exists there).

Two source-exchange strategies for the O(N^2) force:
  * ``allgather`` — one ``lax.all_gather`` of (positions, masses) per step;
    every chip then computes forces for its particle shard against all
    sources.  Simple, and optimal when N/chip is small.
  * ``ring`` — a systolic ``lax.ppermute`` ring: each chip streams source
    shards around the ICI ring, overlapping compute with neighbor exchange.
    Memory O(N/chips), bandwidth-optimal on the torus.

The integrator/cull phases are purely elementwise and shard cleanly; global
ids (shard offset + local index) mask the self-interaction diagonal.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.integrators import get_integrator
from nbody_tpu.engines.brute_force import _pairwise_s, _accumulate
from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh


def _local_rows_vs_sources(pos_rows, row_ids, pos_src, mass_src, src_ids, params,
                           tile=1024):
    """acc for pos_rows against (pos_src, mass_src), diagonal masked by ids."""
    n_rows = pos_rows.shape[0]
    t = tile if n_rows % tile == 0 else (128 if n_rows % 128 == 0 else n_rows)
    pos_t = pos_rows.reshape(n_rows // t, t, -1)
    ids_t = row_ids.reshape(n_rows // t, t)

    def body(args):
        pt, it = args
        s = _pairwise_s(pt, pos_src, mass_src, params.g_soft, it, src_ids)
        return _accumulate(s, pos_src, pt, params.g)

    acc = jax.lax.map(body, (pos_t, ids_t))
    return acc.reshape(n_rows, -1)


def make_sharded_step(mesh: Mesh, integrator="leapfrog", strategy="allgather",
                      tile=1024, bh_config=None):
    """Build a jitted ``step(state, params, dt=None) -> state`` where every
    array in ``state`` is sharded along the particle axis.

    Strategies:
      * ``allgather`` — O(N^2) force vs all-gathered sources
      * ``ring``      — O(N^2) force via a ppermute systolic ring
      * ``bh``        — Barnes-Hut: all-gather positions, DISTRIBUTED tree
        build (per-chip Morton encode / sorted gather / leaf segment-sum,
        merged by psum — ops/tree.py:build_octree_sharded), traverse only
        this chip's slice of particle groups, all-gather force slices.
        The N-body analog of sequence parallelism (SURVEY.md §5).
    """
    integ = get_integrator(integrator)
    axis = PARTICLE_AXIS
    n_dev = mesh.shape[axis]

    def local_step(state: ParticleState, params: SimParams, dt):
        # inside shard_map: arrays are the local shard
        my = jax.lax.axis_index(axis)
        n_loc = state.pos.shape[0]
        alive_col = state.alive[:, None]

        pos = jnp.where(alive_col, integ.pre_force(state.pos, state.vel, dt), state.pos)
        alive = state.alive & params.bounds.contains(pos)
        alive_col = alive[:, None]
        mass_eff = jnp.where(alive, state.mass, jnp.zeros_like(state.mass))

        row_ids = my * n_loc + jnp.arange(n_loc)

        if strategy == "allgather":
            pos_all = jax.lax.all_gather(pos, axis, tiled=True)
            mass_all = jax.lax.all_gather(mass_eff, axis, tiled=True)
            src_ids = jnp.arange(n_dev * n_loc)
            acc = _local_rows_vs_sources(
                pos, row_ids, pos_all, mass_all, src_ids, params, tile=tile
            )
        elif strategy == "ring":
            # systolic ring: rotate source shards around the ICI ring,
            # accumulating partial forces each hop.
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

            def hop(k, carry):
                acc, src_pos, src_mass = carry
                src_owner = (my - k) % n_dev
                src_ids = src_owner * n_loc + jnp.arange(n_loc)
                acc = acc + _local_rows_vs_sources(
                    pos, row_ids, src_pos, src_mass, src_ids, params, tile=tile
                )
                src_pos = jax.lax.ppermute(src_pos, axis, perm)
                src_mass = jax.lax.ppermute(src_mass, axis, perm)
                return acc, src_pos, src_mass

            acc0 = jnp.zeros_like(pos)
            acc, _, _ = jax.lax.fori_loop(
                0, n_dev, hop, (acc0, pos, mass_eff)
            )
        elif strategy == "bh":
            from nbody_tpu.ops.traversal import BHConfig, traverse_tree
            from nbody_tpu.ops.tree import build_octree_sharded

            cfg = bh_config or BHConfig()
            pos_all = jax.lax.all_gather(pos, axis, tiled=True)
            mass_all = jax.lax.all_gather(mass_eff, axis, tiled=True)
            n_tot = pos_all.shape[0]
            # distributed build: per-chip Morton encode + sorted gather +
            # leaf segment-sum, merged with psum/all_gather (tree.py)
            tree = build_octree_sharded(
                pos, mass_eff, pos_all, mass_all, params.bounds,
                cfg.max_level, axis,
            )
            n_chunks = n_tot // (cfg.group_size * cfg.chunk_groups)
            first = (my * (n_chunks // n_dev)).astype(jnp.int32)
            acc_slice, _stats = traverse_tree(
                tree, params.bounds, params.theta2, params.g, params.g_soft,
                cfg, n_tot, chunk_range=(first,), n_shards=n_dev,
            )
            # assemble: gather slices (sorted order), scatter to original
            # order, take my rows
            acc_sorted = jax.lax.all_gather(acc_slice, axis, tiled=True)
            acc_full = jnp.zeros_like(acc_sorted).at[tree.order].set(acc_sorted)
            acc = jax.lax.dynamic_slice(
                acc_full, (my * n_loc, jnp.int32(0)), (n_loc, 3)
            )
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        acc = jnp.where(alive_col, acc, jnp.zeros_like(acc))
        new_pos, new_vel = integ.after_force(pos, state.vel, acc, dt)
        pos = jnp.where(alive_col, new_pos, pos)
        vel = jnp.where(alive_col, new_vel, state.vel)
        return ParticleState(
            pos=pos, vel=vel, acc=acc, mass=state.mass, alive=alive,
            time=state.time + dt,
        )

    state_specs = ParticleState(
        pos=P(axis), vel=P(axis), acc=P(axis), mass=P(axis), alive=P(axis),
        time=P(),
    )
    params_specs = jax.tree.map(lambda _: P(), SimParams.create())

    shard_step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, params_specs, P()),
        out_specs=state_specs,
        check_vma=False,
    )

    @jax.jit
    def step(state, params, dt=None):
        if dt is None:
            dt = params.dt
        return shard_step(state, params, jnp.asarray(dt, dtype=state.dtype))

    return step


def make_sharded_run(mesh: Mesh, integrator="leapfrog", strategy="allgather",
                     tile=1024, bh_config=None):
    step = make_sharded_step(mesh, integrator, strategy, tile=tile,
                             bh_config=bh_config)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(state, params, n_steps: int, dt=None):
        def body(s, _):
            return step(s, params, dt), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


class ShardedSimulation:
    """Multi-chip analog of ``nbody_tpu.api.Simulation`` — same surface,
    particle arrays sharded over a device mesh."""

    def __init__(
        self,
        pos,
        vel,
        mass,
        *,
        engine: str = "brute",
        integrator: str = "leapfrog",
        n_devices: Optional[int] = None,
        strategy: str = "allgather",
        bounds_center=(0.0, 0.0, 0.0),
        bounds_width: float = 10.0,
        dtype=jnp.float32,
        capacity: Optional[int] = None,
        engine_options: Optional[dict] = None,
        **settings,
    ):
        self.mesh = make_mesh(n_devices)
        n_dev = self.mesh.shape[PARTICLE_AXIS]

        bh_config = None
        if engine == "bh-lazy":
            # the lazy engine's frozen-binning carry is per-step state the
            # sharded scan does not thread; running plain 'bh' silently here
            # would misrepresent what was benchmarked
            raise NotImplementedError(
                "sharded bh-lazy is not supported; use engine='bh' "
                "(full rebuild each step) on the mesh"
            )
        if engine in ("bh", "bh-deep"):
            from nbody_tpu.ops.traversal import BHConfig

            bh_config = BHConfig(**(engine_options or {}))
            strategy = "bh"
            pad_multiple = bh_config.group_size * bh_config.chunk_groups * n_dev
        elif engine in ("brute", "brute-pallas"):
            pad_multiple = 128 * n_dev
        else:
            raise NotImplementedError(f"sharded engine {engine!r}")

        state = ParticleState.create(
            pos, vel, mass, capacity=capacity, pad_multiple=pad_multiple,
            dtype=dtype,
        )
        sharding = NamedSharding(self.mesh, P(PARTICLE_AXIS))
        rep = NamedSharding(self.mesh, P())
        self._state = ParticleState(
            pos=jax.device_put(state.pos, sharding),
            vel=jax.device_put(state.vel, sharding),
            acc=jax.device_put(state.acc, sharding),
            mass=jax.device_put(state.mass, sharding),
            alive=jax.device_put(state.alive, sharding),
            time=jax.device_put(state.time, rep),
        )
        self._params = jax.device_put(
            SimParams.create(
                bounds_center=bounds_center, bounds_width=bounds_width,
                dtype=dtype, **settings,
            ),
            rep,
        )
        self._step = make_sharded_step(self.mesh, integrator, strategy,
                                       bh_config=bh_config)
        self._run = make_sharded_run(self.mesh, integrator, strategy,
                                     bh_config=bh_config)
        self._initial = self._state

    def init(self):
        self._state = dataclasses.replace(
            self._state, time=jnp.zeros_like(self._state.time)
        )
        self._initial = self._state

    def reset(self):
        self._state = self._initial

    def step(self):
        self._state = self._step(self._state, self._params)

    def step_by(self, dt):
        self._state = self._step(self._state, self._params, jnp.asarray(dt))

    def run(self, n_steps: int, dt=None):
        self._state = self._run(self._state, self._params, n_steps, dt)
        return self._state

    def compile(self, n_steps: int, dt=None):
        self._run.lower(self._state, self._params, n_steps, dt).compile()
        return self

    def block_until_ready(self):
        jax.block_until_ready(self._state)
        float(self._state.time)  # hard sync (see api.Simulation)
        return self

    @property
    def state(self):
        return self._state

    @property
    def settings(self):
        return self._params

    def set_settings(self, **kw):
        self._params = self._params.replace(**kw)
        return self

    @property
    def n_alive(self) -> int:
        return int(self._state.n_alive())

    @property
    def elapsed(self) -> float:
        return float(self._state.time)

    def get_points(self):
        return self._state.get_points()

    def energy(self) -> float:
        from nbody_tpu.core.energy import total_energy

        replicated = jax.device_put(self._state, NamedSharding(self.mesh, P()))
        return float(total_energy(replicated, self._params))
