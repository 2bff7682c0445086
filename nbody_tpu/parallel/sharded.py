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
            # memory-scalable Morton-range domain decomposition: per-chip
            # arrays stay O(N/n_dev + halo); forces come back by ring route
            # (parallel/domain.py — replaces the round-1 replicated path)
            from nbody_tpu.ops.traversal import BHConfig
            from nbody_tpu.parallel.domain import domain_accel

            cfg = bh_config or BHConfig()
            acc, _stats = domain_accel(
                pos, mass_eff, params.bounds, params.theta2, params.g,
                params.g_soft, cfg, axis, n_dev,
            )
        elif strategy == "bh-replicated":
            from nbody_tpu.ops.traversal import (BHConfig, fit_chunks,
                                                 traverse_tree)
            from nbody_tpu.ops.tree import build_octree_sharded

            cfg = bh_config or BHConfig()
            # grid frame (see ops/traversal.py bh_accel): recenter before
            # the gather so the build's f32 sums stay well-conditioned for
            # scenes far from the origin (ADVICE r2 #1)
            b0 = params.bounds.centered()
            pos_c = pos - params.bounds.center
            pos_all = jax.lax.all_gather(pos_c, axis, tiled=True)
            mass_all = jax.lax.all_gather(mass_eff, axis, tiled=True)
            n_tot = pos_all.shape[0]
            # whole chunks are sliced per device: the chunk count must
            # split evenly over the mesh
            cg_fit = fit_chunks(cfg.chunk_groups, n_tot // cfg.group_size,
                                n_dev)
            if cg_fit != cfg.chunk_groups:
                import dataclasses

                cfg = dataclasses.replace(cfg, chunk_groups=cg_fit)
            # distributed build: per-chip Morton encode + sorted gather +
            # leaf segment-sum, merged with psum/all_gather (tree.py)
            tree = build_octree_sharded(
                pos_c, mass_eff, pos_all, mass_all, b0,
                cfg.max_level, axis, dim=cfg.dim,
                quad=cfg.multipole == "quad", quad_leaf=cfg.quad_leaf,
                refine_levels=cfg.refine_levels,
                refine_cap=cfg.refine_cap,
                refine_threshold=cfg.refine_threshold_resolved,
            )
            n_chunks = n_tot // (cfg.group_size * cfg.chunk_groups)
            first = (my * (n_chunks // n_dev)).astype(jnp.int32)
            acc_slice, _stats = traverse_tree(
                tree, b0, params.theta2, params.g, params.g_soft,
                cfg, n_tot, chunk_range=(first,), n_shards=n_dev,
            )
            # assemble: gather slices (sorted order), un-permute by sorting
            # on the stored permutation (same trick as traverse_tree's
            # single-chip tail — a [N, 3] row scatter wastes 125/128 lanes),
            # take my rows
            acc_sorted = jax.lax.all_gather(acc_slice, axis, tiled=True)
            acc_full = jnp.stack(
                jax.lax.sort(
                    (tree.order, acc_sorted[:, 0], acc_sorted[:, 1],
                     acc_sorted[:, 2]),
                    num_keys=1,
                )[1:],
                axis=1,
            )
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


def make_sharded_energy(mesh: Mesh, tile: int = 1024):
    """Jitted total-energy over the mesh: KE is a local reduction + psum;
    the softened pair potential streams source shards around the ICI ring
    (each unordered pair counted once via global-id ordering), so per-chip
    memory stays O(N/chips * tile)."""
    axis = PARTICLE_AXIS
    n_dev = mesh.shape[axis]

    def local_energy(state: ParticleState, params: SimParams):
        my = jax.lax.axis_index(axis)
        n_loc = state.pos.shape[0]
        m = jnp.where(state.alive, state.mass, jnp.zeros_like(state.mass))
        ke = 0.5 * jnp.sum(m * jnp.sum(state.vel * state.vel, axis=-1))
        eps2 = params.g_soft * params.g_soft
        row_ids = my * n_loc + jnp.arange(n_loc)

        t = tile if n_loc % tile == 0 else (128 if n_loc % 128 == 0 else n_loc)
        pos_t = state.pos.reshape(n_loc // t, t, -1)
        m_t = m.reshape(n_loc // t, t)
        ids_t = row_ids.reshape(n_loc // t, t)

        def pe_vs(src_pos, src_m, src_ids):
            def body(args):
                pt, mt, it = args
                d = pt[:, None, :] - src_pos[None, :, :]
                r2 = jnp.sum(d * d, axis=-1) + eps2
                take = (src_ids[None, :] > it[:, None]) & (r2 > 0.0)
                inv_r = jax.lax.rsqrt(jnp.where(take, r2, 1.0))
                pm = mt[:, None] * src_m[None, :]
                return -params.g * jnp.sum(jnp.where(take, pm * inv_r, 0.0))

            return jnp.sum(jax.lax.map(body, (pos_t, m_t, ids_t)))

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def hop(k, carry):
            pe, src_pos, src_m = carry
            src_owner = (my - k) % n_dev
            src_ids = src_owner * n_loc + jnp.arange(n_loc)
            pe = pe + pe_vs(src_pos, src_m, src_ids)
            src_pos = jax.lax.ppermute(src_pos, axis, perm)
            src_m = jax.lax.ppermute(src_m, axis, perm)
            return pe, src_pos, src_m

        pe, _, _ = jax.lax.fori_loop(
            0, n_dev, hop, (jnp.zeros((), state.pos.dtype), state.pos, m)
        )
        return jax.lax.psum(ke + pe, axis)

    state_specs = ParticleState(
        pos=P(axis), vel=P(axis), acc=P(axis), mass=P(axis), alive=P(axis),
        time=P(),
    )
    params_specs = jax.tree.map(lambda _: P(), SimParams.create())

    return jax.jit(jax.shard_map(
        local_energy, mesh=mesh, in_specs=(state_specs, params_specs),
        out_specs=P(), check_vma=False,
    ))


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

            opts = dict(engine_options or {})
            profile = opts.pop("profile", "fast")
            # mirror the single-chip engine (engines/barnes_hut.py): when the
            # caller leaves group sizing to us, use the capacity-adaptive
            # preset — sized by the PER-CHIP shard, which is what each chip's
            # walk/slab actually sees.  Raw BHConfig() field defaults here
            # used to silently drop block-dual + the tuned cap/pad cuts on
            # every multi-chip run (~35% of the single-chip step rate at
            # 1M/chip, dual_r3.jsonl).
            adaptive = bool(profile == "adaptive"
                            or opts.get("refine_levels"))
            if (profile == "adaptive"
                    and not any(k in opts
                                for k in ("max_level", "refine_levels"))):
                # per-scene deep vs tight-box stack, mirroring the
                # single-chip spelling (api.Simulation / VERDICT r3 #3)
                from nbody_tpu.ops.traversal import (
                    resolve_adaptive_overrides)

                opts.update(resolve_adaptive_overrides(
                    pos, bounds_center, bounds_width))
            if adaptive and strategy not in ("bh", "bh-replicated",
                                             "allgather"):
                # 'allgather' is the constructor default placeholder; bh
                # engines coerce it below.  Anything else asked for a
                # walk with no refined-table route — fail loudly instead
                # of silently dropping the accuracy the profile exists
                # for (VALIDATION.md §19)
                raise ValueError(
                    f"strategy {strategy!r} has no density-adaptive route; "
                    "use strategy='bh' (domain) or 'bh-replicated'"
                )
            auto_group = not any(
                k in opts for k in ("group_size", "subgroups", "chunk_groups")
            )
            if auto_group:
                per_chip = -(-len(mass) // n_dev)
                bh_config = BHConfig.auto_for(per_chip, profile=profile,
                                              **opts)
            else:
                if profile == "accurate":
                    opts.setdefault("window_pad", 2048)
                elif profile == "dense":
                    from nbody_tpu.ops.traversal import DENSE_OVERRIDES

                    for k, v in DENSE_OVERRIDES.items():
                        opts.setdefault(k, v)
                bh_config = BHConfig(**opts)
            # "bh" = Morton-range domain decomposition (O(N/chips + halo)
            # per chip); "bh-replicated" = round-1 all-gather path (kept for
            # A/B and for configs with groups larger than a shard)
            if strategy not in ("bh", "bh-replicated"):
                strategy = "bh"
            pad_multiple = bh_config.group_size * bh_config.chunk_groups * n_dev
        elif engine in ("brute", "brute-pallas"):
            # a bh strategy here would dispatch domain_accel with a raw
            # default BHConfig, silently ignoring the engine choice (and
            # tripping an internal divisibility assert at small N)
            if strategy not in ("allgather", "ring"):
                raise ValueError(
                    f"strategy {strategy!r} requires engine='bh'/'bh-deep'; "
                    f"brute engines take 'allgather' or 'ring'"
                )
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
        self._engine_name = engine
        self._engine_options = engine_options
        self._bh_config = bh_config  # resolved config (None for brute)
        self._energy = None
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

    def energy(self, method: str = "auto") -> float:
        """Total energy with the pair-potential sum computed IN PLACE on the
        mesh: a ppermute ring streams source shards past each chip's rows
        (O(N/chips) per-chip memory, same shape as the 'ring' force
        strategy) — round 1 replicated the whole state onto every device
        first (VERDICT.md #3).  Always the EXACT pair potential ('auto'
        resolves to 'exact' here; the tree estimator is single-device)."""
        if method not in ("auto", "exact"):
            raise ValueError(
                f"sharded energy is exact-only, got method={method!r}")
        if self._energy is None:
            self._energy = make_sharded_energy(self.mesh)
        return float(self._energy(self._state, self._params))

    def energy_method(self, method: str = "auto") -> str:
        return "exact"

    # -- particle management (reference src/shared.rs:91-92) ---------------

    def add_point(self, pos, vel, mass):
        """Occupy the first dead slot.  The masked .at[] update compiles to
        a scatter on the owning shard; shardings are reasserted so the step
        function's layout assumptions never degrade."""
        self._state = self._reshard(self._state.add_point(pos, vel, mass))
        return self

    def remove_point(self, index: int):
        self._state = self._reshard(self._state.remove_point(index))
        return self

    def _reshard(self, state: ParticleState) -> ParticleState:
        sharding = NamedSharding(self.mesh, P(PARTICLE_AXIS))
        rep = NamedSharding(self.mesh, P())
        return ParticleState(
            pos=jax.device_put(state.pos, sharding),
            vel=jax.device_put(state.vel, sharding),
            acc=jax.device_put(state.acc, sharding),
            mass=jax.device_put(state.mass, sharding),
            alive=jax.device_put(state.alive, sharding),
            time=jax.device_put(state.time, rep),
        )

    # -- engine inspection --------------------------------------------------

    def aux(self) -> dict:
        """Tree boxes / traversal stats for visualization.  Inspection runs
        on gathered host data (viz payloads are depth-clamped anyway); the
        simulation arrays stay sharded."""
        from nbody_tpu.engines import get_engine

        eng = get_engine(self._engine_name,
                         **(self._engine_options or {}))
        if eng.aux is None:
            return {}
        host = jax.device_get(self._state)
        st = ParticleState(*[jnp.asarray(getattr(host, f)) for f in
                             ("pos", "vel", "acc", "mass", "alive", "time")])
        return eng.aux(st.pos, st.effective_mass(), self._params)

    # -- checkpointing (sharding-aware; closes VERDICT.md #3) ---------------

    def save(self, path: str, format: str = "orbax"):
        """format='orbax': arrays are written WITH their shardings (orbax
        handles sharded jax.Arrays natively — the multi-host-safe path).
        format='pickle': gathers to host first (single-host convenience)."""
        payload = {
            "state": dataclasses.asdict(self._state),
            "params": {
                "g": self._params.g, "g_soft": self._params.g_soft,
                "dt": self._params.dt, "theta2": self._params.theta2,
                "bounds_center": self._params.bounds.center,
                "bounds_half_width": self._params.bounds.half_width,
            },
        }
        if format == "orbax":
            import os

            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), payload, force=True)
            ckptr.wait_until_finished()
            return
        import pickle

        with open(path, "wb") as f:
            pickle.dump(jax.device_get(payload), f)

    def load(self, path: str, format: str = "orbax"):
        if format == "orbax":
            import os

            import orbax.checkpoint as ocp

            # restore DIRECTLY into the current sharded layout: the target
            # tree of ShapeDtypeStructs carries the shardings
            target = {
                "state": dataclasses.asdict(self._state),
                "params": {
                    "g": self._params.g, "g_soft": self._params.g_soft,
                    "dt": self._params.dt, "theta2": self._params.theta2,
                    "bounds_center": self._params.bounds.center,
                    "bounds_half_width": self._params.bounds.half_width,
                },
            }
            abstract = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding),
                target,
            )
            payload = ocp.StandardCheckpointer().restore(
                os.path.abspath(path), abstract)
        else:
            import pickle

            with open(path, "rb") as f:
                payload = pickle.load(f)
        st = payload["state"]
        self._state = self._reshard(ParticleState(
            pos=jnp.asarray(st["pos"]), vel=jnp.asarray(st["vel"]),
            acc=jnp.asarray(st["acc"]), mass=jnp.asarray(st["mass"]),
            alive=jnp.asarray(st["alive"]), time=jnp.asarray(st["time"]),
        ))
        pr = payload["params"]
        from nbody_tpu.core.state import Bounds

        self._params = jax.device_put(
            SimParams(
                g=jnp.asarray(pr["g"]), g_soft=jnp.asarray(pr["g_soft"]),
                dt=jnp.asarray(pr["dt"]), theta2=jnp.asarray(pr["theta2"]),
                bounds=Bounds(center=jnp.asarray(pr["bounds_center"]),
                              half_width=jnp.asarray(pr["bounds_half_width"])),
            ),
            NamedSharding(self.mesh, P()),
        )
        self._initial = self._state
        return self
