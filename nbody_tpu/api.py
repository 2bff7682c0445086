"""User-facing ``Simulation`` — the analog of the reference ``Simulation``
trait (src/shared.rs:80-97) over the functional core.

Method parity map (reference -> here):
    new(points, integrator, bounds)   -> Simulation(pos, vel, mass, ...)
    init()                            -> init()
    step()                            -> step()
    step_by(dt)                       -> step_by(dt)         (negative dt = rewind,
                                                              reference src/vis.rs:236-252)
    update_forces()                   -> update_forces()
    add_point(p) / remove_point(i)    -> add_point / remove_point
    get_points()                      -> get_points()
    elapsed()                         -> .elapsed
    settings()/settings_mut()         -> .settings / set_settings(**kw)

Extras the reference keeps ad hoc in the vis layer (SURVEY.md §5):
    reset()            — restore the pristine initial state (the reference
                         clones ``simulation_base``, src/vis.rs:42-44,304-320)
    run(n)             — n fused steps under one lax.scan (fast benchmark path)
    save()/load()      — real checkpointing (absent in the reference)
    energy()           — total energy diagnostic (absent in the reference)
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import Bounds, ParticleState, SimParams
from nbody_tpu.core.stepper import (
    make_step,
    make_run,
    make_step_comp,
    make_run_comp,
    make_step_stateful,
    make_run_stateful,
    init_comp,
)
from nbody_tpu.core.energy import resolve_energy_method, total_energy
from nbody_tpu.engines import Engine, get_engine


def resolve_auto_engine(n: int) -> str:
    """Engine choice for ``engine="auto"`` — the measured single-chip
    crossover on the fused engine path (results/crossover_r3b.jsonl,
    round 3 after the Newton-3 symmetric brute kernel): direct sum 96.2
    vs tree 72.3 steps/s at N=49k, 54.6 vs 59.4 at 64k —
    log-interpolated equality at ~60k.  (Round 1 measured ~95k, round 3
    pre-sym ~55k.)
    (The reference selects engines by editing main.rs, src/main.rs:91-101.)"""
    if jax.default_backend() == "cpu" and n <= 60000:
        return "brute"  # the Pallas kernel is TPU-only
    return "brute-pallas" if n <= 60000 else "bh"


class Simulation:
    def __init__(
        self,
        pos,
        vel,
        mass,
        *,
        engine: str | Engine = "brute",
        integrator: str = "leapfrog",
        bounds_center=(0.0, 0.0, 0.0),
        bounds_width: float = 10.0,
        dtype=jnp.float32,
        capacity: Optional[int] = None,
        engine_options: Optional[dict] = None,
        compensated: bool = False,
        **settings,
    ):
        """``compensated=True`` carries a double-float low word for pos/vel
        and routes every integrator accumulation through an error-free
        TwoSum (core/stepper.py make_step_comp) — closes most of the f32
        energy-drift gap to f64 at <1% step cost (VALIDATION.md §8)."""
        if engine == "auto":
            engine = resolve_auto_engine(len(mass))
            if engine == "bh" and not (engine_options or {}).get("profile"):
                # scene auto-detection (VERDICT r3 #4): the fast defaults
                # are tuned on the near-uniform disc; a steep-core scene
                # (1M Plummer: 22x over the accuracy envelope) is detected
                # from the build's leaf-occupancy contrast and routed to
                # the density-adaptive profile.  Explicit profile/engine
                # choices are always respected.
                from nbody_tpu.ops.traversal import (
                    STEEP_CONTRAST, detect_scene_profile,
                    resolve_adaptive_overrides, scene_occupancy)

                occ = scene_occupancy(pos, bounds_center, bounds_width)
                if detect_scene_profile(
                        pos, bounds_center, bounds_width,
                        occupancy=occ) == "adaptive":
                    ov = resolve_adaptive_overrides(
                        pos, bounds_center, bounds_width, occupancy=occ)
                    engine_options = {**(engine_options or {}),
                                      "profile": "adaptive", **ov}
                    print(
                        "[nbody-tpu] engine='auto': steep-core scene "
                        f"detected (occupancy contrast {occ['contrast']:.0f}"
                        f" > {STEEP_CONTRAST:.0f}) -> profile='adaptive' "
                        f"(max_level={ov['max_level']}, refine_levels="
                        f"{ov['refine_levels']}); pass engine='bh' or "
                        "profile='fast' to override"
                    )
        if (engine in ("bh", "bh-deep")
                and (engine_options or {}).get("profile") == "adaptive"
                and not any(k in engine_options
                            for k in ("max_level", "refine_levels"))):
            # two measured adaptive regimes (VERDICT r3 #3): pick the deep
            # vs tight-box stack from this scene's level-7 occupancy
            # instead of shipping one preset that fails the other regime
            from nbody_tpu.ops.traversal import resolve_adaptive_overrides

            ov = resolve_adaptive_overrides(pos, bounds_center, bounds_width)
            engine_options = {**engine_options, **ov}
            print(
                "[nbody-tpu] profile='adaptive' resolved to the "
                + ("deep" if ov["max_level"] == 7 else "tight-box")
                + f" stack (max_level={ov['max_level']}, refine_levels="
                f"{ov['refine_levels']}) from the scene's leaf occupancy"
            )
        self.engine = get_engine(engine, **(engine_options or {}))
        #: resolved options (after scene detection / adaptive regime
        #: resolution) — introspection for tests and the vis layer
        self.engine_options = dict(engine_options or {})
        # pallas engines want tile-friendly capacities (big power-of-two
        # j-tiles); others are happy with the 128-lane minimum
        pad_multiple = 2048 if "pallas" in self.engine.name else 128
        self._state = ParticleState.create(
            pos, vel, mass, capacity=capacity, pad_multiple=pad_multiple,
            dtype=dtype,
        )
        self._params = SimParams.create(
            bounds_center=bounds_center,
            bounds_width=bounds_width,
            dtype=dtype,
            **settings,
        )
        self.compensated = bool(compensated)
        self._lo = None
        if self.engine.stateful:
            if self.compensated:
                raise ValueError(
                    "compensated=True is not supported with stateful engines "
                    "(bh-lazy); use engine='bh'"
                )
            self._carry = self.engine.init_carry(
                self._state.pos, self._state.effective_mass(), self._params
            )
            self._step_c = jax.jit(make_step_stateful(self.engine, integrator))
            self._run_c = make_run_stateful(self.engine, integrator)
            self._step = None
            self._run = None
        elif self.compensated:
            self._carry = None
            self._lo = init_comp(self._state)
            self._step = jax.jit(make_step_comp(self.engine.force, integrator))
            self._run = make_run_comp(self.engine.force, integrator)
        else:
            self._carry = None
            self._step = jax.jit(make_step(self.engine.force, integrator))
            self._run = make_run(self.engine.force, integrator)
        self._initial: Optional[ParticleState] = None
        self.init()

    # -- lifecycle ---------------------------------------------------------

    def init(self):
        """Zero the clock and snapshot the pristine state for ``reset``
        (reference init: src/manual/brute_force.rs:47-50 + the vis layer's
        ``simulation_base`` clone, src/vis.rs:42-44)."""
        self._state = dataclasses.replace(
            self._state, time=jnp.zeros_like(self._state.time)
        )
        self._initial = self._state
        self._initial_carry = self._carry
        self._initial_lo = self._lo

    def reset(self):
        """Restore initial particles, keep current settings (reference 'Reset'
        button semantics, src/vis.rs:216-221)."""
        if self._initial is None:
            raise RuntimeError("init() was never called")
        self._state = self._initial
        self._carry = self._initial_carry
        self._lo = self._initial_lo

    # -- stepping ----------------------------------------------------------

    def step(self):
        self.step_by(None)

    def step_by(self, dt: Optional[float] = None):
        dt = None if dt is None else jnp.asarray(dt)
        if self.engine.stateful:
            self._state, self._carry = self._step_c(
                self._state, self._carry, self._params, dt
            )
        elif self.compensated:
            self._state, self._lo = self._step(
                self._state, self._lo, self._params, dt
            )
        else:
            self._state = self._step(self._state, self._params, dt)

    def run(self, n_steps: int, dt: Optional[float] = None):
        """n fused steps in one XLA program."""
        dt = None if dt is None else jnp.asarray(dt)
        if self.engine.stateful:
            self._state, self._carry = self._run_c(
                self._state, self._carry, self._params, n_steps, dt
            )
        elif self.compensated:
            self._state, self._lo = self._run(
                self._state, self._lo, self._params, n_steps, dt
            )
        else:
            self._state = self._run(self._state, self._params, n_steps, dt)
        return self._state

    def compile(self, n_steps: int, dt=None):
        """Ahead-of-time compile the fused ``run`` for a given step count so
        benchmark timing windows exclude compilation."""
        dt = None if dt is None else jnp.asarray(dt)
        if self.engine.stateful:
            self._run_c.lower(
                self._state, self._carry, self._params, n_steps, dt
            ).compile()
        elif self.compensated:
            self._run.lower(
                self._state, self._lo, self._params, n_steps, dt
            ).compile()
        else:
            self._run.lower(self._state, self._params, n_steps, dt).compile()
        return self

    def update_forces(self):
        """Recompute accelerations in place without integrating (reference
        ``update_forces``, src/shared.rs:90)."""
        st = self._state
        acc = self.engine.force(st.pos, st.effective_mass(), self._params)
        acc = jnp.where(st.alive[:, None], acc, jnp.zeros_like(acc))
        self._state = dataclasses.replace(st, acc=acc)

    def block_until_ready(self):
        # A scalar device->host transfer is the only reliable sync under the
        # axon relay (jax.block_until_ready can return before execution).
        jax.block_until_ready(self._state)
        float(self._state.time)
        return self

    # -- particles ---------------------------------------------------------

    def add_point(self, pos, vel, mass):
        self._state = self._state.add_point(pos, vel, mass)
        return self

    def remove_point(self, index: int):
        self._state = self._state.remove_point(index)
        return self

    def get_points(self):
        return self._state.get_points()

    @property
    def n_alive(self) -> int:
        return int(self._state.n_alive())

    @property
    def state(self) -> ParticleState:
        return self._state

    @state.setter
    def state(self, s: ParticleState):
        self._state = s

    # -- settings ----------------------------------------------------------

    @property
    def settings(self) -> SimParams:
        return self._params

    def set_settings(self, **kw):
        """Mutate physics settings live; traced scalars mean no recompilation
        (reference settings_mut + egui sliders, src/vis.rs:130-199)."""
        self._params = self._params.replace(**kw)
        return self

    @property
    def elapsed(self) -> float:
        return float(self._state.time)

    # -- diagnostics -------------------------------------------------------

    def energy(self, method: str = "auto") -> float:
        """Total energy. method: 'exact' (O(N²) pair PE), 'bh' (tree
        estimator, ~1e-4 relative bias — fine for one-shot magnitudes, can
        dominate DRIFT measurements at the 1e-5..1e-4 level), or 'auto'."""
        return float(total_energy(self._state, self._params, method=method))

    def energy_method(self, method: str = "auto") -> str:
        """The method 'auto' resolves to at this capacity (diagnostic)."""
        return resolve_energy_method(self._state.capacity, method)

    def aux(self) -> dict:
        """Engine-specific inspection data (octree node boxes etc.)."""
        if self.engine.aux is None:
            return {}
        st = self._state
        return self.engine.aux(st.pos, st.effective_mass(), self._params)

    # -- checkpointing (new capability; reference has none, SURVEY.md §5) --

    def _payload(self) -> dict:
        st = jax.device_get(self._state)
        pr = jax.device_get(self._params)
        out = {
            "state": {f.name: getattr(st, f.name) for f in dataclasses.fields(st)},
            "params": {
                "g": pr.g,
                "g_soft": pr.g_soft,
                "dt": pr.dt,
                "theta2": pr.theta2,
                "bounds_center": pr.bounds.center,
                "bounds_half_width": pr.bounds.half_width,
            },
            "engine": self.engine.name,
        }
        if self.compensated:
            # double-float low words ride along so a restored run keeps its
            # compensation (dropping them would only cost a 2^-24 jump)
            out["lo"] = {
                "pos_lo": jax.device_get(self._lo[0]),
                "vel_lo": jax.device_get(self._lo[1]),
            }
        return out

    def save(self, path: str, format: str = "pickle"):
        """Checkpoint to ``path``.  format='pickle' writes a single file;
        format='orbax' writes an orbax-checkpoint directory (sharding-aware,
        the ecosystem standard for multi-host runs)."""
        payload = self._payload()
        if format == "orbax":
            import orbax.checkpoint as ocp

            payload = dict(payload)
            payload.pop("engine")  # orbax trees hold arrays, not strings
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), payload, force=True)
            ckptr.wait_until_finished()  # saves are async
            return
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str, format: str = "pickle"):
        if format == "orbax":
            import orbax.checkpoint as ocp

            payload = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        s = payload["state"]
        self._state = ParticleState(
            pos=jnp.asarray(s["pos"]),
            vel=jnp.asarray(s["vel"]),
            acc=jnp.asarray(s["acc"]),
            mass=jnp.asarray(s["mass"]),
            alive=jnp.asarray(s["alive"]),
            time=jnp.asarray(s["time"]),
        )
        p = payload["params"]
        self._params = SimParams(
            g=jnp.asarray(p["g"]),
            g_soft=jnp.asarray(p["g_soft"]),
            dt=jnp.asarray(p["dt"]),
            theta2=jnp.asarray(p["theta2"]),
            bounds=Bounds(
                center=jnp.asarray(p["bounds_center"]),
                half_width=jnp.asarray(p["bounds_half_width"]),
            ),
        )
        if self.compensated:
            lo = payload.get("lo")
            self._lo = (
                (jnp.asarray(lo["pos_lo"]), jnp.asarray(lo["vel_lo"]))
                if lo is not None else init_comp(self._state)
            )
            self._initial_lo = self._lo
        if self.engine.stateful:
            # stateful engines (bh-lazy) carry a tree bound to the positions
            # it was built from; rebinding it to the restored state avoids a
            # first post-load step traversing a stale frozen binning
            self._carry = self.engine.init_carry(
                self._state.pos, self._state.effective_mass(), self._params
            )
            self._initial_carry = self._carry
        self._initial = self._state
        return self
